"""Adversarial-skew tier (r6): the pipeline operators are oracle-green
on uniform synthetic data, but real crawls are Zipfian — viral
boilerplate passages, mega replica groups, one shingle shared by half
the corpus, and billions of empty documents.  Each test PLANTS one such
shape and asserts (a) the answers stay exactly right and (b) the skewed
run completes within a bounded factor of a uniform same-size control
(the wall-bound form of "no straggler task >> median": a hot key that
funnels to one reducer would blow the ratio, not sit inside it).

Wall ratios use a generous 4x bound — the shared box's throughput
drifts, and these are smoke alarms for quadratic/straggler behavior,
not benchmarks (a true hot-key funnel measures 10-100x, not 4x).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F


def _wall(df) -> float:
    t0 = time.perf_counter()
    df.count()
    return time.perf_counter() - t0


HOT_PASSAGE = " ".join(f"cookie{i}" for i in range(10))  # 10-token window


def test_passage_dedup_hot_passage_skew(spark):
    """One viral passage in 100k of 120k docs (the cookie-banner shape).
    The r6 groupBy(h60(p)) + min(struct) formulation partial-aggregates
    the hot key map-side; the pre-r6 Window over the raw string funneled
    all 100k copies to one reducer.  Correctness: only the first
    occurrence keeps the passage; every doc keeps its unique tail."""
    from kenlm_spark.operators.dedup import passage_dedup

    n, n_hot = 120_000, 100_000
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < n_hot,
            F.concat(F.lit(HOT_PASSAGE + " tail"), F.col("id").cast("string")),
        )
        .otherwise(F.concat(F.lit("uniq"), F.col("id").cast("string")))
        .alias("text"),
    )
    skew_wall = _wall(passage_dedup(base, window=10))
    uniform = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("only"), F.col("id").cast("string")).alias("text"),
    )
    uni_wall = _wall(passage_dedup(uniform, window=10))
    assert skew_wall < max(4 * uni_wall, 10.0), (skew_wall, uni_wall)

    out = passage_dedup(base, window=10)
    rows = {
        r["doc_id"]: r
        for r in out.filter(
            F.col("doc_id").isin(0, 1, 77, n_hot - 1, n_hot)
        ).collect()
    }
    # doc 0 is the first occurrence: keeps passage + its tail
    assert rows[0]["clean_text"] == HOT_PASSAGE.lower() + " tail0"
    assert rows[0]["n_dropped"] == 0
    # later hot docs lose the viral passage window, keep the tail word
    for d in (1, 77, n_hot - 1):
        assert rows[d]["clean_text"] == f"tail{d}", rows[d]
        assert rows[d]["n_passages"] == 2 and rows[d]["n_dropped"] == 1
    # non-hot docs untouched
    assert rows[n_hot]["clean_text"] == f"uniq{n_hot}"
    assert rows[n_hot]["n_dropped"] == 0


def test_minhash_hot_bucket_beyond_guard(spark):
    """A 30k-replica group (every minhash band collides) must be dropped
    by the max_bucket guard BEFORE the pair agg — candidate generation
    stays linear and planted small near-dup groups are still found."""
    from kenlm_spark.operators.dedup import minhash_lsh_pairs

    n_hot = 30_000
    hot = spark.range(n_hot).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta eta theta").alias("text"),
    )
    # two genuine near-dup docs under the cap
    pair = spark.createDataFrame(
        [
            (1_000_000, "red orange yellow green blue indigo violet pink"),
            (1_000_001, "red orange yellow green blue indigo violet teal"),
        ],
        "doc_id long, text string",
    )
    docs = hot.unionByName(pair)
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(
        docs, jaccard_threshold=0.5, max_bucket=20
    ).collect()
    wall = time.perf_counter() - t0
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1_000_000, 1_000_001) in got
    # no pair from the mega-group (guard dropped its buckets); without
    # the guard this would be ~450M candidate pairs
    assert all(a >= 1_000_000 for a, _ in got), got
    assert wall < 60.0, wall


def test_contamination_hot_shingle_half_corpus(spark):
    """One benchmark 5-gram occurs in 50% of 100k corpus docs.  The
    benchmark side is a broadcast hash set, so the hot gh never shuffles
    — the probe is map-side; the per-doc agg keys on doc id (uniform)."""
    from kenlm_spark.operators.dedup import contamination_check

    n = 100_000
    hot5 = "lorem ipsum dolor sit amet"
    corpus = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(F.lit(hot5 + " pad"), F.col("id").cast("string")),
        )
        .otherwise(F.concat(F.lit("clean text body word"), F.col("id").cast("string")))
        .alias("text"),
    )
    bench = spark.createDataFrame(
        [(999_999_999, hot5)], "doc_id long, text string"
    )
    skew_wall = _wall(contamination_check(corpus, bench, broadcast=True))
    clean = corpus.withColumn(
        "text", F.concat(F.lit("x y z w v"), F.col("doc_id").cast("string"))
    )
    uni_wall = _wall(contamination_check(clean, bench, broadcast=True))
    assert skew_wall < max(4 * uni_wall, 10.0), (skew_wall, uni_wall)

    agg = (
        contamination_check(corpus, bench, broadcast=True)
        .groupBy("contaminated")
        .count()
        .collect()
    )
    counts = {r["contaminated"]: r["count"] for r in agg}
    assert counts[True] == n // 2 and counts[False] == n // 2, counts


def test_empty_text_storm(spark):
    """100k empty/whitespace docs + 1k real ones.  Empty docs must never
    reach the passage hash exchange (they are filtered before it and
    rejoin via the map-only spine), and quality metrics / contamination
    must emit a row per doc without a hot ''-key anywhere."""
    from kenlm_spark.operators.dedup import contamination_check, passage_dedup
    from kenlm_spark.filtering.quality import quality_metric_exprs

    n_empty, n_real = 100_000, 1_000
    docs = spark.range(n_empty + n_real).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_empty, F.lit("  \t "))
        .otherwise(F.concat(F.lit("real content here"), F.col("id").cast("string")))
        .alias("text"),
    )
    t0 = time.perf_counter()
    pd_rows = passage_dedup(docs, window=10)
    n_rows = pd_rows.count()
    empty_out = pd_rows.filter(F.col("doc_id") == 5).first()
    wall = time.perf_counter() - t0
    assert n_rows == n_empty + n_real
    assert empty_out["clean_text"] == "" and empty_out["n_passages"] == 0
    assert wall < 60.0, wall

    qm = docs.select(
        "doc_id", *[c.alias(k) for k, c in quality_metric_exprs("text").items()]
    ).count()
    assert qm == n_empty + n_real

    bench = spark.createDataFrame(
        [(1, "real content here999999")], "doc_id long, text string"
    )
    cont = contamination_check(docs, bench, broadcast=True)
    assert cont.count() == n_empty + n_real
    # empty docs emit the [""] sentinel shingle, which must not match
    assert cont.filter(F.col("doc_id") == 7).first()["contaminated"] is False


def test_dsir_hot_bucket_stopword_storm(spark):
    """DSIR under the Zipf head: one stopword bigram in 100k of 110k
    docs.  The bucket histogram partial-aggregates the hot bucket
    map-side and the scoring join is a broadcast against the
    n_buckets-bounded ratio table, so no reducer sees the hot key
    materialized.  Correctness: the rare target-like docs still
    outweigh the boilerplate."""
    from kenlm_spark.operators.dsir import dsir_log_weights

    n, n_hot = 110_000, 100_000
    raw = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < n_hot,
            F.lit("click here click here click here"),
        )
        .otherwise(F.lit("patient dose trial clinical outcome"))
        .alias("text"),
    )
    target = spark.range(50).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.lit("patient dose trial clinical outcome").alias("text"),
    )
    skew_wall = _wall(dsir_log_weights(raw, target))

    uniform = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("word"), (F.col("id") % 50_000).cast("string")).alias(
            "text"
        ),
    )
    uni_wall = _wall(dsir_log_weights(uniform, target))
    assert skew_wall < max(4 * uni_wall, 10.0), (skew_wall, uni_wall)

    w = dsir_log_weights(raw, target)
    agg = (
        w.withColumn("is_med", F.col("id") >= n_hot)
        .groupBy("is_med")
        .agg(F.min("log_w").alias("lo"), F.max("log_w").alias("hi"))
        .collect()
    )
    by = {r["is_med"]: r for r in agg}
    # every target-like doc outweighs every boilerplate doc
    assert by[True]["lo"] > by[False]["hi"]


def test_semdedup_degenerate_cell_at_guard_boundary(spark):
    """SemDeDup under a dead encoder: 30k identical embeddings collapse
    into ONE k-means cell (the all-zero/constant-embedding shard shape).
    The max_cell guard must drop that cell from pairing BEFORE the
    O(m^2) self-join — 30k would otherwise emit ~450M candidate pairs —
    while a second cell sitting exactly AT the cap is still paired in
    full (the worst-allowed case, ~2M pairs) and resolves exactly: all
    members are identical, so every pair ties on c_sim and the larger id
    loses — exactly one survivor, the smallest id."""
    from kenlm_spark.operators.semdedup import semdedup_labels

    cap = 2_000
    n_over, at_cap = 30_000, cap
    # interleaved ids (even=over, odd=boundary) so Lloyd's first-k-by-id
    # seeds see BOTH directions and split the space into two cells
    over = spark.range(n_over).select(
        (F.col("id") * 2).alias("vec_id"),
        F.array(*[F.lit(x) for x in (10.0, 0.0, 0.0, 0.0)]).alias("embedding"),
    )
    boundary = spark.range(at_cap).select(
        (F.col("id") * 2 + 1).alias("vec_id"),
        F.array(*[F.lit(x) for x in (0.0, 10.0, 0.0, 0.0)]).alias("embedding"),
    )
    emb = over.unionByName(boundary)

    t0 = time.perf_counter()
    # split_oversized=False pins the legacy drop-the-cell guard; the
    # default id-hash split regime is covered (with cross-engine parity)
    # in tests/test_semdedup.py
    out = semdedup_labels(
        emb, tau=0.95, n_cells=2, iters=3, sample_frac=1.0, max_cell=cap,
        split_oversized=False,
    )
    agg = (
        out.withColumn("is_over", F.col("nid") % 2 == 0)
        .groupBy("is_over")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
            F.min(F.when(F.col("keep"), F.col("nid"))).alias("min_kept"),
        )
        .collect()
    )
    wall = time.perf_counter() - t0
    by = {r["is_over"]: r for r in agg}
    # over-cap cell: guard drops it from pairing -> everything keeps
    assert by[True]["n"] == n_over and by[True]["n_keep"] == n_over
    # at-cap cell: fully paired, identical members -> one survivor (min id)
    assert by[False]["n"] == at_cap and by[False]["n_keep"] == 1
    assert by[False]["min_kept"] == 1
    # wall bound: linear in the guarded cell, quadratic only under the cap
    assert wall < 90.0, wall


def test_packing_giant_document_skew(spark):
    """Sequence packing under a giant-document shard: one 200k-token
    document among 20k small ones. The assignment window shuffles only
    (id, grp, n_tokens) — the giant doc is one tiny row there — and in
    the materializer it lands alone in its spanning sequence (row size
    == doc size, the irreducible cost of materialization). Walls must
    stay in the uniform corpus's band and the spanning math must be
    exact."""
    import time as _t

    from pyspark.sql import functions as F

    from kenlm_spark.operators.packing import pack_payloads, pack_sequences

    small = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.lit("a b c d e f g h").alias("text"),
    )
    giant = spark.createDataFrame(
        [(999_999, " ".join(["tok"] * 200_000))], "doc_id long, text string"
    )
    docs = small.unionByName(giant)

    t0 = _t.perf_counter()
    asg = pack_sequences(docs, budget_tokens=64, n_groups=8)
    rows = asg.collect()
    wall_asg = _t.perf_counter() - t0
    assert len(rows) == 20_001
    g = [r for r in rows if r.doc_id == 999_999][0]
    assert g.n_tokens == 200_000 and 0 <= g.seq_offset < 64

    t0 = _t.perf_counter()
    out = pack_payloads(docs, budget_tokens=64, n_groups=8)
    seqs = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("n_tokens").alias("max_t"),
        F.sum("n_tokens").alias("sum_t"),
    ).collect()[0]
    wall_pay = _t.perf_counter() - t0
    # token conservation and the giant doc's spanning sequence
    assert seqs["sum_t"] == 20_000 * 8 + 200_000
    assert seqs["max_t"] >= 200_000  # the spanning sequence holds it all
    # wall bounds: generous absolute caps (uniform runs take ~2-4s here)
    assert wall_asg < 60, wall_asg
    assert wall_pay < 90, wall_pay
