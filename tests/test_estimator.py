"""Estimator tests: golden counting (corpus_count_test.cc), discount math,
probability-mass invariants, and ARPA round-trip through the scorer."""

import math

import pytest
from pyspark.sql import functions as F

from kenlm_spark.estimator import (
    BadDiscountError,
    Discount,
    adjusted_counts,
    compute_discount,
    count_windows,
    estimate,
    to_ngram_model,
    write_arpa,
)

# The 4-line corpus of /root/reference/lm/builder/corpus_count_test.cc:59
CORPUS = [
    "looking on a little more loin",
    "on a little more loin",
    "on foo little more loin",
    "bar",
    "",
]

# Golden order-3 window counts from corpus_count_test.cc:35-52 (after
# summing the per-block partials the streaming test observes).
GOLDEN_WINDOWS = {
    "<s> <s> looking": 1,
    "<s> looking on": 1,
    "looking on a": 1,
    "on a little": 2,
    "a little more": 2,
    "little more loin": 3,
    "more loin </s>": 3,
    "<s> <s> on": 2,
    "<s> on a": 1,
    "<s> on foo": 1,
    "on foo little": 1,
    "foo little more": 1,
    "<s> <s> bar": 1,
    "<s> bar </s>": 1,
    "<s> <s> </s>": 1,
}


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], "text string")


def test_count_windows_golden(spark, corpus_df):
    rows = count_windows(corpus_df, "text", 3).collect()
    got = {" ".join(r["words"]): r["count"] for r in rows}
    assert got == GOLDEN_WINDOWS


def test_adjusted_counts_semantics(spark, corpus_df):
    windows = count_windows(corpus_df, "text", 3)
    grams = adjusted_counts(windows, 3)
    tri = {" ".join(r["words"]): r["count"] for r in grams[3].collect()}
    # CollapseStream drops multi-<s> windows from the model set.
    assert "<s> <s> looking" not in tri
    assert tri["<s> looking on"] == 1
    assert tri["little more loin"] == 3

    bi = {" ".join(r["words"]): r["count"] for r in grams[2].collect()}
    # "<s> looking" keeps its raw count (BOS exception).
    assert bi["<s> looking"] == 1
    assert bi["<s> on"] == 2
    # "more loin": distinct left extensions of suffix = {little} -> 1
    assert bi["more loin"] == 1
    # "little more": distinct left extensions {a, foo} -> 2
    assert bi["little more"] == 2

    uni = {" ".join(r["words"]): r["count"] for r in grams[1].collect()}
    assert uni["<unk>"] == 0
    assert uni["<s>"] == 0
    # "loin": distinct preceders {more} -> 1;  "little": {a, foo} -> 2
    assert uni["loin"] == 1
    assert uni["little"] == 2
    # "</s>": distinct preceders {loin, bar, <s>} -> 3
    assert uni["</s>"] == 3


def test_compute_discount_formula():
    n = {1: 100, 2: 50, 3: 30, 4: 20}
    y = 100 / (100 + 2 * 50)
    d = compute_discount(n)
    assert d.d1 == pytest.approx(1 - 2 * y * 50 / 100)
    assert d.d2 == pytest.approx(2 - 3 * y * 30 / 50)
    assert d.d3plus == pytest.approx(3 - 4 * y * 20 / 30)


def test_compute_discount_fallback_and_throw():
    bad = {1: 0, 2: 5}
    with pytest.raises(BadDiscountError):
        compute_discount(bad, fallback=None)
    d = compute_discount(bad, fallback=Discount(0.5, 1.0, 1.5))
    assert (d.d1, d.d2, d.d3plus) == (0.5, 1.0, 1.5)


@pytest.fixture(scope="module")
def estimated(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    model_df, discounts = estimate(docs, "text", order=3)
    return model_df.collect(), discounts


def test_estimate_probability_mass(estimated):
    rows, _ = estimated
    uni = [r for r in rows if r["order"] == 1]
    # Sum over all unigrams except <s> must be 1 (zeroton <unk> included via
    # its gamma*uniform mass).
    total = sum(
        10.0 ** r["log10_prob"] for r in uni if r["words"] != ["<s>"]
    )
    assert total == pytest.approx(1.0, abs=1e-6)


def test_estimate_context_mass(estimated, spark):
    """For an observed bigram context, sum_w p(w|ctx) over the full vocab
    must be 1 — the defining invariant of interpolated KN."""
    rows, _ = estimated
    model = to_ngram_model(_as_df(spark, rows), 3)
    uni_words = [r["words"][0] for r in rows if r["order"] == 1]
    # pick the most frequent bigram context
    bi = [r for r in rows if r["order"] == 2 and r["words"][0] not in ("<s>",)]
    ctx_words = bi[0]["words"]
    # Build the scoring state by feeding the context through the model so
    # the recorded backoffs are the real ones.
    state = model.null_context_state()
    for w in ctx_words:
        _, state = model.full_score(state, model.word_id(w))
    total = 0.0
    for w in uni_words:
        if w == "<s>":
            continue
        ret, _ = model.full_score(state, model.word_id(w))
        total += 10.0 ** ret.log10_prob
    assert total == pytest.approx(1.0, abs=1e-4)


def _as_df(spark, rows):
    return spark.createDataFrame(
        [(r["order"], r["words"], r["log10_prob"], r["log10_backoff"]) for r in rows],
        "order int, words array<string>, log10_prob double, log10_backoff double",
    )


def test_arpa_roundtrip(estimated, spark, tmp_path):
    rows, _ = estimated
    path = str(tmp_path / "est.arpa")
    write_arpa([r.asDict() for r in rows], 3, path)
    from kenlm_spark.ngram.arpa import load_arpa

    loaded = load_arpa(path)
    direct = to_ngram_model(_as_df(spark, rows), 3)
    for sent in ["the data table", "spark query plan row", "zzz unseen words here"]:
        assert loaded.score(sent) == pytest.approx(direct.score(sent), abs=2e-4)


def test_estimated_model_scores_sane(estimated, spark):
    rows, _ = estimated
    model = to_ngram_model(_as_df(spark, rows), 3)
    s = model.score("the data table")
    assert math.isfinite(s) and s < 0
    # A frequent in-vocab word should beat OOV junk.
    assert model.score("the") > model.score("qqqqxyz")


def test_estimate_order4_mass(spark, sf_dir):
    """Generalization check: the KN invariant holds at order 4 too."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    model_df, _ = estimate(docs, "text", order=4)
    rows = model_df.collect()
    uni = [r for r in rows if r["order"] == 1]
    total = sum(10.0 ** r["log10_prob"] for r in uni if r["words"] != ["<s>"])
    assert total == pytest.approx(1.0, abs=1e-6)
    assert {r["order"] for r in rows} == {1, 2, 3, 4}


def test_quantize_error_bound(spark):
    from kenlm_spark.operators.quantize import quantize_model
    from kenlm_spark.oracle import arpa_ngram_rows
    import os

    path = os.path.join(os.path.dirname(__file__), "fixtures", "test.arpa")
    rows = [(n, g, p, b) for n, g, p, b in arpa_ngram_rows(path)]
    model = spark.createDataFrame(
        rows, "ord int, gram string, log10_prob double, log10_backoff double"
    )
    q = {(r["ord"], r["gram"]): r for r in quantize_model(model, bits=6).collect()}
    orig = {(n, g): (p, b) for n, g, p, b in rows}
    # 2^6 bins over <=47 values per order: every bin has <=1 value, so
    # quantization must be lossless here.
    for key, (p, b) in orig.items():
        assert q[key]["prob_q"] == pytest.approx(p, abs=1e-6)
        assert q[key]["backoff_q"] == pytest.approx(b, abs=1e-6)


def test_pruned_model_mass_invariant(spark, sf_dir):
    """Pruning folds dropped mass into gamma, so sum_w p(w|ctx) over the
    full vocab must STILL be 1 for surviving contexts."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    model_df, _ = estimate(docs, "text", order=3, prune_thresholds={2: 1, 3: 1})
    rows = model_df.collect()
    uni_total = sum(
        10.0 ** r["log10_prob"]
        for r in rows
        if r["order"] == 1 and r["words"] != ["<s>"]
    )
    assert uni_total == pytest.approx(1.0, abs=1e-6)

    model = to_ngram_model(_as_df(spark, rows), 3)
    uni_words = [r["words"][0] for r in rows if r["order"] == 1]
    bi = [r for r in rows if r["order"] == 2 and r["words"][0] != "<s>"]
    assert bi, "pruning removed every bigram"
    state = model.null_context_state()
    for w in bi[0]["words"]:
        _, state = model.full_score(state, model.word_id(w))
    total = 0.0
    for w in uni_words:
        if w == "<s>":
            continue
        ret, _ = model.full_score(state, model.word_id(w))
        total += 10.0 ** ret.log10_prob
    assert total == pytest.approx(1.0, abs=1e-4)


def test_prune_words_removed(spark):
    df = spark.createDataFrame(
        [("the bad word here",), ("the good word here",), ("bad word again",)],
        "text string",
    )
    model_df, _ = estimate(
        df, "text", order=2, prune_words=["bad"],
        fallback_discount=Discount(0.5, 1.0, 1.5),
    )
    grams = {" ".join(r["words"]) for r in model_df.collect()}
    assert not any("bad" in g.split(" ") for g in grams)
    assert any("good" in g.split(" ") for g in grams)


def test_model_table_parquet_roundtrip(estimated, spark, tmp_path):
    """S6: the estimated model persists as a parquet table partitioned by
    order (the Iceberg-style intermediate) and reloads score-identically."""
    rows, _ = estimated
    df = _as_df(spark, rows)
    path = str(tmp_path / "model_table")
    df.write.partitionBy("order").mode("overwrite").parquet(path)
    re = spark.read.parquet(path).select(
        "order", "words", "log10_prob", "log10_backoff"
    )
    m1 = to_ngram_model(df, 3)
    m2 = to_ngram_model(re, 3)
    for s in ["the data table", "row value part", "unseen zzz tokens"]:
        assert m2.score(s) == pytest.approx(m1.score(s), abs=1e-6)


def test_order5_estimation_matches_duckdb(spark, sf_dir):
    """Estimation at the reference's DEFAULT order (5) matches the
    independent DuckDB estimator on a deterministic 100-doc slice —
    discounts, gammas, interpolation, and backoffs at all 5 orders."""
    import duckdb
    from pyspark.sql import functions as F

    from kenlm_spark import estimator_sql as est_sql
    from kenlm_spark.estimator import estimate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 100
    )
    model, _ = estimate(docs, "text", order=5)
    got = sorted(
        (r["ord"], r["gram"], r["p"], r["b"])
        for r in model.select(
            F.col("order").alias("ord"),
            F.concat_ws(" ", "words").alias("gram"),
            F.round("log10_prob", 6).alias("p"),
            F.round("log10_backoff", 6).alias("b"),
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet') WHERE doc_id < 100"
    )
    want = sorted(
        (a, g, round(p, 6), round(b, 6))
        for a, g, p, b in con.sql(
            est_sql.model_sql("documents", "text", 5)
        ).fetchall()
    )
    assert got == want


def test_export_model_tables_parity(estimated, spark):
    """Collect-free export == broadcast path: export_model_tables must
    reproduce model_table(to_ngram_model(...)) exactly — same vocab id
    assignment, same key set, bit-equal float32-rounded probs/backoffs."""
    from kenlm_spark.estimator import export_model_tables
    from kenlm_spark.ngram.join_scorer import model_table

    rows, _ = estimated
    model_df = _as_df(spark, rows).localCheckpoint(eager=True)
    m = to_ngram_model(model_df, 3)
    tall, vocab = export_model_tables(model_df, 3)

    assert {r["word"]: r["id"] for r in vocab.collect()} == m.vocab

    ref = {
        (r["n"], r["key"]): (r["prob"], r["backoff"])
        for r in model_table(spark, m).collect()
    }
    got = {
        (r["n"], r["key"]): (r["prob"], r["backoff"])
        for r in tall.collect()
    }
    assert set(ref) == set(got)
    assert all(ref[k][0] == got[k][0] and ref[k][1] == got[k][1] for k in ref)


def test_pipeline_from_model_tables_matches_broadcast(estimated, spark):
    """The collect-free pipeline (estimate -> export_model_tables ->
    join scorer) must make the SAME keep/drop decisions, reasons, and
    scrubbed captions as the broadcast pipeline on the same input."""
    from kenlm_spark.estimator import export_model_tables
    from kenlm_spark.pipeline import FilterConfig, QualityFilterPipeline

    rows, _ = estimated
    model_df = _as_df(spark, rows).localCheckpoint(eager=True)
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(200)
    images = docs.select(
        F.col("doc_id").cast("string").alias("image_id"),
        F.lit(None).cast("binary").alias("bytes"),
        F.lit(8).alias("w"), F.lit(8).alias("h"),
        F.lit("raw").alias("fmt"),
        F.col("text").alias("caption"),
        F.col("doc_id").alias("phash"),
    )
    cols = ["image_id", "keep", "drop_reason", "scrubbed_caption",
            "lm_oov_count", "lm_n_tokens"]

    bcast = QualityFilterPipeline(spark, to_ngram_model(model_df, 3))
    a = {r["image_id"]: tuple(r) for r in bcast.run(images).select(*cols).collect()}

    tall, vocab = export_model_tables(model_df, 3)
    joined = QualityFilterPipeline.from_model_tables(
        spark, tall, vocab, 3, FilterConfig()
    )
    b = {r["image_id"]: tuple(r) for r in joined.run(images).select(*cols).collect()}
    assert a == b


def test_write_read_model_tables_bucketed(estimated, spark, tmp_path):
    """Bucketed persistence round-trip: write_model_tables ->
    read_model_tables scores identically, and the scoring join's FINAL
    plan has no Exchange above the bucketed model scan."""
    from kenlm_spark.estimator import export_model_tables
    from kenlm_spark.ngram.join_scorer import (
        read_model_tables,
        score_with_join,
        write_model_tables,
    )

    rows, _ = estimated
    model_df = _as_df(spark, rows).localCheckpoint(eager=True)
    tall, vocab = export_model_tables(model_df, 3)
    write_model_tables(tall, vocab, "t_export", buckets=8,
                       path=str(tmp_path / "warehouse"))
    tall2, vocab2 = read_model_tables(spark, "t_export")

    m = to_ngram_model(model_df, 3)
    docs = spark.createDataFrame(
        [(1, "the data table"), (2, "row value part"), (3, "zzz unseen")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["log10_prob"]
        for r in score_with_join(
            docs, "text", tall2, vocab2, 3, m.bos_id, m.eos_id
        ).collect()
    }
    for doc_id, text in [(1, "the data table"), (2, "row value part"),
                         (3, "zzz unseen")]:
        assert got[doc_id] == pytest.approx(m.score(text), abs=1e-5)


def test_write_arpa_distributed_byte_identical(spark, sf_dir, tmp_path):
    """The streaming per-order-sorted writer must emit byte-identical
    output to the collect-path writer, and the COMPILED reference must
    parse and score it (when present)."""
    import os
    import sys

    from kenlm_spark.estimator import write_arpa, write_arpa_distributed

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    model_df, _ = estimate(docs, "text", order=3)
    a = str(tmp_path / "collect.arpa")
    b = str(tmp_path / "dist.arpa")
    write_arpa(model_df.collect(), 3, a)
    write_arpa_distributed(model_df, 3, b)
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()

    from kenlm_spark.ngram.arpa import load_arpa

    ours = load_arpa(b)
    if os.path.exists("/tmp/refbuild"):
        sys.path.insert(0, "/tmp/refbuild")
        try:
            import kenlm as ref_kenlm
        except ImportError:
            return
        ref = ref_kenlm.Model(b)
        for s in ["the quick brown fox", "data processing pipeline"]:
            assert ours.score(s) == pytest.approx(
                ref.score(s, bos=True, eos=True), abs=1e-4
            )
