"""Interpolated modified-Kneser-Ney n-gram estimation in DataFrames —
the Spark-native equivalent of the reference's ``lmplz`` pipeline
(/root/reference/lm/builder/pipeline.cc:331-383).

Stage map (reference → here):

1. CorpusCount (corpus_count.cc:90-123,235-284): order-N sliding windows
   over ``[<s>]*(N-1) + tokens + [</s>]`` → ``groupBy(words).count()``.
   Catalyst's partial aggregation is the reference's in-block combiner.
2. AdjustCounts (adjust_counts.cc:218-348): lower orders are the suffix
   closure of the window set; adjusted count = #distinct one-word left
   extensions, EXCEPT ``<s>``-initial n-grams which keep raw counts
   (adjust_counts.cc:307-315); ``<unk>`` and ``<s>`` unigrams forced with
   count 0 (adjust_counts.cc:249-255); windows with a second ``<s>`` are
   dropped from the order-N model after contributing suffixes
   (CollapseStream, adjust_counts.cc:111-214).
3. Discounts (StatCollector, adjust_counts.cc:24-105): per order,
   n[k] = #grams with adjusted count k (k=1..4);
   y = n1/(n1+2 n2); D_k = k - (k+1) y n[k+1]/n[k]; driver-side (tiny).
4. InitialProbabilities (initial_probabilities.cc:143-274): per context,
   denominator = Σ adjusted counts, γ = Σ_k D_k N_k(ctx) / denominator,
   p_uninterp = (count - D(count)) / denominator; unigram specials:
   ``<unk>`` prob 0 (zeroton), ``<s>`` prob 1 γ_gram 0.
5. Interpolate (interpolate.cc:95-164): p_n(g) = p_uninterp(g) +
   γ(ctx(g)) · p_{n-1}(suffix(g)), seeded with uniform 1/(types-1)
   (includes <unk>, excludes <s>); backoff(g) = γ_{n+1}(g) where g is a
   context, else 1; final log10 with prob clamped to ≤ 0.

Deviation from the reference: arithmetic is float64 (the reference uses
float32 internally); query-layer semantics are unchanged and the DuckDB
oracle reproduces the same float64 expressions bit-for-bit.

Scale notes: stage 1 is one shuffle on the window key with map-side
combine; stage 2 is N-1 shuffles (suffix groupBy — countDistinct uses a
two-phase partial aggregate); stage 4 is a groupBy(context) whose result
joins back on context (skew on hot contexts is AQE-handled; contexts are
far more numerous than languages so salting is rarely needed); stage 5 is
N-1 equi-joins on the suffix key where the lower order is broadcast when
small. No driver-side data beyond the 4-number histograms per order.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenlm_spark.functions.text import tokenize
from kenlm_spark.ngram.model import BOS, EOS, UNK


@dataclass
class Discount:
    """Chen-Goodman modified KN discounts (lm/builder/discount.hh:11-21)."""

    d1: float
    d2: float
    d3plus: float

    def get(self, count: int) -> float:
        if count <= 0:
            return 0.0
        if count == 1:
            return self.d1
        if count == 2:
            return self.d2
        return self.d3plus


#: lmplz CLI fallback (lm/builder/lmplz_main.cc:79-81).
FALLBACK_DISCOUNT = Discount(0.5, 1.0, 1.5)


class BadDiscountError(ValueError):
    pass


def compute_discount(n: dict[int, int], fallback: Discount | None = None) -> Discount:
    """Closed-form discounts from the count-of-counts histogram.

    lm/builder/adjust_counts.cc:55-61 plus its validity checks (:62-84);
    on failure either raise or use the configured fallback.
    """
    try:
        if n.get(1, 0) == 0 or n.get(2, 0) == 0:
            raise BadDiscountError(f"need n1 and n2 > 0, got {n}")
        y = n[1] / (n[1] + 2.0 * n[2])
        ds = [0.0]
        for k in (1, 2, 3):
            if n.get(k, 0) == 0 or n.get(k + 1, 0) == 0:
                raise BadDiscountError(f"need n{k} and n{k + 1} > 0, got {n}")
            d = k - (k + 1) * y * n[k + 1] / n[k]
            if d < 0.0 or d > k:
                raise BadDiscountError(f"discount D{k}={d} out of range")
            ds.append(d)
        return Discount(ds[1], ds[2], ds[3])
    except BadDiscountError:
        if fallback is None:
            raise
        return fallback


def count_windows(
    df: DataFrame, text_col: str, order: int,
    disallowed_symbol: str = "throw",
) -> DataFrame:
    """Stage 1: (words: array<string>, count) of order-N windows.

    ``disallowed_symbol`` mirrors corpus_count.cc:170-180 for literal
    ``<s>``/``</s>``/``<unk>`` tokens in the corpus: "throw" (the
    reference lmplz default — a format error) or "skip" (the
    ``--skip_symbols`` behavior: treated as whitespace)."""
    toks = tokenize(text_col)
    specials = (BOS, EOS, UNK)
    if disallowed_symbol == "throw":
        # fused into the scan (one streaming regex per row, no extra
        # job): assert_true raises at execution time like the
        # reference's single-pass reader does
        c = F.coalesce(
            F.col(text_col) if isinstance(text_col, str) else text_col,
            F.lit(""),
        )
        bad = c.rlike(
            "(?:^|[\\x00\\t\\n\\r ])(?:<s>|</s>|<unk>)"
            "(?:[\\x00\\t\\n\\r ]|$)"
        )
        toks = F.when(
            F.assert_true(
                ~bad,
                F.lit(
                    "Special word <s>/</s>/<unk> is not allowed in the "
                    "corpus. Pass --skip_symbols to convert these "
                    "symbols to whitespace."
                    # lm/builder/corpus_count.cc:179
                ),
            ).isNull(),
            toks,
        )
    elif disallowed_symbol == "skip":
        toks = F.filter(toks, lambda t: ~t.isin(*specials))
    else:
        raise ValueError("disallowed_symbol must be 'throw' or 'skip'")
    padded = F.concat(
        F.array(*[F.lit(BOS)] * (order - 1)), toks, F.array(F.lit(EOS))
    )
    # r8 (guide §4.1): explode the POSITIONS and slice per output row.
    # The r1 transform(sequence, i -> slice(...)) built a nested
    # array-of-windows per row through interpreted HOF lambdas before
    # exploding it — measured 10x slower than this shape at sf1.0
    # (4.2s vs 0.4s for the window stream alone); the window multiset
    # (padded size is always >= order, so the sequence is never
    # descending) and the groupBy are unchanged.
    return (
        df.select(padded.alias("_ts"))
        .select(
            "_ts",
            F.explode(
                F.sequence(F.lit(0), F.size("_ts") - order)
            ).alias("_i"),
        )
        .select(F.slice("_ts", F.col("_i") + 1, order).alias("words"))
        .groupBy("words")
        .agg(F.count("*").alias("count"))
    )


def adjusted_counts(windows: DataFrame, order: int) -> dict[int, DataFrame]:
    """Stage 2: {n: (words, count, raw)} per order.

    ``count`` is the KN adjusted (continuation) count; ``raw`` is the true
    occurrence count — the reference prunes lower orders on the RAW count
    (``actual_counts``, adjust_counts.cc:258-268) while emitting adjusted.
    """
    spark = windows.sparkSession
    out: dict[int, DataFrame] = {}
    # Order N model set: drop multi-<s> windows (CollapseStream).
    out[order] = windows.filter(
        (F.size("words") < 2) | (F.element_at("words", 2) != BOS)
    ).withColumn("raw", F.col("count"))

    parents = windows.withColumn("raw", F.col("count"))
    for n in range(order - 1, 0, -1):
        suffixed = parents.select(
            F.element_at("words", 1).alias("_first"),
            F.slice("words", 2, n).alias("words"),
            F.col("count"),
            F.col("raw"),
        )
        grams = suffixed.groupBy("words").agg(
            F.count_distinct("_first").alias("_distinct"),
            F.sum("raw").alias("raw"),
        )
        grams = grams.select(
            "words",
            F.when(F.element_at("words", 1) == BOS, F.col("raw"))
            .otherwise(F.col("_distinct"))
            .cast("long")
            .alias("count"),
            F.col("raw").cast("long").alias("raw"),
        )
        if n == 1:
            specials = spark.createDataFrame(
                [([UNK], 0, 0), ([BOS], 0, 0)],
                schema="words array<string>, count long, raw long",
            )
            grams = (
                grams.join(specials.select("words"), "words", "left_anti")
                .unionByName(specials)
            )
        out[n] = grams
        parents = grams
    return out


def count_histograms(
    grams: dict[int, DataFrame], order: int
) -> tuple[dict[int, dict[int, int]], dict[int, int]]:
    """Stage 3 input: (n[k] per order for k=1..4, total gram count per
    order) — ALL orders in ONE union + ONE collect (r5: was one job per
    order plus a separate count() job for the type total; driver-side
    statistics jobs are pure latency at any scale).

    Order-N statistics exclude windows with a second <s> (AddFull is reached
    only when no <s> occurs beyond position 0, adjust_counts.cc:307-320) —
    exactly the collapsed model set, which ``grams[order]`` already is.
    """
    parts = []
    for n, df in grams.items():
        parts.append(
            df.select(
                F.lit(n).alias("n"),
                F.when(
                    (F.col("count") >= 1) & (F.col("count") <= 4),
                    F.col("count"),
                )
                .otherwise(F.lit(0))
                .alias("bucket"),
            )
        )
    u = parts[0]
    for pdf in parts[1:]:
        u = u.unionByName(pdf)
    rows = u.groupBy("n", "bucket").agg(F.count("*").alias("k")).collect()
    hists: dict[int, dict[int, int]] = {n: {} for n in grams}
    totals: dict[int, int] = {n: 0 for n in grams}
    for r in rows:
        n, bucket, k = int(r["n"]), int(r["bucket"]), int(r["k"])
        totals[n] += k
        if bucket >= 1:
            hists[n][bucket] = k
    return hists, totals


def pruned_expr(
    n: int, prune_threshold: int = 0, prune_words: list[str] | None = None
):
    """Mark column per the reference (P7/P8): raw count <= threshold, or a
    pruned word appears; unigram specials are never pruned
    (adjust_counts.cc:226-233,249-256)."""
    marked = F.col("raw") <= F.lit(prune_threshold)
    if prune_words:
        wl = F.lit(sorted(set(prune_words)))
        marked = marked | (
            F.size(F.array_intersect("words", wl)) > 0
        )
    if n == 1:
        special = F.element_at("words", 1).isin(UNK, BOS, EOS)
        marked = marked & ~special
    return marked


def initial_probabilities(
    grams: DataFrame,
    n: int,
    discount: Discount,
    prune_threshold: int = 0,
    prune_words: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Stage 4 for one order.

    Returns (grams + p_uninterp + gamma_gram + pruned, context_gamma) where
    context_gamma = (context words, gamma) — also the backoff source for
    order n-1. Pruned mass folds into gamma so the model still sums to 1
    (initial_probabilities.cc:165-189).
    """
    d1, d2, d3 = discount.d1, discount.d2, discount.d3plus
    ctx = F.slice("words", 1, n - 1) if n > 1 else F.array().cast("array<string>")
    with_ctx = grams.withColumn("_ctx", ctx).withColumn(
        "_pruned", pruned_expr(n, prune_threshold, prune_words)
    )
    unpruned = ~F.col("_pruned")
    agg = with_ctx.groupBy("_ctx").agg(
        F.sum("count").alias("_denom"),
        F.sum((unpruned & (F.col("count") == 1)).cast("long")).alias("_n1"),
        F.sum((unpruned & (F.col("count") == 2)).cast("long")).alias("_n2"),
        F.sum((unpruned & (F.col("count") >= 3)).cast("long")).alias("_n3"),
        F.sum(F.when(F.col("_pruned"), F.col("count")).otherwise(0)).alias("_pm"),
    )
    gamma = (
        (
            F.lit(d1) * F.col("_n1")
            + F.lit(d2) * F.col("_n2")
            + F.lit(d3) * F.col("_n3")
            + F.col("_pm")
        )
        / F.col("_denom")
    ).alias("gamma")
    ctx_gamma = agg.select(F.col("_ctx").alias("words"), gamma, F.col("_denom"))

    joined = with_ctx.join(
        ctx_gamma.select(
            F.col("words").alias("_ctx"), F.col("gamma").alias("_gamma"), "_denom"
        ),
        "_ctx",
    )
    d_applied = (
        F.when(F.col("count") == 0, F.lit(0.0))
        .when(F.col("count") == 1, F.lit(d1))
        .when(F.col("count") == 2, F.lit(d2))
        .otherwise(F.lit(d3))
    )
    p_uninterp = (F.col("count") - d_applied) / F.col("_denom")
    gamma_gram = F.col("_gamma")
    if n == 1:
        # initial_probabilities.cc:219-253 — <unk> is a zeroton (prob 0),
        # <s> gets prob 1.0 and per-gram gamma 0.
        p_uninterp = (
            F.when(F.col("words") == F.array(F.lit(UNK)), F.lit(0.0))
            .when(F.col("words") == F.array(F.lit(BOS)), F.lit(1.0))
            .otherwise(p_uninterp)
        )
        gamma_gram = F.when(
            F.col("words") == F.array(F.lit(BOS)), F.lit(0.0)
        ).otherwise(F.col("_gamma"))
    result = joined.select(
        "words",
        "count",
        p_uninterp.alias("p_uninterp"),
        gamma_gram.alias("gamma_gram"),
        F.col("_pruned").alias("pruned"),
    )
    return result, ctx_gamma.select("words", "gamma")


def estimate(
    df: DataFrame,
    text_col: str = "text",
    order: int = 3,
    fallback_discount: Discount | None = FALLBACK_DISCOUNT,
    prune_thresholds: dict[int, int] | None = None,
    prune_words: list[str] | None = None,
    disallowed_symbol: str = "throw",
) -> tuple[DataFrame, dict[int, Discount]]:
    """Full lmplz-equivalent pipeline.

    Returns (model_df, discounts) where model_df has columns
    (order: int, words: array<string>, log10_prob: double,
    log10_backoff: double) — log10_backoff 0.0 means "not a context".

    ``prune_thresholds[n]`` drops order-n grams with raw count <= threshold
    (P7); ``prune_words`` drops grams containing those words (P8); pruned
    mass folds into the context gammas. Interpolation still traverses
    pruned suffixes internally so surviving probabilities are well-defined
    (the reference instead leaves holes that its loader re-fills as blanks).
    """
    spark = df.sparkSession
    thresholds = prune_thresholds or {}
    windows = count_windows(
        df, text_col, order, disallowed_symbol=disallowed_symbol
    )
    grams = adjusted_counts(windows, order)
    for n in grams:
        grams[n] = grams[n].persist()
    hists, gram_totals = count_histograms(grams, order)
    discounts = {
        n: compute_discount(hists[n], fallback_discount) for n in range(1, order + 1)
    }

    # types = distinct unigrams (includes <unk>, <s>, </s>) — already
    # counted by the folded histogram job.
    types = gram_totals[1]
    uniform = 1.0 / float(types - 1)  # excludes <s>, interpolate.cc:144-146

    initial: dict[int, DataFrame] = {}
    ctx_gammas: dict[int, DataFrame] = {}
    for n in range(1, order + 1):
        initial[n], ctx_gammas[n] = initial_probabilities(
            grams[n], n, discounts[n], thresholds.get(n, 0), prune_words
        )
        ctx_gammas[n] = ctx_gammas[n].persist()

    # Interpolation down orders (suffix joins).
    completed: dict[int, DataFrame] = {}
    completed[1] = initial[1].select(
        "words",
        (F.col("p_uninterp") + F.col("gamma_gram") * F.lit(uniform)).alias("p"),
        "pruned",
    ).persist()
    for n in range(2, order + 1):
        lower = completed[n - 1].select(
            F.col("words").alias("_suffix"), F.col("p").alias("_p_lower")
        )
        cur = initial[n].withColumn("_suffix", F.slice("words", 2, n - 1))
        completed[n] = cur.join(lower, "_suffix").select(
            "words",
            (F.col("p_uninterp") + F.col("gamma_gram") * F.col("_p_lower")).alias(
                "p"
            ),
            "pruned",
        ).persist()

    # Backoffs: gram g at order n<N is a context of order n+1 → γ_{n+1}(g).
    parts = []
    for n in range(1, order + 1):
        cur = completed[n].filter(~F.col("pruned"))
        if n < order:
            bo = ctx_gammas[n + 1].select(
                F.col("words"), F.col("gamma").alias("_bo")
            )
            cur = cur.join(bo, "words", "left").withColumn(
                "_bo",
                F.when(
                    F.element_at("words", n).isin(UNK, EOS), F.lit(1.0)
                ).otherwise(F.coalesce(F.col("_bo"), F.lit(1.0))),
            )
        else:
            cur = cur.withColumn("_bo", F.lit(1.0))
        parts.append(
            cur.select(
                F.lit(n).alias("order"),
                "words",
                F.least(F.lit(0.0), F.log10("p")).alias("log10_prob"),
                F.log10("_bo").alias("log10_backoff"),
            )
        )
    model = parts[0]
    for p in parts[1:]:
        model = model.unionByName(p)
    return model, discounts


# --------------------------------------------------------------------------
# Export paths
# --------------------------------------------------------------------------

def write_arpa(model_rows: list, order: int, path: str) -> None:
    """ARPA writer (S5, lm/common/print.cc): rows = (order, words, prob, bo)."""
    by_order: dict[int, list] = {n: [] for n in range(1, order + 1)}
    for r in model_rows:
        by_order[r["order"]].append(r)
    for n in by_order:
        by_order[n].sort(key=lambda r: r["words"])
    with open(path, "w") as fh:
        fh.write("\\data\\\n")
        for n in range(1, order + 1):
            fh.write(f"ngram {n}={len(by_order[n])}\n")
        fh.write("\n")
        for n in range(1, order + 1):
            fh.write(f"\\{n}-grams:\n")
            for r in by_order[n]:
                gram = " ".join(r["words"])
                bo = r["log10_backoff"]
                if n < order and bo != 0.0:
                    fh.write(f"{r['log10_prob']:.7f}\t{gram}\t{bo:.7f}\n")
                else:
                    fh.write(f"{r['log10_prob']:.7f}\t{gram}\n")
            fh.write("\n")
        fh.write("\\end\\\n")


def write_arpa_distributed(model_df: DataFrame, order: int, path: str) -> None:
    """Distributed ARPA writer: per-order globally-sorted text parts
    merged into one file by STREAMING byte concatenation — the driver
    never materializes a row, so a 100-TB-corpus model (too big for
    ``model_df.collect()``) exports with bounded driver memory.

    Lines are formatted executor-side in the exact Python ``%.7f`` style
    of :func:`write_arpa` (same rounding), per-order ``orderBy(words)``
    (Spark's array<string> ordering == Python list-of-str sort), so the
    output is byte-identical to the collect path (pytest-pinned).
    """
    import glob
    import os
    import shutil
    import tempfile

    import pandas as pd

    counts = {
        r["order"]: r["n"]
        for r in model_df.groupBy("order").agg(F.count("*").alias("n")).collect()
    }

    def fmt(last: bool):
        def inner(batches):
            for pdf in batches:
                lines = []
                for words, prob, bo in zip(
                    pdf["words"], pdf["log10_prob"], pdf["log10_backoff"]
                ):
                    gram = " ".join(words)
                    if not last and bo != 0.0:
                        lines.append(f"{prob:.7f}\t{gram}\t{bo:.7f}")
                    else:
                        lines.append(f"{prob:.7f}\t{gram}")
                yield pd.DataFrame({"value": lines})

        return inner

    tmp = tempfile.mkdtemp(prefix="arpa_parts_")
    try:
        with open(path, "w") as fh:
            fh.write("\\data\\\n")
            for n in range(1, order + 1):
                fh.write(f"ngram {n}={counts.get(n, 0)}\n")
            fh.write("\n")
        for n in range(1, order + 1):
            part_dir = f"{tmp}/order_{n}"
            (
                model_df.filter(F.col("order") == n)
                .orderBy("words")
                .mapInPandas(fmt(n == order), "value string")
                .write.mode("overwrite")
                .text(part_dir)
            )
            with open(path, "ab") as fh:
                fh.write(f"\\{n}-grams:\n".encode())
                # orderBy range-partitions: part files are globally
                # ordered by their NUMERIC part index; sort on that, not
                # the filename (lexicographic breaks at 6-digit indices:
                # 'part-100000' < 'part-99999')
                for part in sorted(
                    glob.glob(f"{part_dir}/part-*"),
                    key=lambda p: int(
                        os.path.basename(p).split("-")[1]
                    ),
                ):
                    with open(part, "rb") as pf:
                        shutil.copyfileobj(pf, fh)
                fh.write(b"\n")
        with open(path, "a") as fh:
            fh.write("\\end\\\n")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def export_model_tables(
    model_df: DataFrame, order: int
) -> tuple[DataFrame, DataFrame]:
    """Collect-free twin of ``model_table(to_ngram_model(model_df, order))``.

    Converts an estimated model straight to the distributed form the join
    scorer consumes — a tall ``(n, key, prob, backoff)`` DataFrame plus a
    ``(word, id)`` vocab DataFrame — WITHOUT ever materializing the model
    on the driver. This is the 100-TB path: at web-corpus scale the model
    itself outgrows the driver, so ``estimate() → export_model_tables() →
    write_model_tables()`` (bucketed parquet) → ``score_with_join`` is the
    flagship route; ``to_ngram_model`` (driver collect + broadcast) stays
    as the fast path for models that fit.

    Numerics match the broadcast path exactly: probabilities and backoffs
    round-trip through float32 (the broadcast arrays' dtype) before
    re-widening, so join-scored and broadcast-scored captions are
    bit-identical (parity-tested in tests/test_estimator.py).

    Only valid for estimated models (full suffix/prefix closure — every
    word of every gram has a unigram row). ARPA-loaded models go through
    ``join_scorer.model_table``, which also carries hallucinated blanks.
    """
    from pyspark.sql import Window

    spark = model_df.sparkSession

    uni = model_df.filter(F.col("order") == 1).select(
        F.element_at("words", 1).alias("word"),
        F.col("log10_prob").cast("float").alias("p32"),
        F.col("log10_backoff").cast("float").alias("b32"),
    )

    # Vocab ids: <unk>=0, the rest ranked by word order (same assignment
    # as to_ngram_model). Distributed ranking — range-partition + local
    # row_number + cumulative partition offsets — instead of one global
    # single-partition window: the vocab of a 100-TB corpus is itself a
    # big table.
    rest = uni.filter(F.col("word") != UNK).select("word")
    n_part = max(spark.sparkContext.defaultParallelism, 1)
    ranked = (
        rest.repartitionByRange(n_part, "word")
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_pid").orderBy("word")
            ),
        )
    )
    counts = ranked.groupBy("_pid").agg(F.count("*").alias("_c"))
    off_w = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )  # tiny (one row per partition) — single-partition window is fine
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_c").over(off_w), F.lit(0)).alias("_off")
    )
    vocab_df = (
        ranked.join(F.broadcast(offsets), "_pid")
        .select("word", (F.col("_off") + F.col("_rn")).alias("id"))
        .unionByName(
            spark.createDataFrame([(UNK, 0)], "word string, id long")
        )
    )

    uni_tall = uni.join(vocab_df, "word").select(
        F.lit(1).alias("n"),
        F.col("id").alias("key"),
        F.col("p32").cast("double").alias("prob"),
        F.col("b32").cast("double").alias("backoff"),
    )

    # Higher orders: word→id join per position, regroup, then one Arrow
    # pass computes the probing-hash key chain (lm/search_hashed.hh:25-28)
    # per gram — vectorized per gram-length inside each batch.
    # gid must be stamped BEFORE the explode (a nondeterministic expr in
    # the same select as a generator is evaluated per OUTPUT row).
    hi = model_df.filter(F.col("order") >= 2).select(
        F.monotonically_increasing_id().alias("gid"),
        "order",
        F.col("log10_prob").cast("float").cast("double").alias("prob"),
        F.when(F.col("order") < order, F.col("log10_backoff"))
        .otherwise(F.lit(0.0))
        .cast("float")
        .cast("double")
        .alias("backoff"),
        "words",
    ).select(
        "gid", "order", "prob", "backoff",
        F.posexplode("words").alias("pos", "word"),
    )
    grams = (
        hi.join(vocab_df, "word")
        .groupBy("gid")
        .agg(
            F.first("order").alias("n"),
            F.first("prob").alias("prob"),
            F.first("backoff").alias("backoff"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "id"))),
                lambda s: s["id"],
            ).alias("ids"),
        )
    )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def key_of(ids: pd.Series) -> pd.Series:
        from kenlm_spark.ngram.hashing import ngram_keys_batch

        return pd.Series(ngram_keys_batch(ids))

    hi_tall = grams.select(
        "n", key_of("ids").alias("key"), "prob", "backoff"
    )
    return uni_tall.unionByName(hi_tall), vocab_df


def to_ngram_model(model_df: DataFrame, order: int):
    """Materialize an estimated model as a broadcast-ready NGramModel."""
    import numpy as np

    from kenlm_spark.ngram.hashing import ngram_key
    from kenlm_spark.ngram.model import NGramModel

    rows = model_df.collect()
    vocab: dict[str, int] = {UNK: 0}
    uni = [r for r in rows if r["order"] == 1]
    for r in sorted(uni, key=lambda r: r["words"]):
        w = r["words"][0]
        if w != UNK and w not in vocab:
            vocab[w] = len(vocab)
    V = len(vocab)
    uni_prob = np.zeros(V, dtype=np.float32)
    uni_backoff = np.full(V, np.float32(-0.0), dtype=np.float32)
    keys: dict[int, list] = {n: [] for n in range(2, order + 1)}
    vals: dict[int, list] = {n: [] for n in range(2, order + 1)}
    suffix_keys: dict[int, set] = {n: set() for n in range(1, order)}
    context_keys: dict[int, set] = {n: set() for n in range(1, order)}
    for r in rows:
        n, words = r["order"], r["words"]
        ids = [vocab.get(w, 0) for w in words]
        if n == 1:
            uni_prob[ids[0]] = r["log10_prob"]
            if r["log10_backoff"] != 0.0:
                uni_backoff[ids[0]] = r["log10_backoff"]
        else:
            keys[n].append(ngram_key(ids))
            vals[n].append((r["log10_prob"], r["log10_backoff"]))
            suffix_keys[n - 1].add(ngram_key(ids[1:]))
            context_keys[n - 1].add(ngram_key(ids[:-1]))

    kk, pp, bb, ee = {}, {}, {}, {}
    uni_extends = np.zeros(V, dtype=bool)
    for wid in suffix_keys.get(1, ()):  # suffix key of a unigram is its id
        if wid < V:
            uni_extends[wid] = True
    for wid in context_keys.get(1, ()):
        if wid < V and uni_backoff[wid] == 0.0 and np.signbit(uni_backoff[wid]):
            uni_backoff[wid] = np.float32(0.0)
    for n in range(2, order + 1):
        order_pairs = sorted(zip(keys[n], vals[n]))
        karr = np.array([k for k, _ in order_pairs], dtype=np.uint64)
        kk[n] = karr
        pp[n] = np.array([v[0] for _, v in order_pairs], dtype=np.float32)
        if n < order:
            bo = np.array([v[1] for _, v in order_pairs], dtype=np.float32)
            # -0.0 for "not a context" (blank.hh semantics), flipped by
            # context activation below.
            bo = np.where(bo == 0.0, np.float32(-0.0), bo)
            act = np.fromiter(
                (int(k) in context_keys[n] for k, _ in order_pairs),
                bool,
                len(order_pairs),
            )
            bo[act & (bo == 0.0)] = np.float32(0.0)
            bb[n] = bo
            ee[n] = np.fromiter(
                (int(k) in suffix_keys[n] for k, _ in order_pairs),
                bool,
                len(order_pairs),
            )
    return NGramModel(
        order=order,
        vocab=vocab,
        uni_prob=uni_prob,
        uni_backoff=uni_backoff,
        uni_extends=uni_extends,
        keys=kk,
        probs=pp,
        backoffs=bb,
        extends=ee,
    )
