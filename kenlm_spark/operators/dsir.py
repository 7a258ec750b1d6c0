"""Data Selection via Importance Resampling (DSIR) — hashed n-gram
importance weights for targeted training-data selection.

Method (public: Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling", NeurIPS): featurize each document as a bag
of hashed word {1,2}-grams over ``n_buckets`` buckets, fit two unigram
bucket distributions — one on a target-domain sample, one on the raw
corpus — with add-one smoothing, and weight each raw document by its
log importance ratio ``log w(x) = Σ_b c_x[b]·(ln p_target[b] −
ln p_raw[b])``. Documents with ``log w > 0`` look more target-like than
raw-like; top-k / resampling by weight selects a target-shaped subset of
a web-scale corpus.

Spark-first design (100-TB shape):

* Featurization is one projection: normalize → split → concat(unigrams,
  bigrams). Bucketing (``h60(feat) % B``) happens AFTER the explode as a
  plain column expression, never inside a lambda (HOF lambdas are
  allocation-bound — round-1 lesson).
* Both bucket histograms are ``groupBy(bucket).count()`` — partial
  (map-side) aggregation absorbs hot buckets (stopword n-grams are the
  hottest keys in any crawl), and the result is at most ``n_buckets``
  rows regardless of corpus size.
* The log-ratio table is ≤ ``n_buckets`` rows (default 8192 ≈ 128 KiB)
  and is **broadcast** into the per-document scoring join — the only
  shuffle that scales with the corpus is the final ``groupBy(id)`` sum,
  whose payload is (id, double).
* ``dsir_topk`` uses ``orderBy(...).limit(k)`` which Spark plans as
  TakeOrderedAndProject — per-partition partial top-k plus a single
  driver merge, NOT a global sort shuffle.

The reference (a text-only LM toolkit) has no analog; this operator is
additive per the task's training-data-pipeline requirement. A DuckDB
twin (``dsir_weights_sql``) makes the whole path oracle-checkable: every
value is integer counts, one add-one-smoothed division, and ``ln`` —
identical expression shapes on both engines, with the per-document sum
rounded at 6 decimals on both sides (multi-row double sums are
order-dependent; round-1 lesson).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kenlm_spark.operators.dedup import _h60_sql, _norm_sql, h60, norm_text

#: Default hash-feature space size (the DSIR paper uses 10k; a power of
#: two keeps the modulo cheap).
N_BUCKETS = 8192


def dsir_features(text_col: Column | str) -> Column:
    """array<string> of word unigrams + bigrams of the normalized text.

    Unigrams contain no spaces and bigrams are space-joined, so the two
    orders cannot collide as hash inputs. Empty documents yield an empty
    array (they get weight 0 via the left join in
    :func:`dsir_log_weights`, not a polluted '' feature).
    """
    toks = F.array_remove(F.split(norm_text(text_col), " "), "")
    idx = F.sequence(F.lit(0), F.size(toks) - 2)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2))),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def _bucketed(df: DataFrame, id_col: str, text_col: str, n_buckets: int) -> DataFrame:
    """(id, bucket) — one row per feature occurrence (NOT distinct:
    importance weights count repetitions). h60 is non-negative (60-bit),
    so plain ``%`` matches DuckDB's signed modulo.

    A featureless (empty-text) doc keeps a single null-bucket row: the
    scoring pass can then produce a weight for EVERY doc in one corpus
    scan, with no separate ids scan + join-back (histogram builders must
    filter the null bucket out).

    r8 shape: ONE Arrow pass (guide §4.2).  The Catalyst formulations —
    first transform(sequence → slice) HOF lambdas, then a union of an
    explode_outer unigram branch and a sliced bigram branch — both paid
    interpreted md5+conv per feature occurrence AND tokenized the corpus
    once per branch; the Python pass tokenizes once, memoizes the
    feature→bucket hash across the batch (crawl vocabulary ≪ occurrence
    count), and emits the identical (id, bucket) multiset: the same
    PY_TOKEN_RE tokens (== the split of norm_text, the parity the
    minhash wide pass pins), the same int(md5(f)[:15],16) % B buckets,
    the same null row for featureless docs."""
    import numpy as np
    import pandas as pd

    from kenlm_spark.functions.md5_kernel import h60_bytes_batch
    from kenlm_spark.functions.text import PY_TOKEN_RE

    id_type = dict(df.dtypes)[id_col]

    def batch(pdfs):
        for pdf in pdfs:
            uniq: dict[bytes, int] = {}
            ids, rows = [], []
            texts = pdf[text_col].fillna("").str.lower()
            for did, text in zip(pdf[id_col], texts):
                toks = [x for x in PY_TOKEN_RE.split(text) if x]
                if not toks:
                    ids.append(did)
                    rows.append(-1)  # featureless: null bucket
                    continue
                for t in toks:
                    ids.append(did)
                    rows.append(uniq.setdefault(t.encode(), len(uniq)))
                for j in range(len(toks) - 1):
                    f = toks[j] + " " + toks[j + 1]
                    ids.append(did)
                    rows.append(uniq.setdefault(f.encode(), len(uniq)))
            if ids:
                r = np.asarray(rows, np.int64)
                if uniq:
                    hs = (
                        h60_bytes_batch(list(uniq.keys())).astype(np.int64)
                        % n_buckets
                    )
                    vals = hs[np.maximum(r, 0)]
                else:
                    vals = np.zeros(len(r), np.int64)
                buckets = pd.array(vals, dtype="Int64")
                buckets[r < 0] = None
                yield pd.DataFrame(
                    {"id": pd.Series(ids), "bucket": buckets}
                )

    return df.select(id_col, text_col).mapInPandas(
        batch, f"id {id_type}, bucket long"
    )


def bucket_logratio(
    target_buckets: DataFrame, raw_buckets: DataFrame, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """(bucket, lr): add-one-smoothed log importance ratio per bucket,
    ``ln p_target[b] − ln p_raw[b]``. At most ``n_buckets`` rows —
    broadcastable at any corpus size."""
    tcnt = target_buckets.groupBy("bucket").agg(
        F.count("*").cast("long").alias("tc")
    )
    rcnt = raw_buckets.groupBy("bucket").agg(
        F.count("*").cast("long").alias("rc")
    )
    ttot = tcnt.agg(F.coalesce(F.sum("tc"), F.lit(0)).alias("t_total"))
    rtot = rcnt.agg(F.coalesce(F.sum("rc"), F.lit(0)).alias("r_total"))
    b = F.lit(n_buckets)
    return (
        tcnt.join(rcnt, "bucket", "full")
        .crossJoin(ttot)
        .crossJoin(rtot)
        .select(
            "bucket",
            (
                F.log((F.coalesce("tc", F.lit(0)) + F.lit(1.0)) / (F.col("t_total") + b))
                - F.log((F.coalesce("rc", F.lit(0)) + F.lit(1.0)) / (F.col("r_total") + b))
            ).alias("lr"),
        )
    )


def dsir_log_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(id, n_feats, log_w) per raw document.

    ``raw_df`` is the corpus being weighted (it also defines the raw
    distribution, as in the paper's n_raw >> n_target regime);
    ``target_df`` is the target-domain sample. Documents with no
    features (empty text) get n_feats 0 / log_w 0.0 via the left join.
    """
    # raw_b feeds BOTH the raw histogram and the scoring join, so the
    # featurize pass runs twice.  An eager localCheckpoint between was
    # A/B-measured SLOWER at both local scales (r8: 2.01 vs 1.57 s at
    # sf0.1, 2.26 vs 2.10 s at 10x — the Arrow+kernel pass is cheaper
    # than the materialization barrier); at 100 TB, where the second
    # corpus READ dominates instead, persist/checkpoint the featurized
    # stream at the caller (it is the written DSIR feature index).
    raw_b = _bucketed(raw_df, id_col, text_col, n_buckets)
    tgt_b = _bucketed(target_df, id_col, text_col, n_buckets)
    not_null = F.col("bucket").isNotNull()
    ratio = bucket_logratio(
        tgt_b.filter(not_null), raw_b.filter(not_null).select("bucket"), n_buckets
    )
    # Left join: the null bucket of featureless docs matches no ratio row
    # (lr stays null), so count(lr)/sum(lr) give n_feats 0 / log_w 0.0
    # for them — every doc is weighted in ONE corpus pass, no ids
    # join-back (the histogram is the only other corpus scan; at
    # production scale persist the ≤n_buckets ratio table and scoring is
    # a single pass).
    return (
        raw_b.join(F.broadcast(ratio), "bucket", "left")
        .groupBy("id")
        .agg(
            F.count("lr").cast("long").alias("n_feats"),
            F.coalesce(F.sum("lr"), F.lit(0.0)).alias("log_w"),
        )
    )


def dsir_topk(weights: DataFrame, k: int) -> DataFrame:
    """Top-k selection by weight (ties broken by id for determinism).

    ``orderBy().limit()`` plans as TakeOrderedAndProject: each partition
    keeps its local top-k and the driver merges — no global sort shuffle,
    so this holds at 100 TB for any k that fits the driver. For
    corpus-sized selections (k beyond driver memory) use
    :func:`dsir_select_by_quantile`."""
    return weights.orderBy(F.desc("log_w"), F.asc("id")).limit(k)


_SEL_SALT = "dsirsel:"


def dsir_select_by_quantile(
    weights: DataFrame,
    keep_frac: float,
    sample_frac: float = 1.0,
) -> DataFrame:
    """(id, n_feats, log_w, threshold, selected) — corpus-scale DSIR
    selection: keep ~``keep_frac`` of the corpus by importance weight,
    with NO driver-sized structure anywhere (the selection itself is a
    map-only filter, so its size may exceed driver memory — the
    limitation :func:`dsir_topk` has).

    The threshold is a sampled quantile computed engine-exactly (no
    approxQuantile — Greenwald-Khanna sketches are
    implementation-specific and would never hash-match a twin):

    1. sample weight rows by the deterministic hash threshold
       ``h60(salt || id) % 1e6 < sample_frac * 1e6`` (bit-exact across
       engines; at 100 TB pick ``sample_frac`` so the sample is ~1e6
       rows);
    2. rank the SAMPLE by (rounded log_w DESC, id ASC) — a single-task
       sort, bounded by the sample size, never the corpus;
    3. threshold = the ``ceil(keep_frac * m)``-th sampled weight
       (m = sample size, both computed lazily in the same DAG — no
       collect);
    4. selected = rounded ``log_w >= threshold`` — ties at the boundary
       all keep (selection size is ~keep_frac, binomial-sampling-exact).

    ``log_w`` in the output is rounded at 6 (the cross-engine parity
    contract: the threshold is one of these rounded values, so the
    boundary comparison cannot flip on last-ulp drift). An empty sample
    (or empty corpus) yields threshold NULL and selected FALSE for all.
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError("keep_frac must be in (0, 1]")
    if not 0.0 < sample_frac <= 1.0:
        raise ValueError("sample_frac must be in (0, 1]")
    from pyspark.sql import Window

    # localCheckpoint (r8): the weights subtree (two corpus explodes +
    # the histogram broadcast) is otherwise re-evaluated once for the
    # threshold's sample/rank branch, once for its count branch, and
    # once for the final selection scan — 3x the corpus work (measured
    # 9.4s -> ~5s at sf1.0).  The materialized table is (id, n_feats,
    # log_w) — 24 bytes/row of executor-local disk, the same trade the
    # sibling wide-table checkpoints (minhash, semdedup) make.
    from kenlm_spark.session import checkpoint_disk

    w = checkpoint_disk(
        weights.select("id", "n_feats", F.round("log_w", 6).alias("log_w"))
    )
    hmod = F.pmod(
        h60(F.concat(F.lit(_SEL_SALT), F.col("id").cast("string"))),
        F.lit(1_000_000),
    )
    samp = w.filter(hmod < int(sample_frac * 1_000_000)).select("id", "log_w")
    # partition-less Window: deliberate — the sample is bounded by
    # construction (one task sorts ~1e6 rows), the corpus never is
    ranked = samp.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.desc("log_w"), F.asc("id"))),
    )
    m = samp.agg(F.count(F.lit(1)).alias("m"))
    # ceil(keep_frac * m) in identical double math on both engines;
    # min() over the rn==k row keeps this a 1-row DF even when the
    # sample is empty (threshold NULL -> selected coalesces to FALSE)
    thr = (
        ranked.crossJoin(m)
        .filter(
            F.col("rn")
            == F.ceil(F.lit(float(keep_frac)) * F.col("m")).cast("long")
        )
        .agg(F.min("log_w").alias("threshold"))
    )
    return w.crossJoin(F.broadcast(thr)).select(
        "id",
        "n_feats",
        "log_w",
        "threshold",
        F.coalesce(
            F.col("log_w") >= F.col("threshold"), F.lit(False)
        ).alias("selected"),
    )


# ----------------------------------------------------------------- SQL twin


def dsir_weights_sql(
    table: str = "documents",
    target_where: str = "id % 7 = 0",
    raw_where: str = "id % 7 <> 0",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> str:
    """DuckDB twin of :func:`dsir_log_weights` (rounded at 6 decimals +
    the ``selected`` flag, matching the q_dsir_weights query shape).

    ``target_where`` / ``raw_where`` are predicates over the fixed alias
    ``id`` (the id column is exposed as ``id`` in every scope they are
    spliced into) — a pre-qualified contract instead of the string-
    substitution the r5 ADVICE flagged in contamination_check_sql."""
    toks = (
        f"list_filter(regexp_split_to_array({_norm_sql(text_col)}, ' '),"
        " t -> t <> '')"
    )
    return f"""
WITH feats AS (
  SELECT id,
         list_concat(tk,
           CASE WHEN len(tk) >= 2
                THEN list_transform(generate_series(1, len(tk) - 1),
                                    i -> tk[i] || ' ' || tk[i + 1])
                ELSE CAST([] AS VARCHAR[]) END) AS fs
  FROM (SELECT {id_col} AS id, {toks} AS tk FROM {table}) t
),
ex AS (
  SELECT id, {_h60_sql('f')} % {n_buckets} AS bucket
  FROM feats, unnest(fs) AS u(f)
),
tcnt AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS tc
  FROM ex WHERE {target_where} GROUP BY 1
),
rcnt AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS rc
  FROM ex WHERE {raw_where} GROUP BY 1
),
ratio AS (
  SELECT coalesce(t.bucket, r.bucket) AS bucket,
         ln((coalesce(t.tc, 0) + 1.0)
            / ((SELECT coalesce(CAST(sum(tc) AS BIGINT), 0) FROM tcnt) + {n_buckets}))
       - ln((coalesce(r.rc, 0) + 1.0)
            / ((SELECT coalesce(CAST(sum(rc) AS BIGINT), 0) FROM rcnt) + {n_buckets}))
           AS lr
  FROM tcnt t FULL OUTER JOIN rcnt r ON t.bucket = r.bucket
),
w AS (
  SELECT ex.id, CAST(count(*) AS BIGINT) AS n_feats, sum(r.lr) AS log_w
  FROM (SELECT * FROM ex WHERE {raw_where}) ex JOIN ratio r ON ex.bucket = r.bucket
  GROUP BY 1
)
SELECT d.id AS doc_id,
       coalesce(w.n_feats, 0) AS n_feats,
       round(coalesce(w.log_w, 0.0), 6) AS log_w,
       round(coalesce(w.log_w, 0.0), 6) > 0.0 AS selected
FROM (SELECT id FROM (SELECT {id_col} AS id FROM {table}) b WHERE {raw_where}) d
LEFT JOIN w ON d.id = w.id
"""


def dsir_select_sql(
    keep_frac: float,
    sample_frac: float = 1.0,
    table: str = "documents",
    target_where: str = "id % 7 = 0",
    raw_where: str = "id % 7 <> 0",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> str:
    """DuckDB twin of :func:`dsir_select_by_quantile` over the
    :func:`dsir_weights_sql` weights (wrapped as a CTE — nested WITH
    inside a CTE subquery is legal in DuckDB). Mirrors the hash-threshold
    sample, the (log_w DESC, id ASC) rank, the ceil(keep_frac * m)
    threshold pick, and the NULL-threshold -> FALSE coalesce."""
    base = dsir_weights_sql(
        table, target_where, raw_where, id_col, text_col, n_buckets
    )
    h = (
        f"CAST(('0x' || substring(md5('{_SEL_SALT}' || "
        f"CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    )
    return f"""
WITH base AS ({base}),
samp AS (
  SELECT doc_id, log_w FROM base
  WHERE ((({h} % 1000000) + 1000000) % 1000000) < {int(sample_frac * 1_000_000)}
),
m AS (SELECT count(*) AS m FROM samp),
ranked AS (
  SELECT log_w,
         row_number() OVER (ORDER BY log_w DESC, doc_id ASC) AS rn
  FROM samp
),
thr AS (
  SELECT min(log_w) AS threshold
  FROM ranked, m
  WHERE rn = CAST(ceil({float(keep_frac)} * m) AS BIGINT)
)
SELECT b.doc_id, b.n_feats, b.log_w, t.threshold,
       coalesce(b.log_w >= t.threshold, false) AS selected
FROM base b, thr t
"""
