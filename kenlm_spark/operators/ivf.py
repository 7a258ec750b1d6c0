"""IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
scale path for similarity search (complement to the sign-LSH variant).

Classical IVF: k-means coarse centroids partition the corpus; a query
probes only the ``n_probe`` nearest cells. Implemented Spark-first:

* training: Lloyd iterations as crossJoin-argmin (assign) + groupBy-mean
  (update) over a deterministic sample; centroids are tiny and live on the
  driver/broadcast, exactly like a production IVF index's coarse book.
* assignment: argmin over broadcast centroids — a map-only projection.
* search: probe cells via an equi-join on cell id, exact re-rank inside.

Determinism: centroids initialize from the first K vectors by id (no RNG),
so training is reproducible run to run.

At 10^12 scale: train on a sample (the groupBy is over k << corpus cells),
store ``cell`` as a partition column — probing then becomes partition
pruning on the storage layout, the same trick as the reference's per-order
physical layout.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _assign_expr(vec_col: str, centroids: np.ndarray):
    """argmin_c ||v - c||^2 as a Catalyst expression chain (k small)."""
    best_d, best_i = None, None
    for i, c in enumerate(centroids):
        d = None
        for j, cj in enumerate(c):
            t = F.element_at(F.col(vec_col), j + 1).cast("double") - F.lit(float(cj))
            term = t * t
            d = term if d is None else d + term
        if best_d is None:
            best_d, best_i = d, F.lit(i)
        else:
            cond = d < best_d
            best_i = F.when(cond, F.lit(i)).otherwise(best_i)
            best_d = F.when(cond, d).otherwise(best_d)
    return best_i


def train_centroids(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 4096,
) -> np.ndarray:
    """Deterministic Lloyd k-means over a by-id sample."""
    rows = (
        emb.orderBy(id_col).limit(sample).select(id_col, vec_col).collect()
    )
    X = np.asarray([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    cent = X[:k].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k probing the n_probe nearest cells."""
    cent = train_centroids(emb, k=n_cells, id_col=id_col, vec_col=vec_col)
    assigned = emb.select(
        F.col(id_col).alias("nid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        _assign_expr(vec_col, cent).alias("cell"),
    )

    # Driver-side probe list per query (queries are few by contract).
    qrows = assigned.filter(F.col("nid").isin(query_ids)).collect()
    spark = emb.sparkSession
    probe_rows = []
    for r in qrows:
        qv = np.asarray(r["v"])
        d2 = ((cent - qv[None, :]) ** 2).sum(axis=1)
        for cell in np.argsort(d2)[:n_probe]:
            probe_rows.append((int(r["nid"]), list(map(float, qv)), int(cell)))
    probes = spark.createDataFrame(
        probe_rows, "query_id long, qv array<double>, cell int"
    )

    cand = assigned.join(F.broadcast(probes), "cell").filter(
        F.col("nid") != F.col("query_id")
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x)
    )
    cos = dot / (nrm(F.col("qv")) * nrm(F.col("v")))
    scored = cand.select(
        "query_id", F.col("nid").alias("neighbor_id"), F.round(cos, 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", F.col("rank").cast("long"))
    )
