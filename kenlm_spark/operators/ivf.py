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

from kenlm_spark.operators.dedup import h60

_SAMPLE_SALT = "ivfsamp:"


def _sample_filter(id_col: str, frac: float):
    """Hash-threshold training-sample predicate (the repo's
    deterministic_sample primitive): keep iff
    h60(salt || id) mod 1e6 < frac*1e6.  Map-only and a pure function of
    the id — the by-id tie-break sort that follows runs over the sampled
    subset, never the corpus (the r4 orderBy(id).limit(n) corpus-wide
    top-K is gone).  h60 is 60-bit and non-negative, so plain %% agrees
    with the DuckDB twin."""
    bucket = F.pmod(
        h60(F.concat(F.lit(_SAMPLE_SALT), F.col(id_col).cast("string"))),
        F.lit(1_000_000),
    )
    return bucket < int(frac * 1_000_000)


def _sample_where_sql(id_expr: str, frac: float) -> str:
    h = (f"CAST(('0x' || substring(md5('{_SAMPLE_SALT}' || "
         f"CAST({id_expr} AS VARCHAR)), 1, 15)) AS BIGINT)")
    return f"({h} % 1000000) < {int(frac * 1_000_000)}"


def train_centroids(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 4096,
    sample_frac: float = 0.5,
) -> np.ndarray:
    """Deterministic Lloyd k-means over a hash-threshold sample.

    At corpus scale set ``sample_frac`` to a few x ``sample`` / corpus
    rows; the threshold filter is map-only and the residual by-id
    top-``sample`` runs over the sampled subset only."""
    cand = emb
    if sample_frac is not None and sample_frac < 1.0:
        cand = emb.filter(_sample_filter(id_col, sample_frac))
    rows = (
        cand.orderBy(id_col).limit(sample).select(id_col, vec_col).collect()
    )
    if not rows:
        raise ValueError(
            "train_centroids: no vectors to train on — the input is empty "
            f"or sample_frac={sample_frac} selected nothing; raise "
            "sample_frac or check the input"
        )
    X = np.asarray([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    return lloyd_iterations(X, k, iters)


def lloyd_iterations(X: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Deterministic Lloyd over an in-memory sample: centroids seed from
    the first k rows (callers order the sample by id), argmin ties break
    to the lowest cell, empty cells keep their previous centroid — the
    exact arithmetic `kmeans_assign_ctes` unrolls in SQL. Shared by
    :func:`train_centroids` and `curation.train_pair_centroids`."""
    cent = X[:k].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def assign_cells(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(nid, v, cell): nearest-centroid assignment as a numpy batch matmul
    (an Arrow-batched map; the Catalyst argmin expression variant compiles
    a k*dim-term codegen method and is planning-bound for k*dim >= ~500)."""
    import pandas as pd

    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))

    def run(batches):
        cent = bc.value
        c2 = (cent**2).sum(axis=1)
        for pdf in batches:
            X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if len(X) == 0:
                continue
            d2 = (X**2).sum(axis=1, keepdims=True) - 2.0 * (X @ cent.T) + c2
            yield pd.DataFrame(
                {
                    "nid": pdf[id_col].to_numpy(),
                    "v": [list(map(float, row)) for row in X],
                    "cell": d2.argmin(axis=1).astype("int32"),
                }
            )

    # ensure_min_partitions (r8): single-file embedding tables would
    # otherwise run the assign pass (and everything downstream of it)
    # on ONE task; no-op when the scan already has enough splits.
    from kenlm_spark.session import ensure_min_partitions

    return ensure_min_partitions(emb.select(id_col, vec_col)).mapInPandas(
        run, "nid long, v array<double>, cell int"
    )


def _d2_sql(v: str, c: str) -> str:
    """Squared euclidean distance between two DOUBLE lists (list_sum is a
    sequential left-to-right fold — the parity contract with the numpy
    side's dim-sequential accumulation)."""
    return (
        f"list_sum(list_transform(generate_series(1, len({v})), "
        f"i -> ({v}[i]-{c}[i])*({v}[i]-{c}[i])))"
    )


def kmeans_assign_ctes(
    n_cells: int = 8,
    iters: int = 5,
    sample: int = 4096,
    sample_frac: float = 0.5,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[str]:
    """The shared DuckDB k-means pipeline as a CTE list ending in
    ``assigned(nid, v, cell)`` (and ``cent{iters}(cell, c)`` for callers
    that need the trained centroids): deterministic Lloyd training
    unrolled as ``iters`` CTE pairs (assign = windowed argmin with cell
    tie-break, update = per-dimension AVG with empty-cell fallback),
    mirroring :func:`train_centroids` + :func:`assign_cells` exactly.
    Reused by ``ivf_topk_sql`` and ``semdedup.semdedup_sql``."""
    ctes = [
        f"""base AS (
  SELECT {id_col} AS nid, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
  FROM {table}
)""",
        "samp AS (SELECT nid, v FROM base"
        + (
            f" WHERE {_sample_where_sql('nid', sample_frac)}"
            if sample_frac is not None and sample_frac < 1.0
            else ""
        )
        + f" ORDER BY nid LIMIT {sample})",
        "dims AS (SELECT unnest(generate_series(1, "
        "(SELECT len(v) FROM base LIMIT 1))) AS d)",
        f"""cent0 AS (
  SELECT row_number() OVER (ORDER BY nid) - 1 AS cell, v AS c
  FROM (SELECT * FROM samp ORDER BY nid LIMIT {n_cells})
)""",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""a{t} AS (
  SELECT nid, v, cell FROM (
    SELECT s.nid, s.v, c.cell,
           row_number() OVER (PARTITION BY s.nid
                              ORDER BY {_d2_sql('s.v', 'c.c')}, c.cell) AS rn
    FROM samp s CROSS JOIN cent{t - 1} c
  ) WHERE rn = 1
)"""
        )
        ctes.append(
            f"""cent{t} AS (
  SELECT p.cell, COALESCE(m.c, p.c) AS c
  FROM cent{t - 1} p LEFT JOIN (
    SELECT cell, list(avgv ORDER BY d) AS c FROM (
      SELECT a.cell, dims.d, AVG(a.v[dims.d]) AS avgv
      FROM a{t} a, dims GROUP BY a.cell, dims.d
    ) GROUP BY cell
  ) m ON m.cell = p.cell
)"""
        )
    ctes.append(
        f"""assigned AS (
  SELECT nid, v, cell FROM (
    SELECT b.nid, b.v, c.cell,
           row_number() OVER (PARTITION BY b.nid
                              ORDER BY {_d2_sql('b.v', 'c.c')}, c.cell) AS rn
    FROM base b CROSS JOIN cent{iters} c
  ) WHERE rn = 1
)"""
    )
    return ctes


def ivf_topk_sql(
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    iters: int = 5,
    sample: int = 4096,
    sample_frac: float = 0.5,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of ``ivf_topk``: shared k-means CTEs
    (:func:`kmeans_assign_ctes`) then probe + exact re-rank exactly as
    the Spark side."""
    d2 = _d2_sql
    ctes = kmeans_assign_ctes(
        n_cells, iters, sample, sample_frac, table, id_col, vec_col
    )
    ids = ", ".join(str(i) for i in query_ids)
    ctes.append(f"q AS (SELECT nid AS query_id, v AS qv FROM base WHERE nid IN ({ids}))")
    ctes.append(
        f"""probes AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {d2('q.qv', 'c.c')}, c.cell) AS rn
    FROM q CROSS JOIN cent{iters} c
  ) WHERE rn <= {n_probe}
)"""
    )
    ctes.append(
        """cand AS (
  SELECT p.query_id, a.nid AS neighbor_id, a.v
  FROM probes p JOIN assigned a ON a.cell = p.cell
  WHERE a.nid <> p.query_id
)"""
    )
    ctes.append(
        """scored AS (
  SELECT c.query_id, c.neighbor_id,
         round(
           list_sum(list_transform(generate_series(1, len(q.qv)),
                                   i -> q.qv[i] * c.v[i]))
           / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
              * sqrt(list_sum(list_transform(c.v, x -> x * x)))),
           6) AS score
  FROM cand c JOIN q ON q.query_id = c.query_id
)"""
    )
    joined = ",\n".join(ctes)
    return f"""
WITH {joined},
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


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
    assigned = assign_cells(emb, cent, id_col=id_col, vec_col=vec_col)

    # Driver-side probe list per query (queries are few by contract).
    # r8: collect the query vectors from the BASE scan (the isin filter
    # pushes into the parquet read) instead of from `assigned`, whose
    # opaque Arrow pass blocks pushdown and re-ran the whole corpus
    # assignment just to fetch |queries| rows.  float32 -> float64
    # widening is exact, so qv is bit-identical to assigned's v.
    qrows = (
        emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("v"))
        .filter(F.col("nid").isin(query_ids))
        .collect()
    )
    spark = emb.sparkSession
    probe_rows = []
    for r in qrows:
        qv = np.asarray(r["v"], dtype=np.float64)
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


# ------------------------------------------------------------------ IVF-PQ


def _pq_codebooks(
    emb: DataFrame, m: int, n_codes: int, id_col: str, vec_col: str,
    sample_frac: float = 0.5,
) -> np.ndarray:
    """(m, n_codes, sub) sampled codebooks: subvectors of the first
    ``n_codes`` hash-threshold-sampled vectors by id. A deterministic "sampled codebook" PQ
    variant (vs k-means-trained centers): same storage and query
    structure, slightly lower recall, and — the point here — an exactly
    reproducible DuckDB twin. Swapping in Lloyd-trained codebooks is the
    `train_centroids` pattern per subspace."""
    cand = emb
    if sample_frac is not None and sample_frac < 1.0:
        cand = emb.filter(_sample_filter(id_col, sample_frac))
    rows = (
        cand.orderBy(id_col).limit(n_codes).select(vec_col).collect()
    )
    X = np.asarray([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    dim = X.shape[1]
    sub = dim // m
    return X[:, : m * sub].reshape(len(X), m, sub).transpose(1, 0, 2).copy()


def _seq_d2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Squared L2 over the LAST axis with dim-sequential accumulation —
    the same left-fold DuckDB's list_sum performs, so argmin ties and
    near-ties resolve identically on both engines."""
    acc = np.zeros(np.broadcast(a[..., 0], b[..., 0]).shape)
    for i in range(a.shape[-1]):
        d = a[..., i] - b[..., i]
        acc = acc + d * d
    return acc


def ivf_pq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 8,
    n_codes: int = 16,
    sample_frac: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ approximate cosine top-k — the memory-tier below IVF-flat:
    each vector is stored as a coarse cell + ``m`` one-byte-ish codes
    (here ``n_codes`` codewords/subspace), ~``m`` bytes instead of
    ``4*dim``. Scoring reconstructs candidates from their codewords
    (mathematically identical to the classic ADC lookup-table sum,
    since dot(q, recon) = Σ_j dot(q_j, codeword_j)) and probes only
    ``n_probe`` cells. At 1e12 vectors this is the tier that fits an
    executor's memory where raw embeddings don't; the exact
    `brute_force_topk` and IVF-flat `ivf_topk` stay as the re-rank /
    ground-truth tiers above it.
    """
    import pandas as pd

    spark = emb.sparkSession
    cent = train_centroids(emb, k=n_cells, id_col=id_col, vec_col=vec_col)
    books = _pq_codebooks(
        emb, m, n_codes, id_col, vec_col, sample_frac=sample_frac
    )
    sub = books.shape[2]
    bc_cent = spark.sparkContext.broadcast(cent)
    bc_books = spark.sparkContext.broadcast(books)

    def encode(batches):
        cents, bks = bc_cent.value, bc_books.value
        for pdf in batches:
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if not len(X):
                continue
            cell = _seq_d2(X[:, None, :], cents[None, :, :]).argmin(axis=1)
            codes = np.empty((len(X), m), dtype=np.int32)
            for j in range(m):
                Xj = X[:, j * sub : (j + 1) * sub]
                codes[:, j] = _seq_d2(
                    Xj[:, None, :], bks[j][None, :, :]
                ).argmin(axis=1)
            yield pd.DataFrame(
                {
                    "nid": pdf[id_col].to_numpy(),
                    "cell": cell.astype("int32"),
                    "codes": list(codes),
                }
            )

    encoded = emb.select(id_col, vec_col).mapInPandas(
        encode, "nid long, cell int, codes array<int>"
    )

    # probes: driver-side per query (queries are few by contract)
    qrows = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .collect()
    )
    probe_rows = []
    for r in qrows:
        qv = np.asarray(r[vec_col], dtype=np.float64)
        d2 = _seq_d2(qv[None, :], cent)
        for cell in np.argsort(d2, kind="stable")[:n_probe]:
            probe_rows.append(
                (int(r[id_col]), list(map(float, qv)), int(cell))
            )
    probes = spark.createDataFrame(
        probe_rows, "query_id long, qv array<double>, cell int"
    )

    cand = encoded.join(F.broadcast(probes), "cell").filter(
        F.col("nid") != F.col("query_id")
    )

    def score(batches):
        bks = bc_books.value
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.asarray(list(pdf["codes"]), dtype=np.int64)
            recon = np.concatenate(
                [bks[j][codes[:, j]] for j in range(m)], axis=1
            )
            Q = np.asarray([np.asarray(q) for q in pdf["qv"]])[:, : m * sub]
            dot = np.zeros(len(pdf))
            qn = np.zeros(len(pdf))
            rn = np.zeros(len(pdf))
            for i in range(m * sub):
                dot = dot + Q[:, i] * recon[:, i]
                qn = qn + Q[:, i] * Q[:, i]
                rn = rn + recon[:, i] * recon[:, i]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["nid"].to_numpy(),
                    "score": np.round(dot / (np.sqrt(qn) * np.sqrt(rn)), 6),
                }
            )

    scored = cand.mapInPandas(
        score, "query_id long, neighbor_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", F.col("rank").cast("long"))
    )


def ivf_pq_topk_sql(
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 5,
    sample: int = 4096,
    sample_frac: float = 0.5,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> str:
    """DuckDB twin of ``ivf_pq_topk``: the coarse k-means CTE chain of
    ``ivf_topk_sql``, plus sampled codebooks, per-subspace argmin
    encoding, codeword reconstruction, and the same cosine re-rank over
    reconstructions (left-fold sums match the Spark side's sequential
    accumulation bitwise)."""

    def d2(v: str, c: str) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, len({v})), "
            f"i -> ({v}[i]-{c}[i])*({v}[i]-{c}[i])))"
        )

    base_sql = ivf_topk_sql(
        query_ids, k=k, n_cells=n_cells, n_probe=n_probe, iters=iters,
        sample=sample, table=table, id_col=id_col, vec_col=vec_col,
    )
    # reuse everything up to (and including) the probes CTE
    head = base_sql[: base_sql.index("cand AS (")].rstrip().rstrip(",")
    sub = dim // m
    sub_d2 = (
        f"list_sum(list_transform(generate_series(1, {sub}), "
        f"i -> (e.v[(cb.j-1)*{sub}+i] - cb.c[(cb.j-1)*{sub}+i]) * "
        f"(e.v[(cb.j-1)*{sub}+i] - cb.c[(cb.j-1)*{sub}+i])))"
    )
    tail = f""",
cb AS (
  SELECT j.j, row_number() OVER (PARTITION BY j.j ORDER BY b.nid) - 1 AS code,
         b.v AS c
  FROM (SELECT nid, v FROM base
        {f"WHERE {_sample_where_sql('nid', sample_frac)}"
         if sample_frac is not None and sample_frac < 1.0 else ""}
        ORDER BY nid LIMIT {n_codes}) b
  CROSS JOIN (SELECT unnest(generate_series(1, {m})) AS j) j
),
codes AS (
  SELECT nid, j, code FROM (
    SELECT e.nid, cb.j, cb.code,
           row_number() OVER (PARTITION BY e.nid, cb.j
                              ORDER BY {sub_d2}, cb.code) AS rn
    FROM base e CROSS JOIN cb
  ) WHERE rn = 1
),
recon AS (
  SELECT c.nid, flatten(list(
    list_slice(cb.c, (c.j-1)*{sub}+1, c.j*{sub}) ORDER BY c.j)) AS r
  FROM codes c JOIN cb ON cb.j = c.j AND cb.code = c.code
  GROUP BY c.nid
),
cand AS (
  SELECT p.query_id, a.nid AS neighbor_id, r.r
  FROM probes p
  JOIN assigned a ON a.cell = p.cell
  JOIN recon r ON r.nid = a.nid
  WHERE a.nid <> p.query_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         round(
           list_sum(list_transform(generate_series(1, len(c.r)),
                                   i -> q.qv[i] * c.r[i]))
           / (sqrt(list_sum(list_transform(
                  generate_series(1, len(c.r)), i -> q.qv[i] * q.qv[i])))
              * sqrt(list_sum(list_transform(c.r, x -> x * x)))),
           6) AS score
  FROM cand c JOIN q ON q.query_id = c.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""
    return head + tail
