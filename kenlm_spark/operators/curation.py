"""Full multimodal curation — the complete LAION/DataComp-style
image+caption job on ONE spine, in one lazy DAG:

1. decode-free image-metadata gate (``image_pass``, precomputed by the
   caller as a map-side column — `filtering.image_quality`),
2. phash near-duplicate image dedup (``image_canonical``),
3. exact caption dedup (``caption_canonical``),
4. image-text alignment gate — the CLIP-score filter (``aligned``),
5. SemDeDup semantic dedup over the IMAGE embeddings
   (``semantic_canonical``),

with ``selected`` = the conjunction and ``drop_reason`` = the first
failing stage in that order (cheap stages attribute first: an image
that fails the metadata gate is never blamed on its caption).

Scale shape — the reason this module exists instead of five chained
queries:

* **One fused Arrow crossing** computes the text embedding, image
  embedding, alignment cosine, k-means cell, and centroid cosine per
  pair (`fused_alignment_semdedup`). SemDeDup consumes the SAME image
  embeddings the alignment gate computes (exactly the production
  recipe: both run on CLIP image vectors), so the corpus crosses
  Python once, not twice. The only other crossing in the plan is
  SemDeDup's pairwise verify — over the candidate-pair set, which is
  cell-bounded, never corpus-scale.
* The fused output is checkpointed once and fans out to every
  downstream stage; phash banding, the caption-hash partial agg, and
  the cell-size guard all read the materialized spine.
* **Every label join-back is duplicate-bounded and broadcast**: the
  phash dropped-id set (pair-bounded), the caption dup GROUPS
  (``HAVING count(*) > 1`` — dup-light corpora broadcast a near-empty
  table; the canonical-or-not test is ``keep_id IS NULL OR id =
  keep_id``, so unique captions never shuffle), and the SemDeDup loser
  set. ``broadcast_drops=False`` flips all three to shuffle joins for
  dup-heavy corpora (the `multimodal.phash_dedup_labels` contract).
* Centroid training samples the pair table map-side FIRST (the
  deterministic hash threshold + ORDER BY id LIMIT sample of
  `ivf.train_centroids`) and encodes only the bounded sample on the
  driver — the corpus is embedded exactly once, inside the fused pass.

Cross-engine parity: identical to the standalone operators' contracts —
`ivf.kmeans_assign_ctes` (sampling, Lloyd, argmin tie-break),
`semdedup` (unit vectors, round-6 cosines, loser rule), `alignment`
(fake encoders, seq-dot), `multimodal.phash_near_pairs_sql` (banding,
guard, popcount).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kenlm_spark.operators.ivf import _sample_filter, lloyd_iterations
from kenlm_spark.operators.multimodal import phash_dropped_ids
from kenlm_spark.operators.semdedup import semdedup_losers
from kenlm_spark.operators.similarity import _seq_dot, _seq_sq_norm


def train_pair_centroids(
    pairs: DataFrame,
    image_encoder,
    id_col: str = "doc_id",
    image_key_col: str = "img_key",
    n_cells: int = 8,
    iters: int = 5,
    sample: int = 4096,
    sample_frac: float = 0.5,
) -> np.ndarray:
    """Deterministic Lloyd k-means over the image embeddings of a
    bounded sample of the pair table. The sample ids are selected
    map-side (hash threshold + ORDER BY id LIMIT — the exact
    `ivf.train_centroids` recipe, same salt) BEFORE any encoding, then
    the ≤``sample`` keys are encoded driver-side in one batch — the
    corpus itself is only ever embedded inside the fused Arrow pass."""
    cand = pairs
    if sample_frac is not None and sample_frac < 1.0:
        cand = pairs.filter(_sample_filter(id_col, sample_frac))
    rows = (
        cand.orderBy(id_col)
        .limit(sample)
        .select(id_col, image_key_col)
        .collect()
    )
    if not rows:
        raise ValueError(
            "train_pair_centroids: no pairs to train on — the input is "
            f"empty or sample_frac={sample_frac} selected nothing"
        )
    X = np.asarray(
        image_encoder([r[image_key_col] for r in rows]), dtype=np.float64
    )
    return lloyd_iterations(X, n_cells, iters)


def fused_alignment_semdedup(
    pairs: DataFrame,
    centroids: np.ndarray,
    text_encoder,
    image_encoder,
    id_col: str = "doc_id",
    caption_col: str = "caption",
    image_key_col: str = "img_key",
    align_threshold: float = 0.28,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """(nid, align_score, aligned, vn, cell, c_sim, *passthrough) — ONE
    Arrow pass computing both the alignment gate and the SemDeDup
    assignment from a single image-encoder call per batch.

    Arithmetic is bit-for-bit the standalone operators':
    `alignment_scores` (unit text/image vectors, round-6 seq-dot) and
    `semdedup_labels`' assign pass (raw-vector argmin with the
    lowest-cell tie-break, unit-vector centroid cosine). ``passthrough``
    columns ride the batch untouched so downstream stages need no
    corpus join-back."""
    passthrough = list(passthrough or [])
    spark = pairs.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))
    pt_schema = "".join(
        f", {f.name} {f.dataType.simpleString()}"
        for f in pairs.schema
        if f.name in passthrough
    )

    def run(batches):
        c = bc.value
        c2 = (c**2).sum(axis=1)
        cn = c / _seq_sq_norm(c)[:, None]
        for pdf in batches:
            if not len(pdf):
                continue
            t = np.asarray(text_encoder(list(pdf["_cap"])), dtype=np.float64)
            im = np.asarray(
                image_encoder(list(pdf["_key"])), dtype=np.float64
            )
            tn = t / _seq_sq_norm(t)[:, None]
            vn = im / _seq_sq_norm(im)[:, None]
            score = np.round(_seq_dot(tn, vn), 6)
            # assign on RAW image vectors (ties to the lowest cell),
            # cosine on units — semdedup_labels.assign_pass verbatim
            d2 = (im**2).sum(axis=1, keepdims=True) - 2.0 * (im @ c.T) + c2
            cell = d2.argmin(axis=1).astype("int32")
            c_sim = np.round(_seq_dot(vn, cn[cell]), 6)
            out = {
                "nid": pdf["_id"].to_numpy(),
                "align_score": score,
                "aligned": score >= align_threshold,
                "vn": [list(map(float, r)) for r in vn],
                "cell": cell,
                "c_sim": c_sim,
            }
            for name in passthrough:
                out[name] = pdf[name]
            yield pd.DataFrame(out)

    return pairs.select(
        F.col(id_col).alias("_id"),
        F.col(caption_col).alias("_cap"),
        F.col(image_key_col).alias("_key"),
        *passthrough,
    ).mapInPandas(
        run,
        f"nid {pairs.schema[id_col].dataType.simpleString()}, "
        "align_score double, aligned boolean, vn array<double>,"
        " cell int, c_sim double" + pt_schema,
    )


#: drop_reason attribution order — cheap/metadata stages first
STAGES = ("image", "image_dup", "caption_dup", "alignment", "semantic_dup")


def curate_multimodal_full(
    pairs: DataFrame,
    text_encoder,
    image_encoder,
    id_col: str = "doc_id",
    caption_col: str = "caption",
    image_key_col: str = "img_key",
    phash_col: str = "phash",
    image_pass_col: str = "image_pass",
    caption_hash_col: str = "caption_hash",
    align_threshold: float = 0.28,
    tau: float = 0.95,
    n_cells: int = 8,
    iters: int = 5,
    sample: int = 4096,
    sample_frac: float = 0.5,
    max_cell: int = 5_000,
    max_hamming: int = 6,
    max_bucket: int = 2000,
    broadcast_drops: bool = True,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """(id, image_pass, image_canonical, caption_canonical, align_score,
    aligned, semantic_canonical, selected, drop_reason) — the five-stage
    curation over a pair table that already carries the map-side gate
    columns (``image_pass``, ``phash``, ``caption_hash``).

    ``centroids``: pass a pre-trained (n_cells, dim) array to skip the
    in-job k-means — production reuses the IVF coarse quantizer across
    runs (the SemDeDup index is the similarity index), so the train
    phase is a one-time cost, not a per-job one. When given, the
    ``n_cells``/``iters``/``sample``/``sample_frac`` training knobs are
    ignored."""
    cent = centroids if centroids is not None else train_pair_centroids(
        pairs,
        image_encoder,
        id_col=id_col,
        image_key_col=image_key_col,
        n_cells=n_cells,
        iters=iters,
        sample=sample,
        sample_frac=sample_frac,
    )
    from kenlm_spark.session import checkpoint_disk

    fused = checkpoint_disk(
        fused_alignment_semdedup(
            pairs,
            cent,
            text_encoder,
            image_encoder,
            id_col=id_col,
            caption_col=caption_col,
            image_key_col=image_key_col,
            align_threshold=align_threshold,
            passthrough=[image_pass_col, phash_col, caption_hash_col],
        )
    )

    maybe_bc = F.broadcast if broadcast_drops else (lambda df: df)
    # dropped-id fast path (r8): the labels only need distinct id_b, so
    # skip the pair-level distinct — the multi-band pair fan-out partial-
    # aggregates down to the id set map-side (phash_dropped_ids)
    pdrop = maybe_bc(
        phash_dropped_ids(
            fused.select("nid", phash_col),
            id_col="nid",
            phash_col=phash_col,
            max_hamming=max_hamming,
            max_bucket=max_bucket,
        )
        .select(F.col("id_b").alias("nid"))
        .withColumn("_pdrop", F.lit(True))
    )
    # dup GROUPS only (HAVING n > 1): unique captions never join — the
    # broadcast is duplicate-bounded, and canonical = no group or min id
    dup_groups = maybe_bc(
        fused.groupBy(caption_hash_col)
        .agg(
            F.min("nid").alias("_keep_id"),
            F.count(F.lit(1)).alias("_n"),
        )
        .filter(F.col("_n") > 1)
        .select(caption_hash_col, "_keep_id")
    )
    slosers = maybe_bc(
        semdedup_losers(
            fused.select("nid", "vn", "cell", "c_sim"),
            tau=tau,
            max_cell=max_cell,
            dim=int(np.asarray(cent).shape[1]),
        ).withColumn("_sdrop", F.lit(True))
    )
    lab = (
        fused.join(pdrop, "nid", "left")
        .join(dup_groups, caption_hash_col, "left")
        .join(slosers, "nid", "left")
        .select(
            F.col("nid").alias(id_col),
            F.col(image_pass_col).alias("image_pass"),
            F.col("_pdrop").isNull().alias("image_canonical"),
            (
                F.col("_keep_id").isNull()
                | (F.col("nid") == F.col("_keep_id"))
            ).alias("caption_canonical"),
            "align_score",
            "aligned",
            F.col("_sdrop").isNull().alias("semantic_canonical"),
        )
    )
    return lab.select(
        id_col,
        "image_pass",
        "image_canonical",
        "caption_canonical",
        "align_score",
        "aligned",
        "semantic_canonical",
        (
            F.col("image_pass")
            & F.col("image_canonical")
            & F.col("caption_canonical")
            & F.col("aligned")
            & F.col("semantic_canonical")
        ).alias("selected"),
        F.when(~F.col("image_pass"), F.lit("image"))
        .when(~F.col("image_canonical"), F.lit("image_dup"))
        .when(~F.col("caption_canonical"), F.lit("caption_dup"))
        .when(~F.col("aligned"), F.lit("alignment"))
        .when(~F.col("semantic_canonical"), F.lit("semantic_dup"))
        .otherwise(F.lit("none"))
        .alias("drop_reason"),
    )
