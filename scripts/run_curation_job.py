"""Production entrypoint for the FULL multimodal curation job — the
five-stage LAION/DataComp-style image+caption pipeline
(`operators.curation.curate_multimodal_full`) over the north-rule input
table ``(image_id, bytes, w, h, fmt, caption, phash)``.

Run via spark-submit with the packaged library (the same deployment
shape as scripts/run_filter_job.py)::

    spark-submit --py-files /tmp/kenlm_spark_pyfiles.zip \
        scripts/run_curation_job.py \
        --input  <path or Iceberg table of image+caption pairs> \
        --output <snapshot root> \
        [--encoders fake | openclip[:MODEL:PRETRAINED]] \
        [--align-threshold 0.28] [--tau 0.95] [--n-cells 8]
        [--image-rules '{}'] [--max-hamming 6]

Stages on ONE spine, drop_reason = first failing (cheapest first):
decode-free image-metadata gate -> phash near-dup image dedup -> exact
caption dedup -> CLIP-score alignment gate -> SemDeDup over the SAME
image embeddings. ``--encoders openclip`` keys the image encoder on the
``bytes`` binary column (open_clip/torch/PIL required); ``fake`` keys
the deterministic md5 encoders on image_id for plumbing runs in
environments without the models.

Commits an atomic snapshot (manifest-last, parent lineage — the
Iceberg visibility contract of `pipeline.write_snapshot`) and prints a
per-stage drop rollup plus per-partition row counts as JSON lines.
Unlike the filter job there is deliberately no per-id resume: dedup and
SemDeDup labels are corpus-global (a new batch can demote yesterday's
canonical), so the job recomputes over the full input and each commit
is a complete labeling; use `QualityFilterPipeline.expire_snapshots`
to trim history.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--encoders", default="fake")
    p.add_argument("--dim", type=int, default=8, help="fake-encoder dim")
    p.add_argument("--align-threshold", type=float, default=0.28)
    p.add_argument("--tau", type=float, default=0.95)
    p.add_argument("--n-cells", type=int, default=8)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--sample", type=int, default=4096)
    p.add_argument("--sample-frac", type=float, default=0.5)
    p.add_argument("--max-cell", type=int, default=5000)
    p.add_argument("--max-hamming", type=int, default=6)
    p.add_argument("--max-bucket", type=int, default=2000)
    p.add_argument(
        "--image-rules",
        default="{}",
        help="JSON dict of image-metadata gate thresholds "
        "(filtering.image_quality.DEFAULTS keys; '{}' = defaults)",
    )
    p.add_argument(
        "--no-broadcast-drops",
        action="store_true",
        help="shuffle-join the drop label sets instead of broadcasting "
        "(dup-heavy corpora)",
    )
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kenlm_spark.filtering.image_quality import (
        image_metric_exprs,
        image_pass_expr,
    )
    from kenlm_spark.operators.curation import curate_multimodal_full
    from kenlm_spark.operators.dedup import h60, norm_text
    from kenlm_spark.pipeline import QualityFilterPipeline

    existing = SparkSession.getActiveSession()
    spark = existing or SparkSession.builder.appName(
        "multimodal-curation"
    ).getOrCreate()

    if args.encoders == "fake":
        from kenlm_spark.operators.alignment import (
            fake_image_encoder,
            fake_text_encoder,
        )

        tenc = fake_text_encoder(args.dim)
        ienc = fake_image_encoder(args.dim)
        image_key = F.col("image_id").cast("string")
    elif args.encoders.startswith("openclip"):
        from kenlm_spark.operators.clip_adapter import open_clip_encoders

        parts = args.encoders.split(":")
        tenc, ienc = open_clip_encoders(*parts[1:3]) if len(parts) >= 3 \
            else open_clip_encoders()
        image_key = F.col("bytes")  # the real encoder decodes pixels
    else:
        raise SystemExit(f"unknown --encoders {args.encoders!r}")

    pairs = spark.read.parquet(args.input)
    rules = json.loads(args.image_rules)
    spine = pairs.select(
        "image_id",
        F.col("caption"),
        image_key.alias("img_key"),
        F.col("phash").cast("long").alias("phash"),
        h60(norm_text("caption")).alias("caption_hash"),
        image_pass_expr(image_metric_exprs(), rules).alias("image_pass"),
    )
    labeled = curate_multimodal_full(
        spine,
        tenc,
        ienc,
        id_col="image_id",
        caption_col="caption",
        image_key_col="img_key",
        align_threshold=args.align_threshold,
        tau=args.tau,
        n_cells=args.n_cells,
        iters=args.iters,
        sample=args.sample,
        sample_frac=args.sample_frac,
        max_cell=args.max_cell,
        max_hamming=args.max_hamming,
        max_bucket=args.max_bucket,
        broadcast_drops=not args.no_broadcast_drops,
    )

    snapshot_id = QualityFilterPipeline.write_snapshot(labeled, args.output)
    committed = spark.read.parquet(
        f"{args.output}/data/{snapshot_id}"
    )
    rollup = (
        committed.groupBy("drop_reason")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    print(json.dumps({"snapshot_id": snapshot_id}))
    for row in sorted(rollup, key=lambda r: str(r["drop_reason"])):
        print(json.dumps({"drop_reason": row["drop_reason"], "n": row["n"]}))
    per_part = (
        committed.groupBy(F.spark_partition_id().alias("partition"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows"),
            F.sum(F.col("selected").cast("long")).alias("selected"),
        )
        .collect()
    )
    for row in sorted(per_part, key=lambda r: r["partition"]):
        print(json.dumps(row.asDict()))
    if existing is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
