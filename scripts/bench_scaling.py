"""Two-parallelism-level scaling benchmark (north-rule evidence).

The rule requires >=0.8 throughput scaling efficiency from N to 4N
executors; in this sandbox (single machine) the proxy is local[N] vs
local[4N] cores on the same input, per the driver instruction. Each level
runs in its own subprocess (fresh JVM) and measures steady-state pipeline
throughput (captions/sec) on a replicated caption table large enough that
compute dominates fixed overheads.

Usage: python scripts/bench_scaling.py [N] [replication]
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(cpus: int, replication: int, sf_dir: str) -> dict:
    code = f"""
import json, sys, time
sys.path.insert(0, {REPO!r})
import __spark_entry__ as em
from pyspark.sql import functions as F
from kenlm_spark.session import get_spark
from kenlm_spark.pipeline import FilterConfig, QualityFilterPipeline

em._model()
spark = get_spark("scaling-bench", master="local[{cpus}]",
                  shuffle_partitions={cpus * 2})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("{sf_dir}/documents.parquet")
# Spread the single-file scan before the row-multiplying explode so the
# generator itself is parallel (production inputs have many splits).
docs = docs.repartition({cpus * 2})
docs = docs.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit({replication}))))
images = docs.select(
    F.concat(F.col("doc_id").cast("string"), F.lit("_"),
             F.col("rep").cast("string")).alias("image_id"),
    F.lit(None).cast("binary").alias("bytes"),
    F.lit(8).alias("w"), F.lit(8).alias("h"), F.lit("raw").alias("fmt"),
    F.col("text").alias("caption"),
    F.col("doc_id").alias("phash"),
)
n = images.count()
pipe = QualityFilterPipeline(spark, em._model(), FilterConfig())
pipe.run(images).write.format("noop").mode("overwrite").save()  # warmup
t0 = time.perf_counter()
pipe.run(images).write.format("noop").mode("overwrite").save()
wall = time.perf_counter() - t0
print(json.dumps({{"cpus": {cpus}, "captions": n, "wall_sec": round(wall, 3),
                   "captions_per_sec": round(n / wall, 1)}}))
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1200,
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)},
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"no output at cpus={cpus}: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    replication = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    lo = run_one(n, replication, sf_dir)
    hi = run_one(4 * n, replication, sf_dir)
    eff = (hi["captions_per_sec"] / lo["captions_per_sec"]) / 4.0
    result = {
        "metric": "scaling_efficiency_Nx4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "low": lo,
        "high": hi,
        "sf": sf_dir,
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    ts = time.strftime("%Y-%m-%d %H:%M:%S")
    md = f"""# BENCH/BASELINE — measured numbers for this repo

Updated: {ts}

## Throughput scaling (north-rule: N -> 4N executors, >=0.8 efficiency)

Sandbox proxy per driver instruction: same job, same input, local[{n}] vs
local[{4 * n}] cores; steady-state wall time (2nd run) of the full
quality-filter pipeline (langid + KenLM-semantics scoring + heuristics +
scrub + keep/drop) over {lo["captions"]} captions
(sf0.1 documents x{replication}).

| parallelism | captions | wall (s) | captions/sec |
|---|---|---|---|
| local[{n}] | {lo["captions"]} | {lo["wall_sec"]} | {lo["captions_per_sec"]} |
| local[{4 * n}] | {hi["captions"]} | {hi["wall_sec"]} | {hi["captions_per_sec"]} |

**Scaling efficiency (throughput ratio / 4): {eff:.3f}**
(target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

## Reference throughput definition

The reference reports queries/sec excluding model load
(`/root/reference/lm/kenlm_benchmark_main.cc:124-131`); ours likewise
excludes ARPA parse + broadcast construction and uses steady-state runs.

## Headline per-query timings

See the driver-recorded `BENCH_r*.json` (produced by `bench.py`) for the
per-query timings at sf0.1.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
