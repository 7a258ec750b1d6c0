"""Two-cluster-size scaling benchmark (north-rule evidence).

The rule requires >=0.8 throughput scaling efficiency from N to 4N
executors. Real multi-node clusters don't exist in this sandbox, so per the
driver instruction the proxy is the same job at two parallelism levels —
here ``local-cluster[N,4,mem]`` vs ``local-cluster[4N,4,mem]``: genuinely
separate executor JVMs (own heaps/GC, code shipped via addPyFile — the
programmatic twin of ``spark-submit --py-files``), which models "N executors
vs 4N executors" much more faithfully than threads in one JVM.

Each level runs in its own subprocess; steady-state wall time (best of 2
after warmup) of the full quality-filter pipeline on a replicated caption
table large enough that compute dominates fixed overheads.

Usage: python scripts/bench_scaling.py [n_exec] [replication]
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_pyfiles_zip() -> str:
    """Package kenlm_spark as a --py-files zip (what spark-submit would ship)."""
    path = "/tmp/kenlm_spark_pyfiles.zip"
    with zipfile.ZipFile(path, "w") as zf:
        for root, _, files in os.walk(os.path.join(REPO, "kenlm_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return path


def materialize_input(replication: int, sf_dir: str) -> str:
    """Write the replicated caption table once; both cluster sizes scan it.

    Real pipelines read from storage with many input splits; measuring the
    in-memory row replicator would charge the benchmark for generator
    memory bandwidth instead of pipeline throughput.
    """
    path = f"/tmp/scaling_input_x{replication}"
    if os.path.isdir(path) and os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from kenlm_spark.session import get_spark
spark = get_spark("gen", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("{sf_dir}/documents.parquet").repartition(128)
docs = docs.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit({replication}))))
images = docs.select(
    F.concat(F.col("doc_id").cast("string"), F.lit("_"),
             F.col("rep").cast("string")).alias("image_id"),
    F.lit(None).cast("binary").alias("bytes"),
    F.lit(8).alias("w"), F.lit(8).alias("h"), F.lit("raw").alias("fmt"),
    F.col("text").alias("caption"),
    F.col("doc_id").alias("phash"),
)
images.write.mode("overwrite").parquet("{path}")
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True, timeout=900,
                   capture_output=True, text=True)
    return path


def run_one(n_exec: int, cores: int, input_path: str, zip_path: str) -> dict:
    code = f"""
import json, sys, time
sys.path.insert(0, {REPO!r})
import __spark_entry__ as em
from pyspark.sql import SparkSession, functions as F
from kenlm_spark.pipeline import FilterConfig, QualityFilterPipeline

em._model()
spark = (SparkSession.builder.appName("scaling-bench")
         .master("local-cluster[{n_exec},{cores},4096]")
         .config("spark.sql.shuffle.partitions", "{n_exec * cores * 2}")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
         .config("spark.sql.files.maxPartitionBytes", "4m")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.addPyFile({zip_path!r})

images = spark.read.parquet({input_path!r})
n = images.count()
pipe = QualityFilterPipeline(spark, em._model(), FilterConfig())
pipe.run(images).write.format("noop").mode("overwrite").save()  # warmup
best = 1e18
for _ in range(2):
    t0 = time.perf_counter()
    pipe.run(images).write.format("noop").mode("overwrite").save()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({{"executors": {n_exec}, "cores_per_executor": {cores},
                   "captions": n, "wall_sec": round(best, 3),
                   "captions_per_sec": round(n / best, 1)}}))
spark.stop()
"""  # noqa: E501
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1500,
        env={**os.environ},
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"no output at n_exec={n_exec}: {out.stderr[-3000:]}")
    return json.loads(lines[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    replication = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    cores = 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    zip_path = make_pyfiles_zip()
    input_path = materialize_input(replication, sf_dir)

    lo = run_one(n, cores, input_path, zip_path)
    hi = run_one(4 * n, cores, input_path, zip_path)
    eff = (hi["captions_per_sec"] / lo["captions_per_sec"]) / 4.0
    result = {
        "metric": "scaling_efficiency_Nx4N_executors",
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

Sandbox proxy per driver instruction: the same job on the same input at two
cluster sizes — `local-cluster[{n},{cores},4096]` ({n} executor JVMs) vs
`local-cluster[{4 * n},{cores},4096]` ({4 * n} executor JVMs), code shipped to
executors as a zip via addPyFile (the programmatic form of
`spark-submit --py-files`). Steady-state wall time (best of 2 after a
warmup) of the full quality-filter pipeline (langid + KenLM-semantics
perplexity scoring + heuristics + PII/toxicity scrub + keep/drop) over
{lo["captions"]} captions (sf0.1 documents x{replication}).

| cluster size | executors x cores | captions | wall (s) | captions/sec |
|---|---|---|---|---|
| N | {n} x {cores} | {lo["captions"]} | {lo["wall_sec"]} | {lo["captions_per_sec"]} |
| 4N | {4 * n} x {cores} | {hi["captions"]} | {hi["wall_sec"]} | {hi["captions_per_sec"]} |

**Scaling efficiency (throughput ratio / 4): {eff:.3f}**
(target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

## Scale notes (what made this pass, and what it means at 100 TB)

* The pipeline is **map-only**: no shuffle at any stage (salted repartition
  is available for length/language-skewed inputs but off by default; the
  scorer re-chunks batches by token budget inside the UDF, so per-task skew
  is bounded without moving data).
* **Split sizing matters**: with parquet bin-packing
  (`maxPartitionBytes`/`openCostInBytes` defaults) the input collapsed to
  few fat splits and the 4N run ran under-occupied with stragglers;
  balanced splits restored linear occupancy. At 100 TB the same knob
  governs task granularity — target several tasks per core per wave.
* Hot-path expressions are allocation-free `regexp_count`/`rlike` scans;
  earlier `regexp_replace`+`length` and lambda higher-order-function
  variants were GC-bound and stopped scaling with core count.
* Single-machine caveat: all "executors" share one memory bus, so measured
  efficiency is a LOWER bound on what separate hosts would show for this
  bandwidth-bound workload.

## Reference throughput definition

The reference reports queries/sec excluding model load
(`/root/reference/lm/kenlm_benchmark_main.cc:124-131`); ours likewise
excludes ARPA parse + broadcast construction and uses steady-state runs.

## Headline per-query timings

See the driver-recorded `BENCH_r*.json` (produced by `bench.py`) for
per-query timings at sf0.1.
"""
    # Preserve the secondary-workload sections (dedup scaling sweep,
    # salt-skew crossover) appended by the other bench scripts.
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    tail = ""
    if os.path.exists(out_path):
        prev = open(out_path).read()
        idx = prev.find("## Second workload")
        if idx == -1:
            idx = prev.find("## Salted-repartition")
        if idx != -1:
            tail = "\n\n" + prev[idx:]
    md += tail
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
