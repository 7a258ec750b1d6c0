"""Second two-cluster-size scaling workload: SHUFFLE-heavy MinHash+LSH
near-dup dedup at N vs 4N executors (the filter-pipeline run in
bench_scaling.py is map-only; this one exercises the banded bucket
self-join and verify joins under real executor isolation).

Usage: python scripts/bench_scaling_dedup.py [n_exec] [replication]
Appends a section to BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import REPO, make_pyfiles_zip  # noqa: E402


def materialize_docs(replication: int, sf_dir: str) -> str:
    path = f"/tmp/scaling_dedup_x{replication}"
    if os.path.isdir(path) and os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from kenlm_spark.session import get_spark
spark = get_spark("gen", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("{sf_dir}/documents.parquet").repartition(64)
docs = docs.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit({replication}))))
# perturb the tail so replicas are NEAR-duplicates (exercises verify),
# not byte-identical
out = docs.select(
    (F.col("doc_id") * {replication} + F.col("rep")).alias("doc_id"),
    F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")).alias("text"),
)
out.write.mode("overwrite").parquet("{path}")
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True, timeout=900,
                   capture_output=True, text=True)
    return path


def run_one(n_exec: int, cores: int, input_path: str, zip_path: str) -> dict:
    code = f"""
import json, sys, time
sys.path.insert(0, {REPO!r})
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.appName("scaling-dedup")
         .master("local-cluster[{n_exec},{cores},4096]")
         .config("spark.sql.shuffle.partitions", "{n_exec * cores * 2}")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.files.maxPartitionBytes", "4m")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.addPyFile({zip_path!r})
from kenlm_spark.operators.dedup import minhash_lsh_pairs

docs = spark.read.parquet({input_path!r})
n = docs.count()
minhash_lsh_pairs(docs, jaccard_threshold=0.5, max_bucket=20).count()  # warmup
best = 1e18
pairs = 0
for _ in range(2):
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.5, max_bucket=20).count()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({{"executors": {n_exec}, "cores_per_executor": {cores},
                   "docs": n, "pairs": pairs, "wall_sec": round(best, 3),
                   "docs_per_sec": round(n / best, 1)}}))
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1500, env={**os.environ},
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"no output at n_exec={n_exec}: {out.stderr[-3000:]}")
    return json.loads(lines[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    replication = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    zip_path = make_pyfiles_zip()
    input_path = materialize_docs(replication, sf_dir)

    lo = run_one(n, 4, input_path, zip_path)
    hi = run_one(4 * n, 4, input_path, zip_path)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0
    result = {
        "metric": "dedup_scaling_efficiency_Nx4N_executors",
        "value": round(eff, 3),
        "unit": "ratio",
        "low": lo,
        "high": hi,
        "sf": sf_dir,
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    section = f"""

## Second workload: shuffle-heavy dedup scaling (MinHash+LSH)

Same N vs 4N executor proxy, but the workload is the banded-bucket
self-join dedup (signature map pass + bucket shuffle + pair join +
verify joins) over {lo['docs']} documents, with the max_bucket
boilerplate guard ACTIVE (replica groups of 48 exceed the cap and are
dropped — the guard doing exactly its production job, keeping candidate
generation linear):

| cluster size | executors x cores | docs | wall (s) | docs/sec |
|---|---|---|---|---|
| N | {n} x 4 | {lo['docs']} | {lo['wall_sec']} | {lo['docs_per_sec']} |
| 4N | {4 * n} x 4 | {hi['docs']} | {hi['wall_sec']} | {hi['docs_per_sec']} |

**Dedup scaling efficiency (throughput ratio / 4): {eff:.3f}**
(target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})
"""
    # replace any previous auto-appended section of this exact title
    # instead of accumulating duplicates
    marker = "\n\n## Second workload: shuffle-heavy dedup scaling (MinHash+LSH)\n"
    text = open("BENCH/BASELINE.md").read()
    while marker in text:
        start = text.index(marker)
        nxt = text.find("\n## ", start + len(marker))
        text = text[:start] + (text[nxt:] if nxt != -1 else "")
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write(text + section)


if __name__ == "__main__":
    main()
