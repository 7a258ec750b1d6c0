"""Third two-cluster-size scaling workload: the sequence-packing window
(`operators.packing.pack_sequences`) at N vs 4N executors — the r7
operator introduces a NEW shuffle shape (hash-partition-by-group +
in-group sort window), so it gets its own scaling row alongside the
map-only filter pipeline and the shuffle-heavy dedup join.

n_groups is held constant across cluster sizes (it is a property of the
JOB, not the cluster): 256 groups give both sizes ample parallelism and
keep per-group sort slices identical, so the comparison isolates the
executor count.

Usage: python scripts/bench_scaling_packing.py [n_exec] [replication]
Appends a section to BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import REPO, make_pyfiles_zip  # noqa: E402

N_GROUPS = 256
BUDGET = 1024


def materialize_docs(replication: int, sf_dir: str, quarter: bool = False) -> str:
    """Replicated caption corpus with distinct ids (quarter=True keeps
    the same replication — per-doc work unchanged — over a quarter of
    the base documents, for the weak-scaling row)."""
    path = f"/tmp/scaling_pack_x{replication}" + ("_q4" if quarter else "")
    if os.path.isdir(path) and os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    qfilter = ".filter(F.col('doc_id') % 4 == 0)" if quarter else ""
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from kenlm_spark.session import get_spark
spark = get_spark("gen", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("{sf_dir}/documents.parquet"){qfilter}.repartition(64)
docs = docs.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit({replication}))))
out = docs.select(
    (F.col("doc_id") * {replication} + F.col("rep")).alias("doc_id"),
    F.col("text"),
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

spark = (SparkSession.builder.appName("scaling-pack")
         .master("local-cluster[{n_exec},{cores},4096]")
         .config("spark.sql.shuffle.partitions", "{n_exec * cores * 2}")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.files.maxPartitionBytes", "4m")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.addPyFile({zip_path!r})
from kenlm_spark.operators.packing import pack_sequences

docs = spark.read.parquet({input_path!r})
n = docs.count()

def job():
    # the agg reads seq_id/seq_offset, so the window cannot be pruned
    return pack_sequences(docs, budget_tokens={BUDGET}, n_groups={N_GROUPS}) \\
        .agg(F.sum("seq_id").alias("s"), F.max("seq_offset").alias("m"),
             F.count(F.lit(1)).alias("n")).collect()[0]

row = job()  # warmup
best = 1e18
for _ in range(2):
    t0 = time.perf_counter()
    row = job()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({{"executors": {n_exec}, "cores_per_executor": {cores},
                   "docs": n, "packed_docs": row["n"],
                   "wall_sec": round(best, 3),
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
    replication = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    zip_path = make_pyfiles_zip()
    input_path = materialize_docs(replication, sf_dir)
    quarter_path = materialize_docs(replication, sf_dir, quarter=True)

    lo = run_one(n, 4, input_path, zip_path)
    hi = run_one(4 * n, 4, input_path, zip_path)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0
    lo_w = run_one(n, 4, quarter_path, zip_path)
    weak_eff = lo_w["wall_sec"] / hi["wall_sec"]
    result = {
        "metric": "packing_scaling_efficiency_Nx4N_executors",
        "value": round(eff, 3),
        "weak_value": round(weak_eff, 3),
        "unit": "ratio",
        "low": lo,
        "high": hi,
        "low_weak_quarter": lo_w,
        "sf": sf_dir,
        "n_groups": N_GROUPS,
        "budget_tokens": BUDGET,
        "target": 0.8,
        "pass": eff >= 0.8,
        "weak_pass": weak_eff >= 0.8,
    }
    print(json.dumps(result))

    section = f"""

## Third workload: sequence-packing window scaling (r7 operator)

Same N vs 4N executor proxy over the packing window (tokenize map pass
+ ONE hash-partition-by-group exchange + in-group sort + running-sum
window) at n_groups={N_GROUPS}, budget={BUDGET} tokens, over
{lo['docs']} documents:

| cluster size | executors x cores | docs | wall (s) | docs/sec |
|---|---|---|---|---|
| N | {n} x 4 | {lo['docs']} | {lo['wall_sec']} | {lo['docs_per_sec']} |
| 4N | {4 * n} x 4 | {hi['docs']} | {hi['wall_sec']} | {hi['docs_per_sec']} |
| N (weak: quarter corpus) | {n} x 4 | {lo_w['docs']} | {lo_w['wall_sec']} | {lo_w['docs_per_sec']} |

**Strong-scaling efficiency (same input, throughput ratio / 4):
{eff:.3f}** (target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

**Weak-scaling efficiency (constant per-executor load, wall ratio
{lo_w['wall_sec']} / {hi['wall_sec']}): {weak_eff:.3f}**
(target >= 0.8: {"PASS" if weak_eff >= 0.8 else "FAIL"}) — the regime a
100-TB packing job grows in: n_groups rises with the corpus (it is a
job constant here only to isolate executor count), so per-group sort
slices stay bounded and the window never concentrates.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as fh:
        fh.write(section)


if __name__ == "__main__":
    main()
