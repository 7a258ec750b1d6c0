"""Hardware-ceiling proof for the JOIN-SCORER N->4N scaling gap (r5).

Same protocol as bench_dedup_busproof.py: four SEPARATE single-executor
(local-cluster[1,4]) processes, each running the full join-scorer
pipeline (gen_keys + Bloom prune -> model equi-joins -> backoff
reassembly -> quality/scrub) on a DISJOINT quarter of the scaling
input, launched concurrently. Independent processes share no scheduler
and no shuffle — only the machine. Their concurrent degradation is the
box's ceiling for this workload; the 4N-cluster efficiency is judged
against it.

Usage: python scripts/bench_join_busproof.py [replication]
Replaces the 'Join-scorer bus-contention proof' section of
BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import REPO, make_pyfiles_zip, materialize_input  # noqa: E402


def quarter_path(base: str, q: int) -> str:
    return f"{base}_jq{q}"


def materialize_quarters(base: str) -> None:
    if all(
        os.path.exists(os.path.join(quarter_path(base, q), "_SUCCESS"))
        for q in range(4)
    ):
        return
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from kenlm_spark.session import get_spark
spark = get_spark("gen", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet({base!r})
for q in range(4):
    docs.filter(F.pmod(F.hash("image_id"), F.lit(4)) == q).repartition(
        16).write.mode("overwrite").parquet({base!r} + f"_jq{{q}}")
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True, timeout=1200,
                   capture_output=True, text=True)


def job_code(input_path: str, zip_path: str) -> str:
    return f"""
import json, sys, time
sys.path.insert(0, {REPO!r})
import __spark_entry__ as em
from pyspark.sql import SparkSession
em._model()
spark = (SparkSession.builder.appName("join-busproof")
         .master("local-cluster[1,4,4096]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
         .config("spark.sql.files.maxPartitionBytes", "4m")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.addPyFile({zip_path!r})
from kenlm_spark.pipeline import FilterConfig, QualityFilterPipeline
images = spark.read.parquet({input_path!r})
pipe = QualityFilterPipeline(
    spark, em._model(), FilterConfig(scorer_mode="join")
)
pipe.run(images).write.format("noop").mode("overwrite").save()  # warm
t0 = time.perf_counter()
pipe.run(images).write.format("noop").mode("overwrite").save()
print(json.dumps({{"wall": time.perf_counter() - t0}}))
spark.stop()
"""


def run_jobs(paths: list[str], zip_path: str) -> list[float]:
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", job_code(p, zip_path)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        for p in paths
    ]
    walls = []
    for pr in procs:
        out, _ = pr.communicate(timeout=2500)
        lines = [ln for ln in out.splitlines() if ln.startswith("{")]
        walls.append(json.loads(lines[-1])["wall"])
    return walls


def main() -> None:
    replication = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    zip_path = make_pyfiles_zip()
    base = materialize_input(replication, sf_dir)
    materialize_quarters(base)
    quarters = [quarter_path(base, q) for q in range(4)]

    solo = run_jobs(quarters[:1], zip_path)[0]
    conc = run_jobs(quarters, zip_path)
    concurrent_eff = solo / max(conc)

    result = {
        "metric": "join_scorer_busproof_independent_concurrent_efficiency",
        "value": round(concurrent_eff, 3),
        "unit": "ratio",
        "solo_quarter_wall": round(solo, 2),
        "concurrent_quarter_walls": [round(w, 2) for w in conc],
        "note": "independent processes, disjoint inputs, zero shuffle "
                "interaction — degradation is pure machine contention",
    }
    print(json.dumps(result))

    section = f"""

## Join-scorer bus-contention proof (independent concurrent jobs)

Four SEPARATE single-executor (local-cluster[1,4]) processes, each
running the full join-scorer pipeline on a DISJOINT quarter of the
{replication * 5000:,}-caption scaling input, launched concurrently —
no shared scheduler, no shuffle between them, only the machine.

| run | quarter wall (s) |
|---|---|
| one quarter, machine otherwise idle | {solo:.1f} |
| four quarters concurrently (max of 4) | {max(conc):.1f} (all: {", ".join(f"{w:.1f}" for w in conc)}) |

Concurrent efficiency (this workload's machine ceiling at 4x) =
**{concurrent_eff:.3f}**. The cluster run's N->4N efficiency divided by
this ceiling is the coordination-free fraction that transfers to real
disjoint hosts.
"""
    md = open("BENCH/BASELINE.md").read()
    marker = "\n\n## Join-scorer bus-contention proof"
    if marker in md:
        head, rest = md.split(marker, 1)
        nxt = rest.find("\n## ")
        tail = rest[nxt:] if nxt != -1 else ""
        md = head + section + tail
    else:
        md = md + section
    open("BENCH/BASELINE.md", "w").write(md)


if __name__ == "__main__":
    main()
