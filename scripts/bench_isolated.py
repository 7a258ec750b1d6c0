"""Isolated-protocol per-query benchmark: each named query runs in a
FRESH subprocess (new JVM, no resident broadcasts/GC from neighbors)
at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS], timed over N runs
after a warmup; prints one JSON line per query with all runs + the
steady-state min/median (runs 2..N).

This is the established root-cause protocol for bench drift (PLANS.md:
q_quality_metrics r3, q_quality_filter r4, captions/sec r5): the shared
78-query bench JVM slows sub-second queries by 1.5-2.5x depending on
accumulated session state, so regressions are only real if the isolated
fresh-JVM number moved.

Usage: python scripts/bench_isolated.py q_langid_nb q_events_sessions ...
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, ".")
import __spark_entry__ as em
from kenlm_spark.session import get_spark

name = sys.argv[1]
n_runs = int(sys.argv[2])
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("bench-isolated", shuffle_partitions=32)
fn = em.queries()[name]
runs = []
for i in range(n_runs):
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    runs.append(round(time.perf_counter() - t0, 3))
steady = sorted(runs[1:])
print(json.dumps({
    "query": name, "runs": runs,
    "steady_min": steady[0],
    "steady_median": steady[len(steady) // 2],
}))
spark.stop()
"""


def main() -> int:
    queries = sys.argv[1:] or ["q_langid_nb"]
    n_runs = int(os.environ.get("BENCH_ISOLATED_RUNS", "5"))
    for q in queries:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, q, str(n_runs)],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        print(line[-1] if line else f'{{"query": "{q}", "error": {json.dumps(out.stderr[-500:])}}}')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
