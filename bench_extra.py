"""Extra benchmark harness for the optimization rounds (bench.py is
FROZEN for measurement — this file holds the noop-sink isolation runs
cited in OPTIMIZATION_r08.md, guide §1.4).

Times named queries with exactly bench.py's methodology (construction +
noop-sink execution, run twice, report the second) in one fresh session.

Usage: SPARK_GRAFT_SF_DIR=... python bench_extra.py q_a q_b ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    import __spark_entry__ as entrymod
    from kenlm_spark.session import get_spark

    entrymod._model()
    spark = get_spark("kenlm_spark-bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    out = {}
    names = sys.argv[1:] or list(qs)
    for name in names:
        spark.sparkContext.setJobDescription(name)
        print(f"[bench_extra] {name} ...", file=sys.stderr, flush=True)
        run_once(qs[name])
        out[name] = round(run_once(qs[name]), 3)
        print(
            f"[bench_extra] {name} = {out[name]}s", file=sys.stderr, flush=True
        )
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps({"sf": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
