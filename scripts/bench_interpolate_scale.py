"""Real-size interpolation benchmark (r5, VERDICT item 5).

BENCH_r04 showed q_interpolate_models spending 12s of CONSTRUCTION on a
105-row toy model — per-order barrier jobs (localCheckpoint keeps the
k-models-per-order eval cascade from exploding the plan 2^order-fold) and
PLANS.md claimed that overhead "amortizes at real model sizes" without a
measurement.  This script IS that measurement: estimate two full
Kneser-Ney models (lmplz-equivalent, order 3) over disjoint halves of the
sf0.1 documents table (~190k grams each), statically interpolate them
(0.5/0.5), and report construction wall vs action wall vs per-gram
throughput.  Run:

    python scripts/bench_interpolate_scale.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from kenlm_spark.estimator import estimate
from kenlm_spark.operators.interpolate_models import interpolate_models
from kenlm_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    order = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("bench-interp-scale", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    halves = [
        docs.filter(F.col("doc_id") % 2 == i).select("text") for i in (0, 1)
    ]
    models = []
    t0 = time.perf_counter()
    for h in halves:
        model, _ = estimate(h, "text", order=order)
        # materialize the inputs so the interpolation timing below isn't
        # charged for estimation (the production shape: model tables
        # already in parquet)
        models.append(model.localCheckpoint(eager=True))
    t_est = time.perf_counter() - t0
    sizes = [m.count() for m in models]
    print(f"estimate: {t_est:.1f}s  model sizes: {sizes}")

    for run in (1, 2):
        t0 = time.perf_counter()
        mixed = interpolate_models(models, [0.5, 0.5], order=order)
        t1 = time.perf_counter()
        mixed.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        n = mixed.count()
        construct, action = t1 - t0, t2 - t1
        print(
            f"run{run}: construct={construct:.2f}s action={action:.2f}s "
            f"mixed_grams={n} grams/sec={n / (construct + action):,.0f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
