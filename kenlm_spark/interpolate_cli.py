"""CLI twin of the reference's `interpolate` (lm/interpolate/
interpolate_main.cc): merge several language models with fixed or tuned
weights and emit one ARPA.

    python -m kenlm_spark.interpolate_cli -m a.arpa b.arpa -w 0.6 0.4 \
        --arpa out.arpa
    python -m kenlm_spark.interpolate_cli -m a.arpa b.arpa -t heldout.txt \
        --just_tune
    python -m kenlm_spark.interpolate_cli -m a.arpa b.arpa -t heldout.txt \
        --arpa out.arpa

Flag parity with interpolate_main.cc:60-70: -m/--model (several),
-w/--weight, -t/--tuning (one sentence per line), --just_tune. -m
accepts BOTH the reference's input — a ModelBuffer base written by
``lmplz --intermediate`` (kenlm_spark/ngram/model_buffer.py) — and
plain ARPA files. One documented divergence: the merge applied with
the (normalized) weights is the
linear-interpolation semantics of
kenlm_spark/operators/interpolate_models.py (oracle-checked,
q_interpolate_models / q_interpolate_tuned) rather than the reference
pipeline's log-linear + renormalize. The TUNING math is the reference's
(tune_derivatives.cc Newton iterations, ported and golden-tested in
kenlm_spark/ngram/tune.py).
"""

from __future__ import annotations

import argparse
import sys
import tempfile


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="interpolate language models (Spark-distributed merge)"
    )
    ap.add_argument("-m", "--model", nargs="+", required=True)
    ap.add_argument("-w", "--weight", nargs="+", type=float)
    ap.add_argument("-t", "--tuning", help="held-out text, one sentence/line")
    ap.add_argument("--just_tune", action="store_true")
    ap.add_argument("--arpa", help="output path (default stdout)")
    ap.add_argument("--master", default="local[*]")
    args = ap.parse_args(argv)

    if args.just_tune and not args.tuning:
        ap.error("--just_tune requires -t")
    if not args.weight and not args.tuning:
        ap.error("specify -w weights or -t tuning text")

    import os

    from kenlm_spark.oracle import arpa_ngram_rows

    def load_rows(path):
        # ModelBuffer base (lmplz --intermediate output) or ARPA file —
        # the reference's interpolate takes the former; we take both
        if os.path.exists(f"{path}.kenlm_intermediate"):
            from kenlm_spark.ngram.model_buffer import read_model_buffer

            _, rows = read_model_buffer(path)
            return [
                (r["order"], " ".join(r["words"]), r["log10_prob"],
                 r["log10_backoff"])
                for r in rows
            ]
        return list(arpa_ngram_rows(path))

    model_rows = [load_rows(p) for p in args.model]
    order = max(n for rows in model_rows for n, _, _, _ in rows)

    if args.tuning:
        from kenlm_spark.ngram.tune import build_instances, tune_weights

        with open(args.tuning) as fh:
            sentences = [ln.split() for ln in fh if ln.strip()]
        w = tune_weights(build_instances(model_rows, sentences))
        if args.just_tune:
            print(" ".join(f"{x:.6f}" for x in w))
            return 0
        s = float(w.sum())
        lambdas = [float(x) / s for x in w]
    else:
        lambdas = list(args.weight)
        s = sum(lambdas)
        if abs(s - 1.0) > 1e-9:
            print(
                f"normalizing weights (sum {s:.6f} -> 1)", file=sys.stderr
            )
            lambdas = [x / s for x in lambdas]

    from pyspark.sql import SparkSession

    from kenlm_spark.estimator import write_arpa
    from kenlm_spark.operators.interpolate_models import interpolate_models
    from kenlm_spark.session import get_spark

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark("interpolate", master=args.master)

    def as_df(rows):
        return spark.createDataFrame(
            [(n, g.split(" "), float(p), float(b)) for n, g, p, b in rows],
            "order int, words array<string>, log10_prob double, "
            "log10_backoff double",
        )

    mixed = interpolate_models(
        [as_df(r) for r in model_rows], lambdas, order=order
    )
    # (ord, gram, ...) -> the write_arpa row shape
    from pyspark.sql import functions as F

    rows = mixed.select(
        F.col("ord").alias("order"),
        F.split("gram", " ").alias("words"),
        "log10_prob",
        "log10_backoff",
    ).collect()
    if args.arpa:
        write_arpa(rows, order, args.arpa)
    else:
        with tempfile.NamedTemporaryFile("r", suffix=".arpa") as fh:
            write_arpa(rows, order, fh.name)
            sys.stdout.write(open(fh.name).read())
    if not preexisting:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
