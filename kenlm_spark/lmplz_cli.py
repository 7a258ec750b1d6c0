"""CLI twin of the reference's `lmplz` (lm/builder/lmplz_main.cc): estimate
a modified-Kneser-Ney ARPA model from text — but Spark-distributed, so the
same command line scales from stdin to a 100-TB corpus directory.

    python -m kenlm_spark.lmplz_cli -o 3 < corpus.txt > model.arpa
    python -m kenlm_spark.lmplz_cli -o 4 --text corpus.txt --arpa out.arpa \
        --prune 0 0 1 --discount_fallback 0.5 1 1.5

Flag parity with lmplz_main.cc:84-210: -o/--order, --text, --arpa,
--prune (one value per order, non-decreasing, last value extends to
higher orders, unigram pruning not allowed), --discount_fallback
([D1 D2 D3], used when the closed-form Chen-Goodman estimate fails).
`--text` may also be a parquet file/directory with a text column (the
Spark-native input path); plain text is read as one document per line.
"""

from __future__ import annotations

import argparse
import sys
import tempfile


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Spark-distributed lmplz (modified Kneser-Ney)"
    )
    ap.add_argument("-o", "--order", type=int, required=True)
    ap.add_argument("--text", help="input file (text; or .parquet)")
    ap.add_argument("--arpa", help="output ARPA path (default stdout)")
    ap.add_argument(
        "--prune", nargs="+", type=int, default=None,
        help="per-order count<=threshold pruning; last value extends",
    )
    ap.add_argument(
        "--discount_fallback", nargs="*", type=float, default=None,
        help="fallback discounts D1 [D2 [D3]] when closed-form fails",
    )
    ap.add_argument("--text_col", default="text",
                    help="text column when --text is parquet")
    ap.add_argument("--master", default="local[*]")
    ap.add_argument(
        "--skip_symbols", action="store_true",
        help="treat <s>/</s>/<unk> in the corpus as whitespace instead "
        "of erroring (lmplz flag parity)",
    )
    ap.add_argument(
        "--intermediate",
        help="also write the KenLM intermediate (ModelBuffer) file set "
        "at this base path (lmplz --intermediate twin; interpolate "
        "input)",
    )
    ap.add_argument(
        "--collect_threshold", type=int, default=2_000_000,
        help="models larger than this many n-grams stream out via the "
        "distributed per-order-sorted writer instead of a driver collect "
        "(0 forces the distributed path)",
    )
    args = ap.parse_args(argv)

    if args.order < 1:
        ap.error("order must be >= 1")
    prune = None
    if args.prune:
        vals = list(args.prune)
        if vals[0] != 0:
            ap.error("pruning the unigram is not allowed (first value "
                     "must be 0)")  # lmplz_main.cc ParsePruning contract
        if any(b < a for a, b in zip(vals, vals[1:])):
            ap.error("--prune values must be non-decreasing")
        vals += [vals[-1]] * (args.order - len(vals))
        prune = {n + 1: v for n, v in enumerate(vals[: args.order]) if v}

    from kenlm_spark.estimator import FALLBACK_DISCOUNT, Discount, estimate, write_arpa
    from kenlm_spark.session import get_spark

    fallback = FALLBACK_DISCOUNT
    if args.discount_fallback is not None:
        d = list(args.discount_fallback) or [0.5, 1.0, 1.5]
        d += [d[-1]] * (3 - len(d))
        fallback = Discount(d[0], d[1], d[2])

    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark("lmplz", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    if args.text and args.text.endswith(".parquet"):
        docs = spark.read.parquet(args.text).withColumnRenamed(
            args.text_col, "text"
        )
    else:
        if args.text:
            src = args.text
        else:
            # estimator input is a DataFrame; stage stdin to a temp file
            with tempfile.NamedTemporaryFile(
                "w", suffix=".txt", delete=False
            ) as fh:
                fh.write(sys.stdin.read())
                src = fh.name
        docs = spark.read.text(src).withColumnRenamed("value", "text")

    model_df, _ = estimate(
        docs, "text", order=args.order,
        fallback_discount=fallback, prune_thresholds=prune,
        disallowed_symbol="skip" if args.skip_symbols else "throw",
    )
    if args.intermediate:
        from kenlm_spark.ngram.model_buffer import write_model_buffer

        write_model_buffer(model_df.collect(), args.order, args.intermediate)
    # large models stream out distributed (per-order sorted part files +
    # byte merge, no driver materialization); small ones take the collect
    # fast path — byte-identical outputs (tests/test_estimator.py)
    if args.arpa and model_df.count() > args.collect_threshold:
        from kenlm_spark.estimator import write_arpa_distributed

        write_arpa_distributed(model_df, args.order, args.arpa)
    else:
        rows = model_df.collect()
        if args.arpa:
            write_arpa(rows, args.order, args.arpa)
        else:
            with tempfile.NamedTemporaryFile("r", suffix=".arpa") as fh:
                write_arpa(rows, args.order, fh.name)
                sys.stdout.write(open(fh.name).read())
    if not preexisting:  # don't tear down a caller's (e.g. pytest's) session
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
