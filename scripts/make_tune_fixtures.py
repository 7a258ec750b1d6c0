"""Generate the two tuning-fixture models (tests/fixtures/tune_a.arpa,
tune_b.arpa) with the repo's OWN estimator from two deterministic tiny
corpora with different distributions — so interpolation-weight tuning has
a genuinely non-degenerate pair (the golden test.arpa / test_nounk.arpa
pair differ only in <unk> handling, which makes the tuning Hessian
singular). Run once; committed output is stable."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

CORPUS_A = [
    "the quick brown fox jumps over the lazy dog",
    "the quick fox runs over the brown hill",
    "a lazy dog sleeps under the brown tree",
    "the dog jumps and the fox runs",
    "quick brown foxes jump over lazy dogs daily",
    "the lazy fox naps while the dog runs",
]

CORPUS_B = [
    "spark executes the query plan with a shuffle",
    "the query scans the table and joins rows",
    "a shuffle moves rows between executors quickly",
    "the plan broadcasts the small table to executors",
    "executors run tasks over partitions of the table",
    "the optimizer prunes columns from the scan",
]


def main() -> None:
    from kenlm_spark.estimator import estimate, write_arpa
    from kenlm_spark.session import get_spark

    spark = get_spark("make-tune-fixtures", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    for name, corpus in [("tune_a", CORPUS_A), ("tune_b", CORPUS_B)]:
        df = spark.createDataFrame([(s,) for s in corpus], "text string")
        model, _ = estimate(df, "text", order=3)
        rows = [r.asDict() for r in model.collect()]
        path = f"tests/fixtures/{name}.arpa"
        write_arpa(rows, 3, path)
        print("wrote", path, len(rows), "rows")
    spark.stop()


if __name__ == "__main__":
    main()
