"""Evidence for VERDICT r2 item #1: the flagship path is collect-free
end to end.

estimate() → estimator.export_model_tables() (distributed key/vocab
computation, no driver materialization) → join_scorer.write_model_tables()
(parquet bucketed by key) → QualityFilterPipeline.from_model_tables() →
run().

Records in BENCH/FLAGSHIP.md:
  * the executed plan of the full keep/drop pipeline over the BUCKETED
    model table, asserting 0 Exchange above the model scan;
  * that no driver collect of model state happens on this path (the only
    collect is the 2-row <s>/</s> id lookup);
  * decision parity with the broadcast pipeline on the same input.
"""

from __future__ import annotations

import re
import sys
import tempfile

sys.path.insert(0, ".")


def subtree_exchanges(plan: str, scan_marker: str) -> int:
    """Exchanges strictly between the marked scan and its enclosing join."""
    lines = plan.splitlines()
    idx = next((i for i, ln in enumerate(lines) if scan_marker in ln), None)
    if idx is None:
        return -1

    def depth(ln: str) -> int:
        m = re.search(r"[+:]-", ln)
        return m.start() if m else 0

    count, d = 0, depth(lines[idx])
    for i in range(idx - 1, -1, -1):
        nd = depth(lines[i])
        if nd >= d:
            continue
        d = nd
        if "Join" in lines[i]:
            break
        if "Exchange" in lines[i]:
            count += 1
    return count


def main() -> None:
    from pyspark.sql import functions as F

    from kenlm_spark.estimator import estimate, export_model_tables, to_ngram_model
    from kenlm_spark.ngram.join_scorer import read_model_tables, write_model_tables
    from kenlm_spark.pipeline import FilterConfig, QualityFilterPipeline
    from kenlm_spark.session import get_spark

    wh = tempfile.mkdtemp(prefix="flagship_wh_")
    spark = get_spark("flagship-demo", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    # Simulate the at-scale case: a 100-TB-corpus model CANNOT broadcast,
    # which is the whole point of this path. On the sf0.001 toy model AQE
    # would (correctly) broadcast it, hiding the bucketed-join shape.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model_df, _ = estimate(docs, "text", order=3)
    model_df = model_df.localCheckpoint(eager=True)

    tall, vocab = export_model_tables(model_df, 3)
    write_model_tables(tall, vocab, "flagship", buckets=8, path=wh)
    tall_b, vocab_b = read_model_tables(spark, "flagship")

    images = docs.select(
        F.col("doc_id").cast("string").alias("image_id"),
        F.lit(None).cast("binary").alias("bytes"),
        F.lit(8).alias("w"), F.lit(8).alias("h"),
        F.lit("raw").alias("fmt"),
        F.col("text").alias("caption"),
        F.col("doc_id").alias("phash"),
    )
    pipe = QualityFilterPipeline.from_model_tables(
        spark, tall_b, vocab_b, 3, FilterConfig()
    )
    result = pipe.run(images)
    result.write.format("noop").mode("overwrite").save()
    plan = result._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    model_ex = subtree_exchanges(final, "flagship_model")
    vocab_ex = subtree_exchanges(final, "flagship_vocab")

    # broadcast-path parity on decisions
    bcast = QualityFilterPipeline(spark, to_ngram_model(model_df, 3))
    cols = ["image_id", "keep", "drop_reason", "scrubbed_caption"]
    a = {r["image_id"]: tuple(r) for r in bcast.run(images).select(*cols).collect()}
    b = {r["image_id"]: tuple(r) for r in result.select(*cols).collect()}
    n_match = sum(a[k] == b[k] for k in a)

    assert model_ex == 0, f"model-side exchanges: {model_ex}\n{final}"
    assert n_match == len(a) == len(b), (n_match, len(a), len(b))

    joins = [ln.strip() for ln in final.splitlines() if "flagship_model" in ln]
    with open("BENCH/FLAGSHIP.md", "w") as fh:
        fh.write(
            "# Collect-free flagship (VERDICT r2 item #1)\n\n"
            "`estimate()` → `export_model_tables()` → bucketed parquet →\n"
            "`QualityFilterPipeline.from_model_tables()` → `run()`.\n\n"
            "No model state crosses the driver on this path:\n"
            "`export_model_tables` assigns vocab ids with a distributed\n"
            "rank (range partition + partition-local row_number + offset\n"
            "join) and computes probing-hash keys in one Arrow pass; the\n"
            "only collect is the 2-row `<s>`/`</s>` id lookup in\n"
            "`from_model_tables`. `to_ngram_model` (driver collect +\n"
            "broadcast) remains only as the small-model fast path.\n\n"
            f"* Exchanges above the bucketed MODEL scan in the executed\n"
            f"  keep/drop plan: **{model_ex}** (hard-asserted 0)\n"
            f"* Exchanges above the bucketed VOCAB scan: {vocab_ex}\n"
            f"* Decision parity vs broadcast pipeline: {n_match}/{len(a)}\n"
            f"  rows identical (keep, drop_reason, scrubbed_caption)\n\n"
            "Model-scan lines in the executed plan:\n\n```\n"
            + "\n".join(joins[:4])
            + "\n```\n\n"
            "Numeric parity of the exported tables themselves (6.7k rows,\n"
            "bit-equal float32-rounded probs/backoffs, identical vocab id\n"
            "assignment) is pytest-gated:\n"
            "`tests/test_estimator.py::test_export_model_tables_parity`.\n"
        )
    print(f"model_ex={model_ex} vocab_ex={vocab_ex} parity={n_match}/{len(a)}")
    spark.stop()


if __name__ == "__main__":
    main()
