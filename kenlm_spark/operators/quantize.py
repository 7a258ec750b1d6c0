"""Model quantization (SURVEY.md §2.4 A9).

The reference's SeparatelyQuantize (/root/reference/lm/quantize.hh:95-200)
trains per-order equal-frequency bins over probs and backoffs and stores
bin means. Spark-first translation: NTILE over a per-order window (the
equal-frequency chop), then a groupBy for bin means — both deterministic
given the (value, gram) sort, hence DuckDB-oracle-checkable.

Not applied by default: quantization trades the bit-parity the scorer
guarantees for a 2-4x smaller broadcast; apply to the broadcast payload
only when the model outgrows executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantize_model(
    model: DataFrame,
    bits: int = 8,
    order_col: str = "ord",
    gram_col: str = "gram",
    prob_col: str = "log10_prob",
    backoff_col: str = "log10_backoff",
) -> DataFrame:
    """Replace prob/backoff with their per-order equal-frequency bin means."""
    bins = 1 << bits
    wp = Window.partitionBy(order_col).orderBy(F.col(prob_col), F.col(gram_col))
    wb = Window.partitionBy(order_col).orderBy(F.col(backoff_col), F.col(gram_col))
    df = model.withColumn("_pb", F.ntile(bins).over(wp)).withColumn(
        "_bb", F.ntile(bins).over(wb)
    )
    pmeans = df.groupBy(order_col, "_pb").agg(F.avg(prob_col).alias("_pm"))
    bmeans = df.groupBy(order_col, "_bb").agg(F.avg(backoff_col).alias("_bm"))
    return (
        df.join(pmeans, [order_col, "_pb"])
        .join(bmeans, [order_col, "_bb"])
        .select(
            order_col,
            gram_col,
            F.round("_pm", 6).alias("prob_q"),
            F.round("_bm", 6).alias("backoff_q"),
        )
    )


def quantize_model_sql(ng_cte: str, bits: int = 8) -> str:
    """DuckDB twin over an ng(ord, gram, p, bo) VALUES CTE."""
    bins = 1 << bits
    return f"""
WITH {ng_cte},
t AS (
  SELECT ord, gram, p, bo,
         ntile({bins}) OVER (PARTITION BY ord ORDER BY p, gram) AS pb,
         ntile({bins}) OVER (PARTITION BY ord ORDER BY bo, gram) AS bb
  FROM ng
),
pm AS (SELECT ord, pb, AVG(p) AS pmean FROM t GROUP BY ord, pb),
bm AS (SELECT ord, bb, AVG(bo) AS bmean FROM t GROUP BY ord, bb)
SELECT t.ord, t.gram, round(pm.pmean, 6) AS prob_q, round(bm.bmean, 6) AS backoff_q
FROM t JOIN pm ON pm.ord = t.ord AND pm.pb = t.pb
        JOIN bm ON bm.ord = t.ord AND bm.bb = t.bb
"""
