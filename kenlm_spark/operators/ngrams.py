"""N-gram counting over a text column (SURVEY.md §2.4 A1 / §2.5 W1).

The reference counts order-N windows over ``[<s>]*(N-1) + tokens + [</s>]``
per line with a per-block combiner (``lm/builder/corpus_count.cc:90-123``).
Spark-first translation: the sliding window is a per-row array transform
(no shuffle, stays in codegen); the combine is ``groupBy().count()`` —
Catalyst's partial aggregation IS the reference's combiner
(``lm/builder/combine_counts.hh``), and the shuffle its external sort.

At 100 TB: one shuffle on the n-gram key, partial aggregation map-side;
skewed heads (stopword n-grams) are exactly the keys partial agg collapses
before the exchange, so the shuffle stays balanced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kenlm_spark.functions.text import tokenize
from kenlm_spark.ngram.model import BOS, EOS


def padded_tokens(text_col: Column | str, bos_count: int = 1) -> Column:
    """tokens with BOS padding + EOS, as the reference corpus reader emits.

    The reference pads N-1 BOS (then collapses duplicate-<s> rows at adjust
    time); for counting parity with its golden tests use ``bos_count=1``.
    """
    toks = tokenize(text_col)
    pads = F.array(*[F.lit(BOS)] * bos_count)
    return F.concat(pads, toks, F.array(F.lit(EOS)))


def ngrams_expr(tokens: Column, n: int) -> Column:
    """array<string> of space-joined n-grams of the token array."""
    if n == 1:
        return tokens
    idx = F.sequence(F.lit(0), F.size(tokens) - n)
    return F.when(F.size(tokens) >= n, F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n))
    )).otherwise(F.array().cast("array<string>"))


def ngram_counts(
    df: DataFrame, text_col: str = "text", n: int = 2, pad: bool = True
) -> DataFrame:
    """(gram: string, cnt: bigint) counts of order-n word n-grams.

    r8: positions explode + per-row slice instead of materializing the
    nested array-of-ngrams through interpreted HOF lambdas (the
    count_windows lesson — ~10x on the gram stream); rows shorter than
    ``n`` emit nothing, exactly as ngrams_expr's otherwise-empty arm."""
    toks = padded_tokens(text_col) if pad else tokenize(text_col)
    if n == 1:
        grams = df.select(F.explode(toks).alias("gram"))
    else:
        grams = (
            df.select(toks.alias("_ts"))
            .filter(F.size("_ts") >= n)
            .select(
                "_ts",
                F.explode(
                    F.sequence(F.lit(0), F.size("_ts") - n)
                ).alias("_i"),
            )
            .select(
                F.concat_ws(
                    " ", F.slice("_ts", F.col("_i") + 1, n)
                ).alias("gram")
            )
        )
    return grams.groupBy("gram").agg(
        F.count("*").cast("long").alias("cnt")
    )


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) unigram counts — the vocab/type-count operator (A10/S7)."""
    return (
        df.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def ngram_counts_sql(
    text_expr: str, table: str, n: int = 2, pad: bool = True
) -> str:
    """DuckDB twin of :func:`ngram_counts`."""
    toks = (
        f"list_filter(regexp_split_to_array(coalesce({text_expr}, ''), "
        f"'[\\x00\\t\\n\\r ]+'), t -> t <> '')"
    )
    if pad:
        toks = f"list_prepend('<s>', list_append({toks}, '</s>'))"
    return f"""
WITH docs AS (SELECT {toks} AS ts FROM {table}),
pos AS (
  SELECT ts, unnest(generate_series(1, len(ts) - {n - 1})) AS i
  FROM docs WHERE len(ts) >= {n}
)
SELECT array_to_string(list_slice(ts, i, i + {n - 1}), ' ') AS gram,
       CAST(count(*) AS BIGINT) AS cnt
FROM pos GROUP BY gram
"""
