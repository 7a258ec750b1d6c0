"""Heuristic caption-quality metrics and rules as Catalyst expressions.

These are the "quality heuristics" stage of the north rule (SURVEY.md §2.2
P9): no reference analog, so the rule set follows common web-corpus
filtering practice (C4/Gopher-style length, character-class and repetition
rules). Everything is a column expression — predicate pushdown, codegen and
column pruning stay intact; a SQL twin (``quality_sql_exprs``) feeds the
DuckDB oracle.

All ratios are single divisions of integer counts, so Spark and the oracle
compute bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kenlm_spark.functions.text import TOKEN_DELIMS_RE, tokenize

# Default thresholds for the keep decision.
DEFAULTS = {
    "min_tokens": 3,
    "max_tokens": 128,
    "min_mean_token_len": 2.0,
    "max_mean_token_len": 12.0,
    "min_alpha_ratio": 0.5,
    "max_digit_ratio": 0.2,
    "max_upper_ratio": 0.5,
    "max_token_len": 30,
    "min_distinct_ratio": 0.4,
}


def quality_metric_exprs(text_col: Column | str) -> dict[str, Column]:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    c = F.coalesce(c, F.lit(""))
    toks = tokenize(c)
    n_tokens = F.size(toks)
    n_chars = F.length(c)
    alpha = F.length(F.regexp_replace(c, "[^a-zA-Z]", ""))
    digit = F.length(F.regexp_replace(c, "[^0-9]", ""))
    upper = F.length(F.regexp_replace(c, "[^A-Z]", ""))
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    safe_n = F.greatest(n_tokens, F.lit(1))
    safe_c = F.greatest(n_chars, F.lit(1))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": tok_chars.cast("double") / safe_n,
        "alpha_ratio": alpha.cast("double") / safe_c,
        "digit_ratio": digit.cast("double") / safe_c,
        "upper_ratio": upper.cast("double") / safe_c,
        "max_token_len": F.coalesce(
            F.array_max(F.transform(toks, F.length)), F.lit(0)
        ),
        "distinct_ratio": F.size(F.array_distinct(F.transform(toks, F.lower))).cast(
            "double"
        )
        / safe_n,
    }


def quality_pass_expr(metrics: dict[str, Column], cfg: dict | None = None) -> Column:
    t = dict(DEFAULTS, **(cfg or {}))
    return (
        (metrics["n_tokens"] >= t["min_tokens"])
        & (metrics["n_tokens"] <= t["max_tokens"])
        & (metrics["mean_token_len"] >= t["min_mean_token_len"])
        & (metrics["mean_token_len"] <= t["max_mean_token_len"])
        & (metrics["alpha_ratio"] >= t["min_alpha_ratio"])
        & (metrics["digit_ratio"] <= t["max_digit_ratio"])
        & (metrics["upper_ratio"] <= t["max_upper_ratio"])
        & (metrics["max_token_len"] <= t["max_token_len"])
        & (metrics["distinct_ratio"] >= t["min_distinct_ratio"])
    )


def with_quality_metrics(
    df: DataFrame, text_col: str = "caption", cfg: dict | None = None
) -> DataFrame:
    m = quality_metric_exprs(text_col)
    for name, col in m.items():
        df = df.withColumn(name, col)
    return df.withColumn("quality_pass", quality_pass_expr(m, cfg))


# --------------------------------------------------------------------- SQL

def _sql_toks(text_expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(coalesce({text_expr}, ''), "
        f"'{TOKEN_DELIMS_RE}'), t -> t <> '')"
    )


def quality_sql_exprs(text_expr: str) -> dict[str, str]:
    """DuckDB twins, same names as :func:`quality_metric_exprs`."""
    c = f"coalesce({text_expr}, '')"
    toks = _sql_toks(text_expr)
    n_tokens = f"len({toks})"
    n_chars = f"length({c})"
    safe_n = f"greatest({n_tokens}, 1)"
    safe_c = f"greatest({n_chars}, 1)"
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": (
            f"CAST(coalesce(list_sum(list_transform({toks}, t -> length(t))), 0) "
            f"AS DOUBLE) / {safe_n}"
        ),
        "alpha_ratio": f"CAST(length(regexp_replace({c}, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / {safe_c}",
        "digit_ratio": f"CAST(length(regexp_replace({c}, '[^0-9]', '', 'g')) AS DOUBLE) / {safe_c}",
        "upper_ratio": f"CAST(length(regexp_replace({c}, '[^A-Z]', '', 'g')) AS DOUBLE) / {safe_c}",
        "max_token_len": f"coalesce(list_max(list_transform({toks}, t -> length(t))), 0)",
        "distinct_ratio": (
            f"CAST(len(list_distinct(list_transform({toks}, t -> lower(t)))) "
            f"AS DOUBLE) / {safe_n}"
        ),
    }


def quality_pass_sql(text_expr: str, cfg: dict | None = None) -> str:
    t = dict(DEFAULTS, **(cfg or {}))
    m = quality_sql_exprs(text_expr)
    return (
        f"(({m['n_tokens']}) >= {t['min_tokens']} AND ({m['n_tokens']}) <= {t['max_tokens']}"
        f" AND ({m['mean_token_len']}) >= {t['min_mean_token_len']}"
        f" AND ({m['mean_token_len']}) <= {t['max_mean_token_len']}"
        f" AND ({m['alpha_ratio']}) >= {t['min_alpha_ratio']}"
        f" AND ({m['digit_ratio']}) <= {t['max_digit_ratio']}"
        f" AND ({m['upper_ratio']}) <= {t['max_upper_ratio']}"
        f" AND ({m['max_token_len']}) <= {t['max_token_len']}"
        f" AND ({m['distinct_ratio']}) >= {t['min_distinct_ratio']})"
    )
