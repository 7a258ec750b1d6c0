"""Heuristic caption-quality metrics and rules as Catalyst expressions.

These are the "quality heuristics" stage of the north rule (SURVEY.md §2.2
P9): no reference analog, so the rule set follows common web-corpus
filtering practice (C4/Gopher-style length, character-class and repetition
rules). A SQL twin (``quality_sql_exprs``) feeds the DuckDB oracle.

Implementation note (measured): all character-class counters are
``regexp_count`` — a streaming scan with no intermediate string — because
``regexp_replace``+``length`` variants allocated enough garbage that the
stage stopped scaling past 8 local cores. The only array op left is the
distinct-token ratio (one tokenize + array_distinct).

All ratios are single divisions of integer counts, so Spark and the oracle
compute bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kenlm_spark.functions.text import tokenize

# Default thresholds for the keep decision.
DEFAULTS = {
    "min_tokens": 3,
    "max_tokens": 128,
    "min_mean_token_len": 2.0,
    "max_mean_token_len": 12.0,
    "min_alpha_ratio": 0.5,
    "max_digit_ratio": 0.2,
    "max_upper_ratio": 0.5,
    "long_token_limit": 30,
    "min_distinct_ratio": 0.4,
}

_DELIM = "[\\x00\\t\\n\\r ]"
_NONDELIM_RUN = "[^\\x00\\t\\n\\r ]+"


def quality_metric_exprs(text_col: Column | str, cfg: dict | None = None) -> dict[str, Column]:
    t = dict(DEFAULTS, **(cfg or {}))
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    c = F.coalesce(c, F.lit(""))
    n_tokens = F.regexp_count(c, F.lit(_NONDELIM_RUN))
    n_chars = F.length(c)
    alpha = F.regexp_count(c, F.lit("[a-zA-Z]"))
    digit = F.regexp_count(c, F.lit("[0-9]"))
    upper = F.regexp_count(c, F.lit("[A-Z]"))
    # Total token characters == non-delimiter characters.
    tok_chars = n_chars - F.regexp_count(c, F.lit(_DELIM))
    safe_n = F.greatest(n_tokens, F.lit(1))
    safe_c = F.greatest(n_chars, F.lit(1))
    long_pat = "[^\\x00\\t\\n\\r ]{" + str(t["long_token_limit"] + 1) + "}"
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": tok_chars.cast("double") / safe_n,
        "alpha_ratio": alpha.cast("double") / safe_c,
        "digit_ratio": digit.cast("double") / safe_c,
        "upper_ratio": upper.cast("double") / safe_c,
        "has_long_token": c.rlike(long_pat),
        "distinct_ratio": F.size(F.array_distinct(tokenize(F.lower(c)))).cast(
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
        & (~metrics["has_long_token"])
        & (metrics["distinct_ratio"] >= t["min_distinct_ratio"])
    )


def with_quality_metrics(
    df: DataFrame, text_col: str = "caption", cfg: dict | None = None
) -> DataFrame:
    m = quality_metric_exprs(text_col, cfg)
    for name, col in m.items():
        df = df.withColumn(name, col)
    return df.withColumn("quality_pass", quality_pass_expr(m, cfg))


# --------------------------------------------------------------------- SQL

def _sql_toks(text_expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(coalesce({text_expr}, ''), "
        f"'{_DELIM}+'), t -> t <> '')"
    )


def quality_sql_exprs(text_expr: str, cfg: dict | None = None) -> dict[str, str]:
    """DuckDB twins, same names as :func:`quality_metric_exprs`."""
    t = dict(DEFAULTS, **(cfg or {}))
    c = f"coalesce({text_expr}, '')"
    toks_lower = _sql_toks(f"lower({text_expr})")
    n_tokens = f"len(regexp_extract_all({c}, '{_NONDELIM_RUN}'))"
    n_chars = f"length({c})"
    safe_n = f"greatest({n_tokens}, 1)"
    safe_c = f"greatest({n_chars}, 1)"
    tok_chars = f"({n_chars} - len(regexp_extract_all({c}, '{_DELIM}')))"
    long_pat = "[^\\x00\\t\\n\\r ]{" + str(t["long_token_limit"] + 1) + "}"
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": f"CAST({tok_chars} AS DOUBLE) / {safe_n}",
        "alpha_ratio": f"CAST(len(regexp_extract_all({c}, '[a-zA-Z]')) AS DOUBLE) / {safe_c}",
        "digit_ratio": f"CAST(len(regexp_extract_all({c}, '[0-9]')) AS DOUBLE) / {safe_c}",
        "upper_ratio": f"CAST(len(regexp_extract_all({c}, '[A-Z]')) AS DOUBLE) / {safe_c}",
        "has_long_token": f"regexp_matches({c}, '{long_pat}')",
        "distinct_ratio": (
            f"CAST(len(list_distinct({toks_lower})) AS DOUBLE) / {safe_n}"
        ),
    }


def quality_pass_sql(text_expr: str, cfg: dict | None = None) -> str:
    t = dict(DEFAULTS, **(cfg or {}))
    m = quality_sql_exprs(text_expr, cfg)
    return (
        f"(({m['n_tokens']}) >= {t['min_tokens']} AND ({m['n_tokens']}) <= {t['max_tokens']}"
        f" AND ({m['mean_token_len']}) >= {t['min_mean_token_len']}"
        f" AND ({m['mean_token_len']}) <= {t['max_mean_token_len']}"
        f" AND ({m['alpha_ratio']}) >= {t['min_alpha_ratio']}"
        f" AND ({m['digit_ratio']}) <= {t['max_digit_ratio']}"
        f" AND ({m['upper_ratio']}) <= {t['max_upper_ratio']}"
        f" AND NOT ({m['has_long_token']})"
        f" AND ({m['distinct_ratio']}) >= {t['min_distinct_ratio']})"
    )
