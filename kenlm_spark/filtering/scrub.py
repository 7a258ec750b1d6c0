"""Regex PII/toxicity scrubbing as a chain of Catalyst ``regexp_replace``.

North-rule stage with no reference analog (SURVEY.md §2.2 P10). The chain
is ordered (URLs before emails before phone-shaped numbers, structured ids
before generic phones) and every pattern is written in the common subset of
Java regex (Spark) and RE2 (DuckDB oracle): no lookaround, no backrefs,
explicit character classes instead of ``\\s``.

Staying in Catalyst means the scrub is codegen'd JVM-side — at 100 TB this
stage is free compared to a Python UDF doing the same work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement) applied in order.
SCRUB_RULES: list[tuple[str, str, str]] = [
    ("url", r"https?://[^ \t\n\r]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("cc", r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b", "<CC>"),
    (
        "phone",
        r"\b\+?[0-9]{0,2}[-. (]*[0-9]{3}[-. )]+[0-9]{3}[-. ][0-9]{4}\b",
        "<PHONE>",
    ),
    (
        "toxicity",
        r"(?i)\b(damn|hell|crap|shit|fuck|fucking|bitch|bastard|asshole|dick)\b",
        "<TOX>",
    ),
]


def scrub_expr(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    c = F.coalesce(c, F.lit(""))
    for _, pattern, repl in SCRUB_RULES:
        c = F.regexp_replace(c, pattern, repl)
    return c


def with_scrubbed(
    df: DataFrame, text_col: str = "caption", out_col: str = "scrubbed_caption"
) -> DataFrame:
    return df.withColumn(out_col, scrub_expr(text_col))


def scrub_sql(text_expr: str) -> str:
    """DuckDB twin: nested regexp_replace(..., 'g') in the same order."""
    expr = f"coalesce({text_expr}, '')"
    for _, pattern, repl in SCRUB_RULES:
        p = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return expr


def py_scrub(text: str) -> str:
    """Pure-Python twin used as the row-by-row reference in tests."""
    import re

    out = text or ""
    for _, pattern, repl in SCRUB_RULES:
        out = re.sub(pattern, repl, out)
    return out
