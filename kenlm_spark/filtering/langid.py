"""Heuristic language identification as pure Catalyst expressions.

A fastText-style classifier needs model weights we cannot ship, so the
engine's default language-ID is a deterministic stopword-profile classifier
(function-word occurrence counting — the classical profile approach of
Cavnar & Trenkle 1994) expressed entirely in Catalyst: no Python on the hot
path, pushdown-friendly, and SQL-translatable so the DuckDB oracle can
verify it. A real fastText model can be slotted in through
:class:`kenlm_spark.pipeline.FilterConfig` when the library and weights are
available.

Implementation note (measured on local[8] vs local[32]): the hit counters
are ``regexp_count`` over a word-boundary alternation — one streaming scan
per language, no intermediate arrays/strings. Earlier variants
(higher-order-function lambdas, array_intersect) allocated enough JVM
garbage that multi-core scaling collapsed; regexp_count variants run 2-6x
faster and scale. Stopword lists are ASCII-only because ``\\b`` is
ASCII-word-based in both Java regex and RE2 — accented words would never
match the boundary.

Decision rule (deterministic, integer arithmetic only):
  hits(lang) = #occurrences of ``lang`` stopwords (word-bounded, lowercased)
  best = max over langs; predict 'und' if best == 0 or 10*best < n_tokens,
  else the first language in LANG_PRIORITY achieving ``best``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small public function-word profiles (ASCII only; see module docstring).
# Order of LANG_PRIORITY is the deterministic tie-break.
STOPWORDS: dict[str, list[str]] = {
    "en": "the a an and of to in is on with for it this that was as at by are be".split(),
    "de": "der die das und ist ein eine mit von zu auf nicht im den dem des als auch".split(),
    "fr": "le la les et un une est dans pour que qui au du sur pas je vous avec ce".split(),
    "es": "el los las y un una es en que por para con del no se su al lo como".split(),
    "it": "il lo gli di un una che per con non si sono della nel alla dei".split(),
    "pt": "o os um uma em para com do da mais foi sao pelo na nos".split(),
    "nl": "de het een en van is op met voor niet aan bij ook naar uit zijn".split(),
}
LANG_PRIORITY = ["en", "de", "fr", "es", "it", "pt", "nl"]

#: Matches one-or-more reference delimiters (token separator).
_NONDELIM = "[^\\x00\\t\\n\\r ]+"


def _pattern(lang: str) -> str:
    return "\\b(" + "|".join(sorted(set(STOPWORDS[lang]))) + ")\\b"


def lang_expr(text_col: Column | str) -> Column:
    """Predicted language code for a text column (Catalyst only)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    low = F.lower(F.coalesce(c, F.lit("")))
    n = F.regexp_count(low, F.lit(_NONDELIM))
    hit_cols = {
        lang: F.regexp_count(low, F.lit(_pattern(lang))) for lang in LANG_PRIORITY
    }
    best = F.greatest(*hit_cols.values())
    pred = F.lit("und")
    # Build the CASE in reverse so earlier languages win ties.
    for lang in reversed(LANG_PRIORITY):
        pred = F.when(hit_cols[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when((best == 0) | (best * 10 < n), F.lit("und")).otherwise(pred)


def with_langid(df: DataFrame, text_col: str = "caption", out_col: str = "lang_pred") -> DataFrame:
    return df.withColumn(out_col, lang_expr(text_col))


def lang_sql(text_expr: str) -> str:
    """DuckDB SQL twin of :func:`lang_expr` for the correctness oracle."""
    low = f"lower(coalesce({text_expr}, ''))"
    n = f"len(regexp_extract_all({low}, '{_NONDELIM}'))"
    hit_exprs = {
        lang: f"len(regexp_extract_all({low}, '{_pattern(lang)}'))"
        for lang in LANG_PRIORITY
    }
    best = "greatest(" + ", ".join(hit_exprs.values()) + ")"
    case = "CASE "
    case += f"WHEN {best} = 0 OR {best} * 10 < {n} THEN 'und' "
    for lang in LANG_PRIORITY:
        case += f"WHEN {hit_exprs[lang]} = {best} THEN '{lang}' "
    case += "ELSE 'und' END"
    return case


def py_lang(text: str) -> str:
    """Pure-Python twin used as the row-by-row reference in tests."""
    low = (text or "").lower()
    n = len(re.findall(_NONDELIM, low))
    hits = {
        lang: len(re.findall(_pattern(lang), low)) for lang in LANG_PRIORITY
    }
    best = max(hits.values()) if hits else 0
    if best == 0 or best * 10 < n:
        return "und"
    for lang in LANG_PRIORITY:
        if hits[lang] == best:
            return lang
    return "und"
