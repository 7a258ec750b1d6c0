"""Heuristic language identification as pure Catalyst expressions.

A fastText-style classifier needs model weights we cannot ship, so the
engine's default language-ID is a deterministic stopword-profile classifier
(common function-word hit counting — the classical n-gram/profile approach of
Cavnar & Trenkle 1994) expressed entirely in Catalyst: no Python on the hot
path, fully pushdown-friendly, and SQL-translatable so the DuckDB oracle can
verify it. A real fastText model can be slotted in through
:class:`kenlm_spark.pipeline.FilterConfig` (``langid_udf``) when the library
and weights are available.

Decision rule (deterministic, integer arithmetic only):
  hits(lang) = #tokens (lowercased) in STOPWORDS[lang]
  best = max over langs; predict 'und' if best == 0 or 10*best < n_tokens,
  else the first language in LANG_PRIORITY achieving ``best``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kenlm_spark.functions.text import tokenize

# Small public function-word profiles. Order of LANG_PRIORITY is the
# deterministic tie-break.
STOPWORDS: dict[str, list[str]] = {
    "en": "the a an and of to in is on with for it this that was as at by are be".split(),
    "de": "der die das und ist ein eine mit von zu auf nicht im den dem des als auch".split(),
    "fr": "le la les et un une est dans pour que qui au du sur pas je vous avec ce".split(),
    "es": "el los las y un una es en que por para con del no se su al lo como".split(),
    "it": "il lo gli di un una che per con non si sono della nel alla più".split(),
    "pt": "o os um uma é em para com do da não os uma mais foi são pelo".split(),
    "nl": "de het een en van is op met voor niet aan bij ook naar uit zijn".split(),
}
LANG_PRIORITY = ["en", "de", "fr", "es", "it", "pt", "nl"]


def _hits(tokens_lower: Column, words: list[str]) -> Column:
    wl = F.lit(sorted(set(words)))
    return F.size(F.filter(tokens_lower, lambda t: F.array_contains(wl, t)))


def lang_expr(text_col: Column | str) -> Column:
    """Predicted language code for a text column (Catalyst only)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.transform(tokenize(c), F.lower)
    n = F.size(toks)
    hit_cols = {lang: _hits(toks, STOPWORDS[lang]) for lang in LANG_PRIORITY}
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
    toks = (
        "list_filter(list_transform("
        f"regexp_split_to_array({text_expr}, '[\\x00\\t\\n\\r ]+'), t -> lower(t)), "
        "t -> t <> '')"
    )
    hit_exprs = {}
    for lang in LANG_PRIORITY:
        words = ", ".join(f"'{w}'" for w in sorted(set(STOPWORDS[lang])))
        hit_exprs[lang] = (
            f"len(list_filter({toks}, t -> list_contains([{words}], t)))"
        )
    best = "greatest(" + ", ".join(hit_exprs.values()) + ")"
    n = f"len({toks})"
    case = "CASE "
    case += f"WHEN {best} = 0 OR {best} * 10 < {n} THEN 'und' "
    for lang in LANG_PRIORITY:
        case += f"WHEN {hit_exprs[lang]} = {best} THEN '{lang}' "
    case += "ELSE 'und' END"
    return case


def py_lang(text: str) -> str:
    """Pure-Python twin used as the row-by-row reference in tests."""
    import re

    toks = [t.lower() for t in re.split("[\x00\t\n\r ]+", text or "") if t]
    hits = {
        lang: sum(1 for t in toks if t in set(STOPWORDS[lang]))
        for lang in LANG_PRIORITY
    }
    best = max(hits.values()) if hits else 0
    if best == 0 or best * 10 < len(toks):
        return "und"
    for lang in LANG_PRIORITY:
        if hits[lang] == best:
            return lang
    return "und"
