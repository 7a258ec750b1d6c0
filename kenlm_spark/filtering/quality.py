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


# -------------------------------------------------- repetition (Gopher-style)


def repetition_metric_exprs(text_col: Column | str) -> dict[str, Column]:
    """Gopher-rule repetition signals (Rae et al. 2021 §A1.1 "repetition
    removal"), per document, as pure Catalyst expressions:

    * ``dup_line_ratio`` — 1 − distinct/total over newline-split lines
      (0 for single-line docs);
    * ``top_word_ratio`` — occurrences of the most frequent (lowercased)
      token / n_tokens;
    * ``top_bigram_ratio`` — occurrences of the most frequent word
      bigram / bigram count.

    Mode frequency = the longest equal run of the SORTED array, computed
    with one O(n) ``aggregate`` fold (the O(distinct × n)
    count-each-distinct formulation benched 30× slower on sf0.1
    documents). The DuckDB twin keeps the direct mode-count
    formulation — both are exact integer counts, so they agree."""
    c = F.coalesce(
        F.col(text_col) if isinstance(text_col, str) else text_col, F.lit("")
    )
    lines = F.array_remove(
        F.transform(F.split(c, "\n"), lambda s: F.trim(s)), ""
    )
    n_lines = F.size(lines)
    safe_lines = F.greatest(n_lines, F.lit(1))
    toks = F.array_remove(F.split(F.lower(c), _DELIM + "+"), "")
    n_toks = F.size(toks)
    safe_toks = F.greatest(n_toks, F.lit(1))

    def mode_count(arr: Column) -> Column:
        # longest equal run of the sorted array == max element frequency
        init = F.struct(
            F.lit(" not a token ").alias("p"),
            F.lit(0).alias("r"),
            F.lit(0).alias("b"),
        )

        def step(acc, x):
            run = F.when(x == acc["p"], acc["r"] + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("p"), run.alias("r"),
                F.greatest(acc["b"], run).alias("b"),
            )

        return F.aggregate(
            F.array_sort(arr), init, step, lambda acc: acc["b"]
        )

    bigrams = F.when(
        n_toks >= 2,
        F.transform(
            F.sequence(F.lit(1), n_toks - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_bi = F.size(bigrams)
    safe_bi = F.greatest(n_bi, F.lit(1))
    return {
        "dup_line_ratio": (
            (n_lines - F.size(F.array_distinct(lines))).cast("double")
            / safe_lines
        ),
        "top_word_ratio": mode_count(toks).cast("double") / safe_toks,
        "top_bigram_ratio": mode_count(bigrams).cast("double") / safe_bi,
    }


def repetition_sql_query(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`repetition_metric_exprs` as a full query
    (id, dup_line_ratio, top_word_ratio, top_bigram_ratio). Mode counts
    via unnest + GROUP BY (the lambda-per-distinct-token formulation is
    quadratic and minutes-slow on sf0.1) — integer counts and single
    divisions, so values match the Spark side bitwise."""
    c = f"coalesce({text_col}, '')"
    toks = (
        f"list_filter(regexp_split_to_array(lower({c}), '{_DELIM}+'), "
        f"t -> t <> '')"
    )
    lines = (
        f"list_filter(list_transform(regexp_split_to_array({c}, '\n'), "
        f"s -> trim(s)), s -> s <> '')"
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {toks} AS toks, {lines} AS lines FROM {table}
),
tok AS (SELECT id, unnest(toks) AS t FROM base),
wfreq AS (
  SELECT id, MAX(c) AS mw FROM (
    SELECT id, t, count(*) AS c FROM tok GROUP BY id, t
  ) GROUP BY id
),
bigr AS (
  SELECT id, toks[i] || ' ' || toks[i + 1] AS b
  FROM (
    SELECT id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
    FROM base WHERE len(toks) >= 2
  )
),
bfreq AS (
  SELECT id, MAX(c) AS mb FROM (
    SELECT id, b, count(*) AS c FROM bigr GROUP BY id, b
  ) GROUP BY id
)
SELECT base.id AS {id_col},
       round(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
             / greatest(len(lines), 1), 6) AS dup_line_ratio,
       round(CAST(coalesce(w.mw, 0) AS DOUBLE)
             / greatest(len(toks), 1), 6) AS top_word_ratio,
       round(CAST(coalesce(bf.mb, 0) AS DOUBLE)
             / greatest(len(toks) - 1, 1), 6) AS top_bigram_ratio
FROM base
LEFT JOIN wfreq w ON w.id = base.id
LEFT JOIN bfreq bf ON bf.id = base.id
"""


def repetition_metrics_frame(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(id, dup_line_ratio, top_word_ratio, top_bigram_ratio) — the
    :func:`repetition_metric_exprs` signals as ONE Arrow pass (r8).

    The Catalyst formulation sorts each token/bigram array and runs an
    interpreted aggregate fold per metric (HOFs are CodegenFallback), at
    ~130µs/doc; a Counter per row computes the same exact integer mode
    counts ~5× cheaper — the `_tri_counts`/minhash precedent.  Values
    are bit-identical: identical tokenization (PY_TOKEN_RE == the
    Catalyst delimiter class, trim == strip(' ')), exact integer counts,
    and the same single int→double divisions; the entry query applies
    the shared round(…, 6) on top, unchanged."""
    import pandas as pd

    from kenlm_spark.functions.text import PY_TOKEN_RE

    def run(pdfs):
        from collections import Counter

        for pdf in pdfs:
            ids, dl, tw, tb = [], [], [], []
            texts = pdf[text_col].fillna("")
            for did, text in zip(pdf[id_col], texts):
                lines = [
                    s for s in (x.strip(" ") for x in text.split("\n")) if s
                ]
                n_lines = len(lines)
                toks = [t for t in PY_TOKEN_RE.split(text.lower()) if t]
                n_toks = len(toks)
                mw = max(Counter(toks).values()) if toks else 0
                bigrams = [
                    toks[i] + " " + toks[i + 1] for i in range(n_toks - 1)
                ]
                mb = max(Counter(bigrams).values()) if bigrams else 0
                ids.append(did)
                dl.append(
                    float(n_lines - len(set(lines))) / max(n_lines, 1)
                )
                tw.append(float(mw) / max(n_toks, 1))
                tb.append(float(mb) / max(len(bigrams), 1))
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "dup_line_ratio": pd.Series(dl, dtype="float64"),
                    "top_word_ratio": pd.Series(tw, dtype="float64"),
                    "top_bigram_ratio": pd.Series(tb, dtype="float64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run,
        "id long, dup_line_ratio double, top_word_ratio double, "
        "top_bigram_ratio double",
    )
