"""Phrase filter (SURVEY.md §2.2 P4).

Reference: /root/reference/lm/filter/phrase.hh:130-158 — keep an n-gram iff
it can be assembled from whitelisted phrases: a (possibly partial) phrase
suffix at the left edge, whole phrases in the middle, a (possibly partial)
phrase prefix at the right edge. The reference runs a substring automaton
per sentence; here the phrase set is broadcast and a short
dynamic-program runs per n-gram inside an Arrow-batched UDF (n-grams are
≤ a few words, so the DP is O(n · |matching phrases|) with a prefix index).

This is the one operator where a UDF genuinely beats relational form: the
coverage predicate is a chain DP, not an equi-join.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
from pyspark.sql import DataFrame


def _build_index(phrases: list[list[str]]):
    """first-word -> phrases, plus the set of all phrase tuples."""
    by_first = defaultdict(list)
    for p in phrases:
        if p:
            by_first[p[0]].append(tuple(p))
    return by_first, {tuple(p) for p in phrases}


def covers(words: list[str], by_first, phrase_set) -> bool:
    """True iff ``words`` is coverable per the reference's edge rules."""
    n = len(words)
    if n == 0:
        return True
    reach = [False] * (n + 1)
    # Left edge: any phrase SUFFIX matching a prefix of words.
    for p in phrase_set:
        for k in range(1, len(p) + 1):
            suf = p[len(p) - k :]
            if k <= n and tuple(words[:k]) == suf:
                reach[k] = True
            # whole n-gram strictly inside one phrase
            if k >= n:
                for off in range(len(p) - n + 1):
                    if tuple(words) == p[off : off + n]:
                        return True
    # Middle: whole phrases.
    for i in range(1, n + 1):
        if not reach[i]:
            continue
        if i == n:
            return True
        for p in by_first.get(words[i], ()):  # noqa: B905
            L = len(p)
            if i + L <= n and tuple(words[i : i + L]) == p:
                reach[i + L] = True
            # Right edge: phrase PREFIX covering the tail.
            if i + L > n and tuple(words[i:n]) == p[: n - i]:
                reach[n] = True
    return reach[n]


def phrase_filter_sql(ng_cte: str, phrases: list[list[str]]) -> str:
    """DuckDB twin of the coverage DP (independent implementation): left
    edge = gram prefix matching a phrase SUFFIX; middle steps consume
    whole phrases via a recursive CTE; right edge = tail matching a
    phrase PREFIX; plus the whole-gram-inside-one-phrase case.

    ``ng_cte`` must define ``ng(ord, gram)``.
    """
    max_len = max(len(p) for p in phrases)
    vals = ", ".join(
        "([" + ", ".join("'" + w.replace("'", "''") + "'" for w in p) + "])"
        for p in phrases
    )
    return f"""
WITH RECURSIVE {ng_cte},
grams AS (
  SELECT ord, gram, string_split(gram, ' ') AS w FROM ng
),
phr(p) AS (VALUES {vals}),
base AS (
  SELECT g.ord, g.gram, k.k AS pos
  FROM grams g, phr p,
       (SELECT unnest(generate_series(1, {max_len})) AS k) k
  WHERE k.k <= len(g.w) AND k.k <= len(p.p)
    AND g.w[1:k.k] = p.p[len(p.p)-k.k+1:len(p.p)]
),
reach(ord, gram, pos) AS (
  SELECT ord, gram, pos FROM base
  UNION
  SELECT r.ord, r.gram,
         CASE WHEN r.pos + len(p.p) <= len(g.w) THEN r.pos + len(p.p)
              ELSE len(g.w) END AS pos
  FROM reach r
  JOIN grams g ON g.ord = r.ord AND g.gram = r.gram, phr p
  WHERE r.pos < len(g.w) AND (
    (r.pos + len(p.p) <= len(g.w) AND g.w[r.pos+1:r.pos+len(p.p)] = p.p)
    OR
    (r.pos + len(p.p) > len(g.w)
     AND g.w[r.pos+1:len(g.w)] = p.p[1:len(g.w)-r.pos])
  )
),
inside AS (
  SELECT g.ord, g.gram FROM grams g, phr p,
       (SELECT unnest(generate_series(0, {max_len})) AS o) o
  WHERE len(g.w) <= len(p.p) AND o.o <= len(p.p) - len(g.w)
    AND p.p[o.o+1:o.o+len(g.w)] = g.w
)
SELECT ord, gram FROM inside
UNION
SELECT DISTINCT r.ord, r.gram
FROM reach r JOIN grams g ON g.ord = r.ord AND g.gram = r.gram
WHERE r.pos = len(g.w)
"""


def phrase_filter(
    ngrams: DataFrame, phrases: list[list[str]], words_col: str = "words"
) -> DataFrame:
    """Keep n-grams coverable from the (broadcast) phrase set."""
    spark = ngrams.sparkSession
    bc = spark.sparkContext.broadcast(phrases)
    cols = ngrams.columns

    def run(batches):
        by_first, phrase_set = _build_index(bc.value)
        for pdf in batches:
            mask = [
                covers(list(ws), by_first, phrase_set) for ws in pdf[words_col]
            ]
            yield pdf[pd.Series(mask, index=pdf.index)]

    return ngrams.mapInPandas(run, ngrams.schema).select(*cols)
