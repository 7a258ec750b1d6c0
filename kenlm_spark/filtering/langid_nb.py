"""Supervised language-ID: character-trigram Naive Bayes TRAINED IN-ENGINE
from a labeled corpus — the fastText-shaped replacement for the stopword
heuristic (fastText itself is absent from this container; like fastText,
this is a linear bag-of-character-n-grams classifier).

Training and inference are both pure relational algebra, so the whole
train→predict path is DuckDB-oracle-checkable AND scales: training is one
explode + groupBy over the labeled corpus (run once, persist the tiny
(trigram, lang, weight) table); inference is an equi-join on trigram + a
per-doc argmax — no Python, no broadcast of Python state.

Model: log-linear NB with add-one smoothing over the global trigram
vocabulary V:

    score(doc, lang) = log prior(lang)
                     + Σ_{t ∈ doc ∩ V} [ log(count(t,lang)+1)
                                         − log(total(lang)+|V|) ]

Trigrams outside V contribute equally to every language and are skipped.
Prediction = argmax score, ties broken by language code (deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kenlm_spark.operators.dedup import _norm_sql, norm_text


def _trigrams(col: Column) -> Column:
    t = norm_text(col)
    return F.when(
        F.length(t) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 2),
            lambda i: t.substr(i, F.lit(3)),
        ),
    ).otherwise(F.array(t))


def _tri_counts(docs: DataFrame, key_col: str, text_col: str, key_type: str) -> DataFrame:
    """(key, tri, cnt): per-row character-trigram counts in ONE Arrow pass
    (map-only). The Catalyst transform(sequence → substr) variant
    allocated a per-row index array and 3M substrings and dominated the
    bench (the HOF-allocation lesson); a Counter per row is ~10x cheaper
    and produces identical integers, so the SQL twin is unaffected."""
    import pandas as pd

    from kenlm_spark.functions.text import PY_TOKEN_RE

    def run(pdfs):
        from collections import Counter

        for pdf in pdfs:
            keys_out, tri_out, cnt_out = [], [], []
            texts = pdf[text_col].fillna("").str.lower()
            for key, raw in zip(pdf[key_col], texts):
                # exactly norm_text: collapse delimiter runs, NO strip
                t = PY_TOKEN_RE.sub(" ", raw)
                grams = (
                    [t[i : i + 3] for i in range(len(t) - 2)]
                    if len(t) >= 3
                    else [t]
                )
                for tri, cnt in Counter(grams).items():
                    keys_out.append(key)
                    tri_out.append(tri)
                    cnt_out.append(cnt)
            yield pd.DataFrame(
                {"key": keys_out, "tri": tri_out, "cnt": cnt_out}
            )

    return docs.select(key_col, text_col).mapInPandas(
        run, f"key {key_type}, tri string, cnt long"
    )


def train_langid_nb(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    label_col: str = "lang",
) -> tuple[DataFrame, DataFrame]:
    """Returns (weights, priors):

    * weights(tri, lang, w) with w = log(count+1) − log(total_lang + |V|)
    * priors(lang, logp, penalty) with penalty = −log(total_lang + |V|)
      (charged per in-vocabulary trigram that a language did NOT see —
      folded in at inference as n_in_vocab·penalty over the seen sum).
    """
    # checkpoint: counts (tiny — distinct (lang, trigram) pairs) feeds the
    # vocab-size count, totals, weights, and priors; without the barrier
    # each consumer re-runs the full corpus pass
    counts = (
        _tri_counts(docs, label_col, text_col, "string")
        .groupBy(F.col("key").alias("lang"), "tri")
        .agg(F.sum("cnt").alias("c"))
        .localCheckpoint(eager=True)
    )
    vocab_size = counts.select("tri").distinct().count()
    totals = counts.groupBy("lang").agg(F.sum("c").alias("total"))
    weights = counts.join(totals, "lang").select(
        "tri",
        "lang",
        (
            F.log(F.col("c") + 1.0)
            - F.log(F.col("total") + F.lit(float(vocab_size)))
        ).alias("w"),
    )
    n_docs = docs.count()
    priors = (
        docs.groupBy(F.col(label_col).alias("lang"))
        .agg(F.count("*").alias("n"))
        .join(totals, "lang")
        .select(
            "lang",
            F.log(F.col("n") / F.lit(float(n_docs))).alias("logp"),
            (-F.log(F.col("total") + F.lit(float(vocab_size)))).alias(
                "penalty"
            ),
        )
    )
    return weights, priors


def predict_langid_nb(
    docs: DataFrame, weights: DataFrame, priors: DataFrame,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(id, lang_nb): argmax_lang [prior + Σ_seen w + n_in_vocab·penalty]."""
    # distinct trigrams per doc with multiplicities in one map-only pass;
    # the weights join then carries one row per (doc, DISTINCT trigram,
    # lang) instead of one per occurrence
    dtri = _tri_counts(docs, id_col, text_col, "long").withColumnRenamed(
        "key", "id"
    )
    vocab = weights.select("tri").distinct()
    in_vocab = dtri.join(vocab, "tri")  # trigrams outside V affect no lang
    n_iv = in_vocab.groupBy("id").agg(F.sum("cnt").alias("n_iv"))

    seen = (
        in_vocab.join(weights, "tri")
        .groupBy("id", "lang")
        .agg(
            F.sum(F.col("cnt") * F.col("w")).alias("sum_w"),
            F.sum("cnt").alias("n_seen"),
        )
    )
    # every doc scores every language: cross the per-doc trigram count
    # with priors, then add the seen-trigram corrections
    grid = n_iv.crossJoin(priors)
    scored = grid.join(seen, ["id", "lang"], "left").select(
        "id",
        "lang",
        (
            F.col("logp")
            + F.coalesce(F.col("sum_w"), F.lit(0.0))
            + (F.col("n_iv") - F.coalesce(F.col("n_seen"), F.lit(0)))
            * F.col("penalty")
        ).alias("score"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("lang"))
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", F.col("lang").alias("lang_nb"))
    )
    # docs with zero in-vocab trigrams: most frequent language (prior).
    # Kept action-free at compose time: the 1-row top-prior is broadcast
    # left-joined on a constant key instead of collected eagerly; an empty
    # training set degrades to the sentinel "und" rather than crashing.
    top_prior = (
        priors.orderBy(F.desc("logp"), F.asc("lang"))
        .limit(1)
        .select(F.lit(1).alias("_k"), F.col("lang").alias("_fallback"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(best, "id", "left")
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(top_prior), "_k", "left")
        .select(
            "id",
            F.coalesce("lang_nb", "_fallback", F.lit("und")).alias("lang_nb"),
        )
    )


def langid_nb_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    label_col: str = "lang",
) -> str:
    """DuckDB twin of train + predict over the same labeled table."""
    tri = (
        f"list_transform(generate_series(1, len({_norm_sql(text_col)}) - 2), "
        f"i -> substring({_norm_sql(text_col)}, i, 3))"
    )
    tri_expr = (
        f"CASE WHEN len({_norm_sql(text_col)}) >= 3 THEN {tri} "
        f"ELSE [{_norm_sql(text_col)}] END"
    )
    return f"""
WITH tri AS (
  SELECT {label_col} AS lang, unnest({tri_expr}) AS tri FROM {table}
),
counts AS (SELECT lang, tri, count(*) AS c FROM tri GROUP BY lang, tri),
vsize AS (SELECT count(DISTINCT tri) AS v FROM counts),
totals AS (SELECT lang, SUM(c) AS total FROM counts GROUP BY lang),
weights AS (
  SELECT c.tri, c.lang, ln(c.c + 1.0) - ln(t.total + v.v) AS w
  FROM counts c JOIN totals t USING (lang) CROSS JOIN vsize v
),
priors AS (
  SELECT d.lang, ln(CAST(d.n AS DOUBLE) / (SELECT count(*) FROM {table})) AS logp,
         -ln(t.total + v.v) AS penalty
  FROM (SELECT {label_col} AS lang, count(*) AS n FROM {table} GROUP BY 1) d
  JOIN totals t USING (lang) CROSS JOIN vsize v
),
dtri AS (
  SELECT id, tri, count(*) AS cnt FROM (
    SELECT {id_col} AS id, unnest({tri_expr}) AS tri FROM {table}
  ) GROUP BY id, tri
),
vocab AS (SELECT DISTINCT tri FROM weights),
iv AS (SELECT d.* FROM dtri d JOIN vocab USING (tri)),
n_iv AS (SELECT id, SUM(cnt) AS n_iv FROM iv GROUP BY id),
seen AS (
  SELECT i.id, w.lang, SUM(i.cnt * w.w) AS sum_w, SUM(i.cnt) AS n_seen
  FROM iv i JOIN weights w USING (tri) GROUP BY i.id, w.lang
),
scored AS (
  SELECT n.id, p.lang,
         p.logp + COALESCE(s.sum_w, 0.0)
         + (n.n_iv - COALESCE(s.n_seen, 0)) * p.penalty AS score
  FROM n_iv n CROSS JOIN priors p
  LEFT JOIN seen s ON s.id = n.id AND s.lang = p.lang
),
best AS (
  SELECT id, lang FROM (
    SELECT *, row_number() OVER (
      PARTITION BY id ORDER BY score DESC, lang ASC) AS rn
    FROM scored
  ) WHERE rn = 1
),
fallback AS (
  SELECT lang FROM priors ORDER BY logp DESC, lang ASC LIMIT 1
)
SELECT t.{id_col} AS id, COALESCE(b.lang, (SELECT lang FROM fallback)) AS lang_nb
FROM {table} t LEFT JOIN best b ON b.id = t.{id_col}
"""
