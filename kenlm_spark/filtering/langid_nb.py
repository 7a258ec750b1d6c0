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
    from kenlm_spark.session import checkpoint_disk

    counts = checkpoint_disk(
        _tri_counts(docs, label_col, text_col, "string")
        .groupBy(F.col("key").alias("lang"), "tri")
        .agg(F.sum("cnt").alias("c"))
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
    """(id, lang_nb): argmax_lang [prior + Σ_seen w + n_in_vocab·penalty].

    r8 shape (guide §2.3 — generate/aggregate fewer rows): the r6 form
    joined (doc, distinct-trigram) rows against the (tri, lang, w) table,
    exploding to one row per (doc, trigram, LANGUAGE) before an
    (id, lang)-keyed aggregation — ×|langs| row volume through the hash
    aggregate, then a corpus-scale Window for the argmax.  The language
    set is tiny and known (it IS the priors table), so instead the
    weight table pivots to ONE row per trigram carrying the per-language
    weight vector (an absent (tri, lang) pair coalesces to that
    language's add-one penalty — the same unseen-trigram charge the old
    ``n_iv − n_seen`` bookkeeping applied), the pivot broadcasts, and
    one |langs|-column partial aggregation per document computes every
    language's sum directly:

        score_l = logp_l + Σ_tri cnt·(w(tri,l) if seen else penalty_l)

    — algebraically the r6 formula, refactored.  The argmax (ties to the
    lexicographically smallest language, as before) is a greatest() +
    first-match CASE, no Window.  The priors collect driver-side
    (≤|langs| rows; that one tiny action replaces the corpus-scale
    crossJoin grid)."""
    prior_rows = sorted(
        (r["lang"], float(r["logp"]), float(r["penalty"]))
        for r in priors.collect()
    )
    if not prior_rows:
        # empty training set degrades to the sentinel (as before)
        return docs.select(
            F.col(id_col).alias("id"), F.lit("und").alias("lang_nb")
        )
    langs = [lang for lang, _, _ in prior_rows]
    max_logp = max(logp for _, logp, _ in prior_rows)
    fallback = min(t for t in prior_rows if t[1] == max_logp)[0]
    wvec = weights.groupBy("tri").agg(
        *[
            F.max(F.when(F.col("lang") == lang, F.col("w"))).alias(f"_w{i}")
            for i, lang in enumerate(langs)
        ]
    )
    wvec = wvec.select(
        "tri",
        *[
            F.coalesce(F.col(f"_w{i}"), F.lit(pen)).alias(f"_w{i}")
            for i, (_, _, pen) in enumerate(prior_rows)
        ],
    )
    # distinct trigrams per doc with multiplicities in one map-only pass;
    # out-of-vocabulary trigrams drop at the broadcast join (they affect
    # no language)
    dtri = _tri_counts(docs, id_col, text_col, "long").withColumnRenamed(
        "key", "id"
    )
    sums = (
        dtri.join(F.broadcast(wvec), "tri")
        .groupBy("id")
        .agg(
            *[
                F.sum(F.col("cnt") * F.col(f"_w{i}")).alias(f"_s{i}")
                for i in range(len(langs))
            ]
        )
    )
    scored = sums.select(
        "id",
        *[
            (F.lit(logp) + F.col(f"_s{i}")).alias(f"_sc{i}")
            for i, (_, logp, _) in enumerate(prior_rows)
        ],
    )
    sc = [F.col(f"_sc{i}") for i in range(len(langs))]
    best_score = F.greatest(*sc) if len(langs) > 1 else sc[0]
    pred = F.lit(None).cast("string")
    # build the CASE in reverse so the smallest language wins score ties
    for i in range(len(langs) - 1, -1, -1):
        pred = F.when(sc[i] == best_score, F.lit(langs[i])).otherwise(pred)
    best = scored.select("id", pred.alias("lang_nb"))
    # docs with zero in-vocab trigrams (no sums row): most frequent
    # language (max prior, ties to the smallest code — as before)
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(best, "id", "left")
        .select(
            "id",
            F.coalesce("lang_nb", F.lit(fallback)).alias("lang_nb"),
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
