"""Static interpolation of k backoff models (SURVEY.md §2.3 J8, §2.7 U2).

Reference counterpart: /root/reference/lm/interpolate/ (merge_vocab.cc,
merge_probabilities.cc, normalize.cc) — align models' n-grams, mix
probabilities with weights, renormalize backoffs. This implements the
classical offline (Stolcke-style) static interpolation:

1. union of n-gram sets per order (suffix-closed because each input is);
2. for every union n-gram, evaluate each model's BACKOFF probability
   p_i(w|ctx) (exact same recursion as the scorer: longest match + backoff
   charges), then p_new = log10( Σ λ_i 10^{p_i} );
3. recompute backoff weights so the mixture is a proper model:
   bo(c) = (1 - Σ_{(c,w)∈union} p_new(w|c))
         / (1 - Σ_{(c,w)∈union} p_new(w|suffix(c))), floored at a tiny
   epsilon for handcrafted inputs that aren't perfectly normalized.

Spark shape: per order, two left joins (model hit + context backoff) plus
one join to the previous order's evaluated suffix — the same join cascade
Catalyst would get from the scoring SQL; everything stays an equi-join on
gram keys. At scale the smaller model side broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPS = 1e-10


def interpolate_models(
    models: list[DataFrame], lambdas: list[float], order: int
) -> DataFrame:
    """models: DataFrames (order, words, log10_prob, log10_backoff).

    Returns the mixed model in the same schema (words as gram string).

    r8 join shape: the k input models merge ONCE into a checkpointed
    (ord, gram, _p0.._pk, _b0.._bk) table (union + pivot-style partial
    aggregation — one shuffle, no join), so each per-order evaluation is
    3 joins (hit row, context backoff row, previous-order evals) instead
    of 3·k — the evaluated values per model are the identical
    coalesce(hit, coalesce(bo, 0) + lower) terms, just read from merged
    columns.  With per-order eager checkpoints (still required: without
    them Catalyst re-optimizes an O(order²) join tree per branch —
    re-measured r8: 9.6s total with, 14-15s without) the halved
    stage count cuts each checkpoint job roughly in half."""
    assert abs(sum(lambdas) - 1.0) < 1e-9
    k = len(models)
    spark = models[0].sparkSession

    # Union of model n-grams, CLOSED under suffixes: handcrafted/pruned
    # inputs can have holes (e.g. a 5-gram whose bigram suffix is absent);
    # the reference hallucinates blanks for those (lm/search_hashed.cc:57),
    # we materialize the suffix so the evaluation recursion is total.
    #
    # The recursive per-order definition (union[n] = model grams of order
    # n ∪ length-n suffixes of union[n+1]) telescopes to a closed form —
    # union[n] = {last n words of any model gram of order >= n} — so the
    # whole closure is ONE explode + distinct + checkpoint instead of the
    # r4 chain of `order` eager checkpoint jobs (each a full job at toy
    # size; construction 15.1s → 9.6s on the 105-row bench model, and
    # `order`-1 fewer barriers at any scale).
    allg = models[0].select(F.col("order").alias("m_ord"), "words")
    for m in models[1:]:
        allg = allg.unionByName(
            m.select(F.col("order").alias("m_ord"), "words")
        )
    closure = (
        allg.select(
            "m_ord",
            "words",
            F.explode(F.sequence(F.lit(1), F.col("m_ord"))).alias("s_ord"),
        )
        .select(
            F.col("s_ord").alias("ord"),
            F.concat_ws(
                " ", F.expr("slice(words, m_ord - s_ord + 1, s_ord)")
            ).alias("gram"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    unions: dict[int, DataFrame] = {
        n: closure.filter(F.col("ord") == n).select("gram")
        for n in range(1, order + 1)
    }

    # Merged model table: one row per (ord, gram) carrying every model's
    # prob/backoff column (NULL where a model lacks the gram) — union +
    # max(when) partial aggregation, one shuffle, checkpointed so every
    # per-order join below reads the materialized table.
    allm = None
    for i, m in enumerate(models):
        part = m.select(
            F.col("order").alias("ord"),
            F.concat_ws(" ", "words").alias("gram"),
            F.lit(i).alias("_i"),
            F.col("log10_prob").alias("_p"),
            F.col("log10_backoff").alias("_b"),
        )
        allm = part if allm is None else allm.unionByName(part)
    merged = (
        allm.groupBy("ord", "gram")
        .agg(
            *[
                F.max(F.when(F.col("_i") == i, F.col("_p"))).alias(f"_p{i}")
                for i in range(k)
            ],
            *[
                F.max(F.when(F.col("_i") == i, F.col("_b"))).alias(f"_b{i}")
                for i in range(k)
            ],
        )
        .localCheckpoint(eager=True)
    )
    by_order = {
        n: merged.filter(F.col("ord") == n) for n in range(1, order + 1)
    }

    # unk log-prob per model (missing <unk> → -100, lm/model.cc:121-126),
    # one collect off the checkpointed merged table
    unk_rows = by_order[1].filter(F.col("gram") == "<unk>").collect()
    unk_p = [
        float(unk_rows[0][f"_p{i}"])
        if unk_rows and unk_rows[0][f"_p{i}"] is not None
        else -100.0
        for i in range(k)
    ]

    # Step 2: evaluate each model on the union, order by order.
    evals: dict[int, DataFrame] = {}
    for n in range(1, order + 1):
        cur = unions[n]
        if n == 1:
            cur = cur.join(
                by_order[1].select(
                    "gram", *[F.col(f"_p{i}").alias(f"_hit{i}") for i in range(k)]
                ),
                "gram",
                "left",
            )
            for i in range(k):
                cur = cur.withColumn(
                    f"_e{i}", F.coalesce(F.col(f"_hit{i}"), F.lit(unk_p[i]))
                ).drop(f"_hit{i}")
        else:
            cur = (
                cur.withColumn(
                    "_sfx",
                    F.concat_ws(" ", F.slice(F.split("gram", " "), 2, n - 1)),
                )
                .withColumn(
                    "_ctx",
                    F.concat_ws(" ", F.slice(F.split("gram", " "), 1, n - 1)),
                )
                .join(
                    by_order[n].select(
                        "gram",
                        *[F.col(f"_p{i}").alias(f"_hit{i}") for i in range(k)],
                    ),
                    "gram",
                    "left",
                )
                .join(
                    by_order[n - 1].select(
                        F.col("gram").alias("_ctx"),
                        *[F.col(f"_b{i}").alias(f"_bo{i}") for i in range(k)],
                    ),
                    "_ctx",
                    "left",
                )
                .join(
                    evals[n - 1].select(
                        F.col("gram").alias("_sfx"),
                        *[F.col(f"_e{i}").alias(f"_pl{i}") for i in range(k)],
                    ),
                    "_sfx",
                )
            )
            for i in range(k):
                cur = cur.withColumn(
                    f"_e{i}",
                    F.coalesce(
                        F.col(f"_hit{i}"),
                        F.coalesce(F.col(f"_bo{i}"), F.lit(0.0))
                        + F.col(f"_pl{i}"),
                    ),
                ).drop(f"_hit{i}", f"_bo{i}", f"_pl{i}")
        mix = None
        for i, lam in enumerate(lambdas):
            term = F.lit(lam) * F.pow(F.lit(10.0), F.col(f"_e{i}"))
            mix = term if mix is None else mix + term
        # localCheckpoint truncates the cross-order plan lineage: without it
        # Catalyst re-optimizes an O(order^2)-join tree for every downstream
        # branch (measured: 12.5s of planning on a 105-row model; 0.9s with
        # the checkpoint). Executor-local storage is the right trade for an
        # iterative algorithm's intermediates.
        evals[n] = cur.withColumn("_pnew", F.log10(mix)).localCheckpoint(
            eager=True
        )

    # Step 3: backoff renormalization.
    outs = []
    for n in range(1, order + 1):
        base = evals[n].select("gram", F.col("_pnew").alias("log10_prob"))
        if n < order:
            ext = evals[n + 1].select("_ctx", "_sfx", "_pnew")
            lower = evals[n].select(
                F.col("gram").alias("_sfx"), F.col("_pnew").alias("_plow")
            )
            agg = (
                ext.join(lower, "_sfx")
                .groupBy("_ctx")
                .agg(
                    F.sum(F.pow(F.lit(10.0), F.col("_pnew"))).alias("_shi"),
                    F.sum(F.pow(F.lit(10.0), F.col("_plow"))).alias("_slo"),
                )
                .select(
                    F.col("_ctx").alias("gram"),
                    F.log10(
                        F.greatest(F.lit(1.0) - F.col("_shi"), F.lit(EPS))
                        / F.greatest(F.lit(1.0) - F.col("_slo"), F.lit(EPS))
                    ).alias("log10_backoff"),
                )
            )
            base = base.join(agg, "gram", "left").withColumn(
                "log10_backoff", F.coalesce("log10_backoff", F.lit(0.0))
            )
        else:
            base = base.withColumn("log10_backoff", F.lit(0.0))
        outs.append(
            base.select(
                F.lit(n).alias("ord"),
                "gram",
                F.round("log10_prob", 6).alias("log10_prob"),
                F.round("log10_backoff", 6).alias("log10_backoff"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def interpolate_models_sql(
    cte_a: str, cte_b: str, lam_a: float, lam_b: float, order: int
) -> str:
    """DuckDB twin over two ng CTEs ``nga``/``ngb`` (ord, gram, p, bo)."""
    parts = [cte_a.replace("ng(", "nga(", 1), cte_b.replace("ng(", "ngb(", 1)]
    unk = (
        "unk AS (SELECT "
        "coalesce((SELECT p FROM nga WHERE ord = 1 AND gram = '<unk>'), -100.0) AS ua, "
        "coalesce((SELECT p FROM ngb WHERE ord = 1 AND gram = '<unk>'), -100.0) AS ub)"
    )
    parts.append(unk)
    # Suffix-closed unions, built top-down (u{order} first).
    for n in range(order, 0, -1):
        extra = ""
        if n < order:
            extra = (
                f" UNION SELECT array_to_string(list_slice("
                f"string_split(gram, ' '), 2, {n + 1}), ' ') FROM u{n + 1}"
            )
        parts.append(
            f"u{n} AS (SELECT gram FROM nga WHERE ord = {n} "
            f"UNION SELECT gram FROM ngb WHERE ord = {n}{extra})"
        )
    # Evaluation CTEs, ascending.
    for n in range(1, order + 1):
        if n == 1:
            parts.append(f"""e{n} AS (
  SELECT u.gram,
         coalesce(a.p, k.ua) AS ea,
         coalesce(b.p, k.ub) AS eb,
         log10({lam_a} * pow(10, coalesce(a.p, k.ua))
             + {lam_b} * pow(10, coalesce(b.p, k.ub))) AS pnew
  FROM u{n} u CROSS JOIN unk k
  LEFT JOIN nga a ON a.ord = 1 AND a.gram = u.gram
  LEFT JOIN ngb b ON b.ord = 1 AND b.gram = u.gram
)""")
        else:
            sfx = f"array_to_string(list_slice(string_split(u.gram, ' '), 2, {n}), ' ')"
            ctx = f"array_to_string(list_slice(string_split(u.gram, ' '), 1, {n - 1}), ' ')"
            parts.append(f"""e{n} AS (
  SELECT u.gram,
         {ctx} AS ctx, {sfx} AS sfx,
         coalesce(a.p, coalesce(ba.bo, 0) + pa.ea) AS ea,
         coalesce(b.p, coalesce(bb.bo, 0) + pb.eb) AS eb,
         log10({lam_a} * pow(10, coalesce(a.p, coalesce(ba.bo, 0) + pa.ea))
             + {lam_b} * pow(10, coalesce(b.p, coalesce(bb.bo, 0) + pb.eb))) AS pnew
  FROM u{n} u
  LEFT JOIN nga a ON a.ord = {n} AND a.gram = u.gram
  LEFT JOIN ngb b ON b.ord = {n} AND b.gram = u.gram
  LEFT JOIN nga ba ON ba.ord = {n - 1} AND ba.gram = {ctx}
  LEFT JOIN ngb bb ON bb.ord = {n - 1} AND bb.gram = {ctx}
  JOIN e{n - 1} pa ON pa.gram = {sfx}
  JOIN e{n - 1} pb ON pb.gram = {sfx}
)""")
    # backoff aggregates
    finals = []
    for n in range(1, order + 1):
        if n < order:
            parts.append(f"""bo{n} AS (
  SELECT e.ctx AS gram,
         log10(greatest(1.0 - SUM(pow(10, e.pnew)), {EPS})
             / greatest(1.0 - SUM(pow(10, lo.pnew)), {EPS})) AS bo
  FROM e{n + 1} e JOIN e{n} lo ON lo.gram = e.sfx
  GROUP BY e.ctx
)""")
            finals.append(
                f"SELECT {n} AS ord, e.gram, round(e.pnew, 6) AS log10_prob, "
                f"round(coalesce(b.bo, 0.0), 6) AS log10_backoff "
                f"FROM e{n} e LEFT JOIN bo{n} b ON b.gram = e.gram"
            )
        else:
            finals.append(
                f"SELECT {n} AS ord, e.gram, round(e.pnew, 6) AS log10_prob, "
                f"0.0 AS log10_backoff FROM e{n} e"
            )
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(finals)
