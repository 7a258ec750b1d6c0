"""Data mixing — rebalance a corpus across domains to a target token
budget (the SlimPajama / DoReMi-style mixture step: boilerplate-heavy
domains are downsampled so every domain contributes ~its budget of
training tokens).

Shape: one corpus pass computes per-document token counts map-side; the
per-domain token totals are a partially-aggregated groupBy over a
low-cardinality key, broadcast back (≤ #domains rows); the sampling
decision is a map-only pure-integer hash threshold — the same
engine-exact arithmetic as ``semdedup.cluster_balanced_sample`` and
``deterministic_sample``:

    keep  iff  h60(salt || id) % 1e6  *  domain_tokens  <  budget * 1e6

Document-level sampling against a token budget keeps E[sampled tokens]
= budget per domain (doc sizes are independent of the hash); domains
already at or under budget keep everything (the inequality is
vacuously true when budget >= domain_tokens since hmod < 1e6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kenlm_spark.functions.text import tokenize
from kenlm_spark.operators.dedup import h60

_SALT = "mix:"


def rebalance_by_domain(
    df: DataFrame,
    budget_tokens_per_domain: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
) -> DataFrame:
    """(doc_id, <domain_col>, n_tokens, domain_tokens, sampled) —
    deterministic document sampling that caps every domain at
    ~``budget_tokens_per_domain`` training tokens in expectation."""
    if budget_tokens_per_domain <= 0:
        raise ValueError("budget_tokens_per_domain must be positive")
    # coalesce: NULL text must count 0 tokens exactly like the SQL
    # twin's sql_tokens (which coalesces internally) — F.size(NULL
    # array) is NULL, which would poison the domain total
    base = df.select(
        id_col,
        domain_col,
        F.size(tokenize(F.coalesce(F.col(text_col), F.lit(""))))
        .cast("long")
        .alias("n_tokens"),
    )
    totals = base.groupBy(domain_col).agg(
        F.sum("n_tokens").alias("domain_tokens")
    )
    hmod = F.pmod(
        h60(F.concat(F.lit(_SALT), F.col(id_col).cast("string"))),
        F.lit(1_000_000),
    )
    # null-safe join: a NULL domain is a group like any other (groupBy
    # already keeps it); a plain equi-join would silently drop those docs
    totals = totals.withColumnRenamed(domain_col, "_dom")
    return base.join(
        F.broadcast(totals),
        F.col(domain_col).eqNullSafe(F.col("_dom")),
    ).select(
        id_col,
        domain_col,
        "n_tokens",
        "domain_tokens",
        (
            hmod * F.col("domain_tokens")
            # cast BEFORE multiplying: int32 literals overflow at plan
            # time for any budget > 2147 (the SQL twin CASTs likewise);
            # the hmod * domain_tokens side is int64-safe to ~9.2e12
            # tokens per domain (hmod < 1e6)
            < F.lit(budget_tokens_per_domain).cast("long")
            * F.lit(1_000_000).cast("long")
        ).alias("sampled"),
    )


def rebalance_by_domain_sql(
    budget_tokens_per_domain: int,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
) -> str:
    """DuckDB twin (signed %% folded non-negative, as everywhere)."""
    from kenlm_spark.oracle import sql_tokens

    h = (
        f"CAST(('0x' || substring(md5('{_SALT}' || "
        f"CAST(b.{id_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
    )
    return f"""
WITH _mb AS (
  SELECT {id_col}, {domain_col},
         CAST(len({sql_tokens(text_col)}) AS BIGINT) AS n_tokens
  FROM {table}
),
_mt AS (
  SELECT {domain_col}, SUM(n_tokens) AS domain_tokens
  FROM _mb GROUP BY {domain_col}
)
SELECT b.{id_col}, b.{domain_col}, b.n_tokens, t.domain_tokens,
       ((({h} % 1000000) + 1000000) % 1000000) * t.domain_tokens
         < CAST({budget_tokens_per_domain} AS BIGINT) * 1000000 AS sampled
FROM _mb b JOIN _mt t ON t.{domain_col} IS NOT DISTINCT FROM b.{domain_col}
"""
