"""Data mixing — rebalance a corpus across domains to a target token
budget (the SlimPajama / DoReMi-style mixture step: boilerplate-heavy
domains are downsampled so every domain contributes ~its budget of
training tokens).

Shape: one corpus pass computes per-document token counts map-side; the
per-domain token totals are a partially-aggregated groupBy over a
low-cardinality key, broadcast back (≤ #domains rows); the sampling
decision is a map-only pure-integer hash threshold — the same
engine-exact arithmetic as ``semdedup.cluster_balanced_sample`` and
``deterministic_sample``, written in exact-division form so no
intermediate product can wrap int64 however large a domain grows:

    keep  iff  h60(salt || id) % 1e6  <  ceil(budget * 1e6 / domain_tokens)

(equivalent to ``hmod * domain_tokens < budget * 1e6`` for positive
integers, but the only product is ``budget * 1e6`` — validated
driver-side against 2^63 — while ``domain_tokens`` may be arbitrarily
large; the multiply form wraps silently once a domain passes ~9.2e12
tokens, plausible at the 100-TB regime).

Document-level sampling against a token budget keeps E[sampled tokens]
= budget per domain (doc sizes are independent of the hash); domains
already at or under budget keep everything (ceil(B/D) > 1e6-1 >= hmod
whenever budget >= domain_tokens); a zero-token domain keeps everything
vacuously (nothing to downsample).
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
    if budget_tokens_per_domain * 1_000_000 >= 2**63:
        # the only product in the decision; everything else is division
        raise ValueError(
            "budget_tokens_per_domain * 1e6 must fit in int64 "
            f"(got {budget_tokens_per_domain})"
        )
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
    # exact-division threshold: ceil(B / D) = (B-1) div D + 1 for D >= 1;
    # `div` is pure BIGINT division in both engines, so domain_tokens may
    # exceed 9.2e12 without wrapping (the old hmod * D form could not)
    budget_scaled = budget_tokens_per_domain * 1_000_000  # validated < 2^63
    threshold = F.when(
        F.col("domain_tokens") == 0, F.lit(1_000_000).cast("long")
    ).otherwise(
        F.expr(f"(CAST({budget_scaled - 1} AS BIGINT) div domain_tokens) + 1")
    )
    return base.join(
        F.broadcast(totals),
        F.col(domain_col).eqNullSafe(F.col("_dom")),
    ).select(
        id_col,
        domain_col,
        "n_tokens",
        "domain_tokens",
        (hmod < threshold).alias("sampled"),
    )


def rebalance_by_domain_sql(
    budget_tokens_per_domain: int,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
) -> str:
    """DuckDB twin (signed %% folded non-negative, as everywhere;
    `//` is DuckDB's BIGINT division, matching Spark's `div`)."""
    from kenlm_spark.oracle import sql_tokens

    budget_scaled = budget_tokens_per_domain * 1_000_000

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
  -- CAST: DuckDB SUM(BIGINT) returns HUGEINT (Arrow decimal128), which a
  -- type-aware comparator distinguishes from Spark's int64
  SELECT {domain_col}, CAST(SUM(n_tokens) AS BIGINT) AS domain_tokens
  FROM _mb GROUP BY {domain_col}
)
SELECT b.{id_col}, b.{domain_col}, b.n_tokens, t.domain_tokens,
       ((({h} % 1000000) + 1000000) % 1000000)
         < CASE WHEN t.domain_tokens = 0 THEN CAST(1000000 AS BIGINT)
                ELSE (CAST({budget_scaled - 1} AS BIGINT) // t.domain_tokens) + 1
           END AS sampled
FROM _mb b JOIN _mt t ON t.{domain_col} IS NOT DISTINCT FROM b.{domain_col}
"""
