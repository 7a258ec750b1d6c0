"""Sequence packing — assign whole documents to fixed-token-budget
training sequences (the concat-and-pack step that turns a curated
corpus into model-ready sequences, e.g. T5/GPT-NeoX "packing": docs are
concatenated in a deterministic order and the stream is cut into
``budget_tokens``-token sequences; each document is labeled with the
sequence it STARTS in and its offset there, so a writer can materialize
the packed batches without re-tokenizing).

Scale shape: packing needs a total order, which a 10^12-document corpus
cannot have on one node — so the corpus is first split into
``n_groups`` deterministic hash groups (the same salted-h60 arithmetic
as `mixing` / `semdedup.cluster_balanced_sample`) and packing is
performed independently per group. The only shuffle is the window's
hash-partition-by-group + in-partition sort; ``n_groups`` scales with
the cluster (one group per executor-core bundle at 100 TB), and packing
quality is unaffected because sequences never span groups by
construction. Everything else is map-side arithmetic on the running
token count.

Semantics:

* empty documents (0 tokens) produce no row — nothing to pack;
* a document longer than the budget spans sequences; ``seq_id`` is the
  sequence containing its FIRST token (document-granular concat
  packing — the writer slices the overflow into ``seq_id + 1..``);
* ``seq_offset`` = the document's start position inside its sequence,
  always in ``[0, budget)``;
* the per-group document order is ascending id — deterministic and
  engine-independent, so the Spark plan and the DuckDB twin agree
  bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kenlm_spark.functions.text import tokenize
from kenlm_spark.operators.dedup import h60

_SALT = "pack:"


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 256,
    n_groups: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, grp, n_tokens, seq_id, seq_offset) — deterministic
    document → training-sequence assignment at ``budget_tokens`` per
    sequence, packed independently within ``n_groups`` hash groups."""
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if n_groups <= 0:
        raise ValueError("n_groups must be positive")
    grp = F.pmod(
        h60(F.concat(F.lit(_SALT), F.col(id_col).cast("string"))),
        F.lit(n_groups),
    ).cast("long")
    base = (
        df.select(
            F.col(id_col),
            F.size(tokenize(F.coalesce(F.col(text_col), F.lit(""))))
            .cast("long")
            .alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn("grp", grp)
    )
    w = (
        Window.partitionBy("grp")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_start")
    return base.select(id_col, "grp", "n_tokens", start).select(
        id_col,
        "grp",
        "n_tokens",
        # BIGINT div/%: _start >= 0, so both are exact and sign-safe
        F.expr(f"_start div {budget_tokens}").alias("seq_id"),
        F.expr(f"_start % {budget_tokens}").alias("seq_offset"),
    )


def pack_payloads(
    df: DataFrame,
    budget_tokens: int = 256,
    n_groups: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(grp, seq_id, n_docs, n_tokens, seq_text) — the MATERIALIZED
    training sequences: every document's tokens concatenated in packing
    order (ascending id within the hash group) per sequence.

    Scale shape: the token arrays ride the SAME single
    partition-by-group exchange the assignment window needs (no second
    corpus-keyed join to fetch texts back); the per-sequence rollup is
    a partial-aggregating groupBy on the fine-grained (grp, seq_id)
    key. A document longer than the budget contributes all its tokens
    to the sequence it starts in (document-granular packing — the
    writer slices overflow downstream), so ``n_tokens`` can exceed the
    budget exactly when a spanning document is present.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if n_groups <= 0:
        raise ValueError("n_groups must be positive")
    grp = F.pmod(
        h60(F.concat(F.lit(_SALT), F.col(id_col).cast("string"))),
        F.lit(n_groups),
    ).cast("long")
    base = (
        df.select(
            F.col(id_col),
            tokenize(F.coalesce(F.col(text_col), F.lit(""))).alias("_toks"),
        )
        .withColumn("n_tokens", F.size("_toks").cast("long"))
        .filter(F.col("n_tokens") > 0)
        .withColumn("grp", grp)
    )
    w = (
        Window.partitionBy("grp")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_start")
    asg = base.select(id_col, "grp", "n_tokens", "_toks", start).select(
        "grp",
        F.expr(f"_start div {budget_tokens}").alias("seq_id"),
        F.col(id_col).alias("_id"),
        "n_tokens",
        "_toks",
    )
    # array_sort on struct orders by the leading id field, so the
    # concatenation order is exactly the packing order
    members = F.array_sort(F.collect_list(F.struct("_id", "_toks")))
    return asg.groupBy("grp", "seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.array_join(
            F.flatten(F.transform(members, lambda m: m["_toks"])), " "
        ).alias("seq_text"),
    )


def pack_payloads_sql(
    budget_tokens: int = 256,
    n_groups: int = 8,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`pack_payloads` (``string_agg ... ORDER BY
    id`` == Spark's sorted-struct flatten: both concatenate each doc's
    space-joined tokens in ascending id order with single-space
    separators)."""
    from kenlm_spark.oracle import sql_tokens

    h = (
        f"CAST(('0x' || substring(md5('{_SALT}' || "
        f"CAST({id_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
    )
    return f"""
WITH _pk AS (
  SELECT {id_col}, {sql_tokens(text_col)} AS toks,
         CAST({h} % {n_groups} AS BIGINT) AS grp
  FROM {table}
),
_pc AS (
  SELECT {id_col}, grp, toks,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         SUM(CAST(len(toks) AS BIGINT)) OVER (
           PARTITION BY grp ORDER BY {id_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - CAST(len(toks) AS BIGINT) AS _start
  FROM _pk WHERE len(toks) > 0
)
SELECT grp,
       CAST(_start // {budget_tokens} AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       string_agg(array_to_string(toks, ' '), ' ' ORDER BY {id_col})
         AS seq_text
FROM _pc
GROUP BY grp, CAST(_start // {budget_tokens} AS BIGINT)
"""


def pack_sequences_sql(
    budget_tokens: int = 256,
    n_groups: int = 8,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`pack_sequences` (h60 is 60-bit and hence
    non-negative, so plain ``%`` matches Spark's pmod; the window SUM's
    HUGEINT result is collapsed by the outer BIGINT casts)."""
    from kenlm_spark.oracle import sql_tokens

    h = (
        f"CAST(('0x' || substring(md5('{_SALT}' || "
        f"CAST({id_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
    )
    return f"""
WITH _pk AS (
  SELECT {id_col},
         CAST(len({sql_tokens(text_col)}) AS BIGINT) AS n_tokens,
         CAST({h} % {n_groups} AS BIGINT) AS grp
  FROM {table}
),
_pc AS (
  SELECT {id_col}, grp, n_tokens,
         SUM(n_tokens) OVER (
           PARTITION BY grp ORDER BY {id_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS _start
  FROM _pk WHERE n_tokens > 0
)
SELECT {id_col}, grp, n_tokens,
       CAST(_start // {budget_tokens} AS BIGINT) AS seq_id,
       CAST(_start % {budget_tokens} AS BIGINT) AS seq_offset
FROM _pc
"""
