"""Document chunking — the pre-training windowing step: split each
document into ``max_tokens``-token chunks with ``overlap`` tokens of
left context carried between consecutive chunks (the standard fixed-
window packing shape used to feed LM training, e.g. GPT-2's 1024-token
strided windows).

Catalyst-only (tokenize → sequence of starts → posexplode → slice):
map-side array work inside one projection, no shuffle, no Python — a
10^12-document corpus chunks in the same single pass that scans it.
Tokenization is the engine's reference-exact delimiter class
(`functions.text.tokenize`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kenlm_spark.functions.text import tokenize


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_tokens) — fixed-window chunks.

    Chunk i starts at token ``i * (max_tokens - overlap)`` and takes up
    to ``max_tokens`` tokens; the last chunk starts at the last stride
    position that still contains unseen tokens (so no token is dropped
    and no chunk is fully contained in its predecessor). Empty documents
    produce no chunks; documents at or under ``max_tokens`` produce
    exactly one.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    base = df.select(
        F.col(id_col), tokenize(text_col).alias("_t")
    ).filter(F.size("_t") > 0)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("_t") - overlap - 1, F.lit(0)),
        F.lit(step),
    )
    exploded = base.select(
        id_col, "_t", F.posexplode(starts).alias("chunk_idx", "_start")
    )
    chunk = F.slice("_t", F.col("_start") + 1, max_tokens)
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )


def chunk_documents_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 128,
    overlap: int = 16,
) -> str:
    """DuckDB twin of :func:`chunk_documents` (list slicing is 1-based
    inclusive and end-clamped in both engines)."""
    from kenlm_spark.oracle import sql_tokens

    step = max_tokens - overlap
    return f"""
WITH _ct AS (
  SELECT {id_col}, {sql_tokens(text_col)} AS toks FROM {table}
),
_cs AS (
  SELECT {id_col}, toks,
         unnest(generate_series(
           0, greatest(len(toks) - {overlap} - 1, 0), {step})) AS start
  FROM _ct WHERE len(toks) > 0
)
SELECT {id_col},
       CAST(start // {step} AS BIGINT) AS chunk_idx,
       array_to_string(toks[start + 1 : start + {max_tokens}], ' ')
         AS chunk_text,
       CAST(len(toks[start + 1 : start + {max_tokens}]) AS BIGINT)
         AS n_tokens
FROM _cs
"""
