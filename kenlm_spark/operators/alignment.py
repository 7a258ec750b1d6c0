"""Image-text alignment filtering — the CLIP-score gate of LAION /
DataComp-style pair curation: embed the image and its caption, keep the
pair iff cosine(text_emb, image_emb) >= threshold (LAION-400M used
CLIP ViT-B/32 at 0.28).

The container has no CLIP/torch, so the encoders are PLUGGABLE
callables over Arrow batches — the real deployment passes open_clip
encode functions; the default raises an actionable error. Tests and the
oracle query inject :func:`fake_text_encoder` / :func:`fake_image_encoder`:
deterministic md5-derived vectors whose recipe is reproducible in SQL,
so the whole Spark-side contract — one mapInPandas crossing, batch
shapes, unit-normalization, the dim-sequential cosine, the threshold
gate — is value-checked end to end against DuckDB even without the
model. (The same deterministic-fake contract as the image decoder in
`operators/multimodal.py`.)

Scale shape: map-only — one Arrow pass per row, no shuffle; the real
encoder's weights load once per executor (the fastText-adapter cache
pattern) and batches ride Arrow.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kenlm_spark.operators.similarity import _seq_dot, _seq_sq_norm


def _fake_vec(salt: str, key: str, dim: int) -> np.ndarray:
    """Deterministic pseudo-embedding: component c =
    (int(md5(f'{salt}{c}:{key}')[:8], 16) % 1000) / 1000 - 0.5 —
    bit-reproducible in Spark (conv/substring/md5) and DuckDB."""
    return np.array(
        [
            (
                int(
                    hashlib.md5(f"{salt}{c}:{key}".encode()).hexdigest()[:8],
                    16,
                )
                % 1000
            )
            / 1000.0
            - 0.5
            for c in range(dim)
        ]
    )


def fake_text_encoder(dim: int = 8):
    """list[str] -> (n, dim) float64 — deterministic caption encoder."""

    def enc(texts):
        return np.stack([_fake_vec("at:", t or "", dim) for t in texts])

    return enc


def fake_image_encoder(dim: int = 8):
    """list[str] -> (n, dim) float64 — deterministic image encoder
    keyed on an image KEY column (a real encoder consumes bytes; the
    fake stands in for pixels the container cannot decode)."""

    def enc(keys):
        return np.stack([_fake_vec("ai:", k or "", dim) for k in keys])

    return enc


def _default_encoder(*_a, **_k):
    raise ImportError(
        "no encoder injected: install open_clip/torch and pass "
        "text_encoder/image_encoder callables (batch -> ndarray) to "
        "alignment_scores, or use fake_text_encoder/fake_image_encoder "
        "for plumbing tests"
    )


def alignment_scores(
    df: DataFrame,
    id_col: str = "image_id",
    caption_col: str = "caption",
    image_key_col: str = "image_id",
    text_encoder=None,
    image_encoder=None,
    threshold: float = 0.28,
) -> DataFrame:
    """(id, align_score, keep) — cosine(text_emb, image_emb) per pair,
    rounded at 6 (the oracle-parity contract), gated at ``threshold``.
    One mapInPandas crossing; encoders are called once per Arrow batch.
    """
    tenc = text_encoder or _default_encoder
    ienc = image_encoder or _default_encoder

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            t = np.asarray(tenc(list(pdf["_cap"])), dtype=np.float64)
            im = np.asarray(ienc(list(pdf["_key"])), dtype=np.float64)
            tn = t / _seq_sq_norm(t)[:, None]
            inn = im / _seq_sq_norm(im)[:, None]
            score = np.round(_seq_dot(tn, inn), 6)
            yield pd.DataFrame(
                {
                    "id": pdf["_id"].to_numpy(),
                    "align_score": score,
                    "keep": score >= threshold,
                }
            )

    # internal aliases: with the default image_key_col == id_col the
    # naive 3-column select would duplicate a name, and a duplicated
    # pandas label silently returns a 2-column frame inside the batch
    return df.select(
        F.col(id_col).alias("_id"),
        F.col(caption_col).alias("_cap"),
        F.col(image_key_col).alias("_key"),
    ).mapInPandas(run, "id long, align_score double, keep boolean")


def fake_vec_sql(salt: str, expr: str, dim: int) -> str:
    """The DuckDB twin of :func:`_fake_vec` — a DOUBLE[] literal of
    ``dim`` md5-derived components over a VARCHAR expression. Shared by
    :func:`alignment_scores_sql` and the q_curation_full oracle (which
    feeds the same fake image embeddings into the k-means CTEs)."""
    comps = ", ".join(
        f"(CAST('0x' || substring(md5('{salt}{c}:' || {expr}), 1, 8) "
        f"AS BIGINT) % 1000) / 1000.0 - 0.5"
        for c in range(dim)
    )
    return f"[{comps}]"


def alignment_scores_sql(
    dim: int = 8,
    threshold: float = 0.28,
    table: str = "documents",
    id_col: str = "doc_id",
    caption_col: str = "text",
    image_key_expr: str | None = None,
    threshold_repr: str | None = None,
) -> str:
    """DuckDB twin of :func:`alignment_scores` with the fake encoders
    (the real-encoder path has no SQL twin by nature). ``image_key_expr``
    defaults to the id cast to VARCHAR, matching the query's fake keying.
    """
    key = image_key_expr or f"CAST({id_col} AS VARCHAR)"
    vec = lambda salt, expr: fake_vec_sql(salt, expr, dim)  # noqa: E731

    def unit(x: str) -> str:
        return (
            f"list_transform({x}, e -> e / sqrt(list_sum("
            f"list_transform(generate_series(1, len({x})), "
            f"i -> {x}[i] * {x}[i]))))"
        )

    dot = (
        "list_sum(list_transform(generate_series(1, len(tn)), "
        "i -> tn[i] * inn[i]))"
    )
    thr = threshold_repr or repr(threshold)
    return f"""
WITH _av AS (
  SELECT {id_col} AS id,
         {vec('at:', f"coalesce({caption_col}, '')")} AS tv,
         {vec('ai:', f"coalesce({key}, '')")} AS iv
  FROM {table}
),
_an AS (SELECT id, {unit('tv')} AS tn, {unit('iv')} AS inn FROM _av)
SELECT id, round({dot}, 6) AS align_score,
       round({dot}, 6) >= {thr} AS keep
FROM _an
"""
