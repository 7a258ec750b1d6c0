"""Document fingerprinting by winnowing (Schleimer, Wilkerson, Aiken,
SIGMOD 2003 — the MOSS algorithm), over Rabin-Karp rolling hashes.

Per document: normalized text → character k-gram polynomial rolling
hashes (base B mod M, computed INCREMENTALLY per position — O(1) per
char) → winnowing: over every window of ``w`` consecutive k-gram hashes
keep the rightmost minimal one. The selected (position, hash) set is the
document's fingerprint: documents sharing long substrings share
fingerprints, which makes the table joinable for copy/near-dup detection
(guarantee: any shared substring of length >= w + k - 1 yields at least
one shared fingerprint hash).

Map-only (fingerprints depend only on the document's own text): one
mapInPandas pass, no shuffle. The hash is small-modulus (M = 2^31 - 1)
polynomial, so the DuckDB oracle reproduces it exactly with the direct
(non-incremental) formula — same integers, different evaluation order of
exact integer arithmetic.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

B = 257
M = (1 << 31) - 1


def _kgram_hashes(codes: np.ndarray, k: int) -> np.ndarray:
    """Polynomial hashes of all k-grams, vectorized over positions (r8).

    Direct evaluation of the same polynomial the incremental Rabin-Karp
    recurrence computed: hash(p) = Σ_j code[p+j]·B^(k-1-j) (mod M), with
    the per-term powers reduced mod M so every partial sum fits int64
    (max term < 2^21 · 2^31; k terms ≪ 2^63) — the canonical
    representative in [0, M) is identical to the rolling form, and to
    the DuckDB twin's direct formula, integer-for-integer."""
    n = len(codes) - k + 1
    acc = np.zeros(n, dtype=np.int64)
    for j in range(k):
        acc += codes[j : j + n] * pow(B, k - 1 - j, M)
    return (acc % M).astype(np.uint64)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """(id, pos, fp): winnowed fingerprint set per document.

    ``pos`` is the 1-based k-gram start position; documents shorter than
    k (after normalization) emit nothing.
    """
    import pandas as pd

    from kenlm_spark.functions.text import PY_TOKEN_RE

    def batch(pdfs):
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in pdfs:
            ids_out, pos_out, fp_out = [], [], []
            texts = pdf[text_col].fillna("").str.lower()
            for did, raw in zip(pdf[id_col], texts):
                # normalize exactly like norm_text: delimiter runs -> ' '
                t = " ".join(x for x in PY_TOKEN_RE.split(raw) if x)
                if len(t) < k:
                    continue
                codes = np.frombuffer(
                    t.encode("utf-32-le"), dtype="<u4"
                ).astype(np.int64)
                hs = _kgram_hashes(codes, k)
                n = len(hs)
                # rightmost minimal per window, vectorized (r8): the r4
                # per-window Python loop (min + flatnonzero per window)
                # dominated the whole query.  For n >= w the selected
                # index in window i is w-1-argmax(reversed == min) —
                # argmax's first True over the reversed window IS the
                # rightmost minimum; the n < w case is the single
                # truncated window, selected the same way.
                if n >= w:
                    view = sliding_window_view(hs, w)
                    mn = view.min(axis=1)
                    right = (w - 1) - np.argmax(
                        view[:, ::-1] == mn[:, None], axis=1
                    )
                    j = np.arange(n - w + 1) + right
                else:
                    j = np.array(
                        [int(np.flatnonzero(hs == hs.min())[-1])]
                    )
                j = np.unique(j)
                ids_out.extend([did] * len(j))
                pos_out.extend((j + 1).tolist())
                fp_out.extend(hs[j].astype(np.int64).tolist())
            yield pd.DataFrame(
                {"id": ids_out, "pos": pos_out, "fp": fp_out}
            )

    return df.select(id_col, text_col).mapInPandas(
        batch, "id long, pos int, fp long"
    )


def winnow_fingerprints_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> str:
    """DuckDB twin: direct polynomial hash per k-gram (exact integer math,
    order-independent), windowed rightmost-argmin selection."""
    norm = (
        f"regexp_replace(regexp_replace(lower(coalesce({text_col}, '')), "
        "'[\\x00\\t\\n\\r ]+', ' ', 'g'), '^ | $', '', 'g')"
    )
    poly = " + ".join(
        f"CAST(ascii(substring(t, p + {j}, 1)) AS BIGINT) * {pow(B, k - 1 - j, M)}"
        for j in range(k)
    )
    return f"""
WITH d AS (SELECT {id_col} AS id, {norm} AS t FROM {table}),
pos AS (
  SELECT id, t, unnest(generate_series(1, len(t) - {k} + 1)) AS p
  FROM d WHERE len(t) >= {k}
),
h AS (SELECT id, p, ({poly}) % {M} AS hash FROM pos),
nk AS (SELECT id, max(p) AS n FROM h GROUP BY id),
win AS (
  SELECT h.id, w.i AS wstart, h.p, h.hash
  FROM nk
  JOIN (SELECT id, unnest(generate_series(1, greatest(n - {w} + 1, 1))) AS i
        FROM nk) w ON w.id = nk.id
  JOIN h ON h.id = w.id AND h.p >= w.i AND h.p < w.i + {w}
),
sel AS (
  SELECT id, p, hash FROM (
    SELECT *, row_number() OVER (
      PARTITION BY id, wstart ORDER BY hash ASC, p DESC) AS rn
    FROM win
  ) WHERE rn = 1
)
SELECT DISTINCT id, CAST(p AS INTEGER) AS pos, CAST(hash AS BIGINT) AS fp
FROM sel
"""