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
    """Rolling polynomial hashes of all k-grams (incremental Rabin-Karp)."""
    n = len(codes) - k + 1
    out = np.empty(n, dtype=np.uint64)
    h = 0
    for j in range(k):
        h = (h * B + int(codes[j])) % M
    out[0] = h
    drop = pow(B, k - 1, M)
    for p in range(1, n):
        h = ((h - int(codes[p - 1]) * drop) % M + M) % M
        h = (h * B + int(codes[p + k - 1])) % M
        out[p] = h
    return out


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
        for pdf in pdfs:
            ids_out, pos_out, fp_out = [], [], []
            texts = pdf[text_col].fillna("").str.lower()
            for did, raw in zip(pdf[id_col], texts):
                # normalize exactly like norm_text: delimiter runs -> ' '
                t = " ".join(x for x in PY_TOKEN_RE.split(raw) if x)
                if len(t) < k:
                    continue
                codes = np.fromiter((ord(c) for c in t), dtype=np.int64)
                hs = _kgram_hashes(codes, k)
                n = len(hs)
                picked: set[tuple[int, int]] = set()
                n_windows = max(n - w + 1, 1)
                for i in range(n_windows):
                    end = min(i + w, n)
                    seg = hs[i:end]
                    mn = seg.min()
                    # rightmost minimal within the window
                    j = i + int(np.flatnonzero(seg == mn)[-1])
                    picked.add((j + 1, int(hs[j])))
                for p, fp in sorted(picked):
                    ids_out.append(did)
                    pos_out.append(p)
                    fp_out.append(fp)
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