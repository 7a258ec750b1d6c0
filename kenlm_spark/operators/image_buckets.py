"""Aspect-ratio bucketing — assign every image to the nearest (w, h)
training bucket from a fixed resolution ladder (the SDXL / NovelAI
"aspect bucketing" step: variable-aspect corpora are grouped into a
small set of fixed shapes so training batches are homogeneous and crops
are minimal).

Shape: map-only Catalyst arithmetic — the bucket index is
``1 + Σ_i [aspect > boundary_i]`` where the boundaries are the
geometric midpoints between adjacent ladder aspects, precomputed in
Python and inlined as float literals. No join, no shuffle, no Python:
at 10^12 images this rides the same scan as the metadata quality gate.
The comparison operand ``w / h`` is a single IEEE-754 double division
of two integers, so Spark and the DuckDB oracle compute bit-identical
values against bit-identical literals — the bucket decision cannot
drift between engines.

The default ladder is the SDXL 1024^2-regime set (public model card /
community training recipes); any strictly-aspect-increasing ladder
works.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (width, height) training shapes, ordered by ascending aspect = w/h.
DEFAULT_LADDER: tuple[tuple[int, int], ...] = (
    (512, 2048),
    (576, 1728),
    (640, 1536),
    (704, 1408),
    (832, 1216),
    (896, 1152),
    (1024, 1024),
    (1152, 896),
    (1216, 832),
    (1408, 704),
    (1536, 640),
    (1728, 576),
    (2048, 512),
)


def _boundaries(ladder: tuple[tuple[int, int], ...]) -> list[float]:
    """Geometric midpoints between adjacent ladder aspects (strictly
    increasing, validated)."""
    if len(ladder) < 2:
        raise ValueError("ladder needs at least 2 buckets")
    aspects = [bw / bh for bw, bh in ladder]
    if any(a2 <= a1 for a1, a2 in zip(aspects, aspects[1:])):
        raise ValueError("ladder aspects must be strictly increasing")
    return [
        float(math.sqrt(a1 * a2)) for a1, a2 in zip(aspects, aspects[1:])
    ]


def aspect_bucket_exprs(
    w: Column | str = "w",
    h: Column | str = "h",
    ladder: tuple[tuple[int, int], ...] = DEFAULT_LADDER,
) -> dict[str, Column]:
    """Catalyst columns: ``bucket_idx`` (1-based), ``bucket_w``,
    ``bucket_h`` for the nearest-log-aspect ladder bucket."""
    wc = (F.col(w) if isinstance(w, str) else w).cast("double")
    # greatest(h, 1): h = 0 would be IEEE Infinity in Spark but NULL in
    # DuckDB — clamping keeps corrupt rows engine-identical (and they are
    # the image gate's job to drop, same clamp as image_quality.aspect)
    hc = F.greatest(
        (F.col(h) if isinstance(h, str) else h).cast("long"), F.lit(1)
    ).cast("double")
    aspect = wc / hc
    idx = reduce(
        lambda acc, b: acc
        + F.when(aspect > F.lit(b), F.lit(1)).otherwise(F.lit(0)),
        _boundaries(ladder),
        F.lit(1),
    ).cast("int")
    ws = F.array(*[F.lit(int(bw)) for bw, _ in ladder])
    hs = F.array(*[F.lit(int(bh)) for _, bh in ladder])
    return {
        "aspect": aspect,
        "bucket_idx": idx,
        "bucket_w": F.element_at(ws, idx),
        "bucket_h": F.element_at(hs, idx),
    }


def resize_plan_exprs(
    w: Column | str = "w",
    h: Column | str = "h",
    bucket_w: Column | str = "bucket_w",
    bucket_h: Column | str = "bucket_h",
) -> dict[str, Column]:
    """The cover-resize + center-crop transform that maps an image onto
    its bucket shape — what the training dataloader executes downstream
    of bucket assignment. PURE BIGINT arithmetic: the binding side is
    decided by the integer cross-product ``w*bh >= h*bw`` (no float
    scale factor whose last ulp could flip a ceil), resize dims use
    exact ceil-division, crops are centered with div. Bit-exact across
    engines by construction.

    * wider than the bucket → height binds: resized = (ceil(w*bh/h), bh),
      crop ``(resized_w - bw)`` split left/right;
    * else width binds: resized = (bw, ceil(h*bw/w)), crop split
      top/bottom.
    """
    wc = F.greatest(_lc(w).cast("long"), F.lit(1))
    hc = F.greatest(_lc(h).cast("long"), F.lit(1))
    bw = _lc(bucket_w).cast("long")
    bh = _lc(bucket_h).cast("long")
    wider = wc * bh >= hc * bw

    def ceil_div(a: Column, b: Column) -> Column:
        # floor((a + b - 1) / b): the double division is exact because
        # every operand here is a pixel-dimension product (< 2^40 even
        # for absurd inputs, far below the 2^53 double-exactness bound)
        return F.floor((a + b - F.lit(1)) / b).cast("long")

    ceil_w = ceil_div(wc * bh, hc)
    ceil_h = ceil_div(hc * bw, wc)
    resized_w = F.when(wider, ceil_w).otherwise(bw)
    resized_h = F.when(wider, bh).otherwise(ceil_h)
    crop_x = F.when(wider, F.floor((ceil_w - bw) / 2).cast("long")).otherwise(
        F.lit(0).cast("long")
    )
    crop_y = F.when(wider, F.lit(0).cast("long")).otherwise(
        F.floor((ceil_h - bh) / 2).cast("long")
    )
    return {
        "resized_w": resized_w,
        "resized_h": resized_h,
        "crop_x": crop_x,
        "crop_y": crop_y,
    }


def _lc(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def assign_aspect_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    w_col: str = "w",
    h_col: str = "h",
    ladder: tuple[tuple[int, int], ...] = DEFAULT_LADDER,
) -> DataFrame:
    """(id, w, h, aspect, bucket_idx, bucket_w, bucket_h, resized_w,
    resized_h, crop_x, crop_y) — map-only: ladder assignment plus the
    exact cover-resize + center-crop plan onto the bucket shape."""
    e = aspect_bucket_exprs(w_col, h_col, ladder)
    base = df.select(
        id_col,
        F.col(w_col).cast("long").alias("w"),
        F.col(h_col).cast("long").alias("h"),
        F.round(e["aspect"], 6).alias("aspect"),
        e["bucket_idx"].alias("bucket_idx"),
        e["bucket_w"].cast("long").alias("bucket_w"),
        e["bucket_h"].cast("long").alias("bucket_h"),
    )
    r = resize_plan_exprs("w", "h", "bucket_w", "bucket_h")
    return base.select(
        "*",
        r["resized_w"].alias("resized_w"),
        r["resized_h"].alias("resized_h"),
        r["crop_x"].alias("crop_x"),
        r["crop_y"].alias("crop_y"),
    )


# ----------------------------------------------------------------- SQL twin

def aspect_bucket_sql_exprs(
    w: str = "w",
    h: str = "h",
    ladder: tuple[tuple[int, int], ...] = DEFAULT_LADDER,
) -> dict[str, str]:
    """DuckDB twins computing bit-identical bucket decisions (same
    float literals via repr, same strict > comparisons on the same
    double division)."""
    aspect = (
        f"(CAST({w} AS DOUBLE) / "
        f"CAST(greatest(CAST({h} AS BIGINT), 1) AS DOUBLE))"
    )
    terms = " + ".join(
        f"(CASE WHEN {aspect} > {b!r} THEN 1 ELSE 0 END)"
        for b in _boundaries(ladder)
    )
    idx = f"CAST(1 + {terms} AS INT)"
    ws = ", ".join(str(int(bw)) for bw, _ in ladder)
    hs = ", ".join(str(int(bh)) for _, bh in ladder)
    return {
        "aspect": aspect,
        "bucket_idx": idx,
        "bucket_w": f"([{ws}])[{idx}]",
        "bucket_h": f"([{hs}])[{idx}]",
    }


def resize_plan_sql_exprs(
    w: str = "w",
    h: str = "h",
    bucket_w: str = "bucket_w",
    bucket_h: str = "bucket_h",
) -> dict[str, str]:
    """DuckDB twins of :func:`resize_plan_exprs` — pure BIGINT: integer
    cross-product binding-side test, `//` ceil-division, `//` centering."""
    wc = f"greatest(CAST({w} AS BIGINT), 1)"
    hc = f"greatest(CAST({h} AS BIGINT), 1)"
    bw = f"CAST({bucket_w} AS BIGINT)"
    bh = f"CAST({bucket_h} AS BIGINT)"
    wider = f"({wc} * {bh} >= {hc} * {bw})"
    ceil_w = f"(({wc} * {bh} + {hc} - 1) // {hc})"
    ceil_h = f"(({hc} * {bw} + {wc} - 1) // {wc})"
    return {
        "resized_w": f"CAST(CASE WHEN {wider} THEN {ceil_w} ELSE {bw} END AS BIGINT)",
        "resized_h": f"CAST(CASE WHEN {wider} THEN {bh} ELSE {ceil_h} END AS BIGINT)",
        "crop_x": (
            f"CAST(CASE WHEN {wider} THEN ({ceil_w} - {bw}) // 2 "
            f"ELSE 0 END AS BIGINT)"
        ),
        "crop_y": (
            f"CAST(CASE WHEN {wider} THEN 0 "
            f"ELSE ({ceil_h} - {bh}) // 2 END AS BIGINT)"
        ),
    }


def assign_aspect_buckets_sql(
    img_cte: str,
    id_col: str = "doc_id",
    w: str = "w",
    h: str = "h",
    ladder: tuple[tuple[int, int], ...] = DEFAULT_LADDER,
) -> str:
    """DuckDB twin of :func:`assign_aspect_buckets` over an ``img`` CTE
    body providing (id, w, h)."""
    e = aspect_bucket_sql_exprs(w, h, ladder)
    r = resize_plan_sql_exprs("w", "h", "bucket_w", "bucket_h")
    return f"""
WITH img AS (
  {img_cte}
),
bkt AS (
  SELECT {id_col},
         CAST({w} AS BIGINT) AS w,
         CAST({h} AS BIGINT) AS h,
         round({e["aspect"]}, 6) AS aspect,
         {e["bucket_idx"]} AS bucket_idx,
         CAST({e["bucket_w"]} AS BIGINT) AS bucket_w,
         CAST({e["bucket_h"]} AS BIGINT) AS bucket_h
  FROM img
)
SELECT {id_col}, w, h, aspect, bucket_idx, bucket_w, bucket_h,
       {r["resized_w"]} AS resized_w,
       {r["resized_h"]} AS resized_h,
       {r["crop_x"]} AS crop_x,
       {r["crop_y"]} AS crop_y
FROM bkt
"""
