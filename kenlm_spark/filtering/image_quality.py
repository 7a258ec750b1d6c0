"""Image-side quality rules for image+caption curation, as Catalyst
expressions over the typed metadata columns ``(w, h, fmt, bytes)``.

The north rule's input is an image+caption table; production curation of
such corpora (LAION-style) gates on image METADATA before ever decoding a
pixel: resolution floors, aspect-ratio bounds, byte-plausibility (a
4096x4096 "image" carried in 40 bytes is corrupt or truncated), and an
allowed-format set. These rules are the cheap tier — pure Catalyst over
int/binary columns, no Python, no decode — so at 10^12 images they prune
the corpus in the same map-only scan as the caption rules, and the
expensive decode tier (operators.multimodal.decode_image, PSNR checks)
runs only on survivors.

The reference is a text-only LM toolkit (no image analog); this stage is
additive per the task's multimodal requirement. A SQL twin
(``image_quality_sql_exprs``) feeds the DuckDB oracle: every metric is
integer arithmetic or a single division of integer counts, so Spark and
the oracle compute bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Default thresholds for the image keep decision.
DEFAULTS = {
    "min_dim": 64,           # shortest side, pixels
    "max_aspect": 4.0,       # longest/shortest side
    "min_bytes_per_pixel": 0.01,   # below: truncated/corrupt payload
    "max_bytes_per_pixel": 32.0,   # above: not plausibly this image
    "allowed_fmts": ("raw", "png", "jpeg", "webp"),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def image_metric_exprs(
    w: Column | str = "w",
    h: Column | str = "h",
    fmt: Column | str = "fmt",
    bytes_col: Column | str = "bytes",
) -> dict[str, Column]:
    """Per-image metadata metrics (all Catalyst, decode-free)."""
    wc, hc = _c(w).cast("long"), _c(h).cast("long")
    short = F.least(wc, hc)
    longside = F.greatest(wc, hc)
    n_pixels = F.greatest(wc * hc, F.lit(1))
    return {
        "min_dim": short,
        "aspect": longside.cast("double") / F.greatest(short, F.lit(1)),
        "bytes_per_pixel": (
            F.octet_length(_c(bytes_col)).cast("double") / n_pixels
        ),
        "fmt_norm": F.lower(F.coalesce(_c(fmt), F.lit(""))),
    }


def image_pass_expr(
    metrics: dict[str, Column], cfg: dict | None = None
) -> Column:
    """The image keep decision over ``image_metric_exprs`` output.

    NULL metadata FAILS the gate: a row with w/h/bytes NULL (a broken
    metadata extractor — exactly the corrupt record this gate exists
    for) would otherwise evaluate the conjunction to SQL NULL and slip
    past ``~image_pass``, while a NULL fmt was already dropped via its
    coalesce — the coalesce(False) makes the null policy uniform."""
    t = dict(DEFAULTS, **(cfg or {}))
    return F.coalesce(
        (metrics["min_dim"] >= F.lit(int(t["min_dim"])))
        & (metrics["aspect"] <= F.lit(float(t["max_aspect"])))
        & (metrics["bytes_per_pixel"] >= F.lit(float(t["min_bytes_per_pixel"])))
        & (metrics["bytes_per_pixel"] <= F.lit(float(t["max_bytes_per_pixel"])))
        & (metrics["fmt_norm"].isin(*[f.lower() for f in t["allowed_fmts"]])),
        F.lit(False),
    )


# ----------------------------------------------------------------- SQL twin

def image_quality_sql_exprs(
    w: str = "w", h: str = "h", fmt: str = "fmt", bytes_col: str = "bytes"
) -> dict[str, str]:
    """DuckDB expressions computing the identical metric values."""
    short = f"least(CAST({w} AS BIGINT), CAST({h} AS BIGINT))"
    longside = f"greatest(CAST({w} AS BIGINT), CAST({h} AS BIGINT))"
    n_pixels = f"greatest(CAST({w} AS BIGINT) * CAST({h} AS BIGINT), 1)"
    return {
        "min_dim": short,
        "aspect": f"CAST({longside} AS DOUBLE) / greatest({short}, 1)",
        "bytes_per_pixel": (
            f"CAST(octet_length({bytes_col}) AS DOUBLE) / {n_pixels}"
        ),
        "fmt_norm": f"lower(coalesce({fmt}, ''))",
    }


def image_pass_sql(
    w: str = "w", h: str = "h", fmt: str = "fmt", bytes_col: str = "bytes",
    cfg: dict | None = None,
) -> str:
    t = dict(DEFAULTS, **(cfg or {}))
    m = image_quality_sql_exprs(w, h, fmt, bytes_col)
    fmts = ", ".join(f"'{f.lower()}'" for f in t["allowed_fmts"])
    return (
        f"COALESCE(({m['min_dim']} >= {int(t['min_dim'])}"
        f" AND {m['aspect']} <= {float(t['max_aspect'])!r}"
        f" AND {m['bytes_per_pixel']} >= {float(t['min_bytes_per_pixel'])!r}"
        f" AND {m['bytes_per_pixel']} <= {float(t['max_bytes_per_pixel'])!r}"
        f" AND {m['fmt_norm']} IN ({fmts})), FALSE)"
    )
