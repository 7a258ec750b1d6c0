"""Deterministic synthetic image+caption table (the north-rule input shape).

Schema from BASELINE.json ``input_hint``::

    images(image_id: string, bytes: binary, w: int, h: int, fmt: string,
           caption: string, phash: bigint)

The generator is pure-function-of-seed so tests and benchmarks are
reproducible. ``bytes`` is a raw RGB24 buffer (w*h*3 bytes, deterministic
gradient) — fmt='raw' — so the PSNR passthrough check can decode without
external image libraries; the multimodal module treats other formats as
opaque and stubs their decoders.

Caption mix stresses every pipeline stage: reference-vocabulary sentences
(from the golden ARPA fixture vocabulary), OOV injections, non-English
strings (langid), PII/profanity (scrubber), junk/empty/very-long captions
(heuristics + skew handling).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

# Vocabulary of the golden 5-gram model (tests/fixtures/test.arpa, copied
# from the reference's lm/test.arpa) minus tags.
ARPA_WORDS = (
    ", . a also beyond biarritz call concerns consider considering for higher "
    "however i immediate in is little loin look looking more on screening small "
    "the to watch watching what would foo bar baz"
).split()

NON_EN = [
    "der hund ist auf dem tisch und die katze auch nicht",
    "le chat est dans la maison et il dort pas mal",
    "el perro es muy grande y está en la casa con los niños",
    "il gatto è sulla sedia e non si muove per niente",
    "o cachorro é muito bonito e está em casa com a família",
    "de hond is in het park en hij loopt met de baas",
]

PII_SNIPPETS = [
    "contact me at john.doe@example.com for details",
    "call 555-123-4567 now",
    "visit https://example.com/buy?id=1 today",
    "my ssn is 123-45-6789 ok",
    "card 4111 1111 1111 1111 expires soon",
    "server at 192.168.1.100 is down",
]

TOX_WORDS = ["damn", "hell", "crap", "shit"]


def _raw_rgb(rng: np.random.Generator, w: int, h: int) -> bytes:
    base = rng.integers(0, 256, size=3, dtype=np.int64)
    xs = np.arange(w * h * 3, dtype=np.int64)
    px = (base[xs % 3] + xs // 3) % 256
    return px.astype(np.uint8).tobytes()


def generate_images_pdf(n_rows: int = 2000, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_rows):
        r = rng.random()
        if r < 0.55:  # in-vocab English-ish caption
            k = int(rng.integers(3, 16))
            words = list(rng.choice(ARPA_WORDS, size=k))
            if rng.random() < 0.5:
                words = ["the"] + words + ["on", "a", "little", "loin", "."]
            caption = " ".join(words)
        elif r < 0.65:  # OOV injections
            k = int(rng.integers(3, 12))
            words = list(rng.choice(ARPA_WORDS, size=k))
            words.insert(int(rng.integers(0, k)), f"zqx{int(rng.integers(0, 999))}")
            caption = " ".join(words)
        elif r < 0.73:  # non-English
            caption = NON_EN[int(rng.integers(0, len(NON_EN)))]
        elif r < 0.81:  # PII
            base = " ".join(rng.choice(ARPA_WORDS, size=5))
            caption = base + " " + PII_SNIPPETS[int(rng.integers(0, len(PII_SNIPPETS)))]
        elif r < 0.85:  # toxicity
            words = list(rng.choice(ARPA_WORDS, size=6))
            words.insert(3, TOX_WORDS[int(rng.integers(0, len(TOX_WORDS)))])
            caption = " ".join(words)
        elif r < 0.90:  # junk: digits / repeats / uppercase
            kind = int(rng.integers(0, 3))
            if kind == 0:
                caption = " ".join(str(int(x)) for x in rng.integers(0, 9999, 8))
            elif kind == 1:
                caption = " ".join(["loin"] * int(rng.integers(8, 20)))
            else:
                caption = "THE LOIN IS VERY LOUD " * 3
        elif r < 0.93:  # skew tail: very long caption
            k = int(rng.integers(256, 640))
            caption = " ".join(rng.choice(ARPA_WORDS, size=k))
        elif r < 0.96:  # empty / whitespace
            caption = "" if rng.random() < 0.5 else "   "
        else:  # short
            caption = " ".join(rng.choice(ARPA_WORDS, size=2))

        w = int(rng.integers(8, 17))
        h = int(rng.integers(8, 17))
        rows.append(
            {
                "image_id": f"img{i:08d}",
                "bytes": _raw_rgb(rng, w, h),
                "w": w,
                "h": h,
                "fmt": "raw",
                "caption": caption,
                "phash": int(rng.integers(-(2**62), 2**62)),
            }
        )
    return pd.DataFrame(rows)


def generate_images(
    spark: SparkSession, n_rows: int = 2000, seed: int = 42, partitions: int = 8
) -> DataFrame:
    pdf = generate_images_pdf(n_rows, seed)
    return spark.createDataFrame(pdf, schema=IMAGES_SCHEMA).repartition(partitions)


def decode_raw_rgb(data: bytes, w: int, h: int) -> np.ndarray:
    """Decode the fmt='raw' RGB24 buffer; the tests' PSNR check uses this."""
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; +inf for identical buffers."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
