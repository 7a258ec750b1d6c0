"""phash-column near-duplicate dedup (operators/multimodal.py:
phash_near_pairs / phash_dedup_labels) — the image-modality dedup over
the north-rule schema's trusted phash:int64 column."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kenlm_spark.operators.multimodal import (
    phash_dedup_labels,
    phash_near_pairs,
)

MASK64 = (1 << 64) - 1


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & MASK64).count("1")


def _brute_pairs(rows, max_hamming):
    out = set()
    for i, (ia, pa) in enumerate(rows):
        for ib, pb in rows[i + 1 :]:
            d = _ham(pa, pb)
            if d <= max_hamming:
                lo, hi = (ia, ib) if ia < ib else (ib, ia)
                out.add((lo, hi, d))
    return out


def _det_phash(i: int) -> int:
    """Deterministic pseudo-random signed 64-bit value (negatives
    included — real DCT phashes use the full signed range)."""
    u = int.from_bytes(hashlib.md5(f"ph:{i}".encode()).digest()[:8], "big")
    return u - (1 << 64) if u >= 1 << 63 else u


def test_pairs_match_brute_force(spark):
    # 40 random hashes + planted clusters: copies, 1-bit, 3-bit, 6-bit
    # and 7-bit (just over threshold) variants, negatives included.
    rows = [(i, _det_phash(i)) for i in range(40)]
    base = _det_phash(1000)  # negative or positive, whatever md5 gives
    variants = [
        base,
        base ^ 1,
        base ^ (0b111 << 20),
        base ^ ((1 << 63) | 0b11111),  # 6 bits, flips the sign bit too
        base ^ ((0b1111111) << 40),  # 7 bits: outside max_hamming=6
    ]
    rows += [(100 + i, v - (1 << 64) if v >= 1 << 63 else v)
             for i, v in enumerate(variants)]
    df = spark.createDataFrame(rows, "image_id long, phash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_near_pairs(df, "image_id", "phash", 6).collect()
    }
    assert got == _brute_pairs(rows, 6)
    assert any(d == 6 for *_ids, d in got)  # boundary distance present
    assert all(d <= 6 for *_ids, d in got)


def test_max_bucket_guard_drops_flat_color_storm(spark):
    # 50 identical hashes (a flat-color thumbnail storm): every band
    # bucket holds all 50 > max_bucket, so the guard drops them all and
    # no pair is emitted — exact dedup upstream owns identical copies.
    rows = [(i, 12345) for i in range(50)] + [(100, 999), (101, 998)]
    df = spark.createDataFrame(rows, "image_id long, phash long")
    got = {
        (r["id_a"], r["id_b"])
        for r in phash_near_pairs(
            df, "image_id", "phash", 6, max_bucket=40
        ).collect()
    }
    assert got == {(100, 101)}  # ham(999, 998)=1 survives, storm doesn't


def test_max_hamming_bounds_rejected(spark):
    from kenlm_spark.operators.multimodal import phash_near_pairs_sql
    import pytest

    df = spark.createDataFrame([(1, 5)], "image_id long, phash long")
    with pytest.raises(ValueError, match="exact"):
        phash_near_pairs(df, max_hamming=0)  # mask would exceed BIGINT
    with pytest.raises(ValueError):
        phash_near_pairs_sql("t", max_hamming=64)


def test_greedy_labels_keep_smallest_id(spark):
    base = 0x0F0F0F0F0F0F0F0F
    rows = [
        (3, base ^ 1),
        (7, base),
        (9, base ^ 2),
        (20, 0x7000000000000000),  # isolated
    ]
    df = spark.createDataFrame(rows, "image_id long, phash long")
    keep = {
        r["image_id"]: r["keep"]
        for r in phash_dedup_labels(df, "image_id", "phash").collect()
    }
    assert keep == {3: True, 7: False, 9: False, 20: True}


def test_synthesized_column_plants_clusters(spark):
    """The q_dedup_phash synthesis: cluster members (same doc_id%97)
    stay within Hamming 4; the query keeps exactly one doc per cluster
    that has any near-duplicate (greedy min-id)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as em

    df = em._phash_column(spark, "/root/testdata/sf0.001").cache()
    rows = [(r["doc_id"], r["phash"]) for r in df.collect()]
    by_cluster: dict = {}
    for i, p in rows:
        by_cluster.setdefault(i % 97, []).append((i, p))
    for members in by_cluster.values():
        for i, (_, pa) in enumerate(members):
            for _, pb in members[i + 1 :]:
                assert _ham(pa, pb) <= 4
    labels = {
        r["doc_id"]: r["keep"]
        for r in phash_dedup_labels(df, "doc_id", "phash").collect()
    }
    expected_pairs = _brute_pairs(rows, 6)
    expected_dropped = {b for _a, b, _d in expected_pairs}
    for i, _ in rows:
        assert labels[i] == (i not in expected_dropped)
