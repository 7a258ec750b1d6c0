"""Bloom key-membership filter for the join scorer (candidate pruning).

The join scorer's dominant 100-TB cost is the O(order × tokens) candidate
stream shuffled into the model join (``join_scorer.candidate_keys``). The
KeyBloom prunes candidates map-side BEFORE the exchange. These tests pin
the exactness contract (zero false negatives → identical scores) and the
builder equivalences (distributed == driver-side == folded).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kenlm_spark.ngram.join_scorer import (
    _fold,
    _set_bits,
    build_key_bloom,
    candidate_keys,
    key_bloom_from_model,
    model_table,
    score_with_join,
    vocab_table,
)


@pytest.fixture(scope="module")
def tables(spark, arpa_model):
    return model_table(spark, arpa_model), vocab_table(spark, arpa_model)


def test_no_false_negatives(spark, arpa_model, tables):
    """Every order>=2 model key must pass the filter — the exactness
    precondition for pruning before an inner join."""
    mdf, _ = tables
    bloom = key_bloom_from_model(arpa_model)
    keys = np.array(
        [r["key"] for r in mdf.filter(F.col("n") >= 2).collect()],
        dtype=np.int64,
    )
    assert bloom.contains(keys).all()


def test_distributed_matches_driver_build(spark, arpa_model, tables):
    """build_key_bloom over model_table == key_bloom_from_model over the
    same model, bit for bit."""
    mdf, _ = tables
    dist = build_key_bloom(mdf)
    drv = key_bloom_from_model(arpa_model)
    assert dist.nbits == drv.nbits
    assert dist.k == drv.k
    assert dist.bits == drv.bits


def test_fold_identity():
    """OR-folding a 2^m bitmap to 2^s equals building at 2^s directly
    (probe positions are hash & (nbits-1)) — so the adaptive single-pass
    build loses nothing vs a count-first build."""
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**63, size=5000, dtype=np.int64).view(np.uint64)
    big = np.zeros((1 << 20) // 8, dtype=np.uint8)
    _set_bits(big, keys, 1 << 20)
    small_direct = np.zeros((1 << 16) // 8, dtype=np.uint8)
    _set_bits(small_direct, keys, 1 << 16)
    assert np.array_equal(_fold(big, 1 << 16), small_direct)


def test_candidate_stream_shrinks(spark, arpa_model, tables, sf_dir):
    """The prune must remove a real fraction of candidates (high-order
    misses) while keeping every model hit."""
    mdf, vdf = tables
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id"), F.col("text"))
        .limit(300)
    )
    bloom = key_bloom_from_model(arpa_model)
    args = (docs, "text", vdf, arpa_model.order, arpa_model.bos_id, arpa_model.eos_id)
    full = candidate_keys(*args).count()
    pruned = candidate_keys(*args, key_bloom=bloom).count()
    assert pruned < full * 0.8
    # hits after the join are identical: pruned candidates were misses
    full_hits = candidate_keys(*args).join(mdf, ["n", "key"]).count()
    pruned_hits = (
        candidate_keys(*args, key_bloom=bloom).join(mdf, ["n", "key"]).count()
    )
    assert full_hits == pruned_hits


def test_scores_identical_with_bloom(spark, arpa_model, tables, sf_dir):
    mdf, vdf = tables
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id"), F.col("text"))
        .limit(200)
    )
    bloom = key_bloom_from_model(arpa_model)
    base = (
        score_with_join(
            docs, "text", mdf, vdf, arpa_model.order,
            arpa_model.bos_id, arpa_model.eos_id,
        )
        .orderBy("doc_id")
        .toPandas()
    )
    with_bloom = (
        score_with_join(
            docs, "text", mdf, vdf, arpa_model.order,
            arpa_model.bos_id, arpa_model.eos_id, key_bloom=bloom,
        )
        .orderBy("doc_id")
        .toPandas()
    )
    assert base.equals(with_bloom)
