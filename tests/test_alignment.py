"""Image-text alignment gate (operators/alignment.py): pluggable-encoder
contract, deterministic-fake parity, threshold gate, missing-model error."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kenlm_spark.operators.alignment import (
    _fake_vec,
    alignment_scores,
    fake_image_encoder,
    fake_text_encoder,
)
from kenlm_spark.operators.similarity import _seq_dot, _seq_sq_norm


def _expected(caption: str, key: str, dim=8):
    t = _fake_vec("at:", caption or "", dim)[None, :]
    i = _fake_vec("ai:", key or "", dim)[None, :]
    tn = t / _seq_sq_norm(t)[:, None]
    inn = i / _seq_sq_norm(i)[:, None]
    return float(np.round(_seq_dot(tn, inn), 6)[0])


def test_scores_match_rowwise_recompute_and_gate(spark):
    rows = [
        (0, "a cat on a mat"),
        (1, "completely different caption"),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "CAST(doc_id AS STRING) AS img_key"
    )
    out = {
        r["id"]: r
        for r in alignment_scores(
            df,
            id_col="doc_id",
            caption_col="text",
            image_key_col="img_key",
            text_encoder=fake_text_encoder(8),
            image_encoder=fake_image_encoder(8),
            threshold=0.1,
        ).collect()
    }
    assert len(out) == 3
    for i, caption in ((0, rows[0][1]), (1, rows[1][1]), (2, None)):
        want = _expected(caption, str(i))
        assert out[i]["align_score"] == want
        assert out[i]["keep"] == (want >= 0.1)


def test_real_encoder_shape_is_batch_pluggable(spark):
    """A 'real' encoder (any batch->ndarray callable, e.g. open_clip)
    slots in unchanged — here a toy projection whose cosine is
    computable per row, verifying the whole batch path numerically."""

    def toy_text(texts):
        return np.stack([[float(len(t or "")), 1.0, 0.0] for t in texts])

    def toy_image(keys):
        return np.stack([[float(len(k or "")), 1.0, 0.0] for k in keys])

    df = spark.createDataFrame(
        [(i, "x" * i) for i in range(1, 40)], "doc_id long, text string"
    ).selectExpr("doc_id", "text", "CAST(doc_id AS STRING) AS img_key")
    out = {
        r["id"]: r
        for r in alignment_scores(
            df, "doc_id", "text", "img_key", toy_text, toy_image,
            threshold=0.9,
        ).collect()
    }
    assert len(out) == 39
    for i in range(1, 40):
        t = np.array([[float(i), 1.0, 0.0]])
        im = np.array([[float(len(str(i))), 1.0, 0.0]])
        tn = t / _seq_sq_norm(t)[:, None]
        inn = im / _seq_sq_norm(im)[:, None]
        want = float(np.round(_seq_dot(tn, inn), 6)[0])
        assert out[i]["align_score"] == want
        assert out[i]["keep"] == (want >= 0.9)


def test_default_image_key_equals_id_col(spark):
    """Regression: image_key_col defaults to id_col — the duplicated
    column name must not corrupt the batch (pandas returns a 2-column
    frame for a duplicated label)."""
    df = spark.createDataFrame(
        [(7, "some caption")], "image_id long, caption string"
    )
    out = alignment_scores(
        df,
        text_encoder=fake_text_encoder(8),
        image_encoder=fake_image_encoder(8),
        threshold=0.1,
    ).collect()
    assert len(out) == 1 and out[0]["id"] == 7
    assert out[0]["align_score"] == _expected("some caption", 7)


def test_missing_encoder_error_is_actionable(spark):
    df = spark.createDataFrame([(1, "hi")], "doc_id long, text string").selectExpr(
        "doc_id", "text", "CAST(doc_id AS STRING) AS img_key"
    )
    with pytest.raises(Exception, match="open_clip"):
        alignment_scores(df, "doc_id", "text", "img_key").collect()


def test_retrieval_recall_rank_mechanics(spark):
    """Rank recomputed on the driver must match; perfectly-aligned
    encoders (image key == caption, same fake family) give recall@1=1."""
    import hashlib

    import numpy as np

    from kenlm_spark.operators.alignment import (
        _fake_vec,
        fake_image_encoder,
        fake_text_encoder,
        retrieval_recall,
    )
    from kenlm_spark.operators.similarity import _seq_dot, _seq_sq_norm

    rows = [(i, f"caption number {i} words") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", "text", F.col("doc_id").cast("string").alias("img_key")
    )
    out = {
        r["id"]: r
        for r in retrieval_recall(
            df, id_col="doc_id", caption_col="text",
            image_key_col="img_key", pool_mod=3, k=5,
            text_encoder=fake_text_encoder(8),
            image_encoder=fake_image_encoder(8),
        ).collect()
    }
    assert len(out) == 60

    # driver recompute with the documented rule
    def unit(v):
        return v / _seq_sq_norm(v[None, :])[0]

    pool = []
    for i, _t in rows:
        u = int.from_bytes(
            hashlib.md5(f"pool:{i}".encode()).digest()[:8], "big"
        )
        if (u >> 4) % 3 == 0:
            pool.append(i)
    assert pool, "pool nonempty"
    ivec = {i: unit(_fake_vec("ai:", str(i), 8)) for i, _ in rows}
    for i, t in rows:
        tn = unit(_fake_vec("at:", t, 8))
        own = round(float(_seq_dot(tn[None, :], ivec[i][None, :])[0]), 6)
        beats = 0
        for j in pool:
            if j == i:
                continue
            c = round(float(_seq_dot(tn[None, :], ivec[j][None, :])[0]), 6)
            if c > own or (c == own and j < i):
                beats += 1
        r = out[i]
        assert r["rank"] == 1 + beats, (i, r, beats)
        assert r["hit1"] == (r["rank"] == 1) and r["hitk"] == (r["rank"] <= 5)
        assert r["own_cos"] == own

    # perfectly-aligned data: image key == caption, image encoder = the
    # TEXT fake family -> own cosine 1.0, rank 1 everywhere
    df2 = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", "text", F.col("text").alias("img_key")
    )
    aligned = retrieval_recall(
        df2, id_col="doc_id", caption_col="text", image_key_col="img_key",
        pool_mod=3, k=5,
        text_encoder=fake_text_encoder(8),
        image_encoder=fake_text_encoder(8),
    ).collect()
    assert all(r["hit1"] and r["rank"] == 1 for r in aligned)
    assert all(r["own_cos"] == 1.0 for r in aligned)


def test_retrieval_recall_empty_pool_raises(spark):
    from kenlm_spark.operators.alignment import (
        fake_image_encoder,
        fake_text_encoder,
        retrieval_recall,
    )

    df = spark.createDataFrame(
        [(1, "a", "1")], "doc_id long, text string, img_key string"
    )
    with pytest.raises(ValueError):
        retrieval_recall(
            df, id_col="doc_id", caption_col="text",
            image_key_col="img_key", pool_mod=10**6,
            text_encoder=fake_text_encoder(8),
            image_encoder=fake_image_encoder(8),
        )
