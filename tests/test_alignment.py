"""Image-text alignment gate (operators/alignment.py): pluggable-encoder
contract, deterministic-fake parity, threshold gate, missing-model error."""

from __future__ import annotations

import numpy as np
import pytest

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
