"""Structured Streaming + multimodal plumbing tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_stream_hourly_matches_batch(spark, sf_dir, tmp_path):
    from kenlm_spark.streaming.jobs import hourly_event_rollup_stream, run_available_now

    # The streaming file source wants a directory; stage the table into one.
    events_path = str(tmp_path / "events_dir")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(events_path)
    stream_rows = run_available_now(
        hourly_event_rollup_stream(spark, events_path), "hourly_test"
    )
    batch = (
        spark.read.parquet(events_path)
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        )
        .collect()
    )
    key = lambda r: (r["hour"], r["event_type"])  # noqa: E731
    got = {key(r): (r["n_events"], r["sum_value"]) for r in stream_rows}
    want = {key(r): (r["n_events"], r["sum_value"]) for r in batch}
    assert got == want


def test_stream_filter_matches_batch(spark, arpa_model, tmp_path):
    from kenlm_spark.data import generate_images
    from kenlm_spark.pipeline import FilterConfig, QualityFilterPipeline
    from kenlm_spark.streaming.jobs import filtered_captions_stream, run_available_now

    images = generate_images(spark, n_rows=150, seed=5)
    path = str(tmp_path / "images_pq")
    images.write.parquet(path)

    stream_rows = run_available_now(
        filtered_captions_stream(spark, path, arpa_model).select(
            "image_id", "keep", "drop_reason", "scrubbed_caption"
        ),
        "filter_stream_test",
    )
    batch_rows = (
        QualityFilterPipeline(spark, arpa_model, FilterConfig())
        .run(spark.read.parquet(path))
        .select("image_id", "keep", "drop_reason", "scrubbed_caption")
        .collect()
    )
    got = {r["image_id"]: (r["keep"], r["drop_reason"], r["scrubbed_caption"]) for r in stream_rows}
    want = {r["image_id"]: (r["keep"], r["drop_reason"], r["scrubbed_caption"]) for r in batch_rows}
    assert got == want
    assert len(got) == 150


def test_image_features_real_decode(spark):
    from kenlm_spark.data import generate_images
    from kenlm_spark.operators.multimodal import image_features

    images = generate_images(spark, n_rows=40, seed=9)
    feats = {r["image_id"]: r for r in image_features(images).collect()}
    assert len(feats) == 40
    src = {r["image_id"]: r for r in images.collect()}
    for iid, f in feats.items():
        assert f["decoded_real"] is True  # fmt='raw' decodes for real
        assert f["dec_w"] == src[iid]["w"] and f["dec_h"] == src[iid]["h"]
        arr = np.frombuffer(bytes(src[iid]["bytes"]), dtype=np.uint8)
        assert f["mean_r"] == pytest.approx(float(arr[0::3].mean()), abs=1e-6)
        assert len(f["thumb"]) == 16


def test_fake_decode_is_deterministic():
    from kenlm_spark.operators.multimodal import _decode_one

    a1, real1 = _decode_one(b"\x01\x02\x03", 8, 8, "png")
    a2, real2 = _decode_one(b"\x01\x02\x03", 8, 8, "png")
    assert not real1 and not real2
    assert np.array_equal(a1, a2)
    assert a1.shape == (8, 8, 3)


def test_frame_sample_plumbing(spark):
    """Frame sampling fan-out: every_n selection, deterministic fake
    decoder slices the blob, pluggable real decoder marks decoded_real."""
    from kenlm_spark.operators.multimodal import frame_sample

    blob = bytes(range(64))
    df = spark.createDataFrame(
        [("v1", bytearray(blob), "fake", 8), ("v2", None, "fake", 8)],
        "video_id string, bytes binary, fmt string, n_frames int",
    )
    rows = {
        (r["video_id"], r["frame_idx"]): r
        for r in frame_sample(df, every_n=3).collect()
    }
    # v2 has no bytes -> no frames; v1 yields frames 0, 3, 6 of 8
    assert set(rows) == {("v1", 0), ("v1", 3), ("v1", 6)}
    assert bytes(rows[("v1", 0)]["frame_bytes"]) == blob[0:8]
    assert bytes(rows[("v1", 3)]["frame_bytes"]) == blob[24:32]
    assert not rows[("v1", 0)]["decoded_real"]

    def real_decoder(data, fmt, n_frames):
        yield 0, b"decoded"

    out = frame_sample(df, every_n=1, decode_fn=real_decoder).collect()
    assert all(r["decoded_real"] for r in out)
    assert len(out) == 2  # one frame per video, incl. the empty-bytes one


def test_resize_images_block_mean(spark):
    """Deterministic block-mean resize on real raw RGB: a 4x4 image of
    four solid 2x2 quadrants resized to 2x2 must give the quadrant
    colors exactly, round-trippable through the raw decode path."""
    import numpy as np

    from kenlm_spark.operators.multimodal import resize_images

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2, :2] = (255, 0, 0)
    img[:2, 2:] = (0, 255, 0)
    img[2:, :2] = (0, 0, 255)
    img[2:, 2:] = (10, 20, 30)
    df = spark.createDataFrame(
        [("a", bytearray(img.tobytes()), 4, 4, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    row = resize_images(df, 2, 2).collect()[0]
    assert row["decoded_real"] and row["w"] == 2 and row["h"] == 2
    out = np.frombuffer(bytes(row["bytes"]), dtype=np.uint8).reshape(2, 2, 3)
    assert tuple(out[0, 0]) == (255, 0, 0)
    assert tuple(out[0, 1]) == (0, 255, 0)
    assert tuple(out[1, 0]) == (0, 0, 255)
    assert tuple(out[1, 1]) == (10, 20, 30)
    # resized output composes with the feature extractor (same schema shape)
    from kenlm_spark.operators.multimodal import image_features

    feat = image_features(
        resize_images(df, 2, 2).withColumn("fmt", F.lit("raw"))
    ).collect()[0]
    assert feat["dec_w"] == 2 and feat["decoded_real"]


def test_block_sums_matches_loop_reference():
    """The reduceat block-mean must be bit-identical to the per-block loop
    it replaced, on a real 256x256 -> 64x64 resize (micro-bench size) and
    on a ragged 10x7 -> 3x4 (unequal block edges), including timing the
    vectorized path so a loop regression is visible."""
    import time

    import numpy as np

    from kenlm_spark.operators.multimodal import _block_sums

    def loop_means(img, out_h, out_w):
        h, w = img.shape[:2]
        ys = np.linspace(0, h, out_h + 1).astype(int)
        xs = np.linspace(0, w, out_w + 1).astype(int)
        out = np.empty((out_h, out_w, 3), dtype=np.uint8)
        for i in range(out_h):
            for j in range(out_w):
                block = img[
                    ys[i] : max(ys[i + 1], ys[i] + 1),
                    xs[j] : max(xs[j + 1], xs[j] + 1),
                ]
                out[i, j] = block.reshape(-1, 3).mean(axis=0)
        return out

    rng = np.random.default_rng(7)
    for shape, out_hw in [((256, 256, 3), (64, 64)), ((10, 7, 3), (3, 4))]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        t0 = time.perf_counter()
        s, cnt = _block_sums(img, *out_hw)
        fast = (s / cnt[:, :, None]).astype(np.uint8)
        vec_t = time.perf_counter() - t0
        assert np.array_equal(fast, loop_means(img, *out_hw))
        assert vec_t < 0.1  # 256x256 resize in sub-100ms (loop took ~50ms+)


def test_langid_nb_empty_train_is_lazy(spark):
    """predict_langid_nb must not run a Spark action at compose time and
    must degrade to 'und' (not crash) when the training set is empty."""
    from kenlm_spark.filtering.langid_nb import predict_langid_nb, train_langid_nb

    empty = spark.createDataFrame([], "doc_id long, text string, lang string")
    weights, priors = train_langid_nb(empty, "doc_id", "text", "lang")
    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    out = predict_langid_nb(docs, weights, priors, "doc_id", "text")  # no action
    assert out.collect()[0]["lang_nb"] == "und"


def test_binary_meta(spark):
    from kenlm_spark.operators.multimodal import binary_meta

    df = spark.createDataFrame([(1, bytearray(b"\xab\xcd\xef"))], "id long, b binary")
    row = binary_meta(df, "id", "b").collect()[0]
    assert row["n_bytes"] == 3
    assert row["first_byte"] == 0xAB


def test_stream_dedup_one_per_hash(spark, tmp_path):
    from kenlm_spark.data import generate_images
    from kenlm_spark.operators.dedup import exact_duplicates
    from kenlm_spark.streaming.jobs import dedup_stream, run_available_now

    images = generate_images(spark, n_rows=120, seed=21)
    path = str(tmp_path / "dedup_imgs")
    images.write.parquet(path)

    rows = run_available_now(dedup_stream(spark, path), "dedup_stream_test")
    batch = exact_duplicates(
        spark.read.parquet(path), id_col="image_id", text_col="caption"
    ).collect()
    # one survivor per distinct hash, and hash sets agree with batch dedup
    assert len(rows) == len({r["text_hash"] for r in rows})
    assert {r["text_hash"] for r in rows} == {r["text_hash"] for r in batch}


def test_stateful_user_stats(spark, sf_dir, tmp_path):
    from kenlm_spark.streaming.jobs import running_user_stats_stream, run_available_now

    path = str(tmp_path / "events_state")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(path)
    rows = run_available_now(
        running_user_stats_stream(spark, path), "userstats", output_mode="update"
    )
    # final state per user equals the batch aggregation
    batch = (
        spark.read.parquet(path)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("s"))
        .collect()
    )
    # update-mode may emit several rows per user; the last one is the total
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["n_events"], r["sum_value"])
    want = {r["user_id"]: (r["n"], r["s"]) for r in batch}
    assert final == want


def test_audio_features_real_pcm(spark):
    """Crafted PCM16: a square wave alternating +1000/-1000 has RMS 1000
    and a zero crossing at every sample boundary; silence has RMS 0."""
    import numpy as np

    from kenlm_spark.operators.multimodal import audio_features

    square = np.tile(np.array([1000, -1000], dtype="<i2"), 16)  # 32 samples
    silence = np.zeros(16, dtype="<i2")
    df = spark.createDataFrame(
        [(1, bytearray(square.tobytes())), (2, bytearray(silence.tobytes()))],
        "doc_id long, audio binary",
    )
    rows = {(r["id"], r["win_idx"]): r
            for r in audio_features(df, "doc_id", "audio", window=16).collect()}
    assert len(rows) == 3  # 2 windows for the square wave, 1 for silence
    assert rows[(1, 0)]["rms"] == 1000.0 and rows[(1, 1)]["rms"] == 1000.0
    assert rows[(1, 0)]["zero_cross"] == 15  # every adjacent pair flips
    assert rows[(2, 0)]["rms"] == 0.0 and rows[(2, 0)]["zero_cross"] == 0


def test_phash_properties(spark):
    """DCT perceptual hash on REAL decoded pixels: stable under mild
    noise, far for unrelated images; the pair op has pigeonhole-exact
    recall vs a brute-force popcount over the same hashes."""
    import numpy as np
    from itertools import combinations

    from kenlm_spark.data import generate_images
    from kenlm_spark.operators.multimodal import (
        phash64_one,
        phash_near_pairs,
        with_phash,
    )

    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
    noisy = np.clip(
        base.astype(np.int16) + rng.integers(-4, 5, size=base.shape), 0, 255
    ).astype(np.uint8)
    other = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
    h_base, h_noisy, h_other = (
        phash64_one(base), phash64_one(noisy), phash64_one(other)
    )
    near = bin((h_base ^ h_noisy) & (2**64 - 1)).count("1")
    far = bin((h_base ^ h_other) & (2**64 - 1)).count("1")
    assert near <= 6 < far

    images = generate_images(spark, n_rows=120, seed=9)
    hashed = with_phash(images).select("image_id", "phash_computed")
    rows = {r["image_id"]: r["phash_computed"] for r in hashed.collect()}
    assert len(rows) == 120 and all(v is not None for v in rows.values())

    df = spark.createDataFrame(
        [(k, v) for k, v in rows.items()], "image_id string, ph long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_pairs(df, phash_col="ph", max_hamming=10).collect()
    }
    brute = {
        tuple(sorted((a, b))): bin((rows[a] ^ rows[b]) & (2**64 - 1)).count("1")
        for a, b in combinations(sorted(rows), 2)
        if bin((rows[a] ^ rows[b]) & (2**64 - 1)).count("1") <= 10
    }
    assert got == brute


def test_stream_contamination_matches_batch(spark, tmp_path):
    """Stream-static decontamination: the streaming corpus joined to the
    static benchmark hash set must emit exactly the batch result."""
    from kenlm_spark.operators.dedup import contamination_check
    from kenlm_spark.streaming.jobs import run_available_now

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "an entirely unrelated set of words right here"),
        (3, "quick brown fox jumps over whatever else today"),
        (4, ""),
    ]
    bench_rows = [(100, "brown fox jumps over the lazy dog tonight")]
    src = str(tmp_path / "docs_dir")
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    corpus.write.parquet(src)
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    stream_rows = run_available_now(
        contamination_check(stream, bench, shingle_k=3), "contam_test"
    )
    batch = contamination_check(
        spark.read.parquet(src), bench, shingle_k=3
    ).collect()
    got = {r["doc_id"]: (r["n_overlap"], r["contaminated"]) for r in stream_rows}
    want = {r["doc_id"]: (r["n_overlap"], r["contaminated"]) for r in batch}
    assert got == want
    assert got[1][1] and got[3][1] and not got[2][1] and not got[4][1]
