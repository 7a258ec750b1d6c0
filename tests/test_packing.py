"""Sequence packing + aspect bucketing (r7) — semantics and scale shape."""

import pytest
from pyspark.sql import functions as F

from kenlm_spark.operators.image_buckets import (
    DEFAULT_LADDER,
    assign_aspect_buckets,
)
from kenlm_spark.operators.packing import pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_offsets_and_coverage(spark):
    # 40 docs of 1..10 tokens: every non-empty doc gets exactly one row,
    # offsets sit in [0, budget), and within a group the assignment is
    # the running-sum bin of a concat stream in ascending id order.
    rows = [(i, " ".join(["tok"] * (i % 11))) for i in range(40)]
    out = pack_sequences(
        _docs(spark, rows), budget_tokens=16, n_groups=4
    ).collect()
    nonempty = sum(1 for _, t in rows if t)
    assert len(out) == nonempty
    assert all(0 <= r.seq_offset < 16 for r in out)
    assert all(r.seq_id >= 0 for r in out)
    # recompute per group on the driver
    by_grp = {}
    for r in sorted(out, key=lambda r: (r.grp, r.doc_id)):
        start = by_grp.get(r.grp, 0)
        assert r.seq_id == start // 16, r
        assert r.seq_offset == start % 16, r
        by_grp[r.grp] = start + r.n_tokens


def test_pack_long_doc_spans_and_determinism(spark):
    # one 100-token doc with budget 16: seq_id = the sequence containing
    # its first token; rerun is bit-identical (hash grouping is salted
    # md5, not a random split)
    df = _docs(spark, [(7, " ".join(["w"] * 100)), (8, "a b")])
    a = sorted(pack_sequences(df, 16, 4).collect())
    b = sorted(pack_sequences(df, 16, 4).collect())
    assert a == b
    assert {r.doc_id for r in a} == {7, 8}


def test_pack_validates_args(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        pack_sequences(df, budget_tokens=0)
    with pytest.raises(ValueError):
        pack_sequences(df, n_groups=0)


def test_pack_plan_is_one_exchange(spark):
    # the only shuffle is the window's partition-by-group; no join
    df = _docs(spark, [(i, "a b c") for i in range(10)])
    plan = pack_sequences(df, 16, 4)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # group hash + (AQE artifacts)
    assert "Join" not in plan


def test_aspect_buckets_semantics(spark):
    df = spark.createDataFrame(
        [(1, 512, 2048), (2, 1024, 1024), (3, 2048, 512), (4, 1000, 1060)],
        "doc_id long, w int, h int",
    )
    out = {r.doc_id: r for r in assign_aspect_buckets(df).collect()}
    # exact ladder shapes map to themselves
    assert (out[1].bucket_w, out[1].bucket_h) == (512, 2048)
    assert (out[2].bucket_w, out[2].bucket_h) == (1024, 1024)
    assert (out[3].bucket_w, out[3].bucket_h) == (2048, 512)
    # near-square maps to the square bucket
    assert (out[4].bucket_w, out[4].bucket_h) == (1024, 1024)
    # extremes beyond the ladder clamp to the end buckets
    df2 = spark.createDataFrame(
        [(5, 100, 4000), (6, 4000, 100)], "doc_id long, w int, h int"
    )
    out2 = {r.doc_id: r for r in assign_aspect_buckets(df2).collect()}
    assert out2[5].bucket_idx == 1
    assert out2[6].bucket_idx == len(DEFAULT_LADDER)


def test_aspect_buckets_nearest_log_aspect(spark):
    # the assigned bucket minimizes |log(aspect) - log(bucket aspect)|
    import math

    rows = [(i, 16 + (i * 37) % 512, 16 + (i * 91) % 512) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w int, h int")
    out = assign_aspect_buckets(df).collect()
    aspects = [bw / bh for bw, bh in DEFAULT_LADDER]
    for r in out:
        la = math.log(r.w / r.h)
        best = min(range(len(aspects)), key=lambda i: abs(la - math.log(aspects[i])))
        assert r.bucket_idx == best + 1, (r, best)


def test_aspect_buckets_map_only(spark):
    df = spark.createDataFrame([(1, 512, 512)], "doc_id long, w int, h int")
    plan = assign_aspect_buckets(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_aspect_buckets_validates_ladder(spark):
    df = spark.createDataFrame([(1, 512, 512)], "doc_id long, w int, h int")
    with pytest.raises(ValueError):
        assign_aspect_buckets(df, ladder=((512, 512),))
    with pytest.raises(ValueError):
        # non-increasing aspects
        assign_aspect_buckets(df, ladder=((1024, 1024), (512, 512)))


def test_stream_aspect_buckets_matches_batch(spark, tmp_path):
    """assign_aspect_buckets is a pure map-side projection, so it is
    stream-legal as-is: the streaming result must equal the batch one
    (the image-gate + bucketing tier runs unchanged on a live feed)."""
    from kenlm_spark.streaming.jobs import run_available_now

    rows = [(i, 16 + (i * 37) % 512, 16 + (i * 91) % 512) for i in range(50)]
    src = str(tmp_path / "img_dir")
    spark.createDataFrame(rows, "doc_id long, w int, h int").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    got = {
        r["doc_id"]: (r["bucket_idx"], r["bucket_w"], r["bucket_h"])
        for r in run_available_now(
            assign_aspect_buckets(stream), "aspect_test"
        )
    }
    want = {
        r["doc_id"]: (r["bucket_idx"], r["bucket_w"], r["bucket_h"])
        for r in assign_aspect_buckets(spark.read.parquet(src)).collect()
    }
    assert got == want and len(want) == 50


def test_aspect_buckets_zero_height_clamped(spark):
    # h=0 (corrupt metadata) clamps the denominator to 1 on both
    # engines instead of diverging (Spark IEEE inf vs DuckDB null)
    df = spark.createDataFrame([(1, 2048, 0)], "doc_id long, w int, h int")
    r = assign_aspect_buckets(df).collect()[0]
    assert r.bucket_idx == len(DEFAULT_LADDER) and r.aspect == 2048.0


def test_pack_payloads_materializes_in_order(spark):
    from kenlm_spark.operators.packing import pack_payloads

    rows = [(i, " ".join([f"w{i}_{j}" for j in range(1 + i % 5)]))
            for i in range(30)]
    out = pack_payloads(_docs(spark, rows), budget_tokens=8, n_groups=2)
    got = {(r.grp, r.seq_id): r for r in out.collect()}
    # recompute the expected packing on the driver from the assignment op
    asg = pack_sequences(
        _docs(spark, rows), budget_tokens=8, n_groups=2
    ).collect()
    texts = dict(rows)
    expect: dict = {}
    for a in sorted(asg, key=lambda a: (a.grp, a.doc_id)):
        e = expect.setdefault((a.grp, a.seq_id), {"n": 0, "t": 0, "txt": []})
        e["n"] += 1
        e["t"] += a.n_tokens
        e["txt"].append(texts[a.doc_id])
    assert set(got) == set(expect)
    for k, e in expect.items():
        r = got[k]
        assert (r.n_docs, r.n_tokens) == (e["n"], e["t"]), k
        assert r.seq_text == " ".join(e["txt"]), k
    # multi-doc sequences exist and every sequence respects the order
    assert any(e["n"] > 1 for e in expect.values())


def test_resize_plan_exact_cover_and_crop(spark):
    # the resize plan must exactly cover the bucket: one side equals the
    # bucket, the other is >= with the overshoot centered by div
    rows = [(i, 16 + (i * 37) % 512, 16 + (i * 91) % 512) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w int, h int")
    for r in assign_aspect_buckets(df).collect():
        bw, bh = r.bucket_w, r.bucket_h
        # python reference of the documented integer recipe
        if r.w * bh >= r.h * bw:
            exp = ((r.w * bh + r.h - 1) // r.h, bh)
            crop = ((exp[0] - bw) // 2, 0)
        else:
            exp = (bw, (r.h * bw + r.w - 1) // r.w)
            crop = (0, (exp[1] - bh) // 2)
        assert (r.resized_w, r.resized_h) == exp, r
        assert (r.crop_x, r.crop_y) == crop, r
        assert r.resized_w >= bw and r.resized_h >= bh
        assert r.resized_w == bw or r.resized_h == bh
        assert r.crop_x + bw <= r.resized_w
        assert r.crop_y + bh <= r.resized_h


def test_resize_plan_exact_bucket_shape_is_identity(spark):
    # an image already at a ladder shape resizes to itself, zero crop
    df = spark.createDataFrame(
        [(1, 1024, 1024), (2, 512, 2048)], "doc_id long, w int, h int"
    )
    for r in assign_aspect_buckets(df).collect():
        assert (r.resized_w, r.resized_h) == (r.w, r.h)
        assert (r.crop_x, r.crop_y) == (0, 0)
