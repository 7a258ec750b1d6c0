"""End-to-end acceptance tests for the quality-filter pipeline.

Targets from BASELINE.json: keep/drop F1 >= 0.99 vs the row-by-row
reference implementation, scrubbed-caption exact match, image-bytes
passthrough at PSNR >= 40dB, vectorized-only execution.
"""

import numpy as np
import pytest

from kenlm_spark.data import decode_raw_rgb, generate_images, psnr
from kenlm_spark.pipeline import FilterConfig, QualityFilterPipeline

from .oracle_filter import reference_row

N_ROWS = 400


@pytest.fixture(scope="module")
def result_rows(spark, arpa_model):
    images = generate_images(spark, n_rows=N_ROWS, seed=42)
    pipe = QualityFilterPipeline(spark, arpa_model, FilterConfig())
    result = pipe.run(images)
    rows = {r["image_id"]: r.asDict() for r in result.collect()}
    assert len(rows) == N_ROWS
    return rows


@pytest.fixture(scope="module")
def oracle_rows(arpa_model):
    from kenlm_spark.data import generate_images_pdf

    pdf = generate_images_pdf(n_rows=N_ROWS, seed=42)
    return {
        row.image_id: dict(reference_row(arpa_model, row.caption), caption=row.caption)
        for row in pdf.itertuples()
    }


def test_join_scorer_mode_matches_broadcast(spark, arpa_model, result_rows):
    """FilterConfig(scorer_mode='join') — the no-broadcast escape hatch —
    must reproduce the broadcast pipeline's scores and decisions."""
    images = generate_images(spark, n_rows=N_ROWS, seed=42)
    pipe = QualityFilterPipeline(
        spark, arpa_model, FilterConfig(scorer_mode="join")
    )
    rows = {r["image_id"]: r.asDict() for r in pipe.run(images).collect()}
    assert len(rows) == N_ROWS
    for iid, b in result_rows.items():
        j = rows[iid]
        assert j["keep"] == b["keep"], iid
        assert j["drop_reason"] == b["drop_reason"], iid
        assert j["lm_log10_prob"] == pytest.approx(
            b["lm_log10_prob"], abs=1e-9
        ), iid
        assert j["lm_perplexity"] == pytest.approx(
            b["lm_perplexity"], rel=1e-12
        ), iid
        assert j["lm_oov_count"] == b["lm_oov_count"], iid
        assert j["scrubbed_caption"] == b["scrubbed_caption"], iid


def test_keep_drop_f1(result_rows, oracle_rows):
    tp = fp = fn = 0
    for iid, got in result_rows.items():
        want = oracle_rows[iid]["keep"]
        if got["keep"] and want:
            tp += 1
        elif got["keep"] and not want:
            fp += 1
        elif not got["keep"] and want:
            fn += 1
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    assert tp + fn > 20, "oracle kept too few rows for a meaningful F1"
    assert f1 >= 0.99, (tp, fp, fn)


def test_drop_reasons_match(result_rows, oracle_rows):
    mismatches = [
        (iid, got["drop_reason"], oracle_rows[iid]["drop_reason"])
        for iid, got in result_rows.items()
        if got["drop_reason"] != oracle_rows[iid]["drop_reason"]
    ]
    assert not mismatches, mismatches[:10]


def test_scrubbed_caption_exact(result_rows, oracle_rows):
    for iid, got in result_rows.items():
        assert got["scrubbed_caption"] == oracle_rows[iid]["scrubbed_caption"], iid


def test_scores_match_reference_loop(result_rows, oracle_rows):
    for iid, got in result_rows.items():
        want = oracle_rows[iid]
        assert got["lm_log10_prob"] == pytest.approx(
            want["log10_prob"], rel=1e-5, abs=1e-5
        ), iid
        assert got["lm_oov_count"] == want["oov_count"], iid
        assert got["lang_pred"] == want["lang"], iid


def test_bytes_passthrough_psnr(result_rows, oracle_rows, spark, arpa_model):
    from kenlm_spark.data import generate_images_pdf

    pdf = generate_images_pdf(n_rows=N_ROWS, seed=42).set_index("image_id")
    checked = 0
    for iid, got in result_rows.items():
        src = pdf.loc[iid]
        assert got["caption"] == src["caption"]
        if got["fmt"] == "raw":
            a = decode_raw_rgb(bytes(src["bytes"]), src["w"], src["h"])
            b = decode_raw_rgb(bytes(got["bytes"]), got["w"], got["h"])
            assert psnr(a, b) >= 40.0
            checked += 1
    assert checked == N_ROWS


def test_metrics_lineage(spark, arpa_model):
    images = generate_images(spark, n_rows=200, seed=7)
    pipe = QualityFilterPipeline(spark, arpa_model)
    result = pipe.run(images)
    m = pipe.metrics(result).collect()
    assert sum(r["n_rows"] for r in m) == 200
    assert all(r["n_keep"] + r["n_drop"] == r["n_rows"] for r in m)
    assert len(m) > 1, "expected multiple partitions in lineage metrics"


def test_image_rules_gate(spark, arpa_model):
    """FilterConfig.image_rules: the decode-free image-metadata gate
    drops with reason 'image' FIRST; rows passing the gate keep exactly
    the caption-only pipeline's decision (default image_rules=None stays
    bit-identical — pinned by every other test in this file)."""
    from kenlm_spark.data import generate_images

    images = generate_images(spark, n_rows=150, seed=5)
    # Generated images are 8-16 px raw RGB (bytes_per_pixel exactly 3.0,
    # aspect <= 2.0): only the resolution floor varies.
    pipe = QualityFilterPipeline(
        spark, arpa_model, FilterConfig(image_rules={"min_dim": 12})
    )
    rows = pipe.run(images).collect()
    base = {
        r["image_id"]: r.asDict()
        for r in QualityFilterPipeline(spark, arpa_model)
        .run(images)
        .collect()
    }
    n_gated = 0
    for r in rows:
        b = base[r["image_id"]]
        ok = min(r["w"], r["h"]) >= 12
        assert r["image_pass"] == ok, r["image_id"]
        if ok:
            assert r["drop_reason"] == b["drop_reason"], r["image_id"]
            assert r["keep"] == b["keep"], r["image_id"]
        else:
            assert r["drop_reason"] == "image" and not r["keep"], r["image_id"]
            n_gated += 1
    assert 0 < n_gated < len(rows)


def test_image_quality_rules_unit(spark):
    """Each image rule fires independently (incl. the byte-ceiling the
    synthetic corpus can't reach)."""
    from pyspark.sql import functions as F

    from kenlm_spark.filtering.image_quality import (
        image_metric_exprs,
        image_pass_expr,
    )

    rows = [
        ("ok", 100, 100, "png", b"\x00" * 1000),
        ("small", 100, 32, "png", b"\x00" * 1000),
        ("wide", 500, 100, "png", b"\x00" * 5000),
        ("thin", 1000, 1000, "png", b"\x00" * 100),
        ("fat", 64, 64, "png", b"\x00" * (64 * 64 * 33)),
        ("fmt", 100, 100, "tiff", b"\x00" * 1000),
        ("fmt_case", 100, 100, "PNG", b"\x00" * 1000),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, w int, h int, fmt string, bytes binary"
    )
    m = image_metric_exprs()
    got = {
        r["image_id"]: r["p"]
        for r in df.select(
            "image_id", image_pass_expr(m).alias("p")
        ).collect()
    }
    assert got == {
        "ok": True,
        "small": False,
        "wide": False,
        "thin": False,
        "fat": False,
        "fmt": False,
        "fmt_case": True,
    }


def test_image_gate_null_metadata_fails(spark):
    """NULL w/h/bytes (a broken metadata extractor — exactly the corrupt
    record the gate exists for) must FAIL the gate, not slip through a
    SQL-NULL conjunction; fmt NULL already failed via its coalesce."""
    from kenlm_spark.filtering.image_quality import (
        image_metric_exprs,
        image_pass_expr,
    )

    rows = [
        ("null_w", None, 100, "png", b"\x00" * 1000),
        ("null_h", 100, None, "png", b"\x00" * 1000),
        ("null_b", 100, 100, "png", None),
        ("null_f", 100, 100, None, b"\x00" * 1000),
        ("ok", 100, 100, "png", b"\x00" * 1000),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, w int, h int, fmt string, bytes binary"
    )
    got = {
        r["image_id"]: r["p"]
        for r in df.select(
            "image_id", image_pass_expr(image_metric_exprs()).alias("p")
        ).collect()
    }
    assert got == {
        "null_w": False, "null_h": False, "null_b": False,
        "null_f": False, "ok": True,
    }
    assert all(v is not None for v in got.values())  # never SQL NULL


def test_image_gate_skips_scoring_for_gated_rows(spark, arpa_model):
    """Cheap-gate-first: rows failing the image gate skip the LM scorer
    inside the Arrow batch — NULL lm_ columns, drop_reason 'image' —
    while pass rows score bit-identically to the ungated pipeline."""
    from kenlm_spark.data import generate_images

    images = generate_images(spark, n_rows=120, seed=5)
    rows = (
        QualityFilterPipeline(
            spark, arpa_model, FilterConfig(image_rules={"min_dim": 12})
        )
        .run(images)
        .collect()
    )
    base = {
        r["image_id"]: r["lm_log10_prob"]
        for r in QualityFilterPipeline(spark, arpa_model)
        .run(images)
        .collect()
    }
    gated = [r for r in rows if not r["image_pass"]]
    passed = [r for r in rows if r["image_pass"]]
    assert gated and passed
    for r in gated:
        assert r["lm_log10_prob"] is None and r["lm_n_tokens"] is None
        assert r["drop_reason"] == "image"
    for r in passed:
        assert r["lm_log10_prob"] == base[r["image_id"]]


def test_image_rules_gate_stream_matches_batch(spark, arpa_model, tmp_path):
    """The image gate is Catalyst-only, so it must run UNCHANGED on a
    streaming DataFrame: filtered_captions_stream with image_rules ==
    the batch pipeline row for row (keep, drop_reason incl. 'image')."""
    from kenlm_spark.data import generate_images
    from kenlm_spark.streaming.jobs import (
        filtered_captions_stream,
        run_available_now,
    )

    src = str(tmp_path / "imgs")
    generate_images(spark, n_rows=120, seed=7).write.parquet(src)
    cfg = FilterConfig(image_rules={"min_dim": 12})

    stream = filtered_captions_stream(spark, src, arpa_model, cfg)
    got = {
        r["image_id"]: (r["keep"], r["drop_reason"])
        for r in run_available_now(
            stream.select("image_id", "keep", "drop_reason"),
            "img_gate_stream_t",
        )
    }
    want = {
        r["image_id"]: (r["keep"], r["drop_reason"])
        for r in QualityFilterPipeline(spark, arpa_model, cfg)
        .run(spark.read.parquet(src))
        .select("image_id", "keep", "drop_reason")
        .collect()
    }
    assert got == want and len(got) == 120
    assert any(v[1] == "image" for v in got.values())


def test_run_observed_single_pass_matches_recompute(spark, arpa_model):
    """run_observed's zero-extra-scan rollup (df.observe) must equal the
    audit path's per-partition metrics() summed — same definitions, one
    collected during the main action, one recomputed after it."""
    images = generate_images(spark, n_rows=200, seed=7)
    pipe = QualityFilterPipeline(spark, arpa_model)
    result, obs = pipe.run_observed(images)
    rows = result.collect()  # the action that feeds the observation
    assert len(rows) == 200
    got = obs.get
    audit = pipe.metrics(pipe.run(images)).collect()
    want = {
        k: sum(r[k] for r in audit)
        for k in ("n_rows", "n_keep", "n_drop", "n_scrubbed", "n_oov_tokens")
    }
    assert got == want
    assert got["n_keep"] + got["n_drop"] == 200


def test_observed_totals_cap_guard_and_listener(spark, arpa_model, tmp_path):
    """observed_totals must REFUSE to sum a recentProgress window at
    Spark's retention cap (it would silently drop earlier batches);
    ObservedMetricsListener is the unbounded accumulation path and must
    agree with observed_totals on a short drain."""
    import time

    import pytest

    from kenlm_spark.streaming.jobs import (
        ObservedMetricsListener,
        filtered_captions_stream,
        observe_filter_metrics,
        observed_totals,
        run_available_now,
    )

    class _FakeAtCap:
        name = "fake"
        sparkSession = spark
        recentProgress = [None] * 100

    with pytest.raises(RuntimeError, match="numRecentProgressUpdates"):
        observed_totals(_FakeAtCap())

    src = str(tmp_path / "imgs")
    generate_images(spark, n_rows=80, seed=3).write.parquet(src)
    listener = ObservedMetricsListener()
    spark.streams.addListener(listener)
    try:
        stream = observe_filter_metrics(
            filtered_captions_stream(spark, src, arpa_model)
        )
        run_available_now(stream.select("image_id", "keep"), "obs_cap_t")
        q = run_available_now.queries["obs_cap_t"]
        want = observed_totals(q)
        for _ in range(60):  # listener events are delivered async
            if listener.totals.get("n_rows") == want.get("n_rows"):
                break
            time.sleep(0.5)
        assert listener.totals == want and want["n_rows"] == 80
    finally:
        spark.streams.removeListener(listener)


def test_streaming_observed_metrics_match_batch(spark, arpa_model, tmp_path):
    """observe_filter_metrics on the STREAMING pipeline: per-micro-batch
    observedMetrics summed across the drain must equal the batch
    pipeline's counts over the same input — monitoring with no second
    pass over the sink."""
    from pyspark.sql import functions as F

    from kenlm_spark.streaming.jobs import (
        filtered_captions_stream,
        observe_filter_metrics,
        observed_totals,
        run_available_now,
    )

    src = str(tmp_path / "imgs")
    generate_images(spark, n_rows=150, seed=11).write.parquet(src)

    stream = filtered_captions_stream(spark, src, arpa_model)
    stream = observe_filter_metrics(stream)
    run_available_now(stream.select("image_id", "keep"), "obs_stream_t")
    totals = observed_totals(run_available_now.last_query)

    batch = QualityFilterPipeline(spark, arpa_model).run(
        spark.read.parquet(src)
    )
    want = batch.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.sum((~F.col("keep")).cast("long")).alias("n_drop"),
        *[
            F.sum((F.col("drop_reason") == F.lit(r)).cast("long")).alias(
                f"n_drop_{r}"
            )
            for r in ("image", "quality", "lang", "oov", "perplexity")
        ],
    ).collect()[0]
    assert totals == want.asDict()
    assert totals["n_drop_image"] == 0  # image_rules off in this config
    assert totals["n_rows"] == 150
    assert totals["n_drop"] == sum(
        totals[f"n_drop_{r}"]
        for r in ("image", "quality", "lang", "oov", "perplexity")
    )


def test_snapshot_resume(spark, arpa_model, tmp_path):
    images = generate_images(spark, n_rows=120, seed=3)
    pipe = QualityFilterPipeline(spark, arpa_model)
    root = str(tmp_path / "ckpt")

    first_half = images.limit(60).cache()
    r1 = pipe.run_resumable(first_half, root)
    assert r1.count() == 60

    merged = pipe.run_resumable(images, root)
    assert merged.count() == 120
    # Resume must not have re-run the first 60 (snapshot ids preserved).
    again = QualityFilterPipeline.latest_snapshot(spark, root)
    assert again.count() == 120
    assert again.select("image_id").distinct().count() == 120

    # Lineage chain: second snapshot records the first as its parent;
    # the walk terminates at the initial (parentless) snapshot.
    chain = QualityFilterPipeline.snapshot_lineage(root)
    assert len(chain) == 2
    assert chain[0]["parent_snapshot_id"] == chain[1]["snapshot_id"]
    assert chain[1]["parent_snapshot_id"] is None


def test_long_caption_skew_bounded(spark, arpa_model):
    # Very long captions (>512 tokens) must not break or stall batches.
    images = generate_images(spark, n_rows=100, seed=11)
    pipe = QualityFilterPipeline(spark, arpa_model)
    scorer = pipe.scorer
    scorer._max_batch_tokens = 1000  # force re-chunking
    out = pipe.run(images).select("lm_n_tokens").collect()
    assert max(r[0] for r in out) > 256


def test_perplexity_formula(result_rows, oracle_rows):
    for iid, got in result_rows.items():
        want = oracle_rows[iid]["perplexity"]
        assert got["lm_perplexity"] == pytest.approx(want, rel=1e-4), iid


def test_spark_full_scores_column(spark, arpa_model):
    from kenlm_spark.ngram.scorer import SparkNGramScorer

    df = spark.createDataFrame(
        [("looking on a little more loin .",), ("foo bar bar",)], "caption string"
    )
    scorer = SparkNGramScorer(spark, arpa_model)
    rows = scorer.with_full_scores(df, "caption").collect()
    for r in rows:
        expected = list(arpa_model.full_scores(r["caption"]))
        got = r["token_scores"]
        assert len(got) == len(expected)
        total = sum(t["log10_prob"] for t in got)
        assert total == pytest.approx(arpa_model.score(r["caption"]), rel=1e-5)
        for t, (ep, el, eo) in zip(got, expected):
            assert t["ngram_length"] == el and t["oov"] == eo


def test_custom_langid_hook(spark, arpa_model):
    from pyspark.sql import functions as F

    images = generate_images(spark, n_rows=60, seed=2)
    cfg = FilterConfig(langid_expr=lambda c: F.lit("en"))
    pipe = QualityFilterPipeline(spark, arpa_model, cfg)
    rows = pipe.run(images).select("lang_pred").distinct().collect()
    assert {r[0] for r in rows} == {"en"}


def test_null_caption_robust(spark, arpa_model):
    from pyspark.sql import functions as F

    images = generate_images(spark, n_rows=10, seed=1).withColumn(
        "caption",
        F.when(F.col("image_id") == "img00000001", F.lit(None)).otherwise(
            F.col("caption")
        ),
    )
    pipe = QualityFilterPipeline(spark, arpa_model)
    rows = {r["image_id"]: r for r in pipe.run(images).collect()}
    r = rows["img00000001"]
    assert r["keep"] is False and r["drop_reason"] == "quality"
    assert r["scrubbed_caption"] == ""
    assert r["lm_n_tokens"] == 0


def test_run_filter_job_cli(spark, tmp_path):
    """The spark-submit entrypoint works end to end via main()."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from run_filter_job import main

    images = generate_images(spark, n_rows=50, seed=8)
    inp = str(tmp_path / "in")
    images.write.parquet(inp)
    rc = main(
        [
            "--input", inp,
            "--output", str(tmp_path / "out"),
            "--arpa", "/root/repo/tests/fixtures/test.arpa",
        ]
    )
    assert rc == 0
    out = QualityFilterPipeline.latest_snapshot(spark, str(tmp_path / "out"))
    assert out.count() == 50

    # --image-rules threads the JSON thresholds through to the gate.
    rc = main(
        [
            "--input", inp,
            "--output", str(tmp_path / "out2"),
            "--arpa", "/root/repo/tests/fixtures/test.arpa",
            "--image-rules", '{"min_dim": 12}',
        ]
    )
    assert rc == 0
    out2 = QualityFilterPipeline.latest_snapshot(spark, str(tmp_path / "out2"))
    gated = out2.filter("drop_reason = 'image'").count()
    small = out2.filter("least(w, h) < 12").count()
    assert gated == small and gated > 0


def test_expire_snapshots_trims_history_keeps_lineage(spark, tmp_path):
    """Iceberg-style expiry: old snapshots' data + manifests go, the
    kept chain re-roots at the oldest survivor and stays walkable, and
    latest_snapshot / resume are unaffected."""
    import os

    root = str(tmp_path / "snaps")
    df = spark.createDataFrame([(1, "a")], "image_id long, caption string")
    ids = [
        QualityFilterPipeline.write_snapshot(df, root, run_id=f"s{i}")
        for i in range(4)
    ]
    expired = QualityFilterPipeline.expire_snapshots(root, keep_last=2)
    assert expired == sorted(ids[:2])
    # expired data + manifests gone
    for sid in ids[:2]:
        assert not os.path.exists(os.path.join(root, "data", sid))
        assert not os.path.exists(
            os.path.join(root, "manifests", f"{sid}.json")
        )
    # chain re-rooted: latest -> s2 -> None, fully walkable
    chain = QualityFilterPipeline.snapshot_lineage(root)
    assert [m["snapshot_id"] for m in chain] == [ids[3], ids[2]]
    assert chain[-1]["parent_snapshot_id"] is None
    # reads still work
    out = QualityFilterPipeline.latest_snapshot(spark, root)
    assert out is not None and out.count() == 1
    # keep_last larger than history: no-op
    assert QualityFilterPipeline.expire_snapshots(root, keep_last=10) == []
    import pytest as _pytest

    with _pytest.raises(ValueError):
        QualityFilterPipeline.expire_snapshots(root, keep_last=0)
