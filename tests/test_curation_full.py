"""q_curation_full — the five-stage multimodal curation spine: stage
parity against the standalone oracle-checked queries, the planted
caption-dup leg, first-failing-stage attribution, and the plan gates
(Arrow-crossing count, 0 SortMergeJoin)."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def full(spark):
    return {r["doc_id"]: r for r in em.q_curation_full(spark, SF).collect()}


def test_stage_parity_with_standalone_queries(spark, full):
    iq = {
        r["doc_id"]: r["image_pass"]
        for r in em.q_image_quality(spark, SF).collect()
    }
    ph = {r["doc_id"]: r["keep"] for r in em.q_dedup_phash(spark, SF).collect()}
    al = {r["id"]: r for r in em.q_alignment_filter(spark, SF).collect()}
    assert set(full) == set(iq) == set(ph) == set(al)
    for i, r in full.items():
        assert r["image_pass"] == iq[i]
        assert r["image_canonical"] == ph[i]
        assert r["align_score"] == al[i]["align_score"]
        assert r["aligned"] == al[i]["keep"]


def test_first_failing_stage_attribution(full):
    order = ("image", "image_dup", "caption_dup", "alignment", "semantic_dup")
    flags = (
        "image_pass",
        "image_canonical",
        "caption_canonical",
        "aligned",
        "semantic_canonical",
    )
    for r in full.values():
        assert r["selected"] == all(r[f] for f in flags)
        assert (r["drop_reason"] == "none") == r["selected"]
        if not r["selected"]:
            first = next(o for o, f in zip(order, flags) if not r[f])
            assert r["drop_reason"] == first, dict(r.asDict())


def test_all_stages_fire_somewhere(spark):
    """The sf0.01 corpus exercises image, image_dup, alignment, and
    semantic_dup (caption_dup needs planted dups — next test)."""
    reasons = {
        r["drop_reason"]
        for r in em.q_curation_full(spark, "/root/testdata/sf0.01")
        .select("drop_reason")
        .distinct()
        .collect()
    }
    assert {"image", "image_dup", "alignment", "semantic_dup", "none"} <= reasons


def test_caption_dup_leg_with_planted_duplicates(spark):
    """Planted exact-duplicate captions on image-clean rows: the min id
    keeps, the copy drops with drop_reason caption_dup; the dup-groups
    broadcast contains ONLY duplicated groups."""
    from kenlm_spark.operators.alignment import (
        fake_image_encoder,
        fake_text_encoder,
    )
    from kenlm_spark.operators.curation import curate_multimodal_full
    from kenlm_spark.operators.dedup import h60, norm_text

    docs = spark.createDataFrame(
        [(1, "a cat"), (2, "a cat"), (3, "a dog"), (4, "a bird")],
        "doc_id long, text string",
    )
    spine = docs.select(
        "doc_id",
        "text",
        F.col("doc_id").cast("string").alias("img_key"),
        # random 60-bit phashes (pairwise Hamming ~30 — never near-dup;
        # small-int phashes differ in ~2 bits and DO collide), gate open
        h60(F.concat(F.lit("ph"), F.col("doc_id").cast("string"))).alias(
            "phash"
        ),
        h60(norm_text("text")).alias("caption_hash"),
        F.lit(True).alias("image_pass"),
    )
    out = {
        r["doc_id"]: r
        for r in curate_multimodal_full(
            spine,
            fake_text_encoder(8),
            fake_image_encoder(8),
            caption_col="text",
            align_threshold=-1.0,  # alignment passes everything
            tau=1.1,  # semantic dedup fires nowhere
            n_cells=2,
            sample_frac=1.0,
        ).collect()
    }
    assert out[1]["caption_canonical"] is True
    assert out[2]["caption_canonical"] is False
    assert out[2]["drop_reason"] == "caption_dup"
    assert out[3]["caption_canonical"] and out[4]["caption_canonical"]
    assert out[1]["selected"] and out[3]["selected"] and out[4]["selected"]


def test_plan_gates_two_crossings_no_smj(spark):
    """Scale gates: (a) the corpus crosses Python ONCE — the fused
    alignment+assign pass (materialized at the checkpoint, so the final
    label plan shows only semdedup's cell-bounded pair-verify crossing);
    (b) zero SortMergeJoin — every label join-back broadcasts."""
    from kenlm_spark.operators.alignment import (
        fake_image_encoder,
        fake_text_encoder,
    )
    from kenlm_spark.operators.curation import (
        fused_alignment_semdedup,
        train_pair_centroids,
    )
    from kenlm_spark.operators.dedup import h60, norm_text

    docs = em._docs(spark, SF)
    spine = docs.select(
        "doc_id",
        "text",
        F.col("doc_id").cast("string").alias("img_key"),
        em._phash_expr().alias("phash"),
        h60(norm_text("text")).alias("caption_hash"),
        F.lit(True).alias("image_pass"),
    )
    cent = train_pair_centroids(
        spine, fake_image_encoder(8), image_key_col="img_key"
    )
    fused = fused_alignment_semdedup(
        spine,
        cent,
        fake_text_encoder(8),
        fake_image_encoder(8),
        caption_col="text",
        image_key_col="img_key",
        passthrough=["image_pass", "phash", "caption_hash"],
    )
    fused_plan = fused._jdf.queryExecution().executedPlan().toString()
    final = fused_plan.split("== Initial Plan ==")[0]
    assert final.count("MapInPandas") == 1  # ONE corpus crossing
    # ... and it is map-only: no key shuffle (the one RoundRobin
    # exchange is ensure_min_partitions spreading the single toy file)
    assert final.count("Exchange hashpartitioning") == 0
    assert final.count("Exchange rangepartitioning") == 0

    out = em.q_curation_full(spark, SF)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("SortMergeJoin") == 0
    # r8: semdedup's pair verify is pure Catalyst (aggregate/zip_with
    # dot), so the label plan crosses Python ZERO times — the corpus'
    # only crossing is the fused pass behind the checkpoint
    assert final.count("MapInPandas") == 0
    assert final.count("ArrowEvalPython") == 0


def test_run_curation_job_cli(spark, tmp_path):
    """The spark-submit curation entrypoint works end to end over the
    north-rule input schema: snapshot committed atomically, drop_reason
    rollup consistent with the committed labels, selected = the
    conjunction."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from pyspark.sql import functions as F

    from kenlm_spark.data import generate_images
    from kenlm_spark.pipeline import QualityFilterPipeline
    from run_curation_job import main

    images = generate_images(spark, n_rows=60, seed=11)
    inp = str(tmp_path / "in")
    images.write.parquet(inp)
    rc = main(
        [
            "--input", inp,
            "--output", str(tmp_path / "out"),
            "--encoders", "fake",
            "--align-threshold", "0.1",
            "--n-cells", "4",
            "--sample-frac", "1.0",
        ]
    )
    assert rc == 0
    out = QualityFilterPipeline.latest_snapshot(spark, str(tmp_path / "out"))
    assert out.count() == 60
    # selected == every stage passed; drop_reason attribution is total
    bad = out.filter(
        F.col("selected")
        != (
            F.col("image_pass")
            & F.col("image_canonical")
            & F.col("caption_canonical")
            & F.col("aligned")
            & F.col("semantic_canonical")
        )
    ).count()
    assert bad == 0
    assert (
        out.filter(~F.col("selected") & F.col("drop_reason").isNull()).count()
        == 0
    )
    assert (
        out.filter(F.col("selected") & F.col("drop_reason").isNotNull()).count()
        == 0
    )
    # an unknown encoder spec fails loudly
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["--input", inp, "--output", str(tmp_path / "o2"),
              "--encoders", "nope"])


def test_precomputed_centroids_identical_labels(spark):
    """Passing the pre-trained centroid array (the production reuse
    path: the SemDeDup index IS the IVF index) must give bit-identical
    labels to in-job training with the same knobs."""
    from pyspark.sql import functions as F

    from kenlm_spark.data import generate_images
    from kenlm_spark.filtering.image_quality import (
        image_metric_exprs,
        image_pass_expr,
    )
    from kenlm_spark.operators.alignment import (
        fake_image_encoder,
        fake_text_encoder,
    )
    from kenlm_spark.operators.curation import (
        curate_multimodal_full,
        train_pair_centroids,
    )
    from kenlm_spark.operators.dedup import h60, norm_text

    images = generate_images(spark, n_rows=40, seed=3)
    spine = images.select(
        "image_id",
        "caption",
        F.col("image_id").alias("img_key"),
        F.col("phash").cast("long").alias("phash"),
        h60(norm_text("caption")).alias("caption_hash"),
        image_pass_expr(image_metric_exprs()).alias("image_pass"),
    )
    kw = dict(
        id_col="image_id", caption_col="caption", image_key_col="img_key",
        align_threshold=0.1, n_cells=4, iters=2, sample_frac=1.0,
    )
    tenc, ienc = fake_text_encoder(8), fake_image_encoder(8)
    cent = train_pair_centroids(
        spine, ienc, id_col="image_id", image_key_col="img_key",
        n_cells=4, iters=2, sample_frac=1.0,
    )
    a = sorted(map(tuple, curate_multimodal_full(spine, tenc, ienc, **kw).collect()))
    b = sorted(map(tuple, curate_multimodal_full(
        spine, tenc, ienc, centroids=cent, **kw).collect()))
    assert a == b and len(a) == 40
