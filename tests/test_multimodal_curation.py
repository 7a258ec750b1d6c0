"""q_multimodal_curation: the composed image+caption curation DAG must
agree stage-for-stage with the standalone oracle-checked queries."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def test_composition_agrees_with_standalone_stages(spark):
    out = {r["doc_id"]: r for r in em.q_multimodal_curation(spark, SF).collect()}
    iq = {r["doc_id"]: r["image_pass"] for r in em.q_image_quality(spark, SF).collect()}
    ph = {r["doc_id"]: r["keep"] for r in em.q_dedup_phash(spark, SF).collect()}
    assert set(out) == set(iq) == set(ph)
    for i, r in out.items():
        assert r["image_pass"] == iq[i]
        assert r["image_canonical"] == ph[i]
        # selected == conjunction, drop_reason == first failing stage
        assert r["selected"] == (
            r["image_pass"] and r["image_canonical"] and r["caption_canonical"]
        )
        assert (r["drop_reason"] == "none") == r["selected"]
        if not r["image_pass"]:
            assert r["drop_reason"] == "image"
        elif not r["image_canonical"]:
            assert r["drop_reason"] == "image_dup"
        elif not r["caption_canonical"]:
            assert r["drop_reason"] == "caption_dup"


def test_caption_dedup_leg_fires_on_planted_duplicates(spark):
    """The synthetic corpus has no exact caption duplicates, so the
    caption leg is exercised with planted ones through the same
    operators the query composes."""
    from pyspark.sql import functions as F

    from kenlm_spark.operators.dedup import exact_duplicates, h60, norm_text

    docs = spark.createDataFrame(
        [(1, "a cat"), (2, "a cat"), (3, "a  cat "), (4, "a dog")],
        "doc_id long, text string",
    )
    spine = docs.select("doc_id", h60(norm_text("text")).alias("_th"))
    dups = exact_duplicates(docs).select(
        F.col("text_hash").alias("_th"), "keep_id"
    )
    got = {
        r["doc_id"]: r["doc_id"] == r["keep_id"]
        for r in spine.join(dups, "_th").collect()
    }
    # normalization collapses whitespace RUNS but does not trim: 1 and 2
    # are one group (min id wins), 3 keeps its trailing space and stands
    # alone — the engine's exact-dedup contract since r1
    assert got == {1: True, 2: False, 3: True, 4: True}
