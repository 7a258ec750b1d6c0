"""DSIR importance-resampling operator (operators/dsir.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kenlm_spark.operators.dsir import (
    dsir_log_weights,
    dsir_topk,
)


@pytest.fixture(scope="module")
def corpora(spark):
    """Raw corpus with a planted target-like subpopulation.

    Target domain: medical-flavored bigrams. Raw: 20 medical docs among
    80 web-boilerplate docs (plus one empty doc)."""
    med = "patient dose trial clinical dose patient outcome"
    web = "click here to subscribe to our newsletter today"
    raw_rows = [(i, med if i < 20 else web) for i in range(100)] + [(100, "")]
    # Target shares the raw medical docs' BIGRAMS, not just words —
    # bigram mismatch drags otherwise-on-topic docs negative (that
    # sensitivity is the method working, and what the planted
    # separation below relies on).
    tgt_rows = [(1000 + i, "patient dose trial clinical outcome") for i in range(10)]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    target = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    return raw, target


def test_dsir_separates_target_like_docs(spark, corpora):
    raw, target = corpora
    w = {r["id"]: r for r in dsir_log_weights(raw, target).collect()}
    assert len(w) == 101  # every raw doc weighted, including the empty one
    med_w = [w[i]["log_w"] for i in range(20)]
    web_w = [w[i]["log_w"] for i in range(20, 100)]
    # Planted separation: every medical doc outweighs every web doc.
    assert min(med_w) > max(web_w)
    # Weights within a group of identical docs are identical.
    assert len({round(x, 9) for x in med_w}) == 1
    assert w[100]["n_feats"] == 0 and w[100]["log_w"] == 0.0


def test_dsir_topk_is_take_ordered(spark, corpora):
    raw, target = corpora
    # At toy scale the add-one prior over 8192 buckets pulls every
    # populated doc negative, so the featureless doc's neutral 0.0 would
    # top the list — exclude it (production selection always pre-filters
    # empty docs; at corpus scale the prior is negligible).
    w = dsir_log_weights(raw, target).filter(F.col("n_feats") > 0)
    top = dsir_topk(w, 20)
    # Selection correctness: exactly the 20 planted medical docs.
    assert sorted(r["id"] for r in top.collect()) == list(range(20))
    # Scale contract: global top-k plans as TakeOrderedAndProject
    # (per-partition partial top-k + driver merge), never a global sort
    # exchange.
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_dsir_ratio_broadcast(spark, corpora):
    raw, target = corpora
    w = dsir_log_weights(raw, target)
    plan = w._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # The bucket log-ratio table must reach the per-doc scoring join as a
    # broadcast; the corpus side must never sort-merge against it.
    assert "BroadcastHashJoin" in final


def test_dsir_empty_target_degenerates_to_uniform_prior(spark, corpora):
    raw, _ = corpora
    empty_target = raw.filter(F.lit(False))
    w = dsir_log_weights(raw, empty_target).collect()
    # With no target evidence every bucket ratio is ln(uniform/p_raw):
    # weights are finite and defined for every doc (no NaN/null).
    assert all(r["log_w"] is not None for r in w)


def test_dsir_select_by_quantile_semantics(spark, corpora):
    from kenlm_spark.operators.dsir import dsir_select_by_quantile

    raw, target = corpora
    w = dsir_log_weights(raw, target)
    sel = dsir_select_by_quantile(w, keep_frac=0.2, sample_frac=1.0)
    rows = {r["id"]: r for r in sel.collect()}
    assert len(rows) == 101  # every weighted doc labeled, none dropped
    # ceil(0.2 * 101) = 21 ranks; ties at the boundary all keep. At toy
    # scale the add-one prior pulls every populated doc negative, so the
    # featureless doc's neutral 0.0 ranks FIRST, then the 20 (tied)
    # medical docs — rank 21 is the medical weight, and kept = the empty
    # doc + all 20 medical docs.
    kept = sorted(i for i, r in rows.items() if r["selected"])
    assert kept == list(range(20)) + [100]
    thr = {r["threshold"] for r in rows.values()}
    assert len(thr) == 1  # single threshold, broadcast to every row
    assert thr == {rows[0]["log_w"]}  # == the tied medical weight
    # selection is threshold-consistent
    for r in rows.values():
        assert r["selected"] == (r["log_w"] >= r["threshold"])


def test_dsir_select_is_map_only_filter_not_topk(spark, corpora):
    """The scale contract: the selection must NOT be a
    TakeOrderedAndProject over the corpus (that bounds k by driver
    memory) — the corpus side sees only a broadcast of the 1-row
    threshold; the only sort is the bounded sample rank."""
    from kenlm_spark.operators.dsir import dsir_select_by_quantile

    raw, target = corpora
    w = dsir_log_weights(raw, target)
    sel = dsir_select_by_quantile(w, keep_frac=0.2, sample_frac=1.0)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" not in final
    assert "BroadcastNestedLoopJoin" in final  # 1-row threshold crossJoin


def test_dsir_select_empty_sample_selects_nothing(spark, corpora):
    from kenlm_spark.operators.dsir import dsir_select_by_quantile

    raw, target = corpora
    w = dsir_log_weights(raw, target).filter(F.lit(False))
    sel = dsir_select_by_quantile(w, keep_frac=0.5).collect()
    assert sel == []
    # non-empty corpus but keep_frac validation
    import pytest as _pytest

    for bad in (0.0, -0.1, 1.5):
        with _pytest.raises(ValueError):
            dsir_select_by_quantile(w, keep_frac=bad)
    with _pytest.raises(ValueError):
        dsir_select_by_quantile(w, keep_frac=0.5, sample_frac=0.0)


def test_dsir_select_subsample_threshold_close_to_exact(spark):
    """sample_frac < 1: the threshold comes from the hash sample but is
    applied corpus-wide; on a smooth weight distribution the selected
    fraction stays near keep_frac."""
    from kenlm_spark.operators.dsir import dsir_select_by_quantile

    n = 4000
    # a per-doc unique token breaks weight ties (each lands in its own
    # hash bucket with its own ratio) — tie plateaus at the threshold
    # would otherwise keep whole groups and overshoot keep_frac
    raw = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("word"), (F.col("id") % 997).cast("string"),
            F.lit(" filler text common u"), F.col("id").cast("string"),
        ).alias("text"),
    )
    target = spark.range(50).select(
        (F.col("id") + 10_000).alias("doc_id"),
        F.concat(
            F.lit("word"), (F.col("id") % 97).cast("string"),
            F.lit(" filler text common"),
        ).alias("text"),
    )
    w = dsir_log_weights(raw, target)
    sel = dsir_select_by_quantile(w, keep_frac=0.3, sample_frac=0.25)
    got = sel.agg(
        F.sum(F.col("selected").cast("long")).alias("k"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    frac = got["k"] / got["n"]
    # sampled-quantile noise (m ~ 1000) around 0.3; weights are unique
    assert 0.2 < frac < 0.4, frac
