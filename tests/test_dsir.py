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
