"""Domain-mixture rebalancing (operators/mixing.py)."""

from __future__ import annotations

import hashlib

import pytest

from kenlm_spark.operators.mixing import rebalance_by_domain


def test_budget_semantics_and_determinism(spark):
    # heavy domain: 200 docs x 10 tokens = 2000 tokens; light: 30 docs
    # x 4 tokens = 120 tokens. Budget 500: heavy samples ~25%, light
    # keeps EVERYTHING (budget >= domain_tokens).
    rows = [(i, "heavy", " ".join(["w"] * 10)) for i in range(200)] + [
        (1000 + i, "light", "a b c d") for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = rebalance_by_domain(
        df, budget_tokens_per_domain=500, domain_col="source"
    ).collect()
    assert len(out) == 230
    heavy = [r for r in out if r["source"] == "heavy"]
    light = [r for r in out if r["source"] == "light"]
    assert all(r["domain_tokens"] == 2000 and r["n_tokens"] == 10 for r in heavy)
    assert all(r["sampled"] for r in light)  # under budget: keep all
    kept_tokens = sum(r["n_tokens"] for r in heavy if r["sampled"])
    # E[kept] = 500; binomial around 50 docs of 200 — generous band
    assert 200 <= kept_tokens <= 900
    # the decision is the documented pure-integer threshold
    for r in heavy:
        u = int.from_bytes(
            hashlib.md5(f"mix:{r['doc_id']}".encode()).digest()[:8], "big"
        )
        hmod = (u >> 4) % 1_000_000
        assert r["sampled"] == (hmod * 2000 < 500 * 1_000_000)


def test_null_domain_is_a_group_not_dropped(spark):
    df = spark.createDataFrame(
        [(1, "a", "x y"), (2, None, "z w q"), (3, None, "m n")],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in rebalance_by_domain(df, 100).collect()}
    assert set(out) == {1, 2, 3}  # a plain equi-join would lose 2 and 3
    assert out[2]["source"] is None and out[2]["domain_tokens"] == 5
    assert all(r["sampled"] for r in out.values())  # all under budget


def test_production_scale_budget_and_null_text(spark):
    """Regression: budgets beyond int32 must not overflow at plan time
    (real token budgets are millions+), and NULL text counts 0 tokens
    exactly like the SQL twin."""
    df = spark.createDataFrame(
        [(1, "a", "x y z"), (2, "a", None)],
        "doc_id long, source string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in rebalance_by_domain(
            df, budget_tokens_per_domain=5_000_000_000
        ).collect()
    }
    assert out[2]["n_tokens"] == 0
    assert out[1]["domain_tokens"] == 3  # NULL doc contributes 0, not NULL
    assert all(r["sampled"] for r in out.values())  # huge budget keeps all


def test_budget_validation(spark):
    df = spark.createDataFrame([(0, "s", "a")], "doc_id long, source string, text string")
    with pytest.raises(ValueError):
        rebalance_by_domain(df, budget_tokens_per_domain=0)
