"""fastText langid adapter: full pipeline wiring with an injected fake
model (the binary wheel is absent here; the fake exercises batching,
newline scrubbing, label stripping, and the per-process cache — the
real library differs only in the `import fasttext` line)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kenlm_spark.filtering.fasttext_adapter import fasttext_langid_expr


class _FakeFastText:
    """Deterministic stand-in with fastText's predict() shape."""

    n_loads = 0

    def predict(self, texts, k=1):
        labels = []
        for t in texts:
            assert "\n" not in t and "\r" not in t  # adapter must scrub
            code = "en" if "the" in t.lower().split() else "xx"
            labels.append([f"__label__{code}"])
        return labels, [[0.9]] * len(texts)


def _fake_factory(path):
    _FakeFastText.n_loads += 1
    assert path == "/models/lid.176.bin"
    return _FakeFastText()


def test_adapter_predicts_via_batched_udf(spark):
    expr = fasttext_langid_expr("/models/lid.176.bin", _fake_factory)
    df = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "voila\nun texte"),
            (2, None),
        ],
        "doc_id long, text string",
    ).repartition(1)
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select(
            "doc_id", expr(F.col("text")).alias("lang")
        ).collect()
    }
    assert got == {0: "en", 1: "xx", 2: "xx"}


def test_adapter_plugs_into_pipeline(spark, arpa_model):
    from kenlm_spark.data import generate_images
    from kenlm_spark.pipeline import FilterConfig, QualityFilterPipeline

    images = generate_images(spark, n_rows=60, seed=13)
    cfg = FilterConfig(
        langid_expr=fasttext_langid_expr("/models/lid.176.bin", _fake_factory)
    )
    rows = QualityFilterPipeline(spark, arpa_model, cfg).run(images).collect()
    assert len(rows) == 60
    for r in rows:
        want = "en" if "the" in (r["caption"] or "").lower().split() else "xx"
        assert r["lang_pred"] == want
    # 'xx' is outside allowed_langs: those rows can only keep if dropped
    # earlier for another reason — spot-check the lang gate engages.
    assert any(r["drop_reason"] == "lang" for r in rows)


def test_missing_library_error_is_actionable(spark):
    expr = fasttext_langid_expr("/models/nope.bin")  # default factory
    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    with pytest.raises(Exception, match="fasttext"):
        df.select(expr(F.col("text"))).collect()


def test_cache_distinguishes_same_qualname_factories():
    """Two closures share a __qualname__ but carry different bound state
    — the code+closure fingerprint must keep their cache entries apart
    (name-only keying silently returned the wrong model)."""
    from kenlm_spark.filtering.fasttext_adapter import _get_model

    def make(tag):
        def factory(path):  # same __qualname__ for every tag
            return ("model", tag, path)

        return factory

    a = _get_model("/m.bin", make("A"))
    b = _get_model("/m.bin", make("B"))
    assert a == ("model", "A", "/m.bin")
    assert b == ("model", "B", "/m.bin")
    # same factory state -> cache HIT (no reload)
    assert _get_model("/m.bin", make("A")) is a
    # explicit token pins the key regardless of factory identity
    c = _get_model("/m.bin", make("C"), cache_token="pinned")
    assert _get_model("/m.bin", make("D"), cache_token="pinned") is c
