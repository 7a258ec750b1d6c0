"""Property-based tests (hypothesis) for the scorer core."""

from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kenlm_spark.ngram.arpa import load_arpa

FIXTURES = Path(__file__).parent / "fixtures"

MODEL = load_arpa(str(FIXTURES / "test.arpa"))

WORDS = [w for w in MODEL.vocab if w not in ("<s>", "</s>")] + [
    "oovword",
    "zzz",
    "<unk>",
]

sentences = st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join)


@settings(max_examples=120, deadline=None)
@given(sentences)
def test_sum_full_scores_equals_score(s):
    total = sum(p for p, _, _ in MODEL.full_scores(s))
    assert total == pytest.approx(MODEL.score(s), rel=1e-6, abs=1e-6)


@settings(max_examples=60, deadline=None)
@given(st.lists(sentences, min_size=1, max_size=8))
def test_batch_scorer_matches_stateful(batch):
    ids = [MODEL.map_ids(s.split()) for s in batch]
    scores, oov, n = MODEL.score_batch(ids, bos=True, eos=True)
    for i, s in enumerate(batch):
        assert scores[i] == pytest.approx(MODEL.score(s), rel=1e-5, abs=1e-5), s
        assert n[i] == len(s.split()) + 1


@settings(max_examples=60, deadline=None)
@given(sentences)
def test_scores_are_finite_and_nonpositive_domain(s):
    sc = MODEL.score(s)
    assert sc == sc  # not NaN
    # log10 prob of any sentence with the golden model is far below +5
    assert sc < 5.0


@settings(max_examples=40, deadline=None)
@given(sentences)
def test_stupid_backoff_monotone_wrt_kn_structure(s):
    """Stupid-backoff totals are finite and count the same tokens."""
    ids = [MODEL.map_ids(s.split())]
    kn, oov1, n1 = MODEL.score_batch(ids, bos=True, eos=True)
    sb, oov2, n2 = MODEL.score_batch(ids, bos=True, eos=True, stupid_backoff=True)
    assert n1[0] == n2[0] and oov1[0] == oov2[0]
    assert sb[0] == sb[0] and kn[0] == kn[0]
