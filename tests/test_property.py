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


# ---------------------------------------------------- composition properties

REST_MODEL = load_arpa(str(FIXTURES / "test.arpa"), rest=True)

# ChartState composition over OOV (<unk>) tokens diverges from sequential
# scoring IN THE REFERENCE TOO (verified by compiling the reference and
# driving lm/left.hh directly: 'unknown however unknown' gives rtl=-24.41
# vs l2r=-12.41 there as well — test.arpa's '<unk> however <unk>' entries
# hit it). The composition contract is for in-vocabulary tokens; the
# reference's own GrowBig goldens only exercise full sentences where this
# cancels. Our port reproduces the reference bit-for-bit either way.
VOCAB_WORDS = [w for w in MODEL.vocab if w not in ("<s>", "</s>", "<unk>")]
vocab_sentences = st.lists(
    st.sampled_from(VOCAB_WORDS), min_size=0, max_size=12
).map(" ".join)


def _left_to_right(m, ids, begin_sentence):
    total = 0.0
    right = m.begin_sentence_state() if begin_sentence else m.null_context_state()
    for w in ids:
        ret, right = m.full_score(right, w)
        total += ret.log10_prob
    return total


def _right_to_left(m, ids, begin_sentence):
    from kenlm_spark.ngram.left import ChartState, RuleScore

    total = 0.0
    state = ChartState()
    for w in reversed(ids):
        copy = state.copy()
        score = RuleScore(m, state)
        score.terminal(w)
        score.non_terminal(copy, total)
        total = score.finish()
    if begin_sentence:
        copy = state.copy()
        score = RuleScore(m, state)
        score.begin_sentence()
        score.non_terminal(copy, total)
        total = score.finish()
    return total


@settings(max_examples=80, deadline=None)
@given(vocab_sentences)
def test_chart_composition_equals_sequential(s):
    """RuleScore right-to-left composition == sequential scoring on RANDOM
    in-vocab word sequences, open-left fragments, non-rest model."""
    ids = [MODEL.word_id(w) for w in s.split()] if s else []
    assert _right_to_left(MODEL, ids, False) == pytest.approx(
        _left_to_right(MODEL, ids, False), rel=1e-5, abs=1e-5
    )


@settings(max_examples=80, deadline=None)
@given(vocab_sentences)
def test_chart_composition_rest_model_closed(s):
    """Under REST_PROBING, compositions CLOSED by BeginSentence must equal
    sequential scoring (UnRest corrects the optimistic rest charges)."""
    ids = [REST_MODEL.word_id(w) for w in s.split()] if s else []
    assert _right_to_left(REST_MODEL, ids, True) == pytest.approx(
        _left_to_right(REST_MODEL, ids, True), rel=1e-5, abs=1e-5
    )


@settings(max_examples=50, deadline=None)
@given(sentences, st.integers(min_value=0, max_value=12))
def test_stateless_equals_stateful_random(s, cut):
    """full_score_forgot_state == full_score for every position of random
    sequences (prob, length, independent_left)."""
    ids = [MODEL.word_id(w) for w in s.split()] if s else []
    state = MODEL.begin_sentence_state()
    hist = [MODEL.bos_id]
    for w in ids:
        prev_len = state.length
        stateful, state = MODEL.full_score(state, w)
        stateless = MODEL.full_score_forgot_state(list(reversed(hist)), w)
        assert stateless.log10_prob == pytest.approx(
            stateful.log10_prob, rel=1e-6, abs=1e-6
        )
        assert stateless.ngram_length == stateful.ngram_length
        # independent_left comparable only when the carried state was not
        # truncated below the raw history: a truncated (shorter) state
        # cannot observe the longer-context miss the stateless walk sees
        # (the reference's StatelessTest compares states/prob/length, not
        # this flag).
        if prev_len >= min(len(hist), MODEL.order - 1):
            assert stateless.independent_left == stateful.independent_left
        hist.append(w)
