"""Partial-state scoring goldens, transcribed from lm/partial_test.cc
(SimpleBefore, AlsoWouldConsider, EndSentence, Strings/FullDivide) — all
under a REST_PROBING model, as in the reference."""

from pathlib import Path

import pytest

from kenlm_spark.ngram.arpa import load_arpa
from kenlm_spark.ngram.left import ChartState, LeftState, RuleScore
from kenlm_spark.ngram.model import State
from kenlm_spark.ngram.partial import reveal_after, reveal_before

FIXTURES = Path(__file__).parent / "fixtures"
APPROX = dict(rel=1e-3)


@pytest.fixture(scope="module")
def m():
    return load_arpa(str(FIXTURES / "test.arpa"), rest=True)


def test_simple_before(m):
    left = LeftState()
    right = State()

    period = m.word_id(".")
    reveal = State([period], [-0.845098])
    assert reveal_before(m, reveal, 0, False, left, right) == pytest.approx(
        0.0, abs=1e-4
    )
    assert left.length == 0 and not left.full
    assert right.length == 1
    assert right.words[0] == period
    assert right.backoffs[0] == pytest.approx(-0.845098, **APPROX)

    more = m.word_id("more")
    reveal = State([period, more], [-0.845098, -0.4771212])
    assert reveal_before(m, reveal, 1, False, left, right) == pytest.approx(
        0.0, abs=1e-4
    )
    assert left.length == 0 and not left.full
    assert right.length == 2
    assert right.words == [period, more]
    assert right.backoffs[0] == pytest.approx(-0.845098, **APPROX)
    assert right.backoffs[1] == pytest.approx(-0.4771212, **APPROX)


def test_also_would_consider(m):
    would = m.word_id("would")
    consider = m.word_id("consider")

    current = ChartState(
        LeftState([would], False), State([would], [-0.30103])
    )
    after = LeftState([consider], False)

    # adjustment for would consider
    assert reveal_after(
        m, current.left, current.right, after, 0
    ) == pytest.approx(-1.687872 - -0.2922095 - 0.30103, **APPROX)
    assert current.left.length == 2
    assert current.left.pointers[0] == would
    assert not current.left.full

    also = m.word_id("also")
    before = State([also], [-0.30103])
    # r(would) = -0.2922095; p(also -> would) = -2; p(also would -> consider) = -3
    assert reveal_before(
        m, before, 0, False, current.left, current.right
    ) == pytest.approx(-2 + 0.2922095 - 3 + 1.988902, **APPROX)
    assert current.left.length == 0
    assert current.left.full
    assert current.right.length == 2
    assert current.right.words == [would, also]


def test_end_sentence(m):
    period = m.word_id(".")
    eos = m.word_id("</s>")

    between = ChartState(LeftState([eos], True), State())
    before = State([period], [-0.845098])
    assert reveal_before(
        m, before, 0, True, between.left, between.right
    ) == pytest.approx(-0.0410707, **APPROX)
    assert between.left.length == 0


def _score_fragment(model, ids, out):
    sc = RuleScore(model, out)
    for w in ids:
        sc.terminal(w)
    return sc.finish()


def _check_adjustment(model, expect, before_in: State, before_full, between, after_in: LeftState):
    got = 0.0
    for i in range(1, 5):
        if before_in.length >= i:
            before = State(before_in.words[:i], before_in.backoffs[:i])
            got += reveal_before(
                model, before, i - 1, False, between.left, between.right
            )
        if after_in.length >= i:
            after = LeftState(after_in.pointers[:i], False)
            got += reveal_after(model, between.left, between.right, after, i - 1)
    if after_in.full:
        after = LeftState(list(after_in.pointers), True)
        got += reveal_after(
            model, between.left, between.right, after, after_in.length
        )
    if before_full:
        before = State(list(before_in.words), list(before_in.backoffs))
        got += reveal_before(
            model, before, before_in.length, True, between.left, between.right
        )
    assert abs(expect - got) < 1e-3


@pytest.mark.parametrize(
    "text",
    [
        "also would consider",
        "looking on a little more loin . </s>",
        "in biarritz watching considering looking . on a little more loin "
        "also would consider higher to look good unknown the screening foo "
        "bar , unknown however unknown </s>",
    ],
)
def test_full_divide(m, text):
    """partial_test.cc Strings/FullDivide: for EVERY split of the sentence
    into before|between|after, the reveal adjustments must telescope the
    three fragment scores back to the full fragment score."""
    ids = [m.word_id(w) for w in text.split()]

    full_state = ChartState()
    full = _score_fragment(m, ids, full_state)

    before_state = ChartState()
    before_score = 0.0
    for before in range(len(ids)):
        for after in range(before, len(ids) + 1):
            after_state, between_state = ChartState(), ChartState()
            after_score = _score_fragment(m, ids[after:], after_state)
            between_score = _score_fragment(m, ids[before:after], between_state)
            _check_adjustment(
                m,
                full - before_score - after_score - between_score,
                before_state.right,
                before_state.left.full,
                between_state,
                after_state.left,
            )
        sc = RuleScore(m, before_state)
        for w in ids[: before + 1]:
            sc.terminal(w)
        before_score = sc.finish()
