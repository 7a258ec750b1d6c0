"""ChartState / RuleScore / ExtendLeft goldens, transcribed from
lm/left_test.cc (Short, Charge, GrowBig, AlsoWouldConsiderHigher,
GrowSmall, FullGrow) and lm/model_test.cc:182-224 (ExtendLeftTest)."""

import pytest

from kenlm_spark.ngram.left import ChartState, RuleScore

APPROX = dict(rel=1e-3)


@pytest.fixture(scope="module")
def m(arpa_model):
    return arpa_model


def wid(m, w):
    return m.word_id(w)


# ------------------------------------------------- model_test.cc ExtendLeft


def test_extend_left_golden(m):
    little, right = m.full_score(m.null_context_state(), wid(m, "little"))
    assert little.log10_prob == pytest.approx(-1.285941, **APPROX)

    # no added words: returns the pointer unchanged, prob - rest = 0
    extend_none, back, next_use = m.extend_left_score(
        [], [], little.extend_left, 1
    )
    assert next_use == 0
    assert extend_none.extend_left == little.extend_left
    assert extend_none.log10_prob == pytest.approx(
        little.log10_prob - little.rest, abs=1e-5
    )
    assert extend_none.ngram_length == 1

    a = wid(m, "a")
    extend_a, back, next_use = m.extend_left_score(
        [a], [3.14], little.extend_left, 1
    )
    assert next_use == 1
    assert back[0] == pytest.approx(-0.69897, **APPROX)
    assert extend_a.log10_prob == pytest.approx(
        -0.09132547 - little.rest, **APPROX
    )
    assert extend_a.ngram_length == 2
    assert not extend_a.independent_left

    on = wid(m, "on")
    extend_on, back, next_use = m.extend_left_score(
        [on], [3.14], extend_a.extend_left, 2
    )
    assert next_use == 1
    assert back[0] == pytest.approx(-0.4771212, **APPROX)
    assert extend_on.log10_prob == pytest.approx(
        -0.0283603 - (extend_a.rest + little.rest), **APPROX
    )
    assert extend_on.ngram_length == 3
    assert not extend_on.independent_left

    extend_both, back, next_use = m.extend_left_score(
        [a, on], [0.0, 0.0], little.extend_left, 1
    )
    assert next_use == 2
    assert back[0] == pytest.approx(-0.69897, **APPROX)
    assert back[1] == pytest.approx(-0.4771212, **APPROX)
    assert extend_both.log10_prob == pytest.approx(
        -0.0283603 - little.rest, **APPROX
    )
    assert extend_both.ngram_length == 3
    assert not extend_both.independent_left
    assert extend_both.extend_left == extend_on.extend_left


# --------------------------------------------------------- left_test Short


def test_short(m):
    base = ChartState()
    score = RuleScore(m, base)
    score.terminal(wid(m, "more"))
    score.terminal(wid(m, "loin"))
    assert score.finish() == pytest.approx(-1.206319 - 0.3561665, **APPROX)
    assert base.left.full
    assert base.left.length == 2
    assert base.right.length == 1
    assert base.right.words[0] == wid(m, "loin")

    more_left = ChartState()
    score = RuleScore(m, more_left)
    score.terminal(wid(m, "little"))
    score.non_terminal(base, -1.206319 - 0.3561665)
    assert score.finish() == pytest.approx(-1.56538, **APPROX)
    assert more_left.left.length == 3
    assert more_left.right.length == 1
    assert more_left.right.words[0] == wid(m, "loin")
    assert more_left.left.full

    shorter = ChartState()
    score = RuleScore(m, shorter)
    score.terminal(wid(m, "to"))
    score.non_terminal(base, -1.206319 - 0.3561665)
    assert score.finish() == pytest.approx(
        -0.30103 - 1.687872 - 1.206319 - 0.3561665, rel=1e-2
    )
    assert shorter.left.length == 1
    assert shorter.right.length == 1
    assert shorter.right.words[0] == wid(m, "loin")
    assert shorter.left.full


def test_charge(m):
    base = ChartState()
    score = RuleScore(m, base)
    score.terminal(wid(m, "on"))
    score.terminal(wid(m, "more"))
    assert score.finish() == pytest.approx(
        -1.509559 - 0.4771212 - 1.206319, **APPROX
    )
    assert base.left.length == 1
    assert base.right.length == 1
    assert base.right.words[0] == wid(m, "more")
    assert base.left.full

    extend = ChartState()
    score = RuleScore(m, extend)
    score.terminal(wid(m, "looking"))
    score.non_terminal(base, -1.509559 - 0.4771212 - 1.206319)
    assert score.finish() == pytest.approx(-3.91039, **APPROX)
    assert extend.left.length == 2
    assert extend.right.length == 1
    assert extend.right.words[0] == wid(m, "more")
    assert extend.left.full

    tobos = ChartState()
    score = RuleScore(m, tobos)
    score.begin_sentence()
    score.non_terminal(extend, -3.91039)
    assert score.finish() == pytest.approx(-3.471169, **APPROX)
    assert tobos.left.length == 0
    assert tobos.right.length == 1


# -------------------------------------------------- composition vs L-to-R


def left_to_right(m, ids, begin_sentence=False):
    total = 0.0
    right = m.begin_sentence_state() if begin_sentence else m.null_context_state()
    for w in ids:
        ret, right = m.full_score(right, w)
        total += ret.log10_prob
    return total


def right_to_left(m, ids, begin_sentence=False):
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


def tree_middle(m, ids, begin_sentence=False):
    states = []
    for w in ids:
        s = ChartState()
        score = RuleScore(m, s)
        score.terminal(w)
        states.append((s, score.finish()))
    while len(states) > 1:
        upper = []
        for i in range(len(states) // 2):
            s = ChartState()
            score = RuleScore(m, s)
            score.non_terminal(states[2 * i][0], states[2 * i][1])
            score.non_terminal(states[2 * i + 1][0], states[2 * i + 1][1])
            upper.append((s, score.finish()))
        if len(states) % 2:
            upper.append(states[-1])
        states = upper
    if not states:
        return 0.0
    if begin_sentence:
        ignored = ChartState()
        score = RuleScore(m, ignored)
        score.begin_sentence()
        score.non_terminal(states[0][0], states[0][1])
        return score.finish()
    return states[0][1]


GROW_BIG = [
    "in biarritz watching considering looking . on a little more loin "
    "also would consider higher to look good unknown the screening foo "
    "bar , unknown however unknown </s>",
    "on a little more loin also would consider higher to look good "
    "unknown the screening foo bar , unknown however unknown </s>",
    "on a little more loin also would consider higher to look good",
    "more loin also would consider higher to look good",
    "more loin also would consider higher to look",
    "also would consider higher to look",
    "also would consider higher",
    "would consider higher to look",
    "consider higher to look",
    "consider higher to",
    "consider higher",
]

GROW_SMALL = [
    "in biarritz watching considering looking . </s>",
    "in biarritz watching considering looking .",
    "in biarritz",
]


@pytest.mark.parametrize("text", GROW_BIG + GROW_SMALL)
def test_grow(m, text):
    ids = [wid(m, w) for w in text.split()]
    expect = left_to_right(m, ids)
    assert right_to_left(m, ids) == pytest.approx(expect, **APPROX)
    assert tree_middle(m, ids) == pytest.approx(expect, **APPROX)


def test_also_would_consider_higher(m):
    also = ChartState()
    score = RuleScore(m, also)
    score.terminal(wid(m, "also"))
    assert score.finish() == pytest.approx(-1.687872, **APPROX)

    would = ChartState()
    score = RuleScore(m, would)
    score.terminal(wid(m, "would"))
    assert score.finish() == pytest.approx(-1.687872, **APPROX)

    combine_also_would = ChartState()
    score = RuleScore(m, combine_also_would)
    score.non_terminal(also, -1.687872)
    score.non_terminal(would, -1.687872)
    assert score.finish() == pytest.approx(-1.687872 - 2.0, **APPROX)
    assert combine_also_would.right.length == 2

    also_would = ChartState()
    score = RuleScore(m, also_would)
    score.terminal(wid(m, "also"))
    score.terminal(wid(m, "would"))
    assert score.finish() == pytest.approx(-1.687872 - 2.0, **APPROX)
    assert also_would.right.length == 2

    consider = ChartState()
    score = RuleScore(m, consider)
    score.terminal(wid(m, "consider"))
    assert score.finish() == pytest.approx(-1.687872, **APPROX)
    assert consider.left.length == 1
    assert consider.right.length == 1
    assert not consider.left.full

    higher = ChartState()
    score = RuleScore(m, higher)
    score.terminal(wid(m, "higher"))
    higher_score = score.finish()
    assert higher_score == pytest.approx(-1.509559, **APPROX)
    assert higher.left.length == 1
    assert higher.right.length == 1
    assert not higher.left.full
    assert higher.right.words[0] == wid(m, "higher")
    assert higher.right.backoffs[0] == pytest.approx(-0.30103, **APPROX)

    consider_higher = ChartState()
    score = RuleScore(m, consider_higher)
    score.non_terminal(consider, -1.687872)
    score.non_terminal(higher, higher_score)
    assert score.finish() == pytest.approx(
        -1.509559 - 1.687872 - 0.30103, **APPROX
    )
    assert consider_higher.left.length == 2
    assert not consider_higher.left.full

    full = ChartState()
    score = RuleScore(m, full)
    score.non_terminal(combine_also_would, -1.687872 - 2.0)
    score.non_terminal(consider_higher, -1.509559 - 1.687872 - 0.30103)
    assert score.finish() == pytest.approx(-10.6879, **APPROX)
    assert full.right.length == 4


def test_full_grow(m):
    text = "in biarritz watching considering looking . </s>"
    ids = [wid(m, w) for w in text.split()]

    lexical, lexical_scores = [], []
    for w in ids:
        s = ChartState()
        score = RuleScore(m, s)
        score.terminal(w)
        lexical.append(s)
        lexical_scores.append(score.finish())
    assert lexical_scores[0] == pytest.approx(
        left_to_right(m, ids[:1]), **APPROX
    )
    assert lexical_scores[6] == pytest.approx(
        left_to_right(m, ids[6:7]), **APPROX
    )

    l1, l1_scores = [], []
    for i in range(3):
        s = ChartState()
        score = RuleScore(m, s)
        score.non_terminal(lexical[2 * i], lexical_scores[2 * i])
        score.non_terminal(lexical[2 * i + 1], lexical_scores[2 * i + 1])
        l1.append(s)
        l1_scores.append(score.finish())
        assert l1_scores[i] == pytest.approx(
            left_to_right(m, ids[2 * i : 2 * i + 2]), **APPROX
        )
    assert l1[2].left.length == 1
    l1.append(lexical[6])
    l1_scores.append(lexical_scores[6])

    l2, l2_scores = [], []
    for i in range(2):
        s = ChartState()
        score = RuleScore(m, s)
        score.non_terminal(l1[2 * i], l1_scores[2 * i])
        score.non_terminal(l1[2 * i + 1], l1_scores[2 * i + 1])
        l2.append(s)
        l2_scores.append(score.finish())
    assert l2_scores[0] == pytest.approx(left_to_right(m, ids[:4]), **APPROX)
    assert l2_scores[1] == pytest.approx(left_to_right(m, ids[4:7]), **APPROX)
    assert l2[1].left.length == 1
    assert l2[1].left.full

    top = ChartState()
    score = RuleScore(m, top)
    score.non_terminal(l2[0], l2_scores[0])
    score.non_terminal(l2[1], l2_scores[1])
    assert score.finish() == pytest.approx(left_to_right(m, ids), **APPROX)
