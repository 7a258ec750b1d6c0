"""REST_PROBING (lm/value.hh RestValue + MaxRestBuild) goldens:
left_test.cc:388-392 (RestProbing = GrowBig under a rest model, closed
compositions equal sequential scoring) plus a brute-force check of the
MaxRest closure values."""

from pathlib import Path

import pytest

from kenlm_spark.ngram.arpa import load_arpa
from kenlm_spark.ngram.hashing import ngram_key

from tests.test_left import GROW_BIG, left_to_right, right_to_left, tree_middle

FIXTURES = Path(__file__).parent / "fixtures"
APPROX = dict(rel=1e-3)


@pytest.fixture(scope="module")
def rest_model():
    return load_arpa(str(FIXTURES / "test.arpa"), rest=True)


@pytest.mark.parametrize("text", GROW_BIG)
def test_rest_grow_big(rest_model, text):
    """left_test.cc RestProbing: with rest weights, right-to-left and tree
    compositions CLOSED by BeginSentence still equal sequential scoring
    (UnRest converts the optimistic charges back)."""
    m = rest_model
    ids = [m.word_id(w) for w in text.split()]
    expect = left_to_right(m, ids, begin_sentence=True)
    assert right_to_left(m, ids, begin_sentence=True) == pytest.approx(
        expect, **APPROX
    )
    assert tree_middle(m, ids, begin_sentence=True) == pytest.approx(
        expect, **APPROX
    )


def test_rest_values_match_bruteforce(rest_model):
    """MaxRestBuild: rest(g) = max(-|prob(g)|, max over every n-gram
    extending g left, transitively) — brute-forced from the raw ARPA."""
    from kenlm_spark.oracle import arpa_ngram_rows

    rows = list(arpa_ngram_rows(str(FIXTURES / "test.arpa")))
    order = max(n for n, _, _, _ in rows)
    by_words = {tuple(g.split(" ")): (n, p) for n, g, p, _ in rows}

    # closure: push -|prob| of every gram onto all of its proper suffixes
    rest = {w: -abs(p) for w, (n, p) in by_words.items() if n < order}
    for words in sorted(by_words, key=len, reverse=True):
        n, p = by_words[words]
        val = rest.get(words, -abs(p))
        for cut in range(1, len(words)):
            sfx = words[cut:]
            if sfx in rest and val > rest[sfx]:
                rest[sfx] = val

    m = rest_model
    checked = 0
    for words, r in rest.items():
        n = len(words)
        if n == 1:
            got = m._uni_rest(m.word_id(words[0]))
        else:
            ids = [m.word_id(w) for w in words]
            hit = m._find(n, ngram_key(ids))
            if hit is None:  # hallucinated-blank bookkeeping differences
                continue
            got = hit[3]
        assert got == pytest.approx(r, rel=1e-5, abs=1e-5), words
        checked += 1
    assert checked > 50


def test_rest_surfaces_in_full_score(rest_model):
    """FullScoreReturn.rest >= prob for open-left matches (rest is an
    optimistic max), and non-rest models keep rest == prob."""
    m = rest_model
    ret, _ = m.full_score(m.null_context_state(), m.word_id("little"))
    assert ret.rest >= ret.log10_prob
    plain = load_arpa(str(FIXTURES / "test.arpa"))
    ret_p, _ = plain.full_score(plain.null_context_state(), plain.word_id("little"))
    assert ret_p.rest == ret_p.log10_prob
    assert not plain.has_rest and m.has_rest