"""kenlm_compat: the python/kenlm.pyx-compatible facade, differential-
tested against the COMPILED reference binding when present."""

import copy
import os
import pickle

import pytest

import kenlm_spark.kenlm_compat as kenlm

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
ARPA = os.path.join(FIX, "test.arpa")

SENTENCES = [
    "looking on a little more loin",
    "on a little more loin",
    "screening on considering",
    "foo bar zzz unknown",
]


@pytest.fixture(scope="module")
def model():
    return kenlm.Model(ARPA)


def _ref():
    import sys

    sys.path.insert(0, "/tmp/refbuild")
    try:
        import kenlm as ref_kenlm
    except ImportError:
        return None
    return ref_kenlm


def test_model_basics(model):
    assert model.order == 5
    assert "looking" in model and "zzz" not in model
    assert repr(model) == "<Model from test.arpa>"
    m2 = pickle.loads(pickle.dumps(model))
    assert m2.score(SENTENCES[0]) == model.score(SENTENCES[0])


def test_missing_file_raises_ioerror():
    with pytest.raises(IOError, match="Cannot read model"):
        kenlm.Model("/nonexistent/model.arpa")


def test_state_value_semantics(model):
    a, b = kenlm.State(), kenlm.State()
    model.BeginSentenceWrite(a)
    model.BeginSentenceWrite(b)
    assert a == b and hash(a) == hash(b)
    model.NullContextWrite(b)
    assert a != b
    c = copy.copy(a)
    assert c == a and c is not a
    assert copy.deepcopy(a) == a


def test_base_score_chain_equals_score(model):
    """Stepping BaseScore through a sentence == Model.score (pyx:153-207)."""
    for s in SENTENCES:
        state, out = kenlm.State(), kenlm.State()
        model.BeginSentenceWrite(state)
        total = 0.0
        for w in s.split():
            total += model.BaseScore(state, w, out)
            state, out = out, state
        total += model.BaseScore(state, "</s>", out)
        assert total == pytest.approx(model.score(s), abs=1e-5)


def test_full_scores_and_oov(model):
    rows = list(model.full_scores(SENTENCES[3]))
    assert len(rows) == 5  # 4 words + </s>
    oovs = [oov for _, _, oov in rows]
    assert oovs == [False, False, True, True, False]
    st, out = kenlm.State(), kenlm.State()
    model.NullContextWrite(st)
    ret = model.BaseFullScore(st, "zzz", out)
    assert ret.oov and ret.ngram_length == 1
    assert "FullScoreReturn(" in repr(ret)


def test_binary_models_load_through_compat():
    for f in ["test_probing.klm", "test_trie_quant_array.klm"]:
        m = kenlm.Model(os.path.join(FIX, f))
        a = kenlm.Model(ARPA)
        for s in SENTENCES:
            assert m.score(s) == pytest.approx(a.score(s), abs=1e-5)


def test_differential_vs_compiled_reference(model):
    """Method-by-method parity with the real binding on the same file."""
    ref_kenlm = _ref()
    if ref_kenlm is None:
        pytest.skip("compiled reference binding not present")
    ref = ref_kenlm.Model(ARPA)
    assert ref.order == model.order
    for s in SENTENCES:
        for bos in (True, False):
            for eos in (True, False):
                assert model.score(s, bos=bos, eos=eos) == pytest.approx(
                    ref.score(s, bos=bos, eos=eos), abs=1e-4
                ), (s, bos, eos)
        assert model.perplexity(s) == pytest.approx(
            ref.perplexity(s), rel=1e-4
        )
        ours = list(model.full_scores(s))
        theirs = list(ref.full_scores(s))
        assert len(ours) == len(theirs)
        for (p1, l1, o1), (p2, l2, o2) in zip(ours, theirs):
            assert p1 == pytest.approx(p2, abs=1e-4)
            assert (l1, o1) == (l2, o2)
    # BaseScore / BaseFullScore stepping parity
    s_ours, o_ours = kenlm.State(), kenlm.State()
    s_ref, o_ref = ref_kenlm.State(), ref_kenlm.State()
    model.BeginSentenceWrite(s_ours)
    ref.BeginSentenceWrite(s_ref)
    for w in SENTENCES[0].split():
        r1 = model.BaseFullScore(s_ours, w, o_ours)
        r2 = ref.BaseFullScore(s_ref, w, o_ref)
        assert r1.log_prob == pytest.approx(r2.log_prob, abs=1e-4)
        assert r1.ngram_length == r2.ngram_length and r1.oov == r2.oov
        s_ours, o_ours = o_ours, s_ours
        s_ref, o_ref = o_ref, s_ref


def test_state_hash_and_compare_match_binding():
    """F8 (lm/state.hh hash_value + State::Compare): State.__hash__ is
    MurmurHash64A over the uint32 word array viewed as signed int64, and
    ordering is length-then-memcmp — both bit-identical to the compiled
    reference binding on the same states."""
    import os
    import sys

    import pytest

    import kenlm_spark.kenlm_compat as K

    if not os.path.isdir("/tmp/refbuild"):
        pytest.skip("compiled reference not present")
    sys.path.insert(0, "/tmp/refbuild")
    try:
        import kenlm as ref
    except ImportError:
        pytest.skip("compiled reference binding not present")

    klm = os.path.join(os.path.dirname(__file__), "fixtures",
                       "test_probing.klm")
    rm, om = ref.Model(klm), K.Model(klm)
    words = "looking on a little more loin biarritz unknown".split()
    rs, os_ = ref.State(), K.State()
    rm.BeginSentenceWrite(rs)
    om.BeginSentenceWrite(os_)
    states = [(ref.State(), K.State())]
    rm.NullContextWrite(states[0][0])
    om.NullContextWrite(states[0][1])
    for w in words:
        r_out, o_out = ref.State(), K.State()
        rm.BaseScore(rs, w, r_out)
        om.BaseScore(os_, w, o_out)
        states.append((r_out, o_out))
        rs, os_ = r_out, o_out
    for r, o in states:
        assert hash(o) == hash(r)
    for (r1, o1) in states:
        for (r2, o2) in states:
            assert (o1 < o2) == (r1 < r2)
            assert (o1 == o2) == (r1 == r2)
