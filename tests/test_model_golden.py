"""Golden scoring tests transcribed from the reference's unit tests.

Expectations come from /root/reference/lm/model_test.cc:66-180 (Starters,
Continuation, Blanks, Unknowns, MinimalState) run against lm/test.arpa, and
/root/reference/python/example.py:17 (sum(full_scores) == score).
Tolerance mirrors SLOPPY_CHECK_CLOSE(…, 0.001%) loosely: abs/rel 1e-4.
"""

from pathlib import Path

import numpy as np
import pytest

from kenlm_spark.ngram.arpa import load_arpa
from kenlm_spark.ngram.model import NGramModel

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def model() -> NGramModel:
    return load_arpa(str(FIXTURES / "test.arpa"))


@pytest.fixture(scope="module")
def model_nounk() -> NGramModel:
    return load_arpa(str(FIXTURES / "test_nounk.arpa"))


def run(model, state, word, exp_prob, exp_len, exp_indep=None, exp_state_len=None):
    ret, out = model.full_score(state, model.word_id(word))
    assert ret.log10_prob == pytest.approx(exp_prob, rel=1e-4, abs=1e-4), word
    assert ret.ngram_length == exp_len, word
    if exp_indep is not None:
        assert ret.independent_left == exp_indep, word
    if exp_state_len is not None:
        assert out.length == exp_state_len, word
    return out


class TestStarters:
    # model_test.cc:66-78
    def test_looking(self, model):
        run(model, model.begin_sentence_state(), "looking", -0.4846522, 2, True)

    def test_comma_charges_bos_backoff(self, model):
        run(model, model.begin_sentence_state(), ",", -1.383514 + -0.4149733, 1, True)

    def test_oov_charges_bos_backoff(self, model):
        st = model.begin_sentence_state()
        ret, _ = model.full_score(st, model.word_id("this_is_not_found"))
        assert ret.oov
        assert ret.log10_prob == pytest.approx(-1.995635 + -0.4149733, rel=1e-4)
        assert ret.ngram_length == 1


class TestContinuation:
    # model_test.cc:80-103
    def test_full_chain(self, model):
        st = model.begin_sentence_state()
        st = run(model, st, "looking", -0.484652, 2, True)
        st = run(model, st, "on", -0.348837, 3, True)
        st = run(model, st, "a", -0.0155266, 4, True)
        st = run(model, st, "little", -0.00306122, 5, True)
        preserve = st
        st = run(model, st, "the", -4.04005, 1, True)
        st = run(model, st, "biarritz", -1.9889, 1, True)
        st = run(model, st, "not_found", -2.29666, 1, True)
        st = run(model, st, "more", -1.20632 - 20.0, 1, True)
        st = run(model, st, ".", -0.51363, 2, True)
        st = run(model, st, "</s>", -0.0191651, 3, True)
        assert st.length == 0

        st = run(model, preserve, "more", -0.00181395, 5, True, exp_state_len=4)
        st = run(model, st, "loin", -0.0432557, 5, True, exp_state_len=1)


class TestBlanks:
    # model_test.cc:105-137
    def test_also_would_consider(self, model):
        st = model.null_context_state()
        st = run(model, st, "also", -1.687872, 1, False)
        st = run(model, st, "would", -2.0, 2, True)
        st = run(model, st, "consider", -3.0, 3, True)
        preserve = st
        st = run(model, st, "higher", -4.0, 4, True)
        st = run(model, st, "looking", -5.0, 5, True, exp_state_len=1)

        run(model, preserve, "not_found", -1.995635 - 7.0 - 0.30103, 1, True)

    def test_higher_looking_blank(self, model):
        st = model.null_context_state()
        st = run(model, st, "higher", -1.509559, 1, False)
        st = run(
            model, st, "looking", -1.285941 - 0.30103, 2, False, exp_state_len=1
        )
        higher_looking = st
        run(model, st, "not_found", -1.995635 - 0.4771212, 1, True)
        run(model, higher_looking, "consider", -1.687872 - 0.4771212, 1, True)

    def test_would_consider_blanks(self, model):
        st = model.null_context_state()
        st = run(model, st, "would", -1.687872, 1, False, exp_state_len=1)
        st = run(
            model, st, "consider", -1.687872 - 0.30103, 2, False, exp_state_len=2
        )
        st = run(model, st, "higher", -1.509559 - 0.30103, 3, False, exp_state_len=3)
        run(model, st, "looking", -1.285941 - 0.30103, 4, False)


class TestUnknowns:
    # model_test.cc:139-154
    def test_unk_bigrams(self, model):
        st = model.null_context_state()
        st = run(model, st, "not_found", -1.995635, 1, False)
        preserve = st
        st = run(model, st, "not_found2", -15.0, 2, True)
        st = run(model, st, "not_found3", -15.0 - 2.0, 2, True)

        st = run(model, preserve, "however", -4.0, 2, True)
        run(model, st, "not_found3", -6.0, 3, True)


class TestMinimalState:
    # model_test.cc:156-180
    def test_baz_foo_bar(self, model):
        st = model.null_context_state()
        st = run(model, st, "baz", -6.535897, 1, True, exp_state_len=0)
        st = model.null_context_state()
        st = run(model, st, "foo", -3.141592, 1, True, exp_state_len=1)
        st = run(model, st, "bar", -6.0, 2, True, exp_state_len=1)
        # has to include the (positive!) backoff weight of "bar"
        st = run(model, st, "bar", -2.718281 + 3.0, 1, True, exp_state_len=1)

    def test_to_look_a(self, model):
        st = model.null_context_state()
        st = run(model, st, "to", -1.687872, 1, False)
        st = run(model, st, "look", -0.2922095, 2, True, exp_state_len=2)
        run(model, st, "a", -7.0, 3, True)


class TestNoUnk:
    # model_test.cc:281-287 — missing <unk> defaults to -100.
    def test_unk_defaults(self, model_nounk):
        st = model_nounk.null_context_state()
        st = run(model_nounk, st, "not_found", -100.0, 1)
        ret, _ = model_nounk.full_score(st, model_nounk.word_id("not_found"))
        assert ret.oov


class TestSentenceAPI:
    def test_sum_full_scores_equals_score(self, model):
        # python/example.py:17
        s = "looking on a little more loin . </s>"
        s2 = "screening a little more loin ."
        for sentence in (s2, "beyond the loin", "this is all not_found junk"):
            total = sum(p for p, _, _ in model.full_scores(sentence))
            assert total == pytest.approx(model.score(sentence), rel=1e-6)

    def test_perplexity_definition(self, model):
        s = "screening a little more loin ."
        ppl = model.perplexity(s)
        assert ppl == pytest.approx(
            10.0 ** (-model.score(s) / (len(s.split()) + 1)), rel=1e-9
        )


class TestVectorizedScorer:
    def test_matches_stateful_loop(self, model):
        sentences = [
            "looking on a little more loin .",
            "screening a little more loin .",
            "beyond the loin",
            "this is all not_found junk",
            "foo bar bar",
            "also would consider higher looking",
            "",
            "higher looking consider",
            "the the the the the the the the the the",
        ]
        ids = [model.map_ids(s.split()) for s in sentences]
        scores, oov, n_scored = model.score_batch(ids, bos=True, eos=True)
        for i, s in enumerate(sentences):
            assert scores[i] == pytest.approx(model.score(s), rel=1e-5, abs=1e-5), s
            exp_oov = sum(1 for o in model.full_scores(s) if o[2])
            assert oov[i] == exp_oov, s
            assert n_scored[i] == len(s.split()) + 1

    def test_no_bos_eos(self, model):
        sentences = ["foo bar bar", "would consider higher looking"]
        ids = [model.map_ids(s.split()) for s in sentences]
        scores, _, _ = model.score_batch(ids, bos=False, eos=False)
        for i, s in enumerate(sentences):
            assert scores[i] == pytest.approx(
                model.score(s, bos=False, eos=False), rel=1e-5
            )

    def test_stupid_backoff_penalty(self, model):
        # One skipped context order => one log10(0.4) penalty instead of the
        # learned backoff weight.
        ids = [model.map_ids(["looking", "on"])]
        kn, _, _ = model.score_batch(ids, bos=True, eos=False)
        sb, _, _ = model.score_batch(ids, bos=True, eos=False, stupid_backoff=True)
        # "<s> looking on" is a real trigram: no penalty on either token.
        assert sb[0] == pytest.approx(kn[0], abs=1e-6)
        ids2 = [model.map_ids(["baz", "baz"])]
        sb2, _, _ = model.score_batch(ids2, bos=False, eos=False, stupid_backoff=True)
        exp = float(model.uni_prob[model.word_id("baz")]) * 2 + np.log10(0.4)
        assert sb2[0] == pytest.approx(exp, rel=1e-5)


class TestVectorizedFullScores:
    def test_per_token_detail_matches_stateful(self, model):
        sentences = [
            "looking on a little more loin .",
            "also would consider higher looking",
            "foo bar bar baz",
            "this is junk not_found stuff",
            "",
        ]
        ids = [model.map_ids(s.split()) for s in sentences]
        _, _, n_scored, (tp, nl, ov, sidx) = model.score_batch(
            ids, bos=True, eos=True, return_tokens=True
        )
        pos = 0
        for i, s in enumerate(sentences):
            expected = list(model.full_scores(s))
            assert n_scored[i] == len(expected)
            for (ep, el, eo) in expected:
                assert tp[pos] == pytest.approx(ep, rel=1e-5, abs=1e-5), (s, pos)
                assert nl[pos] == el, (s, pos)
                assert bool(ov[pos]) == eo, (s, pos)
                assert sidx[pos] == i
                pos += 1
        assert pos == len(tp)


class TestEdgeOrders:
    def test_unigram_only_model(self):
        from kenlm_spark.ngram.arpa import loads_arpa

        m = loads_arpa(
            "\\data\\\nngram 1=4\n\n\\1-grams:\n"
            "-1.0\t<unk>\n-99\t<s>\n-0.5\t</s>\n-0.3\tfoo\n\n\\end\\\n"
        )
        assert m.order == 1
        # score = p(foo) + p(</s>) with no context effects
        assert m.score("foo") == pytest.approx(-0.3 + -0.5, abs=1e-5)
        ids = [m.map_ids(["foo", "bar"])]
        s, oov, n = m.score_batch(ids)
        assert s[0] == pytest.approx(-0.3 + -1.0 + -0.5, abs=1e-5)
        assert oov[0] == 1 and n[0] == 3

    def test_bigram_model(self):
        from kenlm_spark.ngram.arpa import loads_arpa

        m = loads_arpa(
            "\\data\\\nngram 1=4\nngram 2=2\n\n\\1-grams:\n"
            "-1.0\t<unk>\n-99\t<s>\t-0.5\n-0.5\t</s>\n-0.3\tfoo\t-0.2\n\n"
            "\\2-grams:\n-0.1\t<s> foo\n-0.15\tfoo </s>\n\n\\end\\\n"
        )
        assert m.order == 2
        # <s> foo matched (-0.1), foo </s> matched (-0.15)
        assert m.score("foo") == pytest.approx(-0.1 + -0.15, abs=1e-5)
        # OOV after foo: p(<unk>) + bo(foo)
        assert m.score("foo zzz", eos=False) == pytest.approx(
            -0.1 + (-1.0 + -0.2), abs=1e-5
        )
        ids = [m.map_ids(["foo"])]
        s, _, _ = m.score_batch(ids)
        assert s[0] == pytest.approx(m.score("foo"), abs=1e-5)


class TestStateless:
    """Transcribed from model_test.cc:236-279 (Stateless) — scoring with a
    forgotten state (context words only, backoffs looked up)."""

    def fs(self, model, context_words, word):
        ctx = [model.word_id(w) for w in reversed(context_words)]
        return model.full_score_forgot_state(ctx, model.word_id(word))

    def test_stateless_goldens(self, model):
        seq = ["<s>", "looking", "on", "a", "little", "the", "biarritz",
               "not_found", "more", "."]

        def check(word_idx, ctx_len, exp_len, exp_prob):
            word = seq[word_idx]
            ctx = seq[max(0, word_idx - ctx_len):word_idx]
            ret = self.fs(model, ctx, word)
            assert ret.log10_prob == pytest.approx(exp_prob, rel=1e-4, abs=1e-4), (
                word, ctx)
            assert ret.ngram_length == exp_len, (word, ctx)

        check(1, 1, 2, -0.484652)          # looking | <s>
        check(2, 2, 3, -0.348837)          # on | <s> looking
        check(2, 1, 2, -0.4638903)         # on | looking
        check(3, 3, 4, -0.0155266)         # a | <s> looking on
        check(4, 4, 5, -0.00306122)        # little | ...
        check(5, 5, 1, -4.04005)           # the | 5-word context
        check(5, 0, 1, -1.687872)          # the | no context
        check(6, 1, 1, -1.9889)            # biarritz | the
        check(7, 1, 1, -2.29666)           # not_found | biarritz
        check(7, 0, 1, -1.995635)          # not_found | no context

    def test_nounk_forgot_state(self, model_nounk):
        # model_test.cc:281-287 NoUnkCheck
        ret = model_nounk.full_score_forgot_state([0], 0)
        assert ret.log10_prob == pytest.approx(-100.0, abs=1e-4)

    def test_stateless_matches_stateful_flags(self, model):
        """model_test.cc's StatelessTest asserts FullScoreForgotState ==
        FullScore given the same history — including independent_left,
        which must be set whenever the longest match has no left
        extension, not only at full order (ADVICE round 1)."""
        seq = ["<s>", "looking", "on", "a", "little", "the", "biarritz",
               "not_found", "more", ".", "</s>"]
        ids = [model.word_id(w) for w in seq]
        state = model.begin_sentence_state()
        saw_short_independent = False
        for i in range(1, len(ids)):
            stateful, state = model.full_score(state, ids[i])
            ctx_rev = list(reversed(ids[:i]))
            stateless = model.full_score_forgot_state(ctx_rev, ids[i])
            assert stateless.log10_prob == pytest.approx(
                stateful.log10_prob, abs=1e-6
            ), seq[i]
            assert stateless.ngram_length == stateful.ngram_length, seq[i]
            assert stateless.independent_left == stateful.independent_left, seq[i]
            if (
                stateful.independent_left
                and stateful.ngram_length < model.order
            ):
                saw_short_independent = True
        # the sequence must actually exercise the below-order case the
        # old `length >= order` shortcut got wrong
        assert saw_short_independent


class TestJoinScorer:
    """Join-based (no-broadcast) scorer must equal the broadcast batch
    scorer bit-for-bit on the same captions."""

    def test_join_matches_broadcast(self, spark, model):
        import numpy as np
        from pyspark.sql import functions as F

        from kenlm_spark.ngram.join_scorer import (
            model_table,
            score_with_join,
            vocab_table,
        )

        texts = [
            "looking on a little more loin",
            "the biarritz",
            "screening a little more",  # OOV word
            "",  # empty caption: <s> -> </s> only
            "consider higher to look good unknown",
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        joined = {
            r["doc_id"]: r
            for r in score_with_join(
                docs, "text", model_table(spark, model),
                vocab_table(spark, model), model.order, model.bos_id,
                model.eos_id,
            ).collect()
        }
        for i, t in enumerate(texts):
            ids = [np.asarray(model.map_ids(t.split()), dtype=np.int64)]
            s, o, k = model.score_batch(ids)
            r = joined[i]
            assert r["log10_prob"] == pytest.approx(float(s[0]), abs=1e-9), t
            assert r["oov_count"] == int(o[0]), t
            assert r["n_tokens"] == int(k[0]) - 1, t


class TestVocabSurface:
    # model_test.cc:299-345 — vocab enumeration yields 37 ids; API surface
    # parity with python/kenlm.pyx:149-151, :277-279.
    def test_vocab_size_and_order(self, model):
        assert model.vocab_size == 37
        assert model.order == 5

    def test_membership_is_nonzero_index(self, model):
        assert "looking" in model
        assert "<s>" in model and "</s>" in model
        assert "not_a_word" not in model
        # <unk> maps to id 0, so membership is False by Index(word) != 0
        assert "<unk>" not in model

    def test_word_ids_dense_and_unique(self, model):
        ids = sorted(model.vocab.values())
        assert ids == list(range(model.vocab_size))


def test_probing_fast_path_bit_identical_to_searchsorted():
    """score_batch's r5 probing-table fast path must gather the exact
    same payload elements as the searchsorted path — scores compared as
    raw float64 bits over random id sentences (OOV ids included)."""
    import numpy as np

    from kenlm_spark.ngram.arpa import load_arpa

    m = load_arpa(str(FIXTURES / "test.arpa"))
    rng = np.random.Generator(np.random.PCG64(3))
    sents = [
        rng.integers(0, m.vocab_size, size=rng.integers(1, 30)).astype(
            np.int64
        )
        for _ in range(300)
    ]
    # force-build tables below the size threshold so the fast path runs;
    # pin the NUMPY path (the compiled kernel has its own A/B suite in
    # test_native_kernel.py — here we compare probing vs searchsorted)
    from kenlm_spark.ngram.model import _build_probing_table

    m._native_scorer = None
    m._ptables = {
        n: _build_probing_table(m.keys[n]) for n in range(2, m.order + 1)
    }
    p1, o1, n1 = m.score_batch(sents, bos=True, eos=True)
    assert any(
        m._ptables.get(n) is not None for n in range(2, m.order + 1)
    ), "probing path not exercised"
    m._ptable = lambda n: None  # force the searchsorted fallback
    p2, o2, n2 = m.score_batch(sents, bos=True, eos=True)
    assert np.array_equal(p1.view(np.uint64), p2.view(np.uint64))
    assert np.array_equal(o1, o2) and np.array_equal(n1, n2)


def test_probing_table_never_pickled():
    """Broadcast payload contract: the lazy probing index is excluded
    from pickle (executors rebuild it in one vectorized pass)."""
    import pickle

    from kenlm_spark.ngram.arpa import load_arpa

    from kenlm_spark.ngram.model import _build_probing_table

    m = load_arpa(str(FIXTURES / "test.arpa"))
    m._ptables = {2: _build_probing_table(m.keys[2])}
    m2 = pickle.loads(pickle.dumps(m))
    assert m2._ptables == {}
