"""Interpolation-weight tuning goldens, transcribed from
lm/interpolate/tune_derivatives_test.cc (Small) and
lm/interpolate/tune_instances_test.cc (Toy)."""

import math
import os

import numpy as np
import pytest

from kenlm_spark.ngram.tune import (
    Extension,
    Instances,
    build_instances,
    derivatives,
    tune_weights,
)

LN10 = math.log(10.0)
REF = "/root/reference/lm/common/test_data"


def test_derivatives_small_golden():
    """tune_derivatives_test.cc:48-137 (Small): two models, three words
    plus <s>, one instance, two sparse extensions."""
    unigrams = np.log(
        np.array(
            [
                [0.1, 0.6],
                [0.4, 0.3],
                [0.5, 0.1],
                [1.0, 1.0],  # <s>
            ]
        )
    )
    ln_backoffs = np.log(np.array([[0.2, 0.4]]))
    model_1_word_1 = 1.0 - 0.6 * 0.4 - 0.1 * 0.4
    model_0_word_2 = 1.0 - 0.1 * 0.2 - 0.4 * 0.2
    neg_correct = -np.log(np.array([0.4 * 0.2, model_1_word_1]))
    exts = [
        Extension(0, 1, 1, math.log(model_1_word_1)),
        Extension(0, 2, 0, math.log(model_0_word_2)),
    ]
    inst = Instances(
        ln_unigrams=unigrams,
        ln_backoffs=ln_backoffs,
        neg_ln_correct_sum=neg_correct,
        extensions=exts,
        bos=3,
    )
    weights = np.array([0.9, 1.2])
    _, gradient, hessian = derivatives(inst, weights)

    p_i = np.array(
        [
            (0.1 * 0.2) ** 0.9 * (0.6 * 0.4) ** 1.2,
            (0.4 * 0.2) ** 0.9 * model_1_word_1**1.2,
            model_0_word_2**0.9 * (0.1 * 0.4) ** 1.2,
        ]
    )
    p_i /= p_i.sum()

    expected_gradient = neg_correct.copy()
    expected_gradient[0] += p_i[0] * math.log(0.1 * 0.2)
    expected_gradient[0] += p_i[1] * math.log(0.4 * 0.2)
    expected_gradient[0] += p_i[2] * math.log(model_0_word_2)
    expected_gradient[1] += p_i[0] * math.log(0.6 * 0.4)
    expected_gradient[1] += p_i[1] * math.log(model_1_word_1)
    expected_gradient[1] += p_i[2] * math.log(0.1 * 0.4)
    assert gradient == pytest.approx(expected_gradient, rel=1e-4)

    ln0 = [math.log(0.1 * 0.2), math.log(0.4 * 0.2), math.log(model_0_word_2)]
    ln1 = [math.log(0.6 * 0.4), math.log(model_1_word_1), math.log(0.1 * 0.4)]
    expected_h10 = sum(p_i[x] * ln0[x] * ln1[x] for x in range(3)) - sum(
        p_i[x] * ln0[x] for x in range(3)
    ) * sum(p_i[x] * ln1[x] for x in range(3))
    assert hessian[1, 0] == pytest.approx(expected_h10, rel=1e-4)
    assert hessian[0, 1] == pytest.approx(expected_h10, rel=1e-4)


@pytest.fixture(scope="module")
def toy_rows():
    if not os.path.isdir(REF):
        pytest.skip("reference test_data not available")
    from kenlm_spark.oracle import arpa_ngram_rows

    return (
        list(arpa_ngram_rows(f"{REF}/toy0.arpa")),
        list(arpa_ngram_rows(f"{REF}/toy1.arpa")),
    )


def test_instances_toy_golden(toy_rows):
    """tune_instances_test.cc:19-135 (Toy): tuning text 'c' over toy0+toy1."""
    inst = build_instances(list(toy_rows), [["c"]])

    # union vocab ids: <unk>=0 <s>=1 a=2 </s>=3 c=4 b=5
    assert inst.vocab == ["<unk>", "<s>", "a", "</s>", "c", "b"]
    assert inst.bos == 1

    lu = inst.ln_unigrams
    assert lu[0, 0] == pytest.approx(-0.90309 * LN10, rel=1e-4)
    assert lu[0, 1] == pytest.approx(-1.0 * LN10, rel=1e-4)
    assert not math.isnan(lu[1, 0]) and not math.isnan(lu[1, 1])
    assert lu[2, 0] == pytest.approx(-0.46943438 * LN10, rel=1e-4)
    assert lu[2, 1] == pytest.approx(-0.6146491 * LN10, rel=1e-4)
    assert lu[3, 0] == pytest.approx(-0.5720968 * LN10, rel=1e-4)
    assert lu[3, 1] == pytest.approx(-0.6146491 * LN10, rel=1e-4)
    assert lu[4, 0] == pytest.approx(-0.90309 * LN10, rel=1e-4)  # unk
    assert lu[4, 1] == pytest.approx(-0.7659168 * LN10, rel=1e-4)

    assert inst.num_instances == 2
    assert inst.ln_backoffs[0, 0] == pytest.approx(-0.30103 * LN10, rel=1e-4)
    assert inst.ln_backoffs[0, 1] == pytest.approx(-0.30103 * LN10, rel=1e-4)
    assert inst.ln_backoffs[1, 0] == pytest.approx(0.0, abs=1e-9)
    assert inst.ln_backoffs[1, 1] == pytest.approx(
        (-0.30103 - 0.30103) * LN10, rel=1e-4
    )

    exp = [
        (0, 2, 0, -0.37712017 * LN10),  # <s> a, model 0
        (0, 2, 1, -0.4301247 * LN10),   # <s> a, model 1
        (0, 4, 1, -0.4740302 * LN10),   # <s> c, model 1
        (0, 5, 0, -0.41574955 * LN10),  # <s> b, model 0
        (1, 3, 1, -0.09113217 * LN10),  # c </s>, model 1
    ]
    assert len(inst.extensions) == len(exp)
    for e, (i, w, m, p) in zip(inst.extensions, exp):
        assert (e.instance, e.word, e.model) == (i, w, m)
        assert e.ln_prob == pytest.approx(p, rel=1e-4)


def test_tune_weights_improves_ppl(toy_rows):
    """End-to-end Newton loop: tuned weights must not worsen held-out
    perplexity vs uniform, and must favor the model that generated the
    tuning text."""
    sentences = [["a", "a", "b"], ["b", "b", "b"], ["a", "b", "b"]]
    inst = build_instances(list(toy_rows), sentences)
    w0 = np.full(2, 0.5)
    ppl_uniform, _, _ = derivatives(inst, w0)
    w = tune_weights(inst)
    ppl_tuned, _, _ = derivatives(inst, w)
    assert ppl_tuned <= ppl_uniform + 1e-9
    # 'b b b' sequences exist only in toy1's n-grams
    assert w[1] > w[0]


def test_gradient_matches_finite_difference(toy_rows):
    """Analytic gradient vs central finite difference of the objective
    (mean negative log-likelihood = ln ppl)."""
    inst = build_instances(list(toy_rows), [["a", "b"], ["c"]])
    w = np.array([0.8, 1.1])
    _, grad, _ = derivatives(inst, w)
    eps = 1e-6
    for i in range(2):
        wp, wm = w.copy(), w.copy()
        wp[i] += eps
        wm[i] -= eps
        pp, _, _ = derivatives(inst, wp)
        pm, _, _ = derivatives(inst, wm)
        fd = (math.log(pp) - math.log(pm)) / (2 * eps) * inst.num_instances
        assert grad[i] == pytest.approx(fd, rel=1e-4)
