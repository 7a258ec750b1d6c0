"""Interpolation weight tuning — the reference's `interpolate --tune` path.

Transcribes, Spark-free (the tuning corpus is held-out data, small by
design; the expensive part — applying the tuned weights to full model
tables — stays in Spark via ``operators.interpolate_models``):

* instance building (``lm/interpolate/tune_instances.cc``): per tuning
  word, each model's full-backoff-to-unigram charge, the correct word's
  full conditional, and sparse "extensions" (words where a model matches
  more than a unigram); golden-tested against
  ``lm/interpolate/tune_instances_test.cc`` (Toy).
* the objective/gradient/Hessian (``lm/interpolate/tune_derivatives.cc``)
  of the log-linear interpolation p_I(x|ctx) ∝ exp(Σ_i w_i ln p_i(x|ctx));
  golden-tested against ``tune_derivatives_test.cc`` (Small).
* the Newton loop (``lm/interpolate/tune_weights.cc``): 10 iterations of
  w -= 0.7 H⁻¹ g from uniform weights.

Union vocabulary order matches the reference's merged vocab: <unk> first,
then words by MurmurHash64A (verified against the Toy golden ids).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from kenlm_spark.ngram.hashing import murmur_hash64a

LN10 = math.log(10.0)
UNK, BOS_WORD, EOS_WORD = "<unk>", "<s>", "</s>"


# ------------------------------------------------------------ model wrapper


class _TableModel:
    """Dict-backed ARPA model over (order, gram, log10_prob, log10_backoff)
    rows, with the recursive backoff query and a continuation index."""

    def __init__(self, rows):
        self.prob: dict[tuple[str, ...], float] = {}
        self.backoff: dict[tuple[str, ...], float] = {}
        self.cont: dict[tuple[str, ...], list[str]] = {}
        self.vocab: set[str] = set()
        self.order = 1
        for n, gram, p, b in rows:
            words = tuple(gram.split(" "))
            self.prob[words] = p
            if b:
                self.backoff[words] = b
            self.order = max(self.order, n)
            if n == 1:
                self.vocab.add(words[0])
            else:
                self.cont.setdefault(words[:-1], []).append(words[-1])

    def map_word(self, w: str) -> str:
        return w if w in self.vocab else UNK

    def map_ctx(self, ctx: list[str]) -> tuple[str, ...]:
        return tuple(self.map_word(w) for w in ctx[-(self.order - 1):])

    def ln_cond(self, ctx: tuple[str, ...], word: str) -> float:
        """ln p(word | ctx) by the standard ARPA recursion
        (lm/read_arpa + query semantics)."""
        w = self.map_word(word)
        charge = 0.0
        for start in range(len(ctx) + 1):
            sub = ctx[start:]
            hit = self.prob.get(sub + (w,))
            if hit is not None:
                return (hit + charge) * LN10
            charge += self.backoff.get(sub, 0.0)
        raise KeyError(word)  # unreachable: <unk> unigram always present

    def ln_full_backoff(self, ctx: tuple[str, ...]) -> float:
        """ln of the backoff charged from the full context down to the
        unigram level: Σ_k bo(suffix of length k), missing suffixes
        charging nothing."""
        total = 0.0
        for k in range(1, len(ctx) + 1):
            total += self.backoff.get(ctx[len(ctx) - k:], 0.0)
        return total * LN10

    def extension_words(self, ctx: tuple[str, ...]):
        """Words w for which (some suffix of ctx, w) is an n-gram with
        n >= 2 — i.e. the conditional does NOT reduce to unigram*backoff."""
        out: set[str] = set()
        for k in range(1, len(ctx) + 1):
            out.update(self.cont.get(ctx[len(ctx) - k:], ()))
        return out


# ---------------------------------------------------------------- instances


@dataclass
class Extension:
    instance: int
    word: int
    model: int
    ln_prob: float


@dataclass
class Instances:
    ln_unigrams: np.ndarray          # (V, K) ln p_i(x), OOV -> unk prob
    ln_backoffs: np.ndarray          # (N, K) ln full-backoff per instance
    neg_ln_correct_sum: np.ndarray   # (K,)
    extensions: list[Extension]      # sorted by (instance, word, model)
    bos: int
    vocab: list[str] = field(default_factory=list)

    @property
    def num_instances(self) -> int:
        return self.ln_backoffs.shape[0]


def union_vocab(models: list[_TableModel]) -> list[str]:
    words = set()
    for m in models:
        words |= m.vocab
    words.discard(UNK)
    return [UNK] + sorted(words, key=lambda w: murmur_hash64a(w.encode()))


def build_instances(
    model_rows: list[list], sentences: list[list[str]]
) -> Instances:
    """tune_instances.cc:—: one instance per predicted token (each word of
    each sentence plus </s>), context <s>-initialized and capped at
    order-1."""
    models = [_TableModel(rows) for rows in model_rows]
    vocab = union_vocab(models)
    vid = {w: i for i, w in enumerate(vocab)}
    k = len(models)

    ln_unigrams = np.empty((len(vocab), k))
    for i, m in enumerate(models):
        unk = m.prob[(UNK,)]
        for x, w in enumerate(vocab):
            ln_unigrams[x, i] = m.prob.get((w,), unk) * LN10

    ln_backoffs_rows: list[list[float]] = []
    neg_correct = np.zeros(k)
    extensions: list[Extension] = []
    inst = 0
    for sent in sentences:
        history = [BOS_WORD]
        for word in list(sent) + [EOS_WORD]:
            row = []
            for i, m in enumerate(models):
                ctx = m.map_ctx(history)
                row.append(m.ln_full_backoff(ctx))
                neg_correct[i] -= m.ln_cond(ctx, word)
                for w in m.extension_words(ctx):
                    extensions.append(
                        Extension(inst, vid[w], i, m.ln_cond(ctx, w))
                    )
            ln_backoffs_rows.append(row)
            history.append(word)
            inst += 1
    extensions.sort(key=lambda e: (e.instance, e.word, e.model))
    return Instances(
        ln_unigrams=ln_unigrams,
        ln_backoffs=np.asarray(ln_backoffs_rows).reshape(inst, k),
        neg_ln_correct_sum=neg_correct,
        extensions=extensions,
        bos=vid[BOS_WORD],
        vocab=vocab,
    )


# -------------------------------------------------------------- derivatives


def derivatives(inst: Instances, weights: np.ndarray):
    """tune_derivatives.cc:12-126 — returns (perplexity, gradient,
    hessian) of the tuning data under log-linear interpolation."""
    w = np.asarray(weights, dtype=np.float64)
    k = len(w)
    gradient = inst.neg_ln_correct_sum.copy()
    hessian = np.zeros((k, k))

    weighted_uni = np.exp(inst.ln_unigrams @ w)
    weighted_uni[inst.bos] = 0.0
    z_epsilon = weighted_uni.sum()
    unigram_cross = inst.ln_unigrams.T @ weighted_uni / z_epsilon  # (K,)

    sum_b_i = 0.0
    sum_ln_z_context = 0.0

    ext_idx = 0
    exts = inst.extensions
    for n in range(inst.num_instances):
        ln_bo = inst.ln_backoffs[n]  # (K,)
        weighted_backoffs = math.exp(ln_bo @ w)

        unnorm_sum_x_p_i = 0.0
        unnorm_sum_x_p_i_full = 0.0
        hessian_missing_z = np.zeros((k, k))
        full_cross = np.zeros(k)

        while ext_idx < len(exts) and exts[ext_idx].instance == n:
            word = exts[ext_idx].word
            unnorm_sum_x_p_i += weighted_uni[word]
            ln_p_i_backed = inst.ln_unigrams[word] + ln_bo
            ln_p_i_full = ln_p_i_backed.copy()
            while (
                ext_idx < len(exts)
                and exts[ext_idx].instance == n
                and exts[ext_idx].word == word
            ):
                e = exts[ext_idx]
                ln_p_i_full[e.model] = e.ln_prob
                ext_idx += 1
            weighted = math.exp(ln_p_i_full @ w)
            unnorm_sum_x_p_i_full += weighted
            full_cross += (
                weighted * ln_p_i_full
                - weighted_uni[word] * weighted_backoffs * inst.ln_unigrams[word]
            )
            hessian_missing_z += weighted * np.outer(ln_p_i_full, ln_p_i_full) - (
                weighted_uni[word]
                * weighted_backoffs
                * np.outer(ln_p_i_backed, ln_p_i_backed)
            )

        z_context = (
            weighted_backoffs * (z_epsilon - unnorm_sum_x_p_i)
            + unnorm_sum_x_p_i_full
        )
        sum_ln_z_context += math.log(z_context)
        b_i = z_epsilon / z_context * weighted_backoffs
        sum_b_i += b_i

        full_cross /= z_context
        full_cross += b_i * (ln_bo + unigram_cross) - (
            unnorm_sum_x_p_i / z_epsilon * b_i * ln_bo
        )
        gradient += full_cross

        convolve = np.outer(unigram_cross, ln_bo)
        hessian += (
            b_i * (convolve + convolve.T + np.outer(ln_bo, ln_bo))
            + hessian_missing_z / z_context
            - np.outer(full_cross, full_cross)
        )

    # final vocab-sum Hessian term
    hessian += (
        sum_b_i
        * (inst.ln_unigrams * weighted_uni[:, None]).T
        @ inst.ln_unigrams
        / z_epsilon
    )
    ppl = math.exp(
        (inst.neg_ln_correct_sum @ w + sum_ln_z_context) / inst.num_instances
    )
    return ppl, gradient, hessian


def tune_weights(
    inst: Instances, iterations: int = 10, step: float = 0.7
) -> np.ndarray:
    """tune_weights.cc:16-32 — Newton iterations from uniform weights."""
    k = inst.ln_unigrams.shape[1]
    w = np.full(k, 1.0 / k)
    for _ in range(iterations):
        _, grad, hess = derivatives(inst, w)
        # pinv, not inverse: near-identical models make the Hessian
        # singular (flat objective directions); the pseudo-inverse takes
        # the minimum-norm Newton step there, where the reference's
        # Eigen .inverse() would emit inf/NaN weights.
        w = w - step * (np.linalg.pinv(hess) @ grad)
    return w
