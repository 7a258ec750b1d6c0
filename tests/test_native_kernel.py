"""Raw-bits A/B pinning of the compiled scorer kernel (score_kernel.c via
native_kernel.py) against the numpy score_batch sweep.

The kernel exists to close the single-thread gap vs the reference's
compiled binding (BENCH/BASELINE.md, kenlm_benchmark protocol); its
contract is BIT-identity with the numpy path — same float64 bits per
token, same longest-match orders, same OOV counts — across backoff
modes, bos/eos modes, the probing fast path AND the binary-search path,
big models and toy models.  Live correctness vs the compiled reference
is covered by scripts/diff_reference.py, which scores through whichever
path is active (native by default)."""

from __future__ import annotations

import pathlib
import sys

import numpy as np
import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "scripts"))


def _native_available() -> bool:
    from kenlm_spark.ngram.native_kernel import _compile

    return _compile() is not None


pytestmark = pytest.mark.skipif(
    not _native_available(), reason="no C compiler available"
)


def _ab_compare(m, sents, **kw):
    """score_batch numpy vs native, raw float64 bits — both the
    per-token path (return_tokens=True → NativeScorer.score) and the
    totals-only path (return_tokens=False → score_reduce, whose in-C
    per-sentence accumulation must reproduce np.bincount's bits)."""
    m._native_scorer = None  # force numpy
    a = m.score_batch(sents, return_tokens=True, **kw)
    ar = m.score_batch(sents, **kw)
    del m.__dict__["_native_scorer"]
    assert m._native() is not None
    b = m.score_batch(sents, return_tokens=True, **kw)
    br = m.score_batch(sents, **kw)
    assert np.array_equal(a[0].view(np.uint64), b[0].view(np.uint64)), kw
    assert np.array_equal(a[1], b[1]) and np.array_equal(a[2], b[2]), kw
    for x, y in zip(a[3], b[3]):
        xa, ya = np.asarray(x), np.asarray(y)
        if xa.dtype == np.float64:
            assert np.array_equal(xa.view(np.uint64), ya.view(np.uint64)), kw
        else:
            assert np.array_equal(xa, ya), kw
    assert np.array_equal(ar[0].view(np.uint64), br[0].view(np.uint64)), kw
    assert np.array_equal(ar[1], br[1]) and np.array_equal(ar[2], br[2]), kw


def _random_sents(m, n, seed, max_len=30):
    rng = np.random.Generator(np.random.PCG64(seed))
    return [
        rng.integers(0, m.vocab_size, size=rng.integers(0, max_len)).astype(
            np.int64
        )
        for _ in range(n)
    ]


def test_native_bit_identical_toy_all_modes():
    """Toy fixture (below the probing threshold → binary-search path in
    C), every bos/eos/stupid combination, OOV ids included."""
    from kenlm_spark.ngram.arpa import load_arpa

    m = load_arpa(str(FIXTURES / "test.arpa"))
    sents = _random_sents(m, 400, seed=11)
    for stupid in (False, True):
        for bos in (True, False):
            for eos in (True, False):
                _ab_compare(
                    m, sents, bos=bos, eos=eos, stupid_backoff=stupid
                )


def test_native_bit_identical_big_model_probing():
    """24k-bigram random model — past _PROBING_MIN_KEYS, so the C kernel
    probes the same open-addressing tables as the numpy fast path."""
    from diff_reference import write_big_random_arpa

    from kenlm_spark.ngram.arpa import load_arpa
    from kenlm_spark.ngram.model import _PROBING_MIN_KEYS

    path = "/tmp/native_ab_big.arpa"
    write_big_random_arpa(path, seed=4242)
    m = load_arpa(path)
    assert len(m.keys[2]) >= _PROBING_MIN_KEYS
    sents = _random_sents(m, 600, seed=12, max_len=20)
    _ab_compare(m, sents, bos=True, eos=True, stupid_backoff=False)
    _ab_compare(m, sents, bos=False, eos=True, stupid_backoff=True)
    assert m._ptables.get(2) is not None, "probing tables not engaged"


def test_native_bit_identical_nounk_fixture():
    """The no-<unk> fixture exercises the synthesized-unknown path."""
    from kenlm_spark.ngram.arpa import load_arpa

    m = load_arpa(str(FIXTURES / "test_nounk.arpa"))
    sents = _random_sents(m, 300, seed=13)
    _ab_compare(m, sents, bos=True, eos=True, stupid_backoff=False)


def test_native_scorer_not_pickled():
    """Broadcast contract: ctypes handles never ship; each executor
    process rebuilds from the cached .so."""
    import pickle

    from kenlm_spark.ngram.arpa import load_arpa

    m = load_arpa(str(FIXTURES / "test.arpa"))
    assert m._native() is not None
    m2 = pickle.loads(pickle.dumps(m))
    assert "_native_scorer" not in m2.__dict__
    # and the restored model scores identically (rebuilding lazily)
    sents = _random_sents(m, 50, seed=14)
    a, _, _ = m.score_batch(sents)
    b, _, _ = m2.score_batch(sents)
    assert np.array_equal(a.view(np.uint64), b.view(np.uint64))


def test_native_disabled_by_env(monkeypatch):
    """KENLM_SPARK_NATIVE=0 must force the numpy path (used for A/B)."""
    import kenlm_spark.ngram.native_kernel as nk

    monkeypatch.setenv("KENLM_SPARK_NATIVE", "0")
    monkeypatch.setattr(nk, "_lib", None)
    monkeypatch.setattr(nk, "_lib_tried", False)
    assert nk._compile() is None
