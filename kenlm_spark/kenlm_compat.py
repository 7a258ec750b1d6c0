"""Drop-in twin of the reference's Python binding (python/kenlm.pyx).

A user of the reference scores with ``import kenlm; m = kenlm.Model(path);
m.score(s)``. This module exposes the same classes, method names, call
conventions (mutable State out-params), and exception behavior over our
pure-Python :class:`~kenlm_spark.ngram.model.NGramModel` — so that code
written against the reference binding runs unchanged:

    import kenlm_spark.kenlm_compat as kenlm

    model = kenlm.Model("model.arpa")          # or .klm/.binary (all
    model.score("this is a sentence .")        #  6 binary layouts)
    state, out = kenlm.State(), kenlm.State()
    model.BeginSentenceWrite(state)
    model.BaseScore(state, "this", out)

API parity targets python/kenlm.pyx:11-320 (FullScoreReturn, State with
rich comparison/hash/copy, Config, Model.score/perplexity/full_scores/
BeginSentenceWrite/NullContextWrite/BaseScore/BaseFullScore/__contains__/
__reduce__, LanguageModel alias); differential-tested method-by-method
against the compiled reference binding in tests/test_kenlm_compat.py.
"""

from __future__ import annotations

import os

from kenlm_spark.ngram.model import NGramModel
from kenlm_spark.ngram.model import State as _CoreState


class FullScoreReturn:
    """python/kenlm.pyx:11-42 — (log_prob, ngram_length, oov)."""

    __slots__ = ("log_prob", "ngram_length", "oov")

    def __init__(self, log_prob: float, ngram_length: int, oov: bool):
        self.log_prob = log_prob
        self.ngram_length = ngram_length
        self.oov = oov

    def __repr__(self):
        return "{0}({1}, {2}, {3})".format(
            self.__class__.__name__,
            repr(self.log_prob),
            repr(self.ngram_length),
            repr(self.oov),
        )


class State:
    """python/kenlm.pyx:44-91 — mutable context state with value
    semantics (==, hash, copy)."""

    __slots__ = ("_core",)

    def __init__(self):
        self._core = _CoreState([], [])

    def _key(self):
        return tuple(self._core.words)

    def _cmp(self, other) -> int:
        """lm/state.hh State::Compare: length first, then memcmp over the
        little-endian uint32 word array."""
        a, b = self._core.words, other._core.words
        if len(a) != len(b):
            return -1 if len(a) < len(b) else 1
        import numpy as np

        ab = np.asarray(a, dtype="<u4").tobytes()
        bb = np.asarray(b, dtype="<u4").tobytes()
        return (ab > bb) - (ab < bb)

    def __eq__(self, other):
        return isinstance(other, State) and self._cmp(other) == 0

    def __lt__(self, other):
        return self._cmp(other) < 0

    def __le__(self, other):
        return self._cmp(other) <= 0

    def __gt__(self, other):
        return self._cmp(other) > 0

    def __ge__(self, other):
        return self._cmp(other) >= 0

    def __hash__(self):
        # python/kenlm.pyx:70-71 -> lm/state.hh hash_value:
        # MurmurHash64A over the uint32 word array, seed 0, viewed as a
        # signed 64-bit Py_hash_t (F8 — bit-parity with the binding)
        import numpy as np

        from kenlm_spark.ngram.hashing import murmur_hash64a

        h = murmur_hash64a(
            np.asarray(self._core.words, dtype="<u4").tobytes()
        )
        return int(np.uint64(h).astype(np.int64))

    def __copy__(self):
        ret = State()
        ret._core = _CoreState(
            list(self._core.words), list(self._core.backoffs)
        )
        return ret

    def __deepcopy__(self, memo=None):
        return self.__copy__()


class Config:
    """python/kenlm.pyx:93-119 — loader knobs. The pure-Python loader has
    no mmap modes, so these are accepted and ignored."""

    def __init__(self):
        self.load_method = "POPULATE_OR_READ"
        self.show_progress = False
        self.arpa_complain = "ALL"


class Model:
    """python/kenlm.pyx:121-315 over NGramModel (ARPA, gz/bz2/xz, and all
    six binary layouts via kenlm_spark.ngram.binary.load_model)."""

    def __init__(self, path, config: Config | None = None):
        self.path = os.path.abspath(as_str(path).decode())
        try:
            from kenlm_spark.ngram.binary import load_model

            self._model: NGramModel = load_model(self.path)
        except OSError as exception:
            raise IOError(
                "Cannot read model '{}' ({})".format(path, exception)
            ) from exception

    @property
    def order(self) -> int:
        return self._model.order

    def score(self, sentence, bos=True, eos=True) -> float:
        return self._model.score(
            as_str(sentence).decode(), bos=bos, eos=eos
        )

    def perplexity(self, sentence) -> float:
        return self._model.perplexity(as_str(sentence).decode())

    def full_scores(self, sentence, bos=True, eos=True):
        yield from self._model.full_scores(
            as_str(sentence).decode(), bos=bos, eos=eos
        )

    def BeginSentenceWrite(self, state: State) -> None:
        state._core = self._model.begin_sentence_state()

    def NullContextWrite(self, state: State) -> None:
        state._core = self._model.null_context_state()

    def BaseScore(self, in_state: State, word, out_state: State) -> float:
        ret, out = self._model.full_score(
            in_state._core, self._model.word_id(as_str(word).decode())
        )
        out_state._core = out
        return ret.log10_prob

    def BaseFullScore(
        self, in_state: State, word, out_state: State
    ) -> FullScoreReturn:
        wid = self._model.word_id(as_str(word).decode())
        ret, out = self._model.full_score(in_state._core, wid)
        out_state._core = out
        return FullScoreReturn(ret.log10_prob, ret.ngram_length, wid == 0)

    def __contains__(self, word) -> bool:
        return self._model.word_id(as_str(word).decode()) != 0

    def __repr__(self):
        return "<Model from {0}>".format(os.path.basename(self.path))

    def __reduce__(self):
        return (Model, (self.path,))


class LanguageModel(Model):
    """Backwards compatability stub.  Use Model."""


def as_str(data) -> bytes:
    """python/kenlm.pyx:4-9."""
    if isinstance(data, bytes):
        return data
    elif isinstance(data, str):
        return data.encode("utf8")
    raise TypeError(
        "Cannot convert %s to string" % type(data)
    )
