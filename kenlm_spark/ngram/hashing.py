"""Hash functions matching the reference's vocabulary and n-gram key hashing.

Reimplemented from public algorithm descriptions for bit-parity with the
reference engine (kpu/kenlm):

* ``murmur_hash64a`` — MurmurHash64A (Austin Appleby, public domain), the
  word-string hash used by the reference vocabulary
  (``util/murmur_hash.cc:26-80``, seed selection ``lm/vocab.cc:22-26``).
* ``combine_word_hash`` — the n-gram key recurrence used by the probing
  search (``lm/search_hashed.hh:25-28``): starting from the **last** word id
  of the n-gram and folding in earlier words one at a time.

All arithmetic is modulo 2**64. Vectorized variants use ``np.uint64`` with
wraparound; numpy integer-overflow warnings are intentional and suppressed
locally.
"""

from __future__ import annotations

import numpy as np

_MASK64 = (1 << 64) - 1

# lm/search_hashed.hh:26
_COMBINE_MUL = 8978948897894561157
_WORD_MUL = 17894857484156487943

# util/murmur_hash.cc:28-29
_MURMUR_M = 0xC6A4A7935BD1E995
_MURMUR_R = 47


def murmur_hash64a(data: bytes, seed: int = 0) -> int:
    """MurmurHash64A of ``data`` — bit-identical to util/murmur_hash.cc:26-80."""
    m = _MURMUR_M
    h = (seed ^ ((len(data) * m) & _MASK64)) & _MASK64
    n_blocks = len(data) // 8
    for i in range(n_blocks):
        k = int.from_bytes(data[i * 8 : i * 8 + 8], "little")
        k = (k * m) & _MASK64
        k ^= k >> _MURMUR_R
        k = (k * m) & _MASK64
        h ^= k
        h = (h * m) & _MASK64
    tail = data[n_blocks * 8 :]
    if tail:
        h ^= int.from_bytes(tail, "little")
        h = (h * m) & _MASK64
    h ^= h >> _MURMUR_R
    h = (h * m) & _MASK64
    h ^= h >> _MURMUR_R
    return h


def combine_word_hash(current: int, word: int) -> int:
    """One step of the n-gram key recurrence (lm/search_hashed.hh:25-28)."""
    return ((current * _COMBINE_MUL) ^ ((1 + word) * _WORD_MUL)) & _MASK64


def ngram_key(word_ids) -> int:
    """Key of an n-gram given word ids in natural (left-to-right) order.

    The reference folds from the last word backwards
    (``lm/search_hashed.cc:183-187`` builds suffix keys; query side
    ``lm/model.cc:245-296`` starts at the new word and walks context
    most-recent-first). For n==1 the key is the word id itself.
    """
    it = reversed(list(word_ids))
    h = next(it)
    for w in it:
        h = combine_word_hash(h, w)
    return h


def ngram_keys_batch(id_lists) -> np.ndarray:
    """Vectorized :func:`ngram_key` over a batch of id sequences (mixed
    lengths): fold the recurrence right-to-left per distinct length. Used
    by estimator.export_model_tables' Arrow pass; returns int64 views of
    the uint64 keys."""
    id_lists = list(id_lists)
    out = np.zeros(len(id_lists), dtype=np.uint64)
    lens = np.fromiter((len(x) for x in id_lists), dtype=np.int64,
                       count=len(id_lists))
    for ln in np.unique(lens):
        sel = np.where(lens == ln)[0]
        mat = np.array(
            [np.asarray(id_lists[i], dtype=np.uint64) for i in sel],
            dtype=np.uint64,
        ).reshape(len(sel), int(ln))
        h = mat[:, -1].copy()
        for j in range(int(ln) - 2, -1, -1):
            h = combine_word_hash_vec(h, mat[:, j])
        out[sel] = h
    return out.view(np.int64)


def combine_word_hash_vec(current: np.ndarray, words: np.ndarray) -> np.ndarray:
    """Vectorized ``combine_word_hash`` over uint64 arrays."""
    cur = current.astype(np.uint64, copy=False)
    w = words.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        return (cur * np.uint64(_COMBINE_MUL)) ^ (
            (np.uint64(1) + w) * np.uint64(_WORD_MUL)
        )
