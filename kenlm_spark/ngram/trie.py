"""KenLM trie binary-model reader (model types 2-5) — the compact-storage
layouts search_trie builds: plain trie, quantized, array-compressed
(Bhiksha) pointers, and both. Decodes the bit-packed arrays into the same
:class:`NGramModel` the probing/ARPA loaders produce, so every
``build_binary`` output becomes loadable (closes SURVEY §2.3 J2/O6, which
round 2 documented n/a-by-design).

Layout facts (no code) from the reference:

* region order — ``lm/search_trie.cc:546-572``: quant tables, unigram
  array, one bit-packed middle per order 2..N-1, bit-packed longest;
* sorted vocabulary — ``lm/vocab.cc:83-86`` (uint64 count + sorted
  MurmurHash array; ids are 1 + hash-sort position; strings at the end of
  the file in id order), vocab pad 8 bytes iff ``<unk>`` was not in the
  ARPA (``lm/vocab.hh:109``);
* unigram — ``lm/trie.hh:21-26``: (counts[0]+2) × (prob f32, backoff f32,
  next u64); word w's child range is [next[w], next[w+1]);
* bit-packed entries — ``lm/trie.cc:39-46`` (BaseSize: (1+entries) ×
  total_bits, +8 slop) and ``lm/trie.cc:74-84``: per entry, LSB-first:
  word (RequiredBits(counts[0])), value bits, next-pointer inline bits;
* value bits — ``lm/quantize.hh:29-56``: unquantized middles store prob
  as a 31-bit non-positive float (sign bit re-added on read,
  ``util/bit_packing.hh:145-152``) then backoff as float32; quantized
  middles store backoff-bin then prob-bin indices into per-order float
  tables laid out per ``lm/quantize.cc:50-68`` (8-byte header = version,
  prob_bits, backoff_bits) with backoff table slots 0/1 reserved for
  -0.0 / +0.0 (``lm/quantize.cc:70-77``);
* Bhiksha next pointers — ``lm/bhiksha.hh:64-105`` / ``lm/bhiksha.cc``:
  per middle, a 2-byte header (version, configured bits) at the region
  base, a uint64 offset array at ALIGN8(base)+8, inline low bits per
  entry; next(i) = (upper_bound(offsets, i)-1-begin) << inline | low(i);
  ChopBits argmin replicated exactly from ``lm/bhiksha.cc:37-52``.

The trie stores each n-gram as a root-to-node path of words read
RIGHT-to-LEFT (the root level is the n-gram's last word — queries walk
context backwards, ``lm/search_trie.hh:82-88``), so reconstruction walks
parent ranges with searchsorted and re-keys every path with the probing
hash chain. A middle entry "extends left" iff its child range is
non-empty — the trie twin of the probing sign-bit flag.
"""

from __future__ import annotations

import struct

import numpy as np

from kenlm_spark.ngram.hashing import combine_word_hash_vec
from kenlm_spark.ngram.model import NGramModel

TRIE, QUANT_TRIE, ARRAY_TRIE, QUANT_ARRAY_TRIE = 2, 3, 4, 5


def _align8(n: int) -> int:
    return ((n - 1) // 8 + 1) * 8 if n else 0


def _required_bits(max_value: int) -> int:
    if not max_value:
        return 0
    ret = 1
    while max_value := max_value >> 1:
        ret += 1
    return ret


def _chop_bits(max_offset: int, max_next: int, configured_bits: int) -> int:
    required = _required_bits(max_next)
    best_chop, lowest = 0, None
    for chop in range(0, min(required, configured_bits) + 1):
        change = (max_next >> (required - chop)) * 64 - max_offset * chop
        if lowest is None or change < lowest:
            lowest, best_chop = change, chop
    return best_chop


def _gather_bits(
    buf: np.ndarray, base_byte: int, bit_offs: np.ndarray, length: int
) -> np.ndarray:
    """Vectorized ReadInt57/ReadFloat32 twin: little-endian, LSB-first
    within the 64-bit window at byte (bit_off>>3), shifted by bit_off&7."""
    byte = base_byte + (bit_offs >> np.uint64(3)).astype(np.int64)
    shift = (bit_offs & np.uint64(7)).astype(np.uint64)
    acc = np.zeros(len(byte), dtype=np.uint64)
    for k in range(8):
        acc |= buf[byte + k].astype(np.uint64) << np.uint64(8 * k)
    mask = np.uint64((1 << length) - 1)
    return (acc >> shift) & mask


def _f32_from_bits(bits: np.ndarray) -> np.ndarray:
    return bits.astype(np.uint32).view(np.float32)


def load_trie(data: bytes, order: int, model_type: int, counts: list[int],
              sanity_size: int, fixed_size: int) -> NGramModel:
    quantized = model_type in (QUANT_TRIE, QUANT_ARRAY_TRIE)
    array = model_type in (ARRAY_TRIE, QUANT_ARRAY_TRIE)
    buf = np.frombuffer(data, np.uint8)

    header_size = _align8(sanity_size + fixed_size + 8 * order)
    (n_hashes,) = struct.unpack_from("<Q", data, header_size)
    vocab_size = 8 + 8 * counts[0]
    saw_unk = n_hashes == counts[0] - 1
    bound = n_hashes + 1
    off = header_size + vocab_size + (0 if saw_unk else 8)

    # quant tables
    prob_tab: dict[int, np.ndarray] = {}
    back_tab: dict[int, np.ndarray] = {}
    if quantized:
        version, pb, bb = data[off], data[off + 1], data[off + 2]
        if version != 2:
            raise ValueError(f"quantization version {version}, expected 2")
        t = off + 8
        for n in range(2, order):
            prob_tab[n] = np.frombuffer(data, "<f4", 1 << pb, t)
            t += 4 << pb
            back_tab[n] = np.frombuffer(data, "<f4", 1 << bb, t)
            t += 4 << bb
        prob_tab[order] = np.frombuffer(data, "<f4", 1 << pb, t)
        mid_qbits, long_qbits = pb + bb, pb
        off += (order - 2) * ((4 << pb) + (4 << bb)) + (4 << pb) + 8
    else:
        pb = bb = 0
        mid_qbits, long_qbits = 63, 31

    # unigram: (counts[0]+2) x (prob, backoff, next)
    uni = np.frombuffer(
        data, np.dtype([("prob", "<f4"), ("backoff", "<f4"), ("next", "<u8")]),
        counts[0] + 2, off,
    )
    off += (counts[0] + 2) * 16
    word_bits = _required_bits(counts[0])

    levels = []  # per order n>=2: dict(words, prob, backoff, next_all)
    for n in range(2, order):
        entries, max_next = counts[n - 1], counts[n]
        if array:
            conf_bits = data[off + 1]
            required = _required_bits(max_next)
            chop = _chop_bits(entries + 1, max_next, conf_bits)
            inline = required - chop
            acount = (max_next >> (required - chop)) + 1
            offsets = np.frombuffer(data, "<u8", acount, _align8(off) + 8)
            bsize = 8 * (1 + acount) + 7
        else:
            inline = _required_bits(max_next)
            offsets = None
            bsize = 0
        total = word_bits + mid_qbits + inline
        base = off + bsize
        idx = np.arange(entries + 1, dtype=np.uint64)
        ent = idx * np.uint64(total)
        words = _gather_bits(buf, base, ent[:entries], word_bits).astype(np.int64)
        if quantized:
            bidx = _gather_bits(buf, base, ent[:entries] + np.uint64(word_bits), bb)
            pidx = _gather_bits(
                buf, base, ent[:entries] + np.uint64(word_bits + bb), pb
            )
            prob = prob_tab[n][pidx.astype(np.int64)]
            backoff = back_tab[n][bidx.astype(np.int64)]
        else:
            p31 = _gather_bits(buf, base, ent[:entries] + np.uint64(word_bits), 31)
            prob = _f32_from_bits(p31 | np.uint64(0x80000000))
            backoff = _f32_from_bits(
                _gather_bits(buf, base, ent[:entries] + np.uint64(word_bits + 31), 32)
            )
        low = _gather_bits(
            buf, base, ent + np.uint64(word_bits + mid_qbits), inline or 1
        ) if inline else np.zeros(entries + 1, np.uint64)
        if array:
            high = (
                np.searchsorted(offsets, idx, side="right") - 1
            ).astype(np.uint64)
            nxt = (high << np.uint64(inline)) | low
        else:
            nxt = low
        levels.append(
            {"words": words, "prob": prob, "backoff": backoff, "next": nxt}
        )
        off = base + ((1 + entries) * total + 7) // 8 + 8

    # longest
    entries = counts[order - 1]
    total = word_bits + long_qbits
    ent = np.arange(entries, dtype=np.uint64) * np.uint64(total)
    long_words = _gather_bits(buf, off, ent, word_bits).astype(np.int64)
    if quantized:
        pidx = _gather_bits(buf, off, ent + np.uint64(word_bits), pb)
        long_prob = prob_tab[order][pidx.astype(np.int64)]
    else:
        p31 = _gather_bits(buf, off, ent + np.uint64(word_bits), 31)
        long_prob = _f32_from_bits(p31 | np.uint64(0x80000000))
    off += ((1 + entries) * total + 7) // 8 + 8

    # vocab strings
    tail = data[off:]
    if tail[:6] != b"<unk>\x00":
        raise ValueError(
            f"vocabulary strings not found at computed offset {off} "
            "(trie layout mismatch)"
        )
    words_list = tail.decode("utf-8").split("\x00")[:-1]
    if len(words_list) != bound:
        raise ValueError(f"{len(words_list)} vocab strings but bound={bound}")
    vocab = {w: i for i, w in enumerate(words_list)}

    # ------- reconstruct grams: parent chains down the reversed trie
    uni_next = uni["next"][: bound + 1].astype(np.uint64)

    def parents(boundaries: np.ndarray, n_children: int) -> np.ndarray:
        return (
            np.searchsorted(
                boundaries, np.arange(n_children, dtype=np.uint64), side="right"
            )
            - 1
        ).astype(np.int64)

    keys: dict[int, np.ndarray] = {}
    probs: dict[int, np.ndarray] = {}
    backoffs: dict[int, np.ndarray] = {}
    extends: dict[int, np.ndarray] = {}

    # path key of each node = hash chain folded from the ROOT (last word)
    # downward — exactly the probing key of the reconstructed n-gram.
    prev_keys = np.arange(bound, dtype=np.uint64)  # level-1 node keys
    prev_boundaries = uni_next
    for li, lvl in enumerate(levels):
        n = li + 2
        par = parents(prev_boundaries, len(lvl["words"]))
        node_keys = combine_word_hash_vec(
            prev_keys[par], lvl["words"].astype(np.uint64)
        )
        srt = np.argsort(node_keys, kind="stable")
        keys[n] = node_keys[srt]
        probs[n] = lvl["prob"][srt]
        backoffs[n] = lvl["backoff"][srt]
        nxt = lvl["next"]
        extends[n] = (nxt[1:] > nxt[:-1])[srt]
        prev_keys = node_keys
        prev_boundaries = nxt
    par = parents(prev_boundaries, len(long_words))
    node_keys = combine_word_hash_vec(
        prev_keys[par], long_words.astype(np.uint64)
    )
    srt = np.argsort(node_keys, kind="stable")
    keys[order] = node_keys[srt]
    probs[order] = long_prob[srt]

    return NGramModel(
        order=order,
        vocab=vocab,
        uni_prob=uni["prob"][:bound].copy(),
        uni_backoff=uni["backoff"][:bound].copy(),
        uni_extends=uni_next[1:] > uni_next[:-1],
        keys=keys,
        probs=probs,
        backoffs=backoffs,
        extends=extends,
    )
