"""KenLM binary-model reader (probing layouts) — S4 ingestion.

Parses the reference engine's ``build_binary`` output for the PROBING and
REST_PROBING model types into an :class:`NGramModel`, so users with an
existing ``.klm``/``.binary`` distribution file can load it directly
(VERDICT r2 missing item #1).

Format reimplemented from the reference sources (layout facts only, no
code):

* header / sanity block — ``lm/binary_format.cc:20-133`` (magic string,
  float/int test values, ``FixedWidthParameters``, per-order counts);
* probing vocabulary — ``lm/vocab.cc:218-283`` (8-byte header, 12-byte
  packed ``(uint64 murmur, uint32 id)`` entries) with the word strings
  NUL-separated in id order at the end of the file (``lm/vocab.cc:35-79``);
* search area — ``lm/search_hashed.cc:206-219``: ``(counts[0]+1)``
  unigram weight structs, one probing table per middle order, one for the
  longest order; bucket count = ``max(entries+1,
  uint64(float(multiplier)*float(entries)))``
  (``util/probing_hash_table.hh:108-111``), empty buckets keyed 0;
* sign-bit trick — ``lm/value.hh:16-40`` / ``lm/value_build.hh:26-29``:
  a stored middle/unigram prob with the sign bit CLEARED marks a gram
  that extends left (``MarkExtends`` unsets the sign); the query side
  re-forces the sign, so prob = -|stored| and extends = not signbit.
  Longest-order probs are stored plainly (``lm/search_hashed.hh:121-126``).

Trie variants (model types 2-5) are compact-storage layouts of the same
logical mapping; they are documented n/a-by-design in SURVEY.md §2.3 and
rejected here with a clear error.
"""

from __future__ import annotations

import struct

import numpy as np

from kenlm_spark.ngram.model import NGramModel

MAGIC = b"mmap lm http://kheafield.com/code format version 5\n\x00"
MAGIC_INCOMPLETE = b"mmap lm http://kheafield.com/code incomplete\n"

#: ModelType enum values (lm/model_type.hh)
PROBING, REST_PROBING = 0, 1
_TRIE_TYPES = {2: "TRIE", 3: "QUANT_TRIE", 4: "ARRAY_TRIE", 5: "QUANT_ARRAY_TRIE"}


def _align8(n: int) -> int:
    return ((n - 1) // 8 + 1) * 8 if n else 0


# char magic[ALIGN8(sizeof(kMagicBytes))]: the C array carries one
# implicit NUL beyond the explicit "\n\0" in the literal.
_MAGIC_FIELD = _align8(len(MAGIC) + 1)
# 3 floats + 3 uint32 + 1 uint64 (binary_format.cc:47-63)
_SANITY_SIZE = _MAGIC_FIELD + 12 + 12 + 8
# FixedWidthParameters: u8 order, f32 multiplier @4, i32 model_type @8,
# u8 has_vocabulary @12, u32 search_version @16 (natural C alignment)
_FIXED_SIZE = 20

_VOCAB_ENTRY = np.dtype([("key", "<u8"), ("id", "<u4")])          # pack(4)
_PROB_BACKOFF = np.dtype([("prob", "<f4"), ("backoff", "<f4")])
_REST_WEIGHTS = np.dtype([("prob", "<f4"), ("backoff", "<f4"), ("rest", "<f4")])
_MIDDLE_PB = np.dtype([("key", "<u8"), ("prob", "<f4"), ("backoff", "<f4")])
_MIDDLE_REST = np.dtype(
    [("key", "<u8"), ("prob", "<f4"), ("backoff", "<f4"), ("rest", "<f4")]
)
_LONGEST = np.dtype([("key", "<u8"), ("prob", "<f4")])


def is_binary(path: str) -> bool:
    """RecognizeBinary's cheap twin: does the file start with the v5 magic?"""
    with open(path, "rb") as fh:
        head = fh.read(len(MAGIC))
    if head.startswith(MAGIC_INCOMPLETE[: len(head)]) and len(head) >= len(
        MAGIC_INCOMPLETE
    ):
        raise ValueError(f"{path}: binary file did not finish building")
    return head == MAGIC


def _buckets(entries: int, multiplier: float) -> int:
    """util/probing_hash_table.hh:108-110 — float32 arithmetic then
    truncation, exactly as the C code computes it."""
    by_mult = int(np.float32(multiplier) * np.float32(entries))
    return max(entries + 1, by_mult)


def load_binary(path: str) -> NGramModel:
    with open(path, "rb") as fh:
        data = fh.read()

    if data[: len(MAGIC)] != MAGIC:
        if data.startswith(MAGIC_INCOMPLETE):
            raise ValueError(f"{path}: binary file did not finish building")
        raise ValueError(f"{path}: not a KenLM v5 binary file")
    zero_f, one_f, minus_half = struct.unpack_from("<3f", data, _MAGIC_FIELD)
    one_w, max_w = struct.unpack_from("<2I", data, _MAGIC_FIELD + 12)
    (one_u64,) = struct.unpack_from("<Q", data, _MAGIC_FIELD + 24)
    if (zero_f, one_f, minus_half, one_w, max_w, one_u64) != (
        0.0, 1.0, -0.5, 1, 0xFFFFFFFF, 1,
    ):
        raise ValueError(
            f"{path}: sanity test values do not match (endianness or "
            "architecture mismatch with the writer)"
        )

    order = data[_SANITY_SIZE]
    (multiplier,) = struct.unpack_from("<f", data, _SANITY_SIZE + 4)
    (model_type,) = struct.unpack_from("<i", data, _SANITY_SIZE + 8)
    has_vocab = bool(data[_SANITY_SIZE + 12])
    (search_version,) = struct.unpack_from("<I", data, _SANITY_SIZE + 16)
    counts = list(
        struct.unpack_from(f"<{order}Q", data, _SANITY_SIZE + _FIXED_SIZE)
    )

    if not has_vocab:
        raise ValueError(
            f"{path}: built without vocabulary strings (build_binary "
            "include_vocab off); word ids cannot be recovered"
        )
    if model_type in _TRIE_TYPES:
        if search_version != 1:
            raise ValueError(
                f"{path}: trie search version {search_version}, expected 1"
            )
        from kenlm_spark.ngram.trie import load_trie

        return load_trie(
            data, order, model_type, counts, _SANITY_SIZE, _FIXED_SIZE
        )
    if model_type not in (PROBING, REST_PROBING):
        raise ValueError(f"{path}: unknown model type {model_type}")
    if search_version != 0:
        raise ValueError(
            f"{path}: probing search version {search_version}, expected 0"
        )
    if multiplier < 1.0:
        raise ValueError(f"{path}: probing multiplier {multiplier} < 1.0")

    rest = model_type == REST_PROBING
    uni_dtype = _REST_WEIGHTS if rest else _PROB_BACKOFF
    mid_dtype = _MIDDLE_REST if rest else _MIDDLE_PB

    header_size = _align8(_SANITY_SIZE + _FIXED_SIZE + 8 * order)
    # ProbingVocabulary: ALIGN8(8-byte header) + bucketed (hash, id) table
    (vocab_version, bound) = struct.unpack_from("<2I", data, header_size)
    if vocab_version != 0:
        raise ValueError(
            f"{path}: probing vocabulary version {vocab_version}, expected 0"
        )
    vocab_size = 8 + _buckets(counts[0], multiplier) * _VOCAB_ENTRY.itemsize
    off = header_size + vocab_size

    uni = np.frombuffer(data, uni_dtype, counts[0] + 1, off)[:bound]
    off += (counts[0] + 1) * uni_dtype.itemsize

    keys: dict[int, np.ndarray] = {}
    probs: dict[int, np.ndarray] = {}
    backoffs: dict[int, np.ndarray] = {}
    extends: dict[int, np.ndarray] = {}
    rests: dict[int, np.ndarray] = {} if rest else None
    for n in range(2, order):
        nb = _buckets(counts[n - 1], multiplier)
        table = np.frombuffer(data, mid_dtype, nb, off)
        off += nb * mid_dtype.itemsize
        ent = table[table["key"] != 0]
        idx = np.argsort(ent["key"], kind="stable")
        ent = ent[idx]
        keys[n] = ent["key"].copy()
        stored = ent["prob"]
        probs[n] = -np.abs(stored)            # re-force the sign bit
        extends[n] = ~np.signbit(stored)
        backoffs[n] = ent["backoff"].copy()   # ±0.0 bits preserved
        if rest:
            rests[n] = ent["rest"].copy()

    nb = _buckets(counts[order - 1], multiplier)
    table = np.frombuffer(data, _LONGEST, nb, off)
    off += nb * _LONGEST.itemsize
    ent = table[table["key"] != 0]
    idx = np.argsort(ent["key"], kind="stable")
    keys[order] = ent["key"][idx].copy()
    probs[order] = ent["prob"][idx].copy()    # stored plainly

    # vocab strings: NUL-separated, id order, <unk> first (vocab.cc:35-49)
    tail = data[off:]
    if tail[:6] != b"<unk>\x00":
        raise ValueError(
            f"{path}: vocabulary strings not found at computed offset "
            f"{off} (layout mismatch)"
        )
    words = tail.decode("utf-8").split("\x00")[:-1]
    if len(words) != bound:
        raise ValueError(
            f"{path}: {len(words)} vocabulary strings but bound={bound}"
        )
    vocab = {w: i for i, w in enumerate(words)}

    stored_u = uni["prob"]
    return NGramModel(
        order=order,
        vocab=vocab,
        uni_prob=-np.abs(stored_u),
        uni_backoff=uni["backoff"].copy(),
        uni_extends=~np.signbit(stored_u),
        keys=keys,
        probs=probs,
        backoffs=backoffs,
        extends=extends,
        uni_rest=uni["rest"].copy() if rest else None,
        rests=rests,
    )


def load_model(path: str) -> NGramModel:
    """Dispatch: KenLM v5 binary (probing) or ARPA (+gz/bz2/xz)."""
    from kenlm_spark.ngram.arpa import load_arpa

    try:
        if is_binary(path):
            return load_binary(path)
    except (OSError, UnicodeDecodeError):
        pass
    return load_arpa(path)
