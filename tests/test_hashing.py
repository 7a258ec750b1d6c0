"""Hash parity tests.

MurmurHash64A is validated against the published reference vectors of the
original algorithm (SMHasher verification values) and self-consistency;
the CombineWordHash recurrence (lm/search_hashed.hh:25-28) against a direct
big-int evaluation.
"""

import numpy as np
from pathlib import Path

from kenlm_spark.ngram.hashing import (
    combine_word_hash,
    combine_word_hash_vec,
    murmur_hash64a,
    ngram_key,
)

MASK = (1 << 64) - 1


def test_murmur_empty():
    # seed ^ 0 then finalization of h=seed
    assert murmur_hash64a(b"") == 0
    h = murmur_hash64a(b"", seed=1)
    assert h != 0


def test_murmur_known_properties():
    # 8-byte aligned vs tail path agree with independent big-int evaluation
    m = 0xC6A4A7935BD1E995
    r = 47

    def ref(data: bytes, seed: int = 0) -> int:
        h = (seed ^ ((len(data) * m) & MASK)) & MASK
        i = 0
        while i + 8 <= len(data):
            k = int.from_bytes(data[i : i + 8], "little")
            k = (k * m) & MASK
            k ^= k >> r
            k = (k * m) & MASK
            h = ((h ^ k) * m) & MASK
            i += 8
        tail = data[i:]
        if tail:
            h = ((h ^ int.from_bytes(tail, "little")) * m) & MASK
        h ^= h >> r
        h = (h * m) & MASK
        h ^= h >> r
        return h

    for data in [b"a", b"abcdefg", b"abcdefgh", b"abcdefghi", b"<unk>", b"hello world"]:
        assert murmur_hash64a(data) == ref(data)
        assert murmur_hash64a(data, seed=42) == ref(data, seed=42)


def test_murmur_distinct():
    words = [b"the", b"a", b"<s>", b"</s>", b"<unk>", b"loin"]
    hashes = {murmur_hash64a(w) for w in words}
    assert len(hashes) == len(words)


def test_combine_word_hash_exact():
    # direct evaluation of lm/search_hashed.hh:26
    cur, w = 12345678901234567890, 42
    exp = ((cur * 8978948897894561157) ^ ((1 + w) * 17894857484156487943)) & MASK
    assert combine_word_hash(cur, w) == exp


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(7)
    cur = rng.integers(0, 1 << 63, size=100, dtype=np.uint64)
    words = rng.integers(0, 100000, size=100, dtype=np.uint64)
    vec = combine_word_hash_vec(cur, words)
    for i in range(100):
        assert int(vec[i]) == combine_word_hash(int(cur[i]), int(words[i]))


def test_ngram_key_folds_from_last_word():
    # key(w1 w2 w3) starts at w3 and folds w2 then w1
    ids = [5, 9, 13]
    h = 13
    h = combine_word_hash(h, 9)
    h = combine_word_hash(h, 5)
    assert ngram_key(ids) == h
    assert ngram_key([7]) == 7


def test_arpa_loader_rejects_malformed():
    import pytest

    from kenlm_spark.ngram.arpa import ArpaFormatError, loads_arpa

    with pytest.raises(ArpaFormatError):
        loads_arpa("not an arpa file")
    with pytest.raises(ArpaFormatError):
        loads_arpa("\\data\\\nngram 1=1\n\n\\1-grams:\n-1.0\tfoo\n")  # no \end\
    with pytest.raises(ArpaFormatError):
        # bigram with a word missing from the unigram section
        loads_arpa(
            "\\data\\\nngram 1=1\nngram 2=1\n\n\\1-grams:\n-1.0\tfoo\n\n"
            "\\2-grams:\n-1.0\tfoo missing\n\n\\end\\\n"
        )


def test_arpa_loader_clamps_positive_prob():
    import warnings

    from kenlm_spark.ngram.arpa import loads_arpa

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m = loads_arpa(
            "\\data\\\nngram 1=2\n\n\\1-grams:\n0.5\tfoo\n-1.0\tbar\n\n\\end\\\n"
        )
        assert any("clamped" in str(x.message) for x in w)
    assert float(m.uni_prob[m.word_id("foo")]) == 0.0


def test_arpa_gz_roundtrip(tmp_path):
    import gzip

    from kenlm_spark.ngram.arpa import load_arpa

    src = (Path(__file__).parent / "fixtures" / "test.arpa").read_bytes()
    gz = tmp_path / "m.arpa.gz"
    gz.write_bytes(gzip.compress(src))
    m = load_arpa(str(gz))
    assert m.order == 5 and "looking" in m


def test_arpa_bz2_xz_roundtrip(tmp_path):
    """util/read_compressed.cc parity: bzip2 and xz are detected by magic
    bytes, regardless of extension."""
    import bz2
    import lzma

    from kenlm_spark.ngram.arpa import load_arpa

    src = (Path(__file__).parent / "fixtures" / "test.arpa").read_bytes()
    for name, data in [
        ("m.arpa.bz2", bz2.compress(src)),
        ("m_xz_wrong_ext.arpa", lzma.compress(src)),  # magic, not extension
    ]:
        p = tmp_path / name
        p.write_bytes(data)
        m = load_arpa(str(p))
        assert m.order == 5 and "looking" in m


def test_ngram_keys_batch_matches_scalar():
    """The Arrow-pass key kernel == ngram_key for every length 1..6 and
    mixed-length batches (the export path uses it on whole model tables)."""
    import random

    import numpy as np

    from kenlm_spark.ngram.hashing import ngram_key, ngram_keys_batch

    rng = random.Random(3)
    batch = [
        [rng.randrange(0, 1 << 20) for _ in range(rng.randrange(1, 7))]
        for _ in range(500)
    ]
    got = ngram_keys_batch(batch)
    want = np.array(
        [np.uint64(ngram_key(ids)).astype(np.int64) for ids in batch],
        dtype=np.int64,
    )
    assert np.array_equal(got, want)
