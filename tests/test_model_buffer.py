"""ModelBuffer (KenLM intermediate format) reader/writer.

Format pinned against lm/common/model_buffer.cc source facts: metadata
header string, Counts/Payload lines, NUL vocab, per-order binary records
(n×u32 + 2×f32) in SuffixOrder with the unigram file addressable by
word id — verified here with a SlowQuery-equivalent raw probe
(model_buffer.cc:100-104 reads unigram ``word_id * recsize + 4``).
"""

import os
import struct

import pytest

from kenlm_spark.ngram.model_buffer import (
    METADATA_HEADER,
    read_model_buffer,
    write_model_buffer,
)
from kenlm_spark.oracle import arpa_ngram_rows

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
ARPA = os.path.join(FIX, "test.arpa")


def _rows_from_arpa(path):
    return [
        {
            "order": n,
            "words": g.split(" "),
            "log10_prob": p,
            "log10_backoff": b,
        }
        for n, g, p, b in arpa_ngram_rows(path)
    ]


def test_roundtrip(tmp_path):
    rows = _rows_from_arpa(ARPA)
    base = str(tmp_path / "m")
    write_model_buffer(rows, 5, base)

    # metadata exact format
    meta = open(f"{base}.kenlm_intermediate").read().splitlines()
    assert meta[0] == METADATA_HEADER
    assert meta[1].startswith("Counts ")
    assert meta[2] == "Payload pb"

    order, got = read_model_buffer(base)
    assert order == 5
    want = {
        (r["order"], tuple(r["words"])): (
            pytest.approx(r["log10_prob"], abs=1e-6),
            pytest.approx(r["log10_backoff"], abs=1e-6),
        )
        for r in rows
    }
    got_map = {
        (r["order"], tuple(r["words"])): (r["log10_prob"], r["log10_backoff"])
        for r in got
    }
    assert set(got_map) == set(want)
    for k, (p, b) in want.items():
        assert got_map[k][0] == p and got_map[k][1] == b, k


def test_unigram_file_addressable_by_id(tmp_path):
    """SlowQuery reads the unigram record at word_id*(4+8)+4 — so the
    order-1 file must be id-ordered with one record per id."""
    rows = _rows_from_arpa(ARPA)
    base = str(tmp_path / "m")
    write_model_buffer(rows, 5, base)
    words = open(f"{base}.vocab", "rb").read().decode().split("\x00")[:-1]
    assert words[:3] == ["<unk>", "<s>", "</s>"]
    rec = struct.Struct("<I2f")
    data = open(f"{base}.1", "rb").read()
    assert len(data) == rec.size * len(words)
    by_arpa = {
        tuple(r["words"])[0]: r["log10_prob"]
        for r in rows
        if r["order"] == 1
    }
    for wid, w in enumerate(words):
        got_id, prob, _ = rec.unpack_from(data, wid * rec.size)
        assert got_id == wid
        if w in by_arpa:
            assert prob == pytest.approx(by_arpa[w], abs=1e-6)


def test_interpolate_cli_reads_model_buffer(tmp_path, spark):
    """interpolate_cli -m accepts a ModelBuffer base and produces the
    same mix as the ARPA inputs."""
    import sys

    from kenlm_spark.interpolate_cli import main as ip_main

    a = os.path.join(FIX, "tune_a.arpa")
    b = os.path.join(FIX, "tune_b.arpa")
    base_a = str(tmp_path / "ma")
    write_model_buffer(_rows_from_arpa(a), 3, base_a)

    out_mb = str(tmp_path / "mix_mb.arpa")
    out_arpa = str(tmp_path / "mix_arpa.arpa")
    assert ip_main(["-m", base_a, b, "-w", "0.5", "0.5", "--arpa", out_mb,
                    "--master", "local[4]"]) == 0
    assert ip_main(["-m", a, b, "-w", "0.5", "0.5", "--arpa", out_arpa,
                    "--master", "local[4]"]) == 0
    # the intermediate format stores float32 payloads (ProbBackoff), so
    # compare semantically rather than byte-wise
    from kenlm_spark.ngram.arpa import load_arpa

    m1, m2 = load_arpa(out_mb), load_arpa(out_arpa)
    for s_ in ["the table has rows", "executors run the shuffle",
               "unseen words here"]:
        assert m1.score(s_) == pytest.approx(m2.score(s_), abs=1e-4)


def test_streaming_example_cli_split(tmp_path):
    """streaming_example twin: backoff stream preserves input (suffix)
    order; csorted stream is the same (ids, prob) multiset re-sorted in
    ContextOrder (penultimate word most significant, last word least —
    lm/common/compare.hh:104-127); both metadata files carry the input
    counts."""
    import subprocess
    import sys

    import numpy as np

    from kenlm_spark.streaming_example_cli import _read_meta

    rows = _rows_from_arpa(ARPA)
    base = str(tmp_path / "ngrams")
    write_model_buffer(rows, 5, base)
    cs, bo = str(tmp_path / "csorted"), str(tmp_path / "backoffs")
    r = subprocess.run(
        [sys.executable, "-m", "kenlm_spark.streaming_example_cli",
         "-n", base, "-c", cs, "-b", bo, "-t", str(tmp_path)],
        capture_output=True,
    )
    assert r.returncode == 0, r.stderr
    counts = _read_meta(base)
    assert _read_meta(cs) == counts
    assert _read_meta(bo) == counts
    for n in range(1, 6):
        rec = struct.calcsize(f"<{n}I2f")
        raw = np.fromfile(f"{base}.{n}", dtype=np.uint8).reshape(-1, rec)
        in_ids = raw[:, : 4 * n].copy().view("<u4").reshape(-1, n)
        in_prob = raw[:, 4 * n: 4 * n + 4].copy().view("<f4").ravel()
        in_bo = raw[:, 4 * n + 4:].copy().view("<f4").ravel()
        # backoff stream: float32 per record, input order, bit-exact
        got_bo = np.fromfile(f"{bo}.{n}", dtype="<f4")
        assert np.array_equal(
            got_bo.view(np.uint32), in_bo.view(np.uint32)
        )
        # csorted stream: no backoff in the record
        crec = 4 * n + 4
        craw = np.fromfile(f"{cs}.{n}", dtype=np.uint8).reshape(-1, crec)
        got_ids = craw[:, : 4 * n].copy().view("<u4").reshape(-1, n)
        got_prob = craw[:, 4 * n:].copy().view("<f4").ravel()
        assert len(got_ids) == counts[n - 1]
        # context order: nondecreasing under (ids[n-2]..ids[0], ids[n-1])
        key_cols = [got_ids[:, j] for j in range(n - 2, -1, -1)] + [
            got_ids[:, n - 1]
        ]
        keys = list(zip(*[c.tolist() for c in key_cols]))
        assert keys == sorted(keys)
        # same multiset of (ids, prob) as the input
        def multiset(ids, probs):
            return sorted(
                (tuple(i), float(np.float32(p)))
                for i, p in zip(ids.tolist(), probs.tolist())
            )
        assert multiset(got_ids, got_prob) == multiset(in_ids, in_prob)
