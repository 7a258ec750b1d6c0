"""KenLM intermediate-format (ModelBuffer) reader/writer — the file set
`lmplz --intermediate` emits and `interpolate` consumes
(lm/common/model_buffer.cc):

* ``<base>.kenlm_intermediate`` — text metadata: the exact header line
  ``KenLM intermediate binary file``, then ``Counts c1 c2 ...``, then
  ``Payload pb`` (probability+backoff; the quantized ``q`` payload is
  rejected here);
* ``<base>.vocab`` — NUL-delimited words in id order; builder
  convention ``<unk>``=0, ``<s>``=1, ``</s>``=2
  (lm/word_index.hh, corpus_count.cc VocabHandout);
* ``<base>.1`` .. ``<base>.N`` — binary records of ``n`` little-endian
  uint32 word ids + float32 prob + float32 backoff, sorted in
  SuffixOrder (lm/common/compare.hh) so ModelBuffer::SlowQuery can
  binary-search them; the unigram file is therefore addressable by word
  id directly (model_buffer.cc:100-104).

The reference's own producers (lmplz) need boost to build in this
container, so the format is pinned by the source facts above plus a
SlowQuery-equivalent raw-binary probe in tests/test_model_buffer.py.
"""

from __future__ import annotations

import os
import struct

import numpy as np

METADATA_HEADER = "KenLM intermediate binary file"
SPECIALS = ("<unk>", "<s>", "</s>")


def write_model_buffer(rows: list, order: int, base: str) -> None:
    """rows: (order, words list, log10_prob, log10_backoff) — the
    estimator/write_arpa row shape. Emits the full ModelBuffer file set."""
    by_order: dict[int, list] = {n: [] for n in range(1, order + 1)}
    for r in rows:
        by_order[r["order"]].append(
            (list(r["words"]), float(r["log10_prob"]), float(r["log10_backoff"]))
        )

    # vocab ids: builder specials first, then remaining unigrams in their
    # model order (any consistent assignment round-trips — the vocab file
    # is the id map)
    vocab: dict[str, int] = {}
    for w in SPECIALS:
        vocab[w] = len(vocab)
    for words, _, _ in by_order[1]:
        if words[0] not in vocab:
            vocab[words[0]] = len(vocab)
    missing = [w for w in SPECIALS if not any(
        ws[0] == w for ws, _, _ in by_order[1]
    )]
    # every id must have a unigram record (the file is indexed by id);
    # hallucinate missing specials the way model.cc:121-126 does for <unk>
    for w in missing:
        by_order[1].append(([w], -100.0 if w == "<unk>" else 0.0, 0.0))

    counts = [len(by_order[n]) for n in range(1, order + 1)]
    with open(f"{base}.kenlm_intermediate", "w") as fh:
        fh.write(METADATA_HEADER + "\n")
        fh.write("Counts " + " ".join(str(c) for c in counts) + "\n")
        fh.write("Payload pb\n")
    with open(f"{base}.vocab", "wb") as fh:
        for w, _ in sorted(vocab.items(), key=lambda kv: kv[1]):
            fh.write(w.encode("utf-8") + b"\x00")
    for n in range(1, order + 1):
        recs = []
        for words, prob, backoff in by_order[n]:
            ids = tuple(vocab[w] for w in words)
            recs.append((ids, prob, backoff))
        recs.sort(key=lambda t: tuple(reversed(t[0])))  # SuffixOrder
        with open(f"{base}.{n}", "wb") as fh:
            for ids, prob, backoff in recs:
                fh.write(struct.pack(f"<{n}I2f", *ids, prob, backoff))


def read_model_buffer(base: str):
    """-> (order, rows) with rows in the write_arpa shape
    (order, words, log10_prob, log10_backoff)."""
    meta = f"{base}.kenlm_intermediate"
    with open(meta) as fh:
        header = fh.readline().rstrip("\n")
        if header != METADATA_HEADER:
            raise ValueError(
                f"{meta} begins with {header!r} not {METADATA_HEADER!r}"
            )
        counts_line = fh.readline().split()
        if counts_line[0] != "Counts":
            raise ValueError(f"expected Counts, got {counts_line[:1]}")
        counts = [int(c) for c in counts_line[1:]]
        payload = fh.readline().split()
        if payload[:2] != ["Payload", "pb"]:
            raise ValueError(
                f"unsupported payload {payload[1:2]} (only 'pb' here)"
            )
    with open(f"{base}.vocab", "rb") as fh:
        words = fh.read().decode("utf-8").split("\x00")[:-1]
    order = len(counts)
    rows = []
    for n in range(1, order + 1):
        rec = struct.Struct(f"<{n}I2f")
        data = open(f"{base}.{n}", "rb").read()
        if len(data) != rec.size * counts[n - 1]:
            raise ValueError(
                f"{base}.{n}: {len(data)} bytes != {counts[n - 1]} records "
                f"of {rec.size}"
            )
        for off in range(0, len(data), rec.size):
            *ids, prob, backoff = rec.unpack_from(data, off)
            rows.append(
                {
                    "order": n,
                    "words": [words[i] for i in ids],
                    "log10_prob": float(np.float32(prob)),
                    "log10_backoff": float(np.float32(backoff)),
                }
            )
    return order, rows
