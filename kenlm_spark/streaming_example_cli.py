"""CLI twin of the reference's `streaming_example`
(lm/interpolate/streaming_example_main.cc) — the last reference main
without a counterpart here.

Semantics (streaming_example_main.cc:24-29, split_worker.cc:14-37):
given intermediate suffix-sorted n-gram files (the ModelBuffer set
``<ngrams>.kenlm_intermediate`` + ``<ngrams>.1..N``), emit two file
sets per order:

* ``<backoffs>.N`` — the raw float32 backoff values, one per record,
  in the INPUT (suffix) order (SplitWorker strips them off unchanged);
* ``<csortngrams>.N`` — records of ``N`` little-endian uint32 word ids
  + float32 prob (NO backoff), re-sorted in CONTEXT order
  (lm/common/compare.hh:104-127: compare word ``N-2`` down to word
  ``0``, the last word compared last);

plus a ``.kenlm_intermediate`` metadata file (Counts + ``Payload pb``)
for each output base, exactly what ``ModelBuffer::Sink`` writes
(lm/common/model_buffer.cc:61-83; Sink does not write a vocab — the
constructor just creates an empty ``.vocab`` when keep_buffer).

The reference binary needs boost::program_options to build, which this
container lacks — semantics are pinned by the source facts above and
tests/test_model_buffer.py round-trips (same precedent as filter_cli).
The heavy lift (external-memory context sort of each order) maps to a
DataFrame ``orderBy`` over the same key tuple in the distributed
engine; this CLI is the reference's single-node streaming shape, done
as one numpy lexsort per order.

Usage (flag names mirror the reference):

    python -m kenlm_spark.streaming_example_cli \
        -n ngrams -c csorted-ngrams -b backoffs [-t /tmp/]
"""

from __future__ import annotations

import struct
import sys

import numpy as np

from kenlm_spark.ngram.model_buffer import METADATA_HEADER


def _read_meta(base: str) -> list[int]:
    with open(f"{base}.kenlm_intermediate") as fh:
        header = fh.readline().rstrip("\n")
        if header != METADATA_HEADER:
            raise ValueError(f"{base}: bad header {header!r}")
        counts_line = fh.readline().split()
        if counts_line[0] != "Counts":
            raise ValueError("expected Counts")
        counts = [int(c) for c in counts_line[1:]]
        payload = fh.readline().split()
        if payload[:2] != ["Payload", "pb"]:
            raise ValueError(f"unsupported payload {payload[1:]}")
    return counts


def _write_meta(base: str, counts: list[int]) -> None:
    with open(f"{base}.kenlm_intermediate", "w") as fh:
        fh.write(METADATA_HEADER + "\n")
        fh.write("Counts " + " ".join(str(c) for c in counts) + "\n")
        fh.write("Payload pb\n")
    # ModelBuffer's keep_buffer constructor creates the vocab file
    # (empty here — Sink never writes words into it)
    open(f"{base}.vocab", "wb").close()


def split_streams(ngrams: str, csorted: str, backoffs: str) -> list[int]:
    """The three-chain split: per order, strip backoffs to one stream
    (input order) and (ids, prob) context-sorted to the other."""
    counts = _read_meta(ngrams)
    order = len(counts)
    for n in range(1, order + 1):
        rec = struct.calcsize(f"<{n}I2f")
        raw = np.fromfile(f"{ngrams}.{n}", dtype=np.uint8)
        if len(raw) != rec * counts[n - 1]:
            raise ValueError(
                f"{ngrams}.{n}: {len(raw)} bytes != {counts[n - 1]} "
                f"records of {rec}"
            )
        view = raw.reshape(-1, rec)
        ids = view[:, : 4 * n].copy().view("<u4").reshape(-1, n)
        prob = view[:, 4 * n: 4 * n + 4].copy().view("<f4").ravel()
        backoff = view[:, 4 * n + 4:].copy().view("<f4").ravel()

        backoff.astype("<f4").tofile(f"{backoffs}.{n}")

        # ContextOrder: most-significant key = ids[n-2], then down to
        # ids[0], the last word ids[n-1] compared last; np.lexsort's
        # primary key is the LAST in the tuple
        keys = [ids[:, n - 1]] + [ids[:, j] for j in range(n - 1)]
        perm = np.lexsort(tuple(keys))
        out = np.empty((len(ids), 4 * n + 4), dtype=np.uint8)
        out[:, : 4 * n] = (
            ids[perm].astype("<u4").view(np.uint8).reshape(-1, 4 * n)
        )
        out[:, 4 * n:] = (
            prob[perm].astype("<f4").view(np.uint8).reshape(-1, 4)
        )
        out.tofile(f"{csorted}.{n}")
    _write_meta(csorted, counts)
    _write_meta(backoffs, counts)
    return counts


def main(argv=None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    ngrams, csorted, backoffs = "ngrams", "csorted-ngrams", "backoffs"
    i = 0
    while i < len(args):
        a = args[i]
        if a in ("-n", "--ngrams"):
            ngrams = args[i + 1]
            i += 2
        elif a in ("-c", "--csortngrams"):
            csorted = args[i + 1]
            i += 2
        elif a in ("-b", "--backoffs"):
            backoffs = args[i + 1]
            i += 2
        elif a in ("-t", "--tmpdir"):
            i += 2  # numpy sorts in memory; flag kept for parity
        elif a in ("-h", "--help"):
            print(__doc__, file=sys.stderr)
            return 1
        else:
            print(f"unknown argument {a}", file=sys.stderr)
            return 1
    split_streams(ngrams, csorted, backoffs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
