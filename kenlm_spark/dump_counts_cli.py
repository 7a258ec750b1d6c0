"""CLI twin of the reference's `dump_counts` (lm/builder/
dump_counts_main.cc): print the builder's binary count records as text.

    python -m kenlm_spark.dump_counts_cli counts.bin vocab.bin 3

Record format: ``order`` little-endian uint32 vocab ids + one uint64
count. The vocabulary file is NUL-delimited words in id order. Output
line format matches the reference exactly: each word followed by a
space, then the count (dump_counts_main.cc:28-34).
"""

from __future__ import annotations

import struct
import sys


def main(argv=None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    if len(args) != 3:
        print(
            "Usage: dump_counts_cli counts vocabulary order\n"
            "The counts file contains records with 4-byte vocabulary ids "
            "followed by 8-byte\ncounts.  Each record has order many "
            "vocabulary ids.\n"
            "The vocabulary file contains the words delimited by NULL in "
            "order of id.",
            file=sys.stderr,
        )
        return 1
    counts_path, vocab_path, order_s = args
    order = int(order_s)

    with open(vocab_path, "rb") as fh:
        vocab = fh.read().decode("utf-8").split("\x00")[:-1]

    rec = struct.Struct(f"<{order}IQ")
    out = sys.stdout
    with open(counts_path, "rb") as fh:
        while chunk := fh.read(rec.size):
            if len(chunk) != rec.size:
                raise SystemExit(
                    f"Read {len(chunk)} bytes at the end of file, which is "
                    f"not a complete record of length {rec.size}"
                )
            *ids, count = rec.unpack(chunk)
            for i in ids:
                if i >= len(vocab):
                    raise SystemExit(
                        f"Vocab ID {i} is larger than the vocab file's "
                        f"maximum of {len(vocab)}."
                    )
                out.write(vocab[i] + " ")
            out.write(f"{count}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
