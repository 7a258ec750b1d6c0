"""CLI twin of the reference's `cat_compressed`
(util/cat_compressed_main.cc) — cat that transparently decompresses.

The reference detects gzip/bzip2/xz by magic bytes
(util/read_compressed.cc), reads each named file (stdin when none) and
streams the decompressed bytes to stdout; `-h`/`--help` before `--`
prints usage. The codec sniffing here is the same magic-byte dispatch
`kenlm_spark.ngram.arpa._open` uses for compressed ARPA input (S2).

Usage: python -m kenlm_spark.cat_compressed_cli [file1] [file2] ...
"""

from __future__ import annotations

import shutil
import sys

_BUF = 16384


def _open_binary(path: str):
    with open(path, "rb") as probe:
        magic = probe.read(6)
    if magic[:2] == b"\x1f\x8b":
        import gzip

        return gzip.open(path, "rb")
    if magic[:3] == b"BZh":
        import bz2

        return bz2.open(path, "rb")
    if magic == b"\xfd7zXZ\x00":
        import lzma

        return lzma.open(path, "rb")
    return open(path, "rb")


def main(argv=None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    # "Lane Schwartz likes -h and --help" — only before a literal --
    for a in args:
        if a == "--":
            break
        if a in ("-h", "--help"):
            print(
                "A cat implementation that interprets compressed files.\n"
                "Usage: cat_compressed [file1] [file2] ...\n"
                "If no file is provided, then stdin is read.",
                file=sys.stderr,
            )
            return 1
    files = [a for a in args if a != "--"]
    out = sys.stdout.buffer
    if not files:
        shutil.copyfileobj(sys.stdin.buffer, out, _BUF)
        return 0
    for path in files:
        with _open_binary(path) as fh:
            shutil.copyfileobj(fh, out, _BUF)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
