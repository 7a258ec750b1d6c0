"""CLI twin of the reference's `build_binary` (lm/build_binary_main.cc):
convert an ARPA (or re-pack any readable binary) into a probing-layout
``.klm`` the reference engine mmaps directly.

    python -m kenlm_spark.build_binary_cli in.arpa out.klm
    python -m kenlm_spark.build_binary_cli probing in.arpa out.klm
    python -m kenlm_spark.build_binary_cli -p 2.0 probing in.arpa out.klm
    python -m kenlm_spark.build_binary_cli trie in.arpa out.klm

Supported: the probing data structure (-p multiplier) and the plain
trie (byte-identical to the reference's `build_binary trie` output —
kenlm_spark/ngram/trie_writer.py). Quantized/array tries are
read-supported but not written.
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    multiplier = 1.5
    kind = "probing"
    if "-p" in args:
        i = args.index("-p")
        multiplier = float(args[i + 1])
        del args[i : i + 2]
    if args and args[0] in ("probing", "trie"):
        kind = args.pop(0)
    if len(args) != 2:
        print(
            "usage: build_binary_cli [-p MULT] [probing|trie] INPUT "
            "OUTPUT.klm",
            file=sys.stderr,
        )
        return 2
    src, dst = args

    if kind == "trie":
        from kenlm_spark.ngram.trie_writer import write_trie

        write_trie(src, dst, multiplier=multiplier)
        return 0

    from kenlm_spark.ngram.binary import load_model
    from kenlm_spark.ngram.binary_writer import write_binary

    write_binary(load_model(src), dst, multiplier=multiplier)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
