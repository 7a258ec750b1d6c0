"""CLI twin of the reference's `build_binary` (lm/build_binary_main.cc):
convert an ARPA (or re-pack any readable binary) into a probing-layout
``.klm`` the reference engine mmaps directly.

    python -m kenlm_spark.build_binary_cli in.arpa out.klm
    python -m kenlm_spark.build_binary_cli probing in.arpa out.klm
    python -m kenlm_spark.build_binary_cli -p 2.0 probing in.arpa out.klm
    python -m kenlm_spark.build_binary_cli trie in.arpa out.klm
    python -m kenlm_spark.build_binary_cli -q 8 -b 8 -a 22 trie in.arpa out.klm

Supported: the probing data structure (-p multiplier) and all four trie
layouts — plain, quantized (-q/-b), Bhiksha array-compressed pointers
(-a), and both — each byte-identical to the reference's `build_binary`
output for the same flags (kenlm_spark/ngram/trie_writer.py).
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    multiplier = 1.5
    kind = "probing"
    quant_bits = backoff_bits = array_bits = None

    def take(flag, cast):
        nonlocal args
        if flag in args:
            i = args.index(flag)
            v = cast(args[i + 1])
            del args[i : i + 2]
            return v
        return None

    multiplier = take("-p", float) or 1.5
    quant_bits = take("-q", int)
    backoff_bits = take("-b", int)
    array_bits = take("-a", int)
    unknown_logprob = take("-u", float)
    for flag in ("-T", "-S", "-w", "-m", "-t"):  # sort/temp/write knobs:
        take(flag, str)  # accepted for parity; no staged sort here
    include_vocab = True
    for noarg in ("-s", "-i", "-v"):
        while noarg in args:
            args.remove(noarg)
            if noarg == "-v":
                include_vocab = False
            # -s (silence missing <s>/<\/s>) and -i (silence positive
            # prob warning) are warning-level toggles; parsing already
            # tolerates both inputs
    if args and args[0] in ("probing", "trie"):
        kind = args.pop(0)
    if len(args) != 2:
        print(
            "usage: build_binary_cli [-p MULT] [-q BITS -b BITS] [-a BITS] "
            "[probing|trie] INPUT OUTPUT.klm",
            file=sys.stderr,
        )
        return 2
    src, dst = args

    if kind == "trie":
        from kenlm_spark.ngram.trie_writer import write_trie

        write_trie(
            src, dst, multiplier=multiplier, quant_bits=quant_bits,
            backoff_bits=backoff_bits, array_bits=array_bits,
            unknown_logprob=unknown_logprob, include_vocab=include_vocab,
        )
        return 0

    from kenlm_spark.ngram.binary import is_binary, load_model
    from kenlm_spark.ngram.binary_writer import (
        write_binary,
        write_probing_from_arpa,
    )

    if not is_binary(src):
        # ARPA input: the insertion-order-exact writer — byte-identical
        # to the reference's build_binary output for the same flags
        write_probing_from_arpa(
            src, dst, multiplier=multiplier,
            unknown_logprob=unknown_logprob, include_vocab=include_vocab,
        )
    else:
        # binary→binary repack keeps the NGramModel-based writer (the
        # original insertion order is not recoverable from a binary)
        write_binary(load_model(src), dst, multiplier=multiplier)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
