"""CLI twin of the reference's `query` tool (lm/query_main.cc +
lm/ngram_query.hh): per-word scores, per-line totals, and the corpus
perplexity summary, over ARPA or any of the six binary layouts.

    python -m kenlm_spark.query_cli [-n] [-v word|sentence|summary|0|1|2] \
        model.arpa < text

Output format matches QueryPrinter (lm/ngram_query.hh:22-42):

    word=<vocab_id> <ngram_length> <prob>\t ... Total: <t> OOV: <n>
    ...
    Perplexity including OOVs:\t<...>
    Perplexity excluding OOVs:\t<...>
    OOVs:\t<n>
    Tokens:\t<n>

`-n` drops sentence context (NullContext, no </s>), as in the reference.
Differential-tested against the compiled reference `query` binary in
tests/test_cli.py (values compared parsed, not byte-wise — C++ float
formatting differs from Python's).
"""

from __future__ import annotations

import argparse
import sys


def format_g(x: float) -> str:
    """C++ default float formatting (6 significant digits, %g)."""
    return f"{x:g}"


def run(model, lines, out, sentence_context=True,
        print_word=True, print_line=True, print_summary=True) -> None:
    corpus_total = 0.0
    corpus_oov_only = 0.0
    corpus_oov = 0
    corpus_tokens = 0
    for line in lines:
        state = (
            model.begin_sentence_state()
            if sentence_context
            else model.null_context_state()
        )
        total = 0.0
        oov = 0
        for word in line.split():
            wid = model.word_id(word)
            ret, state = model.full_score(state, wid)
            if wid == 0:
                oov += 1
                corpus_oov_only += ret.log10_prob
            total += ret.log10_prob
            if print_word:
                out.write(
                    f"{word}={wid} {ret.ngram_length} "
                    f"{format_g(ret.log10_prob)}\t"
                )
            corpus_tokens += 1
        if sentence_context:
            ret, state = model.full_score(state, model.eos_id)
            total += ret.log10_prob
            corpus_tokens += 1
            if print_word:
                out.write(
                    f"</s>={model.eos_id} {ret.ngram_length} "
                    f"{format_g(ret.log10_prob)}\t"
                )
        if print_line:
            out.write(f"Total: {format_g(total)} OOV: {oov}\n")
        corpus_total += total
        corpus_oov += oov
    if print_summary and corpus_tokens:
        ppl_inc = 10.0 ** (-(corpus_total / corpus_tokens))
        denom = corpus_tokens - corpus_oov
        ppl_exc = (
            10.0 ** (-((corpus_total - corpus_oov_only) / denom))
            if denom
            else float("inf")
        )
        out.write(
            f"Perplexity including OOVs:\t{format_g(ppl_inc)}\n"
            f"Perplexity excluding OOVs:\t{format_g(ppl_exc)}\n"
            f"OOVs:\t{corpus_oov}\n"
            f"Tokens:\t{corpus_tokens}\n"
        )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="KenLM-compatible query tool (lm/query_main.cc twin)"
    )
    ap.add_argument("model", help="ARPA or binary model file")
    ap.add_argument(
        "-n", dest="sentence_context", action="store_false",
        help="Do not wrap the input in <s>/</s> (NullContext)",
    )
    ap.add_argument(
        "-v", dest="verbosity", default=None,
        choices=["word", "sentence", "summary", "0", "1", "2"],
    )
    ap.add_argument(
        "-b", dest="flush", action="store_true",
        help="Do not buffer output (accepted for flag parity; python "
        "stdout is line-flushed here anyway)",
    )
    ap.add_argument(
        "-l", dest="load_method", default=None,
        choices=["lazy", "populate", "read", "parallel"],
        help="Load method (accepted for flag parity; numpy arrays load "
        "eagerly here)",
    )
    args = ap.parse_args(argv)

    pw = pl = ps = False
    if args.verbosity is None:
        pw = pl = ps = True
    elif args.verbosity == "word":
        pw = True
    elif args.verbosity == "sentence":
        pl = True
    elif args.verbosity == "summary":
        ps = True
    elif args.verbosity == "0":
        ps = True
    elif args.verbosity == "1":
        pl = ps = True
    elif args.verbosity == "2":
        pw = pl = ps = True

    from kenlm_spark.ngram.binary import load_model

    model = load_model(args.model)
    run(
        model,
        (ln.rstrip("\n") for ln in sys.stdin),
        sys.stdout,
        sentence_context=args.sentence_context,
        print_word=pw,
        print_line=pl,
        print_summary=ps,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
