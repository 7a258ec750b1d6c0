"""CLI twin of the reference's `fragment` (lm/fragment_main.cc): score
each input line as a sentence FRAGMENT — RuleScore/ChartState semantics,
no implicit <s>/</s> — printing one float per line.

    python -m kenlm_spark.fragment_cli model.arpa < fragments.txt

Accepts any model this engine loads (ARPA, probing/rest binaries, all
four trie layouts — broader than the reference binary, which rejects
trie types). Differential-tested against the compiled reference's
ChartState scores (tests/test_cli.py; the RuleScore port itself is
golden-tested in tests/test_left.py).
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    if len(args) != 1:
        print("Expected model file name.", file=sys.stderr)
        return 1

    from kenlm_spark.ngram.binary import load_model
    from kenlm_spark.ngram.left import ChartState, RuleScore

    model = load_model(args[0])
    for line in sys.stdin:
        ignored = ChartState()
        scorer = RuleScore(model, ignored)
        for w in line.split():
            scorer.terminal(model.word_id(w))
        print(f"{scorer.finish():g}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
