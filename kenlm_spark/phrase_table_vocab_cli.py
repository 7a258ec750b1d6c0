"""CLI twin of the reference's `phrase_table_vocab`
(lm/filter/phrase_table_vocab_main.cc): per source sentence, collect the
vocabulary of phrase-table TARGET sides whose SOURCE phrase appears in
the sentence.

    python -m kenlm_spark.phrase_table_vocab_cli source.txt < table \
        > per_sentence_vocab.txt

Source sentences come from the file argument (one per line); the phrase
table streams on stdin as ``source ||| target ||| ...`` lines. Each
sentence's vocab starts with its own words (TargetWords::Introduce),
then gains the target words of every table line whose source phrase
(length <= 7 words, the reference's indexing cap) occurs contiguously in
the sentence. Output: one line per sentence, each word followed by a
space. One documented divergence: the reference prints hash-set
iteration order; this twin prints first-insertion order so the output
is deterministic (consumers treat the line as a set either way).
"""

from __future__ import annotations

import sys

MAX_LENGTH = 7  # phrase_table_vocab_main.cc:144 Input(7)


def main(argv=None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    if len(args) != 1:
        print("Expected source text on the command line", file=sys.stderr)
        return 1

    phrase_map: dict[str, list[int]] = {}
    vocabs: list[dict[str, None]] = []  # dict-as-ordered-set
    with open(args[0]) as fh:
        for sid, line in enumerate(fh):
            words = line.split()
            vocabs.append(dict.fromkeys(words))
            for i in range(len(words)):
                for j in range(i + 1, min(len(words), i + MAX_LENGTH) + 1):
                    phrase_map.setdefault(" ".join(words[i:j]), []).append(sid)

    for line in sys.stdin:
        parts = line.rstrip("\n").split("|||")
        if len(parts) < 2:
            continue
        source = " ".join(parts[0].split())
        targets = parts[1].split()
        for sid in phrase_map.get(source, ()):
            vocabs[sid].update(dict.fromkeys(targets))

    out = sys.stdout
    for vocab in vocabs:
        for w in vocab:
            out.write(w + " ")
        out.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
