"""CLI twin of the reference's `count_ngrams` (lm/builder/
count_ngrams_main.cc): count order-N windows from text and emit the
builder's binary record format — per record, ``order`` little-endian
uint32 vocab ids followed by a uint64 count, records in SuffixOrder
(lm/common/compare.hh: compare word ids from the LAST position
backward) with equal grams combined (CombineCounts), plus a
NUL-delimited vocabulary list in id order (--write_vocab_list).

    python -m kenlm_spark.count_ngrams_cli -o 3 \
        --write_vocab_list vocab.bin --text corpus.txt > counts.bin

Window semantics are corpus_count.cc's (golden-tested in
tests/test_estimator.py): each sentence is padded with order-1 ``<s>``
and one ``</s>``; every window ending at a real token or at ``</s>`` is
one record; for order 1 the special ``<unk>``/``<s>`` unigrams are
emitted with count 0 (corpus_count.cc:76-80). Vocabulary ids follow
VocabHandout: <unk>=0, <s>=1, </s>=2, then words by first appearance in
corpus order (reconstructed distributed via min(global position); ties
impossible — a word has one first position).

The reference binary needs boost to build in this container, so format
parity is pinned by round-tripping through dump_counts_cli against the
transcribed corpus_count goldens instead.
"""

from __future__ import annotations

import argparse
import struct
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Spark-distributed count_ngrams")
    ap.add_argument("-o", "--order", type=int, required=True)
    ap.add_argument("--write_vocab_list", required=False)
    ap.add_argument("--read_vocab_table", required=False)
    ap.add_argument("--text", help="input text file (default stdin)")
    ap.add_argument("--master", default="local[*]")
    ap.add_argument("--out", help="counts output (default stdout)")
    args = ap.parse_args(argv)
    if bool(args.write_vocab_list) == bool(args.read_vocab_table):
        ap.error(
            "specify one of --read_vocab_table or --write_vocab_list"
        )
    if args.read_vocab_table:
        ap.error(
            "--read_vocab_table (probing hash vocab input) is not "
            "supported; use --write_vocab_list"
        )

    import tempfile

    from pyspark.sql import functions as F

    from kenlm_spark.estimator import count_windows
    from kenlm_spark.session import get_spark

    if args.text:
        src = args.text
    else:
        with tempfile.NamedTemporaryFile(
            "w", suffix=".txt", delete=False
        ) as fh:
            fh.write(sys.stdin.read())
            src = fh.name

    preexisting = True
    try:
        from pyspark.sql import SparkSession

        preexisting = SparkSession.getActiveSession() is not None
    except Exception:
        pass
    spark = get_spark("count_ngrams", master=args.master)
    docs = spark.read.text(src).withColumnRenamed("value", "text")

    # first-appearance vocab ids: global position = (row id, token pos)
    rows = docs.withColumn("_rid", F.monotonically_increasing_id())
    toks = rows.select(
        "_rid", F.posexplode(F.split(F.col("text"), r"[\x00\t\n\r ]+")).alias(
            "pos", "word"
        )
    ).filter(F.col("word") != "")
    firsts = (
        toks.groupBy("word")
        .agg(F.min(F.struct("_rid", "pos")).alias("first"))
        .orderBy("first")
        .select("word")
        .collect()
    )
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for r in firsts:
        if r["word"] not in vocab:
            vocab[r["word"]] = len(vocab)

    counts = count_windows(docs, "text", args.order).collect()

    records = []
    for r in counts:
        ids = tuple(vocab.get(w, 0) for w in r["words"])
        records.append((ids, int(r["count"])))
    if args.order == 1:
        # corpus_count emits <unk> and <s> unigrams with count 0
        present = {ids[0] for ids, _ in records}
        for special in (0, 1):
            if special not in present:
                records.append(((special,), 0))
    records.sort(key=lambda t: tuple(reversed(t[0])))  # SuffixOrder

    out = open(args.out, "wb") if args.out else sys.stdout.buffer
    for ids, count in records:
        out.write(struct.pack(f"<{args.order}IQ", *ids, count))
    if args.out:
        out.close()

    with open(args.write_vocab_list, "wb") as fh:
        for w, _ in sorted(vocab.items(), key=lambda kv: kv[1]):
            fh.write(w.encode("utf-8") + b"\x00")

    if not preexisting:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
