"""Model filtering (SURVEY.md §2.2 P1-P3, §2.7 U1): keep the n-grams of a
model that a target vocabulary / sentence set can produce.

Reference semantics (/root/reference/lm/filter/vocab.hh):

* Single (P1, :37-53): keep an n-gram iff EVERY non-tag token is in the
  vocabulary; tags ``<...>`` always pass (:31-35).
* Union (P2, :55-77): keep iff SOME single sentence contains all non-tag
  tokens (non-empty intersection of per-word sentence posting lists,
  util/multi_intersection.hh).
* Multiple (P3, :79-128): like Union but fan-out — emit the n-gram once
  per qualifying sentence.

Spark-first shape: posting lists are a (word, sentence_id) table; the
k-way intersection is explode → join → groupBy count, i.e. a semi-join
cascade, not a per-row automaton. At scale the posting table is the big
side (shuffled once); the model side is usually broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kenlm_spark.functions.text import tokenize

_IS_TAG = "^<.*>$"


def _content_words(words_col):
    """Non-tag tokens of the n-gram (tags always pass the vocab test)."""
    return F.filter(words_col, lambda w: ~w.rlike(_IS_TAG))


def filter_single(ngrams: DataFrame, vocab: DataFrame) -> DataFrame:
    """P1: ngrams(order, words) kept iff all non-tag words ∈ vocab(word)."""
    ex = ngrams.select(
        "order", "words", F.explode(_content_words(F.col("words"))).alias("word")
    )
    misses = (
        ex.join(vocab, "word", "left_anti")
        .select("order", "words")
        .distinct()
    )
    return ngrams.join(misses, ["order", "words"], "left_anti")


def sentence_postings(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(word, sent_id) distinct posting table."""
    return (
        docs.select(
            F.col(id_col).alias("sent_id"),
            F.explode(tokenize(text_col)).alias("word"),
        )
        .distinct()
    )


def filter_union(
    ngrams: DataFrame, postings: DataFrame, max_posting: int | None = None
) -> DataFrame:
    """P2: kept iff some sentence contains every non-tag word."""
    return (
        filter_multiple(ngrams, postings, max_posting=max_posting)
        .select("order", "words")
        .distinct()
        .join(ngrams, ["order", "words"])
    )


def filter_multiple(
    ngrams: DataFrame, postings: DataFrame, max_posting: int | None = None
) -> DataFrame:
    """P3: (order, words, sent_id) — one row per qualifying sentence.

    ``max_posting`` is the stop-word skew guard for the posting join (the
    same role max_bucket plays in dedup): words whose posting list exceeds
    it are treated as universally present — they stop participating in
    the intersection join (whose skewed key would otherwise dominate the
    shuffle) exactly like tags. Default off; the guarded path is a
    superset of the exact result and is NOT the oracle-checked default.
    """
    base = ngrams.select(
        "order",
        "words",
        _content_words(F.col("words")).alias("_content"),
    ).withColumn("_n", F.size(F.array_distinct("_content")))
    tag_only = base.filter(F.col("_n") == 0).select("order", "words")
    ex = base.filter(F.col("_n") > 0).select(
        "order", "words", "_n", F.explode(F.array_distinct("_content")).alias("word")
    )
    if max_posting is not None:
        common = (
            postings.groupBy("word")
            .agg(F.count("*").alias("_pc"))
            .filter(F.col("_pc") > max_posting)
            .select("word")
        )
        ex = ex.join(common, "word", "left_anti")
        req = ex.groupBy("order", "words").agg(F.count("*").alias("_req"))
        # grams whose every content word is ultra-common qualify everywhere
        tag_only = tag_only.unionByName(
            base.filter(F.col("_n") > 0)
            .join(req, ["order", "words"], "left_anti")
            .select("order", "words")
        )
        ex = ex.join(req, ["order", "words"]).drop("_n").withColumnRenamed(
            "_req", "_n"
        )
    # join rows are unique per (gram, word, sent): ex explodes
    # array_distinct'ed words and postings are distinct (word, sent), so a
    # plain count equals count_distinct without the Expand two-phase agg
    hits = ex.join(postings, "word").groupBy("order", "words", "_n", "sent_id").agg(
        F.count("*").alias("_hits")
    )
    qualified = hits.filter(F.col("_hits") == F.col("_n")).select(
        "order", "words", "sent_id"
    )
    # No eager isEmpty() here: an empty tag_only side just contributes an
    # empty crossJoin branch lazily (operator construction stays
    # action-free, so callers can compose plans without triggering jobs).
    all_sents = postings.select("sent_id").distinct()
    tag_fanout = tag_only.crossJoin(all_sents)
    return qualified.unionByName(tag_fanout)
