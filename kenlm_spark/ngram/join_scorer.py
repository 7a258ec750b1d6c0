"""Join-based caption scoring — the fallback for models too large to
broadcast.

The broadcast scorer (``scorer.SparkNGramScorer``) ships the whole model
to every executor; at 100 TB-corpus n-gram counts the model itself can
outgrow the driver/broadcast ceiling (``estimator.to_ngram_model``
collects it). This module scores with the model kept DISTRIBUTED as a
tall ``(n, key, prob, backoff)`` DataFrame (parquet-able, bucketable by
``key``), using only relational ops plus one hash-chain mapInPandas:

1. tokenize + posexplode, token→id via a JOIN with the vocab table
   (never a broadcast dict);
2. one Python pass per doc emits every candidate key: gram keys
   (context+word, orders 1..N) and context-suffix keys (for backoff
   charges) — pure ``combine_word_hash`` chains, no model access;
3. one equi-join against the model table on (n, key) — the scale step:
   with the model bucketed by key this is a co-located join;
4. per-position reassembly: longest gram match L → its prob, plus the
   backoffs of context suffixes of length >= L (ARPA backoff recursion,
   missing suffixes charge nothing by suffix closure);
5. per-doc rollup (Σ log10, oov count, token count).

Numerically identical to the broadcast path (same float32 payloads, same
charges; summation-order ulps absorbed by the same round() the oracle
uses) — ``q_score_captions_join`` hash-matches q_score_captions' oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenlm_spark.functions.text import tokenize
from kenlm_spark.ngram.hashing import combine_word_hash
from kenlm_spark.ngram.model import NGramModel


@dataclass
class KeyBloom:
    """Bit-packed Bloom filter over the model's order>=2 key set.

    A few bits per key (default 10 bits/key → ~1.6% false positives with k=6 probes), so it
    broadcasts where the model itself doesn't: a 1e9-key model is ~1.25 GB
    of bits vs ~20+ GB of (key, prob, backoff) payload. Keys are already
    uniform 64-bit hash chains (combine_word_hash), so probe positions come
    from double hashing the key itself — no re-hash pass. False negatives
    are impossible (every member key sets its bits), so filtering candidate
    n-grams with it before the model join is EXACT: a dropped candidate
    would have missed the join anyway (missing grams / context suffixes
    charge nothing by ARPA suffix closure); false positives just flow to
    the join and drop there.
    """

    nbits: int  # power of two
    k: int
    bits: bytes  # nbits/8 bytes, little-endian bit order within a byte

    def contains(self, keys_i64: np.ndarray) -> np.ndarray:
        """Vectorized membership test for int64-viewed uint64 keys."""
        bits = np.frombuffer(self.bits, dtype=np.uint8)
        h1 = keys_i64.view(np.uint64)
        h2 = (h1 >> np.uint64(33)) | np.uint64(1)
        mask = np.uint64(self.nbits - 1)
        out = np.ones(len(h1), dtype=bool)
        for i in range(self.k):
            pos = (h1 + np.uint64(i) * h2) & mask
            byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
            out &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1 != 0
        return out


_BLOOM_K = 6  # fixed probe count: with 10 bits/key FP ~1%, and a fixed k
# lets partition bitmaps build BEFORE the key count is known


def _set_bits(bm: np.ndarray, keys_u64: np.ndarray, nbits: int) -> None:
    h2 = (keys_u64 >> np.uint64(33)) | np.uint64(1)
    mask = np.uint64(nbits - 1)
    for i in range(_BLOOM_K):
        pos = (keys_u64 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(
            bm,
            (pos >> np.uint64(3)).astype(np.int64),
            (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
        )


def _fold(bm: np.ndarray, target_nbits: int) -> np.ndarray:
    """OR-fold a power-of-two bitmap down to ``target_nbits``. Probe
    positions are ``hash & (nbits-1)``, so the folded bitmap is
    bit-identical to one built directly at the target size — membership
    stays exact (no false negatives introduced)."""
    while len(bm) * 8 > target_nbits:
        half = len(bm) // 2
        bm = np.bitwise_or(bm[:half], bm[half:])
    return bm


def _target_nbits(n_keys: int, bits_per_key: int, cap: int) -> int:
    want = 1 << max(13, int(np.ceil(np.log2(max(1, n_keys) * bits_per_key))))
    return min(cap, want)


def build_key_bloom(
    model_df: DataFrame,
    bits_per_key: int = 10,
    initial_bits: int = 1 << 26,
    merge_parallelism: int = 16,
) -> KeyBloom:
    """One distributed pass over the model table → a broadcastable Bloom
    filter of its order>=2 keys.

    Single job: each input partition sets its keys' bits into a local
    bitmap at ``initial_bits`` (vectorized ``np.bitwise_or.at``) and emits
    (count, bitmap); bitmaps are OR-merged through a coalesced reduce
    stage (``merge_parallelism``-wide, so the driver sees at most that
    many bitmaps regardless of input partition count) and folded down to
    the count-optimal size. Size the cap for the model: ``initial_bits``
    must be >= ~``bits_per_key`` × key count or the false-positive rate
    degrades (the filter stays exact either way — members always pass).
    Default 2^26 bits = 8 MB covers ~6.7M keys; a 1e9-key model wants
    ``initial_bits=1<<34`` (2 GB — still far under the model's payload).
    Unigrams are excluded: word ids always hit the n=1 table, so filtering
    them would save nothing.
    """
    import pandas as pd

    nbytes = initial_bits // 8

    def part_bitmap(batches):
        bm = np.zeros(nbytes, dtype=np.uint8)
        count = 0
        for pdf in batches:
            h1 = pdf["key"].to_numpy(np.int64).view(np.uint64)
            if not len(h1):
                continue
            count += len(h1)
            _set_bits(bm, h1, initial_bits)
        if count:
            yield pd.DataFrame({"count": [count], "bm": [bm.tobytes()]})

    def or_reduce(batches):
        bm = np.zeros(nbytes, dtype=np.uint8)
        count = 0
        for pdf in batches:
            for c, b in zip(pdf["count"], pdf["bm"]):
                count += int(c)
                np.bitwise_or(bm, np.frombuffer(b, dtype=np.uint8), out=bm)
        if count:
            yield pd.DataFrame({"count": [count], "bm": [bm.tobytes()]})

    parts = (
        model_df.filter(F.col("n") >= 2)
        .select("key")
        .mapInPandas(part_bitmap, "count long, bm binary")
        .coalesce(merge_parallelism)
        .mapInPandas(or_reduce, "count long, bm binary")
        .collect()
    )
    bm = np.zeros(nbytes, dtype=np.uint8)
    n_keys = 0
    for row in parts:
        n_keys += row["count"]
        np.bitwise_or(bm, np.frombuffer(row["bm"], dtype=np.uint8), out=bm)
    bm = _fold(bm, _target_nbits(n_keys, bits_per_key, initial_bits))
    return KeyBloom(nbits=len(bm) * 8, k=_BLOOM_K, bits=bm.tobytes())


def key_bloom_from_model(
    model: NGramModel, bits_per_key: int = 10
) -> KeyBloom:
    """Driver-side fast path: build the candidate filter straight from an
    already-resident :class:`NGramModel`'s key arrays (microseconds, no
    Spark job). Bit-identical to :func:`build_key_bloom` over
    :func:`model_table` of the same model."""
    key_arrays = [
        model.keys[n].view(np.uint64) for n in range(2, model.order + 1)
    ]
    n_keys = sum(len(a) for a in key_arrays)
    nbits = _target_nbits(n_keys, bits_per_key, 1 << 34)
    bm = np.zeros(nbits // 8, dtype=np.uint8)
    for arr in key_arrays:
        _set_bits(bm, arr, nbits)
    return KeyBloom(nbits=nbits, k=_BLOOM_K, bits=bm.tobytes())


def model_table(spark: SparkSession, model: NGramModel) -> DataFrame:
    """Export the model as a tall (n, key, prob, backoff) DataFrame.

    ``key`` is the int64 view of the uint64 hash chain (order >= 2) or the
    word id (order 1). Includes hallucinated blanks, so join-based lookup
    sees exactly what the broadcast arrays see. In production this table
    is written to parquet bucketed by ``key`` and never re-collected.
    """
    import pandas as pd

    frames = [
        pd.DataFrame(
            {
                "n": 1,
                "key": np.arange(len(model.uni_prob), dtype=np.int64),
                "prob": model.uni_prob.astype(np.float64),
                "backoff": model.uni_backoff.astype(np.float64),
            }
        )
    ]
    for n in range(2, model.order + 1):
        frames.append(
            pd.DataFrame(
                {
                    "n": n,
                    "key": model.keys[n].view(np.int64),
                    "prob": model.probs[n].astype(np.float64),
                    "backoff": (
                        model.backoffs[n].astype(np.float64)
                        if n < model.order
                        else np.zeros(len(model.keys[n]))
                    ),
                }
            )
        )
    return spark.createDataFrame(pd.concat(frames, ignore_index=True))


def vocab_table(spark: SparkSession, model: NGramModel) -> DataFrame:
    """(word, id) — the distributed twin of the vocab dict."""
    return spark.createDataFrame(
        list(model.vocab.items()), "word string, id long"
    )


def write_model_tables(
    tall: DataFrame,
    vocab: DataFrame,
    name: str,
    buckets: int = 64,
    path: str | None = None,
) -> None:
    """Persist the distributed model as BUCKETED parquet tables.

    The model table is bucketed+sorted by ``(n, key)`` — the scoring
    join's exact equi-key set, which is what lets the planner use the
    bucketing — so every scoring join reads it in place: no Exchange
    above the model scan, only the candidate stream shuffles to the
    bucket layout (BENCH/BUCKETED.md, BENCH/FLAGSHIP.md). The vocab
    table is bucketed by ``word`` for the same reason on the token→id
    join. Written once per estimated model; at 100 TB this is the step
    that replaces ``to_ngram_model``'s driver collect entirely.
    """
    w = tall.write.mode("overwrite").format("parquet")
    if path:
        w = w.option("path", f"{path}/{name}_model")
    w.bucketBy(buckets, "n", "key").sortBy("n", "key").saveAsTable(
        f"{name}_model"
    )
    wv = vocab.write.mode("overwrite").format("parquet")
    if path:
        wv = wv.option("path", f"{path}/{name}_vocab")
    wv.bucketBy(buckets, "word").sortBy("word").saveAsTable(f"{name}_vocab")


def read_model_tables(
    spark: SparkSession, name: str
) -> tuple[DataFrame, DataFrame]:
    """Read back the bucketed (model, vocab) tables written by
    :func:`write_model_tables` — bucket metadata comes from the catalog,
    so downstream joins on ``key``/``word`` skip their model-side shuffle."""
    return spark.table(f"{name}_model"), spark.table(f"{name}_vocab")


def score_with_join(
    docs: DataFrame,
    text_col: str,
    model_df: DataFrame,
    vocab_df: DataFrame,
    order: int,
    bos_id: int,
    eos_id: int,
    id_type: str = "long",
    key_bloom: KeyBloom | None = None,
) -> DataFrame:
    """(doc_id, log10_prob, oov_count, n_tokens) with KenLM semantics,
    computed without any broadcast of model state. ``id_type`` is the
    Spark type of the doc_id column (e.g. "string" for image ids).

    ``key_bloom`` (see :func:`build_key_bloom`) prunes candidate n-grams
    map-side BEFORE the shuffle into the model join: most high-order
    candidates miss the model, and without the filter each one costs a
    shuffled row. Exactness is preserved — the Bloom filter has no false
    negatives, and a pruned candidate would have contributed nothing
    downstream (the inner join would drop it)."""
    cand = candidate_keys(
        docs, text_col, vocab_df, order, bos_id, eos_id, id_type, key_bloom
    )

    # One inner equi-join (the scale step); every scored position keeps at
    # least its unigram row because word ids always hit the n=1 table.
    hits = cand.join(model_df, ["n", "key"])
    return _reassemble(hits, order)


def candidate_keys(
    docs: DataFrame,
    text_col: str,
    vocab_df: DataFrame,
    order: int,
    bos_id: int,
    eos_id: int,
    id_type: str = "long",
    key_bloom: KeyBloom | None = None,
) -> DataFrame:
    """The candidate stream: one row per (doc, end-position, order) whose
    n-gram might hit the model — the input side of the scoring join.
    Exposed separately so its volume (the join scorer's dominant shuffle
    cost) can be measured directly with/without the Bloom prune."""
    spark = docs.sparkSession
    id_np_dtype = np.int64 if id_type == "long" else object
    bloom_bc = (
        spark.sparkContext.broadcast(key_bloom) if key_bloom is not None else None
    )

    toks = docs.select(
        "doc_id", F.posexplode(tokenize(text_col)).alias("pos", "word")
    )
    ids = toks.join(vocab_df, "word", "left").select(
        "doc_id", "pos", F.coalesce("id", F.lit(0)).alias("wid")
    )
    seqs = ids.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "wid"))),
            lambda s: s["wid"],
        ).alias("ids")
    )
    # keep docs whose caption tokenized to nothing (scored as <s> → </s>)
    seqs = docs.select("doc_id").join(seqs, "doc_id", "left").select(
        "doc_id", F.coalesce("ids", F.array().cast("array<long>")).alias("ids")
    )

    def gen_keys(batches):
        """Vectorized over the whole Arrow batch: flatten all padded
        sequences, compute the order-n key chain K[n][j] =
        combine(K[n-1][j], flat[j-n+1]) with combine_word_hash_vec, and
        mask positions whose n-gram would cross a document boundary.

        Emits ONE row per (end-position, order) — a context suffix of
        length m for scoring position p is exactly the gram of order m
        ending at p-1, so the downstream model join serves both roles
        from the same row (no separate ctx candidates)."""
        import pandas as pd

        from kenlm_spark.ngram.hashing import combine_word_hash_vec

        for pdf in batches:
            lens = np.fromiter(
                (len(x) + 2 for x in pdf["ids"]), dtype=np.int64, count=len(pdf)
            )
            total = int(lens.sum())
            flat = np.empty(total, dtype=np.uint64)
            doc_of = np.empty(total, dtype=id_np_dtype)
            rel_pos = np.empty(total, dtype=np.int64)
            off = 0
            for doc_id, id_list in zip(pdf["doc_id"], pdf["ids"]):
                ln = len(id_list) + 2
                flat[off] = bos_id
                flat[off + 1 : off + ln - 1] = np.asarray(id_list, dtype=np.uint64)
                flat[off + ln - 1] = eos_id
                doc_of[off : off + ln] = doc_id
                rel_pos[off : off + ln] = np.arange(ln)
                off += ln

            # K[n-1][j]: key of the n-gram ending at j (garbage where the
            # n-gram crosses a doc boundary; masked below via rel_pos).
            keys = np.empty((order, total), dtype=np.uint64)
            keys[0] = flat
            for n in range(2, order + 1):
                shifted = np.empty(total, dtype=np.uint64)
                shifted[n - 1 :] = flat[: total - (n - 1)]
                shifted[: n - 1] = 0
                keys[n - 1] = combine_word_hash_vec(keys[n - 2], shifted)

            bloom = bloom_bc.value if bloom_bc is not None else None
            parts = []
            for n in range(1, order + 1):
                # the n-gram ending at j exists iff it fits in the doc
                mask = rel_pos >= n - 1
                if n >= 2 and bloom is not None:
                    # map-side candidate pruning: keys absent from the
                    # model never reach the shuffle (no false negatives)
                    mask = mask & bloom.contains(keys[n - 1].view(np.int64))
                if mask.any():
                    parts.append(
                        pd.DataFrame(
                            {
                                "doc_id": doc_of[mask],
                                "pos": rel_pos[mask],
                                "n": n,
                                "key": keys[n - 1][mask].view(np.int64),
                                "wid": flat[mask].view(np.int64),
                            }
                        )
                    )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    return seqs.mapInPandas(
        gen_keys, f"doc_id {id_type}, pos int, n int, key long, wid long"
    )


def _reassemble(hits: DataFrame, order: int) -> DataFrame:
    """Per-position ARPA reassembly of the joined (candidate × model) rows
    into token scores, then the per-doc rollup."""
    # Each joined row plays two roles: the gram match for its own end
    # position, and (shifted by one) a context-suffix backoff source for
    # the next position. JVM-side explode, then ONE groupBy reassembles a
    # position from its <= 2*order-1 rows with small-array HOF logic.
    roles = F.array(
        F.struct(
            F.col("pos").alias("sp"), F.lit(True).alias("g"),
            "n", "prob", "backoff", "wid",
        ),
        F.struct(
            (F.col("pos") + 1).alias("sp"), F.lit(False).alias("g"),
            "n", "prob", "backoff", "wid",
        ),
    )
    rows = (
        hits.select("doc_id", F.explode(roles).alias("r"))
        .select("doc_id", "r.sp", "r.g", "r.n", "r.prob", "r.backoff", "r.wid")
        .filter(
            (F.col("g") & (F.col("sp") >= 1))
            | (~F.col("g") & (F.col("n") <= order - 1))
        )
    )
    # Pivot the <= 2*order-1 rows of a position into fixed columns with
    # conditional aggregates (p_n = gram prob at order n, c_m = ctx
    # backoff of suffix length m) — a single partial-aggregatable hash agg
    # with no array building.
    aggs = [
        F.max(F.when(F.col("g") & (F.col("n") == n), F.col("prob"))).alias(
            f"p{n}"
        )
        for n in range(1, order + 1)
    ] + [
        F.max(F.when(~F.col("g") & (F.col("n") == m), F.col("backoff"))).alias(
            f"c{m}"
        )
        for m in range(1, order)
    ] + [F.max(F.when(F.col("g"), F.col("wid"))).alias("wid")]
    agg = rows.groupBy("doc_id", "sp").agg(*aggs)

    # score = p_L + Σ_{m >= L} c_m for the longest matched L — a coalesce
    # chain from the top order down (missing suffix backoffs charge 0).
    def charges_from(m_lo: int):
        total = None
        for m in range(m_lo, order):
            c = F.coalesce(F.col(f"c{m}"), F.lit(0.0))
            total = c if total is None else total + c
        return total if total is not None else F.lit(0.0)

    score = None
    for n in range(order, 0, -1):
        branch = F.col(f"p{n}") + charges_from(n)
        score = branch if score is None else F.coalesce(score, branch)
    token_scores = (
        agg.filter(F.col("p1").isNotNull())  # drop ctx-only groups past end
        .select("doc_id", score.alias("score"), "wid")
    )
    return token_scores.groupBy("doc_id").agg(
        F.sum("score").alias("log10_prob"),
        F.sum(F.when(F.col("wid") == 0, 1).otherwise(0))
        .cast("long")
        .alias("oov_count"),
        (F.count("*") - 1).cast("long").alias("n_tokens"),  # minus </s>
    )
