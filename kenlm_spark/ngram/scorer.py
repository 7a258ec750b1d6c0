"""Distributed caption scoring: broadcast model + Arrow-batched pandas UDF.

Spark-first translation of the reference's bulk query path
(``lm/kenlm_benchmark_main.cc:80-132``): the model ships to executors once
as a broadcast variable (the analog of its shared mmap), and each Arrow
batch of captions is scored by the fully vectorized
:meth:`NGramModel.score_batch` — per-order ``searchsorted`` joins against
the broadcast key arrays, the manual form of a broadcast hash join. No
per-row Python anywhere: tokenization is a pandas str operation and the
scorer loop is numpy over the whole batch.

Scale notes (100 TB / 1000 executors):
* the broadcast is O(model size), shipped once per executor, reused across
  tasks — same cost profile as the reference's page-cache-shared mmap.
* compute is linear in tokens; a handful of pathological captions cannot
  stall a task because ``max_batch_tokens`` re-chunks inside the UDF.
* output is a struct column, so Catalyst can prune/push the rest of the
  plan around it; only (text) enters Python and only 4 numbers leave.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from kenlm_spark.functions.text import PY_TOKEN_RE
from kenlm_spark.ngram.model import NGramModel

SCORE_SCHEMA = T.StructType(
    [
        T.StructField("log10_prob", T.DoubleType()),
        T.StructField("perplexity", T.DoubleType()),
        T.StructField("oov_count", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
    ]
)


def _score_frame(
    model: NGramModel,
    texts: pd.Series,
    stupid_backoff: bool,
    max_batch_tokens: int,
) -> pd.DataFrame:
    nk = model._native()
    if nk is not None and nk._ensure_vocab_table(model):
        # fused C path (score_kernel.c score_captions): tokenize +
        # murmur-probing vocab lookup + scoring in one GIL-free pass —
        # profiling showed the regex split and dict-mapping cost 14x
        # the compiled scorer itself on caption-length text.  The byte
        # walk equals the regex split (all 5 delimiters are ASCII) and
        # the hash vocab equals the dict except for 64-bit murmur
        # collisions, the reference's own vocab semantics.
        from kenlm_spark.ngram.model import LOG10_STUPID_ALPHA

        filled = texts.fillna("")
        enc = [t.encode("utf-8") for t in filled]
        lens = np.fromiter((len(b) for b in enc), np.int64, len(enc))
        offs = np.zeros(len(enc) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        buf = (
            np.frombuffer(b"".join(enc), dtype=np.uint8)
            if len(enc)
            else np.zeros(0, dtype=np.uint8)
        )
        scores, oov, ntok = nk.score_captions(
            buf, offs, stupid_backoff, LOG10_STUPID_ALPHA
        )
        denom = np.maximum(ntok + 1, 1)
        return pd.DataFrame(
            {
                "log10_prob": scores,
                "perplexity": np.power(10.0, -scores / denom),
                "oov_count": oov,
                "n_tokens": ntok,
            }
        )

    toks = texts.fillna("").str.split(PY_TOKEN_RE)
    get = model.vocab.get
    id_lists: list[np.ndarray] = []
    for tl in toks:
        ids = [get(t, 0) for t in tl if t]
        id_lists.append(np.asarray(ids, dtype=np.int64))

    n = len(id_lists)
    scores = np.empty(n)
    oov = np.empty(n, dtype=np.int64)
    ntok = np.empty(n, dtype=np.int64)
    # Re-chunk so one batch of pathologically long captions stays bounded.
    start = 0
    while start < n:
        end, budget = start, max_batch_tokens
        while end < n and (budget > 0 or end == start):
            budget -= len(id_lists[end]) + 2
            end += 1
        s, o, k = model.score_batch(
            id_lists[start:end], bos=True, eos=True, stupid_backoff=stupid_backoff
        )
        scores[start:end] = s
        oov[start:end] = o
        ntok[start:end] = k - 1
        start = end

    denom = np.maximum(ntok + 1, 1)
    ppl = np.power(10.0, -scores / denom)
    return pd.DataFrame(
        {
            "log10_prob": scores,
            "perplexity": ppl,
            "oov_count": oov,
            "n_tokens": ntok,
        }
    )


class SparkNGramScorer:
    """Broadcast-model sentence scorer.

    >>> scorer = SparkNGramScorer(spark, load_arpa("model.arpa"))
    >>> df = scorer.with_scores(images, "caption")
    """

    def __init__(
        self,
        spark: SparkSession,
        model: NGramModel,
        stupid_backoff: bool = False,
        max_batch_tokens: int = 200_000,
    ) -> None:
        self.spark = spark
        self.model = model
        self.order = model.order
        self._bc = spark.sparkContext.broadcast(model)
        self._stupid = stupid_backoff
        self._max_batch_tokens = max_batch_tokens

    def udf(self):
        bc = self._bc
        stupid = self._stupid
        max_tokens = self._max_batch_tokens

        @pandas_udf(SCORE_SCHEMA)
        def score_udf(texts: pd.Series) -> pd.DataFrame:
            return _score_frame(bc.value, texts, stupid, max_tokens)

        return score_udf

    def masked_udf(self):
        """Scorer that SKIPS rows whose mask is false — they get NULL
        score columns without paying tokenize/lookup/score. Catalyst
        extracts Python UDFs out of CASE WHEN, so `F.when(mask, udf(c))`
        still evaluates the UDF for every row; masking must happen
        inside the batch, which this UDF does (the 10^12-scale
        cheap-gate-first contract of FilterConfig.image_rules)."""
        bc = self._bc
        stupid = self._stupid
        max_tokens = self._max_batch_tokens

        @pandas_udf(SCORE_SCHEMA)
        def score_masked_udf(
            texts: pd.Series, mask: pd.Series
        ) -> pd.DataFrame:
            m = mask.fillna(False).to_numpy(dtype=bool)
            n = len(texts)
            out = pd.DataFrame(
                {
                    "log10_prob": pd.array([None] * n, dtype="Float64"),
                    "perplexity": pd.array([None] * n, dtype="Float64"),
                    "oov_count": pd.array([None] * n, dtype="Int64"),
                    "n_tokens": pd.array([None] * n, dtype="Int64"),
                }
            )
            if m.any():
                sub = _score_frame(
                    bc.value,
                    texts[m].reset_index(drop=True),
                    stupid,
                    max_tokens,
                )
                for c in out.columns:
                    out.loc[m, c] = sub[c].to_numpy()
            return out

        return score_masked_udf

    def score_col(self, text_col: Column | str) -> Column:
        c = F.col(text_col) if isinstance(text_col, str) else text_col
        return self.udf()(c)

    def with_scores(
        self,
        df: DataFrame,
        text_col: str = "caption",
        prefix: str = "lm_",
        mask_col: str | None = None,
    ) -> DataFrame:
        """Append score columns. With ``mask_col``, rows where the mask
        is false/NULL skip scoring entirely and get NULL columns."""
        if mask_col is not None:
            s = self.masked_udf()(F.col(text_col), F.col(mask_col)).alias(
                "_lm"
            )
        else:
            s = self.score_col(text_col).alias("_lm")
        return df.withColumn("_lm", s).select(
            "*",
            F.col("_lm.log10_prob").alias(f"{prefix}log10_prob"),
            F.col("_lm.perplexity").alias(f"{prefix}perplexity"),
            F.col("_lm.oov_count").alias(f"{prefix}oov_count"),
            F.col("_lm.n_tokens").alias(f"{prefix}n_tokens"),
        ).drop("_lm")

    def with_full_scores(
        self, df: DataFrame, text_col: str = "caption", out_col: str = "token_scores"
    ) -> DataFrame:
        """Per-token (log10_prob, ngram_length, oov) — the vectorized twin
        of the reference's full_scores API (python/kenlm.pyx:217-242)."""
        bc = self._bc
        stupid = self._stupid

        schema = T.ArrayType(
            T.StructType(
                [
                    T.StructField("log10_prob", T.DoubleType()),
                    T.StructField("ngram_length", T.IntegerType()),
                    T.StructField("oov", T.BooleanType()),
                ]
            )
        )

        @pandas_udf(schema)
        def full_scores_udf(texts: pd.Series) -> pd.Series:
            model = bc.value
            get = model.vocab.get
            id_lists = [
                np.asarray(
                    [get(t, 0) for t in PY_TOKEN_RE.split(s) if t], dtype=np.int64
                )
                for s in texts.fillna("")
            ]
            _, _, n_scored, (tp, nl, ov, _) = model.score_batch(
                id_lists, bos=True, eos=True, stupid_backoff=stupid,
                return_tokens=True,
            )
            bounds = np.cumsum(n_scored)[:-1]
            out = []
            for probs, lens, oovs in zip(
                np.split(tp, bounds), np.split(nl, bounds), np.split(ov, bounds)
            ):
                out.append(
                    [
                        {"log10_prob": float(p), "ngram_length": int(n), "oov": bool(o)}
                        for p, n, o in zip(probs, lens, oovs)
                    ]
                )
            return pd.Series(out)

        return df.withColumn(out_col, full_scores_udf(F.col(text_col)))

    def unpersist(self) -> None:
        self._bc.unpersist()
