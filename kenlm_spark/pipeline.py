"""The caption quality-filter pipeline (the north rule, end to end).

Stages over an image+caption table
``(image_id, bytes, w, h, fmt, caption, phash)``:

1. language-ID          — Catalyst expressions (kenlm_spark.filtering.langid)
2. perplexity scoring   — broadcast n-gram model, Arrow-batched pandas UDF
                          (kenlm_spark.ngram.scorer); KenLM query semantics
                          per /root/reference/lm/model.cc:134-296
3. quality heuristics   — Catalyst expressions (filtering.quality)
4. PII/toxicity scrub   — regexp_replace chain (filtering.scrub)
5. keep/drop decision   — deterministic rule over 1-4, with a drop_reason

Image bytes pass through untouched (verified by PSNR/equality tests).

Scale design:
* Stages 1/3/4/5 are pure Catalyst — whole-stage codegen, pushdown, no
  Python. Only stage 2 crosses into Python, via Arrow, batch-at-a-time.
* Skew: caption length is Zipfian. ``salt_by_length`` re-partitions by a
  composite (length-bucket, salt) key so one partition cannot accumulate
  all the long captions; inside the UDF, batches are re-chunked by token
  budget (scorer.max_batch_tokens).
* Checkpoint/resume: ``write_snapshot``/``latest_snapshot`` implement an
  Iceberg-style snapshot directory (manifest + immutable data files). On a
  real cluster, swap for ``df.writeTo(table)`` on an Iceberg catalog —
  the pipeline only assumes atomic snapshot visibility.
* Lineage/metrics: every run stamps ``part_id`` and ``run_id`` and
  ``metrics`` aggregates keep/drop/scrub counts per partition.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenlm_spark.filtering.langid import lang_expr
from kenlm_spark.filtering.quality import (
    DEFAULTS as QUALITY_DEFAULTS,
    quality_metric_exprs,
    quality_pass_expr,
)
from kenlm_spark.filtering.scrub import scrub_expr
from kenlm_spark.ngram.model import NGramModel
from kenlm_spark.ngram.scorer import SparkNGramScorer


@dataclass
class FilterConfig:
    allowed_langs: tuple[str, ...] = ("en",)
    max_perplexity: float = 1e5
    max_oov_ratio: float = 0.5
    quality: dict = field(default_factory=dict)
    stupid_backoff: bool = False
    #: Optional replacement language-ID: a callable (text Column) -> Column
    #: of language codes — e.g. a fastText pandas UDF when the library and
    #: weights are available. None uses the built-in Catalyst classifier.
    langid_expr: object = None
    #: 0 disables the salted repartition. The filter is map-only, so by
    #: default no shuffle is inserted at all — per-split byte sizing
    #: (spark.sql.files.maxPartitionBytes) plus the scorer's in-UDF token
    #: re-chunking already bound skew. Set >0 when the INPUT partitioning
    #: itself is length/language-skewed (e.g. source files sorted by
    #: caption length), which is when a salted redistribution pays for its
    #: full-data shuffle.
    salt_buckets: int = 0
    length_buckets: tuple[int, ...] = (8, 32, 128, 512)
    #: "broadcast" ships the model to executors (fastest; bounded by the
    #: driver/broadcast ceiling). "join" keeps the model DISTRIBUTED as a
    #: tall (n, key, prob, backoff) table and scores via equi-joins
    #: (kenlm_spark.ngram.join_scorer) — the escape hatch when the
    #: estimated model outgrows broadcast (100 TB-corpus n-gram counts).
    #: Identical scores (bit-parity-tested).
    scorer_mode: str = "broadcast"
    #: None disables the image-metadata gate (decision parity with the
    #: caption-only reference pipeline — the default the F1 tests pin).
    #: A dict (see filtering.image_quality.DEFAULTS) enables the
    #: decode-free image rules (resolution / aspect / byte-plausibility /
    #: format) as the FIRST drop reason ('image'): pure Catalyst over the
    #: (w, h, fmt, bytes) columns, so at 10^12 images the cheapest gate
    #: prunes before any caption scoring or pixel decode.
    image_rules: dict | None = None


class QualityFilterPipeline:
    def __init__(
        self, spark: SparkSession, model: NGramModel, config: FilterConfig | None = None
    ) -> None:
        self.spark = spark
        self.config = config or FilterConfig()
        if self.config.scorer_mode == "join":
            # In production the model tables live in parquet, bucketed by
            # key, and are read here instead of exported from a loaded
            # model (which would defeat the no-broadcast purpose).
            from kenlm_spark.ngram.join_scorer import model_table, vocab_table

            if self.config.stupid_backoff:
                raise ValueError(
                    "join scorer implements learned-backoff semantics only"
                )
            from kenlm_spark.ngram.join_scorer import key_bloom_from_model

            mdf = model_table(spark, model)
            self._join_model = (
                mdf,
                vocab_table(spark, model),
                model.order,
                model.bos_id,
                model.eos_id,
            )
            # broadcastable candidate filter (a few bits/key); prunes the
            # join-scorer's O(order×tokens) shuffle map-side with zero
            # semantic change.  The model is resident on the driver here,
            # so build the bloom from its arrays directly (microseconds);
            # from_model_tables uses the distributed build_key_bloom pass
            # (bit-identical) when only parquet tables exist.
            self._key_bloom = key_bloom_from_model(model)
            self.scorer = None
        else:
            self.scorer = SparkNGramScorer(
                spark, model, stupid_backoff=self.config.stupid_backoff
            )

    @classmethod
    def from_model_tables(
        cls,
        spark: SparkSession,
        model_df: DataFrame,
        vocab_df: DataFrame,
        order: int,
        config: FilterConfig | None = None,
        use_key_bloom: bool = True,
    ) -> "QualityFilterPipeline":
        """Build the pipeline from DISTRIBUTED model tables — no NGramModel,
        no driver collect, no broadcast. This is the 100-TB construction:
        ``estimate() → estimator.export_model_tables() → [optionally
        join_scorer.write_model_tables() for bucketed parquet] → here``.
        The model stays a (n, key, prob, backoff) DataFrame end to end.

        <s>/</s> ids are resolved with one 2-row lookup (O(1), not
        model-sized).
        """
        from kenlm_spark.ngram.model import BOS, EOS

        self = cls.__new__(cls)
        self.spark = spark
        self.config = config or FilterConfig()
        self.config.scorer_mode = "join"
        if self.config.stupid_backoff:
            raise ValueError(
                "join scorer implements learned-backoff semantics only"
            )
        special = {
            r["word"]: r["id"]
            for r in vocab_df.filter(
                F.col("word").isin(BOS, EOS)
            ).collect()
        }
        self._join_model = (
            model_df,
            vocab_df,
            order,
            special.get(BOS, 0),
            special.get(EOS, 0),
        )
        if use_key_bloom:
            from kenlm_spark.ngram.join_scorer import build_key_bloom

            self._key_bloom = build_key_bloom(model_df)
        else:
            self._key_bloom = None
        self.scorer = None
        return self

    def _with_join_scores(self, df: DataFrame, text_col: str) -> DataFrame:
        from kenlm_spark.ngram.join_scorer import score_with_join

        model_df, vocab_df, order, bos, eos = self._join_model
        docs = df.select(
            F.col("image_id").alias("doc_id"), F.col(text_col).alias("text")
        )
        scored = score_with_join(
            docs, "text", model_df, vocab_df, order, bos, eos,
            id_type=df.schema["image_id"].dataType.simpleString(),
            key_bloom=getattr(self, "_key_bloom", None),
        )
        scored = scored.select(
            F.col("doc_id").alias("image_id"),
            F.col("log10_prob").alias("lm_log10_prob"),
            F.pow(
                F.lit(10.0),
                -F.col("log10_prob") / (F.col("n_tokens") + F.lit(1)),
            ).alias("lm_perplexity"),
            F.col("oov_count").alias("lm_oov_count"),
            F.col("n_tokens").alias("lm_n_tokens"),
        )
        return df.join(scored, "image_id")

    # ------------------------------------------------------------- stages

    def salt_by_length(self, df: DataFrame, text_col: str = "caption") -> DataFrame:
        """Salted repartition by caption-length bucket (skew handling).

        Length is Zipfian; hashing on (bucket, salt) spreads the long tail
        across ``salt_buckets`` partitions per bucket instead of letting
        hash(image_id) chance decide.
        """
        c = F.coalesce(F.col(text_col), F.lit(""))
        bucket = F.lit(0)
        for i, b in enumerate(self.config.length_buckets):
            bucket = F.when(F.length(c) > b, F.lit(i + 1)).otherwise(bucket)
        salt = F.pmod(F.xxhash64(F.col("image_id")), F.lit(self.config.salt_buckets))
        n_part = self.spark.sparkContext.defaultParallelism
        return df.repartition(n_part, bucket, salt)

    def run(self, images: DataFrame, text_col: str = "caption") -> DataFrame:
        cfg = self.config
        df = (
            self.salt_by_length(images, text_col)
            if cfg.salt_buckets > 0
            else images
        )
        lang_fn = cfg.langid_expr or lang_expr
        df = df.withColumn("lang_pred", lang_fn(F.col(text_col)))
        # Cheapest gate FIRST: the decode-free image-metadata rules are
        # pure Catalyst over (w, h, fmt, bytes), so they are computed
        # before the LM crossing and — on the broadcast scorer path —
        # gated rows skip tokenize/lookup/score inside the batch (NULL
        # lm_ columns; masking must live inside the UDF because Catalyst
        # extracts Python UDFs out of CASE WHEN). The join-scorer path
        # still scores every row: its work is a relational join, and
        # pre-filtering there would split the corpus scan in two.
        if cfg.image_rules is not None:
            from kenlm_spark.filtering.image_quality import (
                image_metric_exprs,
                image_pass_expr,
            )

            im = image_metric_exprs()
            df = df.withColumn(
                "image_pass", image_pass_expr(im, cfg.image_rules)
            )
        if cfg.scorer_mode == "join":
            df = self._with_join_scores(df, text_col)
        elif cfg.image_rules is not None:
            df = self.scorer.with_scores(
                df, text_col, prefix="lm_", mask_col="image_pass"
            )
        else:
            df = self.scorer.with_scores(df, text_col, prefix="lm_")
        metrics = quality_metric_exprs(text_col, cfg.quality)
        for name, col in metrics.items():
            df = df.withColumn(name, col)
        df = df.withColumn("quality_pass", quality_pass_expr(metrics, cfg.quality))
        df = df.withColumn("scrubbed_caption", scrub_expr(text_col))

        oov_ratio = F.col("lm_oov_count").cast("double") / F.greatest(
            F.col("lm_n_tokens"), F.lit(1)
        )
        lang_ok = F.col("lang_pred").isin(*cfg.allowed_langs)
        ppl_ok = F.col("lm_perplexity") <= F.lit(cfg.max_perplexity)
        oov_ok = oov_ratio <= F.lit(cfg.max_oov_ratio)

        reason = F.when(~F.col("quality_pass"), F.lit("quality"))
        if cfg.image_rules is not None:
            # image_pass was computed BEFORE scoring (cheap-gate-first);
            # it leads the reason chain, so gated rows' NULL lm_ columns
            # never reach the lang/oov/perplexity predicates
            reason = F.when(~F.col("image_pass"), F.lit("image")).when(
                ~F.col("quality_pass"), F.lit("quality")
            )
        df = df.withColumn(
            "drop_reason",
            reason.when(~lang_ok, F.lit("lang"))
            .when(~oov_ok, F.lit("oov"))
            .when(~ppl_ok, F.lit("perplexity"))
            .otherwise(F.lit(None).cast("string")),
        )
        df = df.withColumn("keep", F.col("drop_reason").isNull())
        df = df.withColumn("part_id", F.spark_partition_id())
        return df

    # ----------------------------------------------------------- metrics

    @staticmethod
    def _metric_exprs(text_col: str = "caption") -> list:
        """The keep/drop/scrub metric aggregates (shared by the recompute
        path, the observed single-pass path, and the streaming observer)."""
        return [
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
            F.sum((~F.col("keep")).cast("long")).alias("n_drop"),
            F.sum(
                (
                    F.col("scrubbed_caption")
                    != F.coalesce(F.col(text_col), F.lit(""))
                ).cast("long")
            ).alias("n_scrubbed"),
            F.sum(F.col("lm_oov_count")).alias("n_oov_tokens"),
        ]

    @staticmethod
    def metrics(result: DataFrame, text_col: str = "caption") -> DataFrame:
        """Per-partition lineage metrics (north-rule requirement).

        This is the AUDIT path — it re-aggregates the result by the
        stamped ``part_id``. For the production monitoring rollup use
        ``run_observed``: same totals, collected during the main action
        with no second scan.
        """
        return result.groupBy("part_id").agg(
            *QualityFilterPipeline._metric_exprs(text_col)
        )

    def run_observed(self, images: DataFrame, text_col: str = "caption"):
        """``run`` plus a zero-cost global metrics rollup.

        Returns ``(result, observation)``: the metric aggregates ride the
        SAME job via ``DataFrame.observe`` (Spark accumulates them on the
        executors during whatever action the caller runs — at 100 TB this
        halves the cost of "filter + report keep/drop/scrub counts", which
        otherwise needs a second full scan or a cached intermediate).
        ``observation.get`` blocks until the first action on ``result``
        has completed and then yields
        ``{n_rows, n_keep, n_drop, n_scrubbed, n_oov_tokens}``.
        """
        from pyspark.sql import Observation

        result = self.run(images, text_col)
        obs = Observation("filter_metrics")
        return result.observe(obs, *self._metric_exprs(text_col)), obs

    # ------------------------------------------------- snapshot checkpoints

    @staticmethod
    def write_snapshot(df: DataFrame, root: str, run_id: str | None = None) -> str:
        """Write an immutable snapshot + manifest (Iceberg-style commit).

        Data lands in ``root/data/<snapshot_id>/`` first; the manifest is
        written last, so a snapshot is visible only when complete (the same
        visibility contract as an Iceberg snapshot commit). Each manifest
        records ``parent_snapshot_id`` (the latest complete snapshot at
        commit time, or None for the first) — the same lineage chain an
        Iceberg table keeps, so an audit can walk every resume step back
        to the initial run.
        """
        parent = QualityFilterPipeline._latest_manifest(root)
        snapshot_id = run_id or f"{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        data_path = os.path.join(root, "data", snapshot_id)
        df.write.mode("overwrite").parquet(data_path)
        manifest = {
            "snapshot_id": snapshot_id,
            "data_path": data_path,
            "committed_at": time.time(),
            "parent_snapshot_id": parent["snapshot_id"] if parent else None,
        }
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
        tmp = os.path.join(root, "manifests", f".{snapshot_id}.tmp")
        final = os.path.join(root, "manifests", f"{snapshot_id}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, final)
        return snapshot_id

    @staticmethod
    def _latest_manifest(root: str) -> dict | None:
        mdir = os.path.join(root, "manifests")
        if not os.path.isdir(mdir):
            return None
        manifests = [p for p in os.listdir(mdir) if p.endswith(".json")]
        if not manifests:
            return None
        # Latest = max committed_at INSIDE the manifest, not filename order:
        # a caller-supplied run_id is an arbitrary string and may sort after
        # newer time-stamped snapshots.
        latest = None
        for p in manifests:
            with open(os.path.join(mdir, p)) as fh:
                m = json.load(fh)
            if latest is None or m["committed_at"] > latest["committed_at"]:
                latest = m
        return latest

    @staticmethod
    def latest_snapshot(spark: SparkSession, root: str) -> DataFrame | None:
        latest = QualityFilterPipeline._latest_manifest(root)
        if latest is None:
            return None
        return spark.read.parquet(latest["data_path"])

    @staticmethod
    def snapshot_lineage(root: str) -> list[dict]:
        """The manifest chain from the latest snapshot back to the first
        (each entry links ``parent_snapshot_id``): the audit record of
        every resume. Pre-lineage manifests (no parent field) terminate
        the walk the same way a None parent does."""
        mdir = os.path.join(root, "manifests")
        if not os.path.isdir(mdir):
            return []
        by_id = {}
        for p in os.listdir(mdir):
            if p.endswith(".json"):
                with open(os.path.join(mdir, p)) as fh:
                    m = json.load(fh)
                by_id[m["snapshot_id"]] = m
        chain = []
        cur = QualityFilterPipeline._latest_manifest(root)
        while cur is not None and cur["snapshot_id"] not in {
            c["snapshot_id"] for c in chain
        }:
            chain.append(cur)
            cur = by_id.get(cur.get("parent_snapshot_id"))
        return chain

    @staticmethod
    def expire_snapshots(root: str, keep_last: int = 2) -> list[str]:
        """Iceberg-style snapshot expiry: delete all but the newest
        ``keep_last`` snapshots' data and manifests, returning the
        expired snapshot ids. The kept manifests are REWRITTEN so the
        oldest survivor's ``parent_snapshot_id`` becomes None — the
        lineage chain stays walkable end to end (it just starts later),
        exactly like Iceberg's expire_snapshots truncating table
        history. Deletion order is manifest-first, so a crash mid-expiry
        leaves orphaned data files (collectable by rerunning) rather
        than a visible manifest pointing at deleted data."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        mdir = os.path.join(root, "manifests")
        if not os.path.isdir(mdir):
            return []
        manifests = []
        for p in os.listdir(mdir):
            if p.endswith(".json"):
                with open(os.path.join(mdir, p)) as fh:
                    manifests.append(json.load(fh))
        manifests.sort(key=lambda m: m["committed_at"])
        expired, kept = manifests[:-keep_last], manifests[-keep_last:]
        expired_ids = {m["snapshot_id"] for m in expired}
        for m in expired:
            os.remove(os.path.join(mdir, f"{m['snapshot_id']}.json"))
            shutil.rmtree(m["data_path"], ignore_errors=True)
        # re-root the oldest survivor (and heal any kept manifest whose
        # parent was expired — only possible if history forked)
        for m in kept:
            if m.get("parent_snapshot_id") in expired_ids:
                m["parent_snapshot_id"] = None
                tmp = os.path.join(mdir, f".{m['snapshot_id']}.tmp")
                with open(tmp, "w") as fh:
                    json.dump(m, fh)
                os.rename(tmp, os.path.join(mdir, f"{m['snapshot_id']}.json"))
        return sorted(expired_ids)

    def run_resumable(
        self, images: DataFrame, checkpoint_root: str, text_col: str = "caption"
    ) -> DataFrame:
        """Resume from the latest complete snapshot: score only new ids."""
        done = self.latest_snapshot(self.spark, checkpoint_root)
        if done is None:
            result = self.run(images, text_col)
            self.write_snapshot(result, checkpoint_root)
            return result
        todo = images.join(done.select("image_id"), "image_id", "left_anti")
        new_result = self.run(todo, text_col)
        merged = done.unionByName(new_result)
        self.write_snapshot(merged, checkpoint_root)
        return merged
