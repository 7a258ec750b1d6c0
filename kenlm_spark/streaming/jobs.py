"""Structured Streaming variants of the engine's operators.

The reference is a batch system (its util/stream is an intra-process
pipeline, SURVEY.md §2.9), so these are additive capabilities:

* ``hourly_event_rollup_stream`` — event-time tumbling window with a
  watermark for late data; the batch twin is ``q_events_hourly``, and the
  test asserts both produce identical results under availableNow.
* ``filtered_captions_stream`` — the full quality-filter pipeline on a
  stream. Every stage is stateless/map-only (langid/quality/scrub are
  Catalyst projections, the scorer is a pandas UDF), so it runs unchanged
  on a streaming DataFrame — the Spark-first payoff of keeping the
  pipeline shuffle-free.

At production scale the source would be Kafka or an Iceberg
streaming-read; tests use the file source over the same parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_event_rollup_stream(
    spark: SparkSession, events_path: str, watermark: str = "2 hours"
) -> DataFrame:
    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).parquet(events_path)
    # Parquet infers TIMESTAMP_NTZ; watermarks need TIMESTAMP (session UTC,
    # so the wall-clock value is unchanged).
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def filtered_captions_stream(
    spark: SparkSession, images_path: str, model, config=None
) -> DataFrame:
    """Streaming quality filter: same stages, streaming source."""
    from kenlm_spark.pipeline import FilterConfig, QualityFilterPipeline

    schema = spark.read.parquet(images_path).schema
    stream = spark.readStream.schema(schema).parquet(images_path)
    pipe = QualityFilterPipeline(spark, model, config or FilterConfig())
    # salt_by_length would repartition; streams stay map-only.
    assert pipe.config.salt_buckets == 0, "streaming filter must be map-only"
    return pipe.run(stream)


def dedup_stream(
    spark: SparkSession,
    images_path: str,
    text_col: str = "caption",
    id_col: str = "image_id",
) -> DataFrame:
    """Streaming exact dedup: stateful dropDuplicates on the normalized
    content hash — the streaming twin of operators.dedup.exact_duplicates.

    State grows with distinct hashes; on a real deployment pair with
    ``withWatermark`` on an event-time column + ``dropDuplicatesWithinWatermark``
    to bound it. Files sources here have no event time, so state is unbounded
    (documented trade-off; the batch dedup is the compaction path).
    """
    from kenlm_spark.operators.dedup import h60, norm_text

    schema = spark.read.parquet(images_path).schema
    stream = spark.readStream.schema(schema).parquet(images_path)
    hashed = stream.withColumn("text_hash", h60(norm_text(text_col)))
    return hashed.dropDuplicates(["text_hash"]).select(id_col, "text_hash")


def running_user_stats_stream(
    spark: SparkSession, events_path: str, round_digits: int = 6
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-user event counters and value sums across micro-batches.

    Demonstrates arbitrary-state streaming (the tool for operators that
    windowed aggs can't express); state is one small tuple per user.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).parquet(events_path)

    out_schema = "user_id long, n_events long, sum_value double"
    state_schema = "n long, s double"

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [round(s, round_digits)],
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def observe_filter_metrics(
    df: DataFrame, name: str = "filter_metrics", exprs: list | None = None
) -> DataFrame:
    """Attach per-micro-batch keep/drop monitoring metrics via ``observe``.

    This is the streaming production-monitoring story the north rule asks
    for: the counts are accumulated on the executors DURING each
    micro-batch (no extra pass, no second aggregation query over the
    sink) and surface in every ``StreamingQueryProgress`` under
    ``observedMetrics[name]`` — read them with ``observed_totals``.
    For the batch pipeline the same single-pass rollup is
    ``QualityFilterPipeline.run_observed`` (``pyspark.sql.Observation``).

    Default metrics assume a keep/drop decision frame (a ``keep`` bool and
    a nullable ``drop_reason``): total rows, keeps, drops, and one counter
    per drop reason the north-rule pipeline emits.
    """
    if exprs is None:
        exprs = [
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
            F.sum((~F.col("keep")).cast("long")).alias("n_drop"),
        ] + [
            F.sum(
                (F.col("drop_reason") == F.lit(r)).cast("long")
            ).alias(f"n_drop_{r}")
            # 'image' counts 0 unless FilterConfig.image_rules is set
            for r in ("image", "quality", "lang", "oov", "perplexity")
        ]
    return df.observe(name, *exprs)


def observed_totals(query, name: str = "filter_metrics") -> dict:
    """Sum a named observation across the micro-batches of a streaming
    query (running or finished): the job-level rollup of the per-batch
    ``observedMetrics``. Batches that carried no data for the observed
    subtree are skipped.

    Spark retains only the last ``spark.sql.streaming.
    numRecentProgressUpdates`` (default 100) progress entries, so this
    RAISES when the query has hit that cap — a silent sum over a
    truncated window would underreport. Long-running production queries
    must accumulate per batch instead: attach
    :class:`ObservedMetricsListener` before starting the query."""
    progress = list(query.recentProgress)
    # StreamingQuery carries no sparkSession handle in pyspark 4.x —
    # read the retention conf off the active session so a user-raised
    # numRecentProgressUpdates actually raises the cap here too
    cap = 100
    try:
        from pyspark.sql import SparkSession

        session = SparkSession.getActiveSession()
        if session is not None:
            cap = int(
                session.conf.get(
                    "spark.sql.streaming.numRecentProgressUpdates", "100"
                )
            )
    except Exception:
        pass
    if len(progress) >= cap:
        raise RuntimeError(
            f"observed_totals: query '{query.name}' has >= {cap} progress "
            "entries — Spark retains only the most recent "
            "numRecentProgressUpdates, so summing recentProgress would "
            "silently drop earlier batches. Attach ObservedMetricsListener "
            "before start() (or raise the conf) for long streams."
        )
    totals: dict = {}
    for p in progress:
        row = (p.observedMetrics or {}).get(name)
        if row is None:
            continue
        for k, v in row.asDict().items():
            if v is not None:
                totals[k] = totals.get(k, 0) + v
    return totals


class ObservedMetricsListener:
    """StreamingQueryListener accumulating a named observation per batch
    — the unbounded-stream twin of :func:`observed_totals` (which is
    capped by Spark's recentProgress retention). Register with
    ``spark.streams.addListener(listener)`` BEFORE starting the query;
    read ``listener.totals`` any time.
    """

    def __new__(cls, name: str = "filter_metrics"):
        from pyspark.sql.streaming import StreamingQueryListener

        class _L(StreamingQueryListener):
            def __init__(self, metric_name: str):
                self.metric_name = metric_name
                self.totals: dict = {}
                self.n_batches = 0

            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                om = event.progress.observedMetrics or {}
                row = om.get(self.metric_name)
                if row is None:
                    return
                self.n_batches += 1
                for k, v in row.asDict().items():
                    if v is not None:
                        self.totals[k] = self.totals.get(k, 0) + v

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        return _L(name)


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str | None = None,
    collect_rows: bool = True,
) -> list:
    """Drain a bounded stream into a memory sink; return the rows.

    ``collect_rows=False`` (r8) skips the final driver collect and
    returns [] — for callers that only read the named memory table
    afterwards (every ``queries()`` stream entry), the collect was a
    pure driver-side copy of the whole sink.

    The finished ``StreamingQuery`` is exposed as
    ``run_available_now.queries[query_name]`` (and, for the latest
    call, ``run_available_now.last_query``) so callers can read
    per-batch progress / ``observedMetrics`` without changing the
    long-standing rows return type. The name-keyed registry is the one
    to use when draining more than one stream — ``last_query`` is a
    process-global that a concurrent drain overwrites.
    """
    if output_mode is None:
        output_mode = (
            "complete"
            if stream_df.isStreaming and _has_agg(stream_df)
            else "append"
        )
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    run_available_now.last_query = q
    if not hasattr(run_available_now, "queries"):
        run_available_now.queries = {}
    run_available_now.queries[query_name] = q
    if not collect_rows:
        return []
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}").collect()


def _has_agg(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()
    return "Aggregate" in plan
