"""Structured Streaming: watermarked windowed aggregation + scoring.

The reference pins the Kafka connector jar and never uses it
(``/root/reference/main.py:22`` — SURVEY.md §2.1 S3, "latent source").
This module realizes that intent Spark-first:

- ONE aggregation function (:func:`windowed_event_counts`) shared by
  the batch twin (plans/relational.py events_hourly) and the stream —
  same logical plan, two execution modes;
- event-time tumbling windows with a watermark: late rows beyond the
  watermark are dropped, state is bounded (the 100 TB-stream
  requirement — unbounded state is the streaming OOM);
- file source here (deterministic tests; TESTDATA replays parquet),
  Kafka source behind the same schema at
  :func:`stream_events_from_kafka` — swapping sources changes one
  line, not the query;
- model scoring via ``foreachBatch`` reusing the *batch* feature
  transform + MLlib model unchanged (fit-once, score-forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Tumbling-window counts + value sum per event_type.

    Works on BOTH batch and streaming DataFrames (watermark is a no-op
    in batch). The integer-scaled value sum keeps results identical to
    the batch oracle twin. State per window×type is O(1); the
    watermark bounds how many windows stay open.
    """
    src = events
    if watermark is not None and events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.round(
                    F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0), 2
                )
            ).alias("total_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stream_events_from_dir(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream: each new parquet file in ``path`` becomes a
    micro-batch — the deterministic test transport."""
    return spark.readStream.schema(EVENT_SCHEMA).parquet(path)


def stream_events_from_kafka(
    spark: SparkSession, bootstrap: str, topic: str
) -> DataFrame:  # pragma: no cover - no Kafka broker in the test image
    """Kafka source (realizing the reference's latent S3 connector).

    Requires the spark-sql-kafka package on the classpath; value is
    JSON-decoded into EVENT_SCHEMA. Not exercised in tests (no broker
    in the image) — the file source above drives the same query.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), EVENT_SCHEMA).alias("e")
    ).select("e.*")


def score_stream(
    stream: DataFrame,
    transform_fn,
    sink_fn,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Score a stream with a *batch-fitted* pipeline via foreachBatch.

    ``transform_fn(batch_df) -> DataFrame`` is the same function used
    on the batch side (fitted FeaturePipelineModel.transform + MLlib
    model.transform); ``sink_fn(df, epoch_id)`` receives the scored
    micro-batch (exactly-once if the sink is idempotent on epoch_id).
    """

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        sink_fn(transform_fn(batch_df), epoch_id)

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
