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


def sessionized_event_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-user session windows: a session closes after ``gap`` of
    inactivity (the streaming twin of plans/relational2.rel_sessionize).

    ``session_window`` keeps one merging window per (user, open
    session) — state is bounded by the number of *open* sessions, and
    the watermark finalizes/evicts sessions whose close time has
    passed. Works on batch DataFrames too (watermark skipped).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
        )
    )


def running_user_totals(
    events: DataFrame, timeout_minutes: int | None = None
) -> DataFrame:
    """Custom stateful operator: per-user RUNNING event count + value
    sum across micro-batches via ``applyInPandasWithState``.

    This is the shape built-in windowed aggs can't express: state that
    never closes (a lifetime per-user counter), emitted once per
    micro-batch per active user. State per user is two numbers —
    O(|users|) total. Pass ``timeout_minutes`` to evict keys after that
    much processing-time inactivity (the unbounded-state guard for
    high-cardinality key spaces); note that arming a processing-time
    timeout makes Spark schedule continuous no-data batches to fire
    evictions, so ``processAllAvailable`` no longer returns — use it
    with a real trigger interval, not in replay-to-completion tests.
    Arrow-batched: each call receives ALL rows for one user in the
    micro-batch as pandas DataFrames.
    """
    import numpy as np  # local import: executors deserialize the closure
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    # state keeps CENTS as an exact long — no float rounding in state, so
    # batch order / batch count can never shift the total, and the single
    # /100.0 at emission matches the oracle's SUM(cents)/100.0 exactly
    state_schema = "n long, total_c long"
    evict_ms = None if timeout_minutes is None else timeout_minutes * 60 * 1000

    def update(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n, total_c = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            # half-away-from-zero per value, matching DuckDB ROUND /
            # Spark F.round (pandas .round() is half-to-even — ADVICE r1)
            v = pdf["value"].to_numpy(dtype="float64") * 100.0
            cents = np.sign(v) * np.floor(np.abs(v) + 0.5)
            total_c += int(cents.astype("int64").sum())
        state.update((n, total_c))
        if evict_ms is not None:
            state.setTimeoutDuration(evict_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total_c / 100.0]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if evict_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def view_purchase_stream_join(
    views: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
    with_ts: bool = False,
) -> DataFrame:
    """Stream-stream join: each view matched to the same user's
    purchases within ``within`` AFTER the view (attribution join).

    Both sides are watermarked and the join condition bounds event time
    on both sides — that's what lets Spark EVICT buffered state: a view
    older than watermark+within can never match a future purchase and
    is dropped. An unbounded stream-stream join (no time bound) buffers
    forever — the canonical streaming OOM. Works identically on batch
    DataFrames (watermarks no-op) for oracle/back-test parity.

    ``how="left_outer"`` additionally emits unmatched views with a null
    purchase_id — but only once the watermark passes ``v_ts + within``
    (the row is provably unmatchable from then on), so views near the
    END of a bounded replay never emit their null row: the caller must
    restrict to rows older than the final watermark minus ``within``
    (plans/streamq.stream_join_left_outer does). ``with_ts`` keeps the
    view timestamp in the output for exactly that cutoff filter.
    """
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    if views.isStreaming:
        v = v.withWatermark("v_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    out = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {within}")),
        how,
    ).select(
        "view_id",
        "purchase_id",
        F.col("v_user").alias("user_id"),
        *(["v_ts"] if with_ts else []),
    )
    return out


def deduped_event_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once per event_id under at-least-once delivery: every
    row is duplicated in-flight (explode ×2 — same micro-batch, the
    deterministic stand-in for a redelivering transport), then
    ``dropDuplicatesWithinWatermark`` keeps one copy per key. Unlike
    plain ``dropDuplicates``, the within-watermark variant EVICTS key
    state once the watermark passes — bounded state, the only dedup
    that survives an unbounded 100 TB stream. Batch DataFrames take
    the plain ``dropDuplicates`` path, so stream == batch is testable.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    doubled = src.withColumn(
        "__copy", F.explode(F.array(F.lit(1), F.lit(2)))
    ).drop("__copy")
    deduped = (
        doubled.dropDuplicatesWithinWatermark(["event_id"])
        if events.isStreaming
        else doubled.dropDuplicates(["event_id"])
    )
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0), 2
        ).alias("total_value"),
    )


def stream_events_from_dir(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream: each new parquet file in ``path`` becomes a
    micro-batch — the deterministic test transport.
    ``max_files_per_trigger`` rate-limits the replay into multiple
    micro-batches (exact iff the input files are time-ranged — see
    plans/streamq._replay_input)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


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


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """:func:`running_user_totals` re-expressed on Spark 4's
    ``transformWithStateInPandas`` — the arbitrary-state API that
    replaces ``applyInPandasWithState``: state lives behind a typed
    handle (ValueState/ListState/MapState + timers) instead of one
    GroupState tuple, so an operator can hold several independent state
    variables and register per-key timers. Semantics here are kept
    identical to the classic operator (exact integer-cent state, one
    cumulative emission per key per micro-batch) so the SAME batch-SQL
    oracle checks both — two generations of the stateful API, one
    verified contract.

    ENVIRONMENT BOUNDARY: transformWithState's Python↔JVM state
    protocol needs ``google.protobuf``, which this image lacks (same
    class as the Keras/matplotlib gaps — no installs available), so the
    operator is NOT in the driver registry; tests/test_streaming.py
    runs it when protobuf is importable and skips otherwise. The
    operator itself is complete — on a standard Spark 4 install it
    replays to the same totals as :func:`running_user_totals`.
    """
    import numpy as np  # local imports: executors deserialize the closure
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = "user_id long, n_events long, total_value double"

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, total_c long")

        def handleInputRows(self, key, rows, timerValues):
            n, total_c = self._totals.get() if self._totals.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                # half-away-from-zero cents, same discipline as the
                # classic operator and the DuckDB oracle's ROUND
                v = pdf["value"].to_numpy(dtype="float64") * 100.0
                cents = np.sign(v) * np.floor(np.abs(v) + 0.5)
                total_c += int(cents.astype("int64").sum())
            self._totals.update((n, total_c))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total_c / 100.0],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
