"""SparkSession builders tuned for this engine.

The reference creates its session at ``/root/reference/main.py:17-26``
(4g executor/driver memory, a Kafka connector jar, nothing else). Our
builder instead encodes the scale-first defaults that matter on a real
cluster — AQE (runtime re-planning, skew-join splitting, partition
coalescing), Arrow for every Python boundary, UTC session time so
results are oracle-comparable — while staying correct on ``local[N]``.

On a 1000-executor / 100 TB cluster the same builder applies; only
``master`` / memory / ``spark.sql.shuffle.partitions`` change (set
shuffle partitions so a shuffle partition is ~128-200 MB of data:
100 TB shuffle → O(500k) partitions, which AQE coalesces per-stage).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Number of local threads == shuffle partitions for local runs: every
# shuffle fans out exactly to the core count, no tiny-partition overhead.
_LOCAL_CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))


def build_session(
    app_name: str = "web_attack_detection_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with scale-aware defaults.

    Every config below is a deliberate 100 TB-scale choice:

    - AQE on: runtime shuffle-partition coalescing, skew-join
      splitting, and dynamic broadcast conversion — the knobs that keep
      big joins alive when the planner's size estimates are wrong.
    - Arrow on: the only acceptable JVM<->Python transport; row-wise
      pickling is 10-100x slower for Pandas-UDF operators.
    - UTC session timezone: deterministic timestamp semantics across
      engines (matches DuckDB's naive-UTC storage for the oracle).
    - parquet filter pushdown + vectorized reader stay at their
      (enabled) defaults; we assert on them in tests via ``explain``.
    """
    cpus = _LOCAL_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else cpus),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        # local mode: one JVM; driver memory is the only knob.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # the events fixture stores TIMESTAMP(NANOS) parquet, which Spark
        # refuses by default; read ns as long, converted in io.sources.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # tz-less parquet timestamp[us] should scan as TIMESTAMP (UTC
        # session), not TIMESTAMP_NTZ — keeps ts predicates pushable and
        # every time function (unix_micros, from_utc_timestamp) typed.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Spark 4.x writes + fsyncs a checksum sidecar per checkpoint
        # file (ChecksumCheckpointFileManager); on a local/posix
        # checkpoint dir that integrity layer costs ~30% of stateful-
        # streaming micro-batch latency for zero benefit — single-disk
        # durability is already the filesystem's problem. Re-enable on
        # object-store checkpoints where partial writes are real.
        .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
