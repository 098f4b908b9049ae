"""Format-interop queries: write a fixture slice through another
columnar/row format, read it back, and aggregate — proving the IO
path end to end with a full oracle (the oracle aggregates the ORIGIN
parquet, so any loss, reorder, or type drift in the roundtrip breaks
the hash match).

These extend io/sources.py's ingest surface (parquet, CSV incl. the
UNSW 49-col shape, JSON-in-VARCHAR) with the write side: Spark ships
ORC/JSON writers natively, and at 100 TB "can we hand this dataset to
engine X" is a first-class operator, not an afterthought.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.registry import register, sql_money_sum


def _stable_dir(spark: SparkSession, base: str, content_key: str) -> str:
    """Content-keyed directory under the warehouse (stable across
    processes, overwritten in place per call — one dir per logical
    input, no accumulation and no exit-time rmtree racing concurrent
    readers; ADVICE r4) — the stable_bucketed_table contract for
    plain-path writes."""
    h = hashlib.md5(content_key.encode()).hexdigest()[:8]
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(wh.removeprefix("file:"), f"{base}_{h}")
    return loc


_ORC_ORACLE = f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       {sql_money_sum('value')} AS total_value
FROM events
GROUP BY event_type
"""


@register(
    "io_orc_roundtrip",
    _ORC_ORACLE,
    doc="ORC write -> read -> aggregate; oracle aggregates the origin parquet",
)
def io_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossless-interop proof for the ORC path: project the event log
    (ids, type, integer-exact value), write it as ORC into a
    content-keyed warehouse directory, read it BACK through Spark's
    vectorized ORC reader, and aggregate. The oracle computes the
    same aggregate from the ORIGIN parquet — so the hash match proves
    write+read preserved every row and every double bit-for-bit. ORC
    is the format handoff to Hive/Trino estates; columnar pushdown on
    the read side works exactly as with parquet (PushedFilters shows
    in the plan). Executes the write at construction (documented in
    tools/plan_audit.py). The ts column is excluded: ORC has no
    TIMESTAMP(NANOS) physical type, which is a REAL interop boundary
    worth surfacing, not papering over."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    loc = _stable_dir(spark, "orc_events", sf_dir)
    e.write.mode("overwrite").orc(loc)
    back = spark.read.orc(loc)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.round(
            F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0), 2
        ).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# hive-partitioned layout + partition pruning
# ---------------------------------------------------------------------------

_PRUNE_ORACLE = f"""
SELECT event_type,
       CAST(user_id % 10 AS BIGINT) AS user_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_money_sum('value')} AS total_value
FROM events
WHERE event_type IN ('error', 'purchase')
GROUP BY 1, 2
"""


@register(
    "io_partitioned_prune",
    _PRUNE_ORACLE,
    doc="hive-partitioned write + partition-pruned read; oracle filters the origin",
)
def io_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The layout decision that matters most at 100 TB: write the
    event log hive-partitioned by event_type (the dominant filter
    column), then serve a two-type query from it. The read-back scan
    carries the filter as a PARTITION filter — directory-level
    pruning, zero bytes read from the other partitions — which
    `tests/test_sinks.py` asserts via PartitionFilters in the
    physical plan (a pushed DATA filter would still read every file's
    footer). The oracle runs the same filter+aggregate on the origin
    parquet, so the roundtrip also proves the partitioned layout lost
    nothing. Executes the write at construction (documented in
    tools/plan_audit.py _EXECUTING_NAMES)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    loc = _stable_dir(spark, "part_events", sf_dir)
    e.write.mode("overwrite").partitionBy("event_type").parquet(loc)
    back = spark.read.parquet(loc).filter(
        F.col("event_type").isin("error", "purchase")
    )
    return back.groupBy("event_type", (F.col("user_id") % 10).alias("user_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0), 2
        ).alias("total_value"),
    ).select(
        "event_type",
        F.col("user_bucket").cast("long"),
        "n",
        "total_value",
    )


# ---------------------------------------------------------------------------
# CSV write -> schema-pinned read -> aggregate
# ---------------------------------------------------------------------------

_CSV_ORACLE = f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(user_id) AS BIGINT) AS user_checksum,
       {sql_money_sum('value')} AS total_value
FROM events
GROUP BY event_type
"""


@register(
    "io_csv_roundtrip",
    _CSV_ORACLE,
    doc="CSV write -> explicit-schema read -> aggregate; oracle aggregates the origin",
)
def io_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The text-format handoff: write the event log as headered CSV
    (money pre-scaled to integer CENTS — the only lossless way to
    push currency through a text format; parsing doubles back from
    decimal strings is where silent drift creeps in), read it back
    with an EXPLICIT schema (inferSchema on 100 TB means reading the
    data twice and trusting a sample), and aggregate. The oracle
    aggregates the origin parquet with the identical integer-scaled
    money sum, so a hash match proves the text roundtrip dropped
    nothing — rows, keys, or cents. Executes the write at
    construction (tools/plan_audit.py _EXECUTING_NAMES)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    loc = _stable_dir(spark, "csv_events", sf_dir)
    e.write.mode("overwrite").option("header", True).csv(loc)
    back = spark.read.schema(
        "event_id long, user_id long, event_type string, cents long"
    ).option("header", True).csv(loc)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("user_id").cast("long").alias("user_checksum"),
        F.round(F.sum("cents") / F.lit(100.0), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# schema evolution: mergeSchema over generations of a dataset
# ---------------------------------------------------------------------------

_EVOLUTION_ORACLE = f"""
WITH unioned AS (
  SELECT event_id, user_id, event_type,
         CAST(NULL AS BIGINT) AS cents
  FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT event_id, user_id, event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_id % 2 = 1
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(cents) AS BIGINT) AS n_with_value,
       CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS cents_sum
FROM unioned GROUP BY event_type
"""


@register(
    "io_schema_evolution",
    _EVOLUTION_ORACLE,
    doc="mergeSchema read across two dataset generations (column added later)",
)
def io_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift, the fact of life every long-lived 100 TB dataset
    accumulates: generation 1 was written WITHOUT the cents column,
    generation 2 WITH it. The read side recovers a single unified
    relation via ``mergeSchema`` — Spark fills the missing column
    with NULLs for gen-1 files instead of failing or silently
    dropping it — and the aggregate proves exactly which rows carry
    values (n vs n_with_value) and that the sums survived. The
    oracle states the same union with an explicit NULL column over
    the origin. mergeSchema costs a footer read per file — enable it
    per-read like here, not globally. Executes the two generation
    writes at construction (tools/plan_audit.py _EXECUTING_NAMES)."""
    e = load_table(spark, sf_dir, "events")
    loc = _stable_dir(spark, "evolving_events", sf_dir)
    gen1 = e.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "user_id", "event_type"
    )
    gen2 = e.filter(F.col("event_id") % 2 == 1).select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    gen1.write.mode("overwrite").parquet(f"{loc}/gen=1")
    gen2.write.mode("overwrite").parquet(f"{loc}/gen=2")
    back = spark.read.option("mergeSchema", True).parquet(
        f"{loc}/gen=1", f"{loc}/gen=2"
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("cents").cast("long").alias("n_with_value"),
        F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("cents_sum"),
    )
