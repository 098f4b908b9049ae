"""Sources: parquet fixture tables, CSV (the reference's only source).

Reference parity: the reference reads 4 headered CSVs with
``inferSchema=True`` (``/root/reference/main.py:34-41``) and unions
three of them into a train split. Here:

- ``load_table`` is the parquet path used by every query (columnar
  scan, predicate pushdown, column pruning — all free from Catalyst).
- ``read_csv`` keeps CSV support, but with *explicit schema preferred*;
  ``inferSchema`` costs one extra full read per file, which at 100 TB
  is an extra 100 TB of I/O. Inference stays available behind a flag
  for reference-compatible behavior.
- ``load_split`` reproduces the multi-file-ingest semantics (S2 in
  SURVEY.md §2.1) as a single globbed read — one scan node instead of
  N scans + unions, so Spark schedules one stage over all files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one fixture table (TESTDATA.md).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark reads only as
    a raw long (``spark.sql.legacy.parquet.nanosAsLong``, set in
    session.py). We convert ns→µs and expose a true ``timestamp`` so
    Spark and the DuckDB oracle (``CAST(ts AS TIMESTAMP)`` truncates to
    µs identically) agree on the column.

    Fixtures written as tz-less ``timestamp[us]`` come back as
    TIMESTAMP_NTZ on sessions without ``inferTimestampNTZ=false``
    (our session.py sets it; the driver's harness session may not).
    The session timezone is UTC everywhere, so casting NTZ→timestamp
    preserves the instant and matches DuckDB's naive-timestamp read.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division: ts is ~1.7e18 ns — double division would lose
        # sub-µs precision (doubles carry 53 bits ≈ 9e15)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        # The NTZ→TIMESTAMP cast reinterprets the naive value in the
        # SESSION timezone; only UTC preserves the instant the DuckDB
        # naive-timestamp oracle sees (ADVICE r1). Foreign sessions (the
        # driver's) may not set it, so force it here — this conf is
        # runtime-settable and idempotent.
        if spark.conf.get("spark.sql.session.timeZone") != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def parallelize_scan(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin repartition a scan whose parallelism is below the
    core count — guide §2.5's unsplittable-input remedy.

    The fixture parquet files are single row groups, so however low
    ``maxPartitionBytes``/``openCostInBytes`` go, the scan is ONE task
    and every map-side operator downstream runs on one core (measured
    r10: embeddings/documents/events all scan as 1 partition at sf0.1).
    Call this ONLY in front of heavy per-row compute (numpy forwards
    ≈ ms/row) where the shuffle of the input is orders of magnitude
    cheaper than the single-threaded compute it unlocks.  On splittable
    production inputs the partition count exceeds the core count and
    this is a no-op.  Round-robin repartition is deterministic under
    retries (sort-before-repartition, SPARK-23207) and every caller's
    output is partitioning-invariant (per-row maps + exact-integer
    aggregation), which the oracle sweep re-proves."""
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views so plans can use spark.sql."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    infer_schema: bool = False,
) -> DataFrame:
    """CSV source (S1, ``/root/reference/main.py:34``).

    Explicit ``schema`` is the scale path (single pass over the data).
    ``infer_schema=True`` mirrors the reference's behavior at the cost
    of an extra sampling pass.
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def load_split(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Multi-file ingest (S2, ``/root/reference/main.py:28-44``).

    The reference unions per-file DataFrames positionally
    (``train_df.union(additional_data)``, main.py:39,42), which silently
    miscombines if column order drifts. We read all files in ONE scan
    (identical schema assumed, as in the reference) so the physical plan
    is a single FileScan over every split — no union nodes at all.
    """
    return spark.read.parquet(*paths)


def union_by_name(*dfs: DataFrame) -> DataFrame:
    """Schema-aligned union (R1). Positional ``union`` is a footgun at
    scale — ``unionByName`` matches columns by name instead."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out
