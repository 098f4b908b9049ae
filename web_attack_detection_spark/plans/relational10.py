"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping.

At 100 TB, scan cost is dominated by how much data a predicate lets
you SKIP. Sorting by one column gives perfect min/max pruning on that
column and none on any other; interleaving the bits of two columns
(the Z-order / Morton curve) gives useful pruning on BOTH — each
Z-range bucket covers a small rectangle of (x, y) space, so its
per-bucket min/max column stats are tight. This is the layout trick
behind Delta/Iceberg OPTIMIZE ZORDER, expressed here as a plain
integer computation + range bucketing, which is all it is.

The bit interleave is pure integer div/mod arithmetic — bit-exact on
any engine — so the whole layout assignment is oracle-checkable, and
the query also emits the per-bucket min/max rectangles that a file
skipper would prune with, plus the pruning payoff for one concrete
predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.registry import register

_BITS = 10  # 10-bit x, y -> 20-bit z-value
_BUCKETS = 64


def _interleave(x: str, y: str, div: str) -> str:
    """Morton-interleave expression: bit i of x -> bit 2i of z, bit i
    of y -> bit 2i+1. ``div`` is the integer-division token ('//' for
    DuckDB, 'div' for Spark SQL); everything else is engine-portable
    arithmetic."""
    terms = []
    for i in range(_BITS):
        terms.append(f"(({x} {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


_Z_RANGE = 1 << (2 * _BITS)
_BUCKET_WIDTH = _Z_RANGE // _BUCKETS

# the concrete predicate whose pruning payoff the query reports:
# x in [100, 150) — a 5%-of-keyspace range filter
_PRED_LO, _PRED_HI = 100, 150


def _oracle() -> str:
    z = _interleave("x", "y", "//")
    return f"""
WITH keyed AS (
  SELECT CAST(l_partkey % {1 << _BITS} AS BIGINT) AS x,
         CAST(l_suppkey % {1 << _BITS} AS BIGINT) AS y
  FROM lineitem
),
zed AS (
  SELECT x, y, CAST({z} AS BIGINT) AS z FROM keyed
),
bucketed AS (
  SELECT x, y, z, z // {_BUCKET_WIDTH} AS bucket FROM zed
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(x) AS min_x, MAX(x) AS max_x,
       MIN(y) AS min_y, MAX(y) AS max_y,
       (MIN(x) <= {_PRED_HI - 1} AND MAX(x) >= {_PRED_LO}) AS pred_must_scan
FROM bucketed
GROUP BY bucket
"""


@register(
    "rel_zorder_layout",
    _oracle(),
    doc="Z-order (Morton) layout: interleaved-bit bucketing + min/max skip stats",
)
def rel_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every row a Morton z-value over (partkey, suppkey) and
    range-bucket it into {_BUCKETS} layout buckets — the write path of
    a ZORDER table rewrite (`df.repartitionByRange(_BUCKETS, z)` then
    a partitioned write; here the buckets are reported, not written).

    Each bucket's (min_x, max_x, min_y, max_y) rectangle is what
    footer-level skipping would prune with: ``pred_must_scan`` shows
    how many of the {_BUCKETS} buckets a 5% range predicate on x
    actually touches — with Z-order it is a small fraction; under a
    y-sorted layout it would be ALL of them. The interleave itself is
    20 div/mod terms, whole-stage-codegen'd, zero shuffle; the only
    shuffle is the final bucket aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(
        (F.col("l_partkey") % (1 << _BITS)).cast("long").alias("x"),
        (F.col("l_suppkey") % (1 << _BITS)).cast("long").alias("y"),
    )
    zed = keyed.withColumn("z", F.expr(_interleave("x", "y", "div")).cast("long"))
    bucketed = zed.withColumn("bucket", F.expr(f"z div {_BUCKET_WIDTH}"))
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        (
            (F.min("x") <= F.lit(_PRED_HI - 1)) & (F.max("x") >= F.lit(_PRED_LO))
        ).alias("pred_must_scan"),
    )
