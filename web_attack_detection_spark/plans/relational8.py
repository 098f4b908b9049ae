"""Eighth relational wave: multiset set operations and ordered
pagination.

``EXCEPT ALL`` / ``INTERSECT ALL`` keep multiplicities — a user who
viewed twice and purchased once still has one surviving view — which
relational2.py's distinct-set variants deliberately do not; both
semantics exist in ANSI SQL and an engine must offer both. Pagination
appears twice because only one form scales: OFFSET pagination must
compute and discard every earlier page (the TakeOrdered heap still
carries offset+limit rows through every partition), while keyset
pagination (WHERE (sort key) past the last-seen row) pushes the
predicate into the scan and reads one page regardless of depth — at
100 TB, page 10 000 via OFFSET is a cluster job, via keyset it's a
point lookup.

The reference (huunhan1804/web-attack-detection) has no sorts, limits,
or set operations anywhere (SURVEY.md §2.2 'explicitly absent');
engine-completeness queries, same rationale as relational5.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.registry import register

# ---------------------------------------------------------------------------
# multiset set operations
# ---------------------------------------------------------------------------

_EXCEPT_ALL_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'view'
EXCEPT ALL
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


@register(
    "rel_except_all",
    _EXCEPT_ALL_ORACLE,
    doc="EXCEPT ALL (multiset difference, multiplicities preserved)",
)
def rel_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset subtraction: each purchase cancels ONE view of the same
    user, surplus views survive with their multiplicity. Plans as a
    count-per-key aggregate on each side + a generate of
    max(cnt_l - cnt_r, 0) copies — the shuffle carries (key, count)
    pairs, never the raw multiset, so it scales like a groupBy even
    when duplicates are huge."""
    ev = load_table(spark, sf_dir, "events")
    viewed = ev.filter(F.col("event_type") == "view").select("user_id")
    bought = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return viewed.exceptAll(bought)


_INTERSECT_ALL_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'error'
INTERSECT ALL
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


@register(
    "rel_intersect_all",
    _INTERSECT_ALL_ORACLE,
    doc="INTERSECT ALL (multiset intersection, min multiplicity)",
)
def rel_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user survives min(#errors, #purchases) times — the multiset
    intersection. Same (key, count)-pair shuffle shape as EXCEPT ALL."""
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("user_id")
    pur = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return err.intersectAll(pur)


# ---------------------------------------------------------------------------
# ordered pagination: OFFSET (the trap) and keyset (the scale path)
# ---------------------------------------------------------------------------

_OFFSET_PAGE_ORACLE = """
SELECT o_orderkey, o_custkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) / 100.0 AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20 OFFSET 40
"""


@register(
    "rel_offset_page",
    _OFFSET_PAGE_ORACLE,
    doc="ORDER BY + LIMIT/OFFSET page 3 (total order via unique tiebreak)",
)
def rel_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 3 of the orders ranked by price. The sort key ends in the
    unique o_orderkey, so the order is total and the page is
    deterministic — LIMIT/OFFSET over a non-total order is a different
    page every run. Spark executes this as a global TakeOrdered of
    offset+limit rows (heap per partition, merged on the driver) — no
    full sort, but the heap grows with page DEPTH, which is why deep
    pagination belongs to rel_keyset_page."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select(
            "o_orderkey",
            "o_custkey",
            (F.round(F.col("o_totalprice") * 100).cast("long") / 100.0).alias(
                "totalprice"
            ),
        )
        .offset(40)
        .limit(20)
    )


# keyset anchor: the last row of rel_offset_page's page (page 3, row 60)
# is re-derived inside the query on both sides, so the oracle stays
# self-contained and scale-factor independent.
_KEYSET_PAGE_ORACLE = """
WITH anchor AS (
  SELECT o_totalprice AS ap, o_orderkey AS ak
  FROM orders
  ORDER BY o_totalprice DESC, o_orderkey ASC
  LIMIT 1 OFFSET 59
)
SELECT o_orderkey, o_custkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) / 100.0 AS totalprice
FROM orders, anchor
WHERE o_totalprice < ap OR (o_totalprice = ap AND o_orderkey > ak)
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""


@register(
    "rel_keyset_page",
    _KEYSET_PAGE_ORACLE,
    doc="keyset pagination: WHERE past last-seen row + LIMIT, no OFFSET",
)
def rel_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The page AFTER the last-seen row (anchor), fetched without
    OFFSET: the row-comparison predicate ``(price, key) < anchor``
    filters at the scan (min/max row-group skipping applies on the
    price column), then a plain top-20 heap. Page depth no longer
    appears in the plan — the 100 TB pagination pattern. The anchor is
    computed here for self-containment; a real cursor client passes it
    back in."""
    orders = load_table(spark, sf_dir, "orders")
    anchor = (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select(F.col("o_totalprice").alias("ap"), F.col("o_orderkey").alias("ak"))
        .offset(59)
        .limit(1)
    )
    past = (F.col("o_totalprice") < F.col("ap")) | (
        (F.col("o_totalprice") == F.col("ap")) & (F.col("o_orderkey") > F.col("ak"))
    )
    return (
        orders.join(F.broadcast(anchor), past)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select(
            "o_orderkey",
            "o_custkey",
            (F.round(F.col("o_totalprice") * 100).cast("long") / 100.0).alias(
                "totalprice"
            ),
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# time-series gap fill by LINEAR INTERPOLATION (the companion to
# relational3's LOCF: estimates missing hours from BOTH neighbors)
# ---------------------------------------------------------------------------

_LERP_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sum_val_c
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type,
         min(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS mn,
         max(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS mx
  FROM events GROUP BY 1
), spine AS (
  SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM bounds
), ctx AS (
  SELECT s.event_type, s.h, hourly.sum_val_c AS own,
         last_value(hourly.sum_val_c IGNORE NULLS) OVER wb AS prev_c,
         last_value(CASE WHEN hourly.sum_val_c IS NOT NULL THEN epoch_us(s.h) END IGNORE NULLS) OVER wb AS prev_e,
         first_value(hourly.sum_val_c IGNORE NULLS) OVER wf AS next_c,
         first_value(CASE WHEN hourly.sum_val_c IS NOT NULL THEN epoch_us(s.h) END IGNORE NULLS) OVER wf AS next_e
  FROM spine s LEFT JOIN hourly ON s.event_type = hourly.event_type AND s.h = hourly.h
  WINDOW wb AS (PARTITION BY s.event_type ORDER BY s.h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY s.event_type ORDER BY s.h
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type,
       strftime(CAST(h AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS hour,
       ROUND(CAST(ROUND(CASE
         WHEN own IS NOT NULL THEN CAST(own AS DOUBLE)
         WHEN prev_c IS NULL THEN CAST(next_c AS DOUBLE)
         WHEN next_c IS NULL THEN CAST(prev_c AS DOUBLE)
         ELSE prev_c + (next_c - prev_c)
              * ((epoch_us(h) - prev_e) / CAST(next_e - prev_e AS DOUBLE))
       END) AS BIGINT) / 100.0, 2) AS filled,
       CAST(CASE WHEN own IS NULL THEN 1 ELSE 0 END AS INT) AS was_gap
FROM ctx
"""


@register(
    "rel_gap_fill_lerp",
    _LERP_ORACLE,
    doc="hourly spine + linear interpolation between neighboring observations",
)
def rel_gap_fill_lerp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing hours get the straight line between their nearest
    observed neighbors (boundary gaps fall back to the single
    neighbor) — LOCF's step function is wrong for rates and gauges.
    Two IGNORE-NULLS windows (backward last, forward first) over the
    spine join find both anchors in one sort each; interpolation is
    exact-integer cents lerped with one double division, so both
    engines agree bit-for-bit. Same single-shuffle shape as LOCF: the
    spine join and both windows share the event_type partitioning."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_val_c"))
    bounds = ev.groupBy("event_type").agg(
        F.min(F.date_trunc("hour", F.col("ts"))).alias("mn"),
        F.max(F.date_trunc("hour", F.col("ts"))).alias("mx"),
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    joined = spine.join(hourly, ["event_type", "h"], "left").select(
        "event_type", "h", F.col("sum_val_c").alias("own")
    )
    wb = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    e = F.unix_micros(F.col("h"))
    known_e = F.when(F.col("own").isNotNull(), e)
    ctx = joined.select(
        "event_type",
        "h",
        "own",
        F.last("own", ignorenulls=True).over(wb).alias("prev_c"),
        F.last(known_e, ignorenulls=True).over(wb).alias("prev_e"),
        F.first("own", ignorenulls=True).over(wf).alias("next_c"),
        F.first(known_e, ignorenulls=True).over(wf).alias("next_e"),
    )
    filled = (
        F.when(F.col("own").isNotNull(), F.col("own").cast("double"))
        .when(F.col("prev_c").isNull(), F.col("next_c").cast("double"))
        .when(F.col("next_c").isNull(), F.col("prev_c").cast("double"))
        .otherwise(
            F.col("prev_c")
            + (F.col("next_c") - F.col("prev_c"))
            * ((e - F.col("prev_e")) / (F.col("next_e") - F.col("prev_e")).cast("double"))
        )
    )
    # round the lerped CENTS to an integer first: fractional-decimal
    # rounding of a lerp result hits HALF_UP-vs-float-repr divergence
    # between engines (10.63375 → .6337/.6338); integer rounding of a
    # ~1e3-magnitude double is ulp-safe, and the final /100 + round(2)
    # is the registry's proven money discipline.
    return ctx.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.round(F.round(filled).cast("long") / 100.0, 2).alias("filled"),
        F.when(F.col("own").isNull(), 1).otherwise(0).cast("int").alias("was_gap"),
    )


# ---------------------------------------------------------------------------
# date arithmetic battery 2: calendar functions beyond part extraction
# ---------------------------------------------------------------------------

_DATE2_ORACLE = """
SELECT o_orderkey,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus_2_months,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
FROM orders
WHERE o_orderkey < 500
"""


@register(
    "rel_date_funcs2",
    _DATE2_ORACLE,
    doc="calendar arithmetic: last_day/add_months/dayofyear/ISO week/trunc",
)
def rel_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic the partition-maintenance jobs live on
    (month-end snapshots, rolling +N-month retention cutoffs, ISO-week
    rollups). All codegen'd JVM intrinsics over the pruned scan; the
    month arithmetic is calendar-aware on both engines (Jan 31 + 1
    month = Feb 28/29), which no epoch-seconds arithmetic reproduces."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months("o_orderdate", 2), "yyyy-MM-dd").alias(
            "plus_2_months"
        ),
        F.dayofyear("o_orderdate").alias("doy"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "month_start"
        ),
    )


# ---------------------------------------------------------------------------
# value-range window frame (RANGE BETWEEN n PRECEDING/FOLLOWING over a
# NUMERIC sort key — not rows, not time)
# ---------------------------------------------------------------------------

_VALUE_RANGE_ORACLE = """
SELECT o_orderkey,
       o_orderstatus,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) / 100.0 AS totalprice,
       COUNT(*) OVER w AS n_near,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS near_total_c
FROM orders
WHERE o_orderkey < 2000
WINDOW w AS (PARTITION BY o_orderstatus
             ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT)
             RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
"""


@register(
    "rel_value_range_window",
    _VALUE_RANGE_ORACLE,
    doc="value-range window frame: ±100 around each price, per status",
)
def rel_value_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frame is defined by the SORT KEY'S VALUE (orders within
    ±100 currency units), not row offsets or time — peer-density
    analytics (how many competitors price near me). One shuffle on the
    partition key, ordered scan with a sliding value-bounded frame;
    the frame content is value-determined, so ties cause no
    nondeterminism. rel_moving_avg (rows) and rel_time_range_window
    (time) cover the other two frame types. The frame sorts on exact
    integer CENTS (±10000) — PySpark range boundaries are integral,
    and the integer key dodges float-equality edges at the frame
    borders in both engines."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy(cents)
        .rangeBetween(-10000, 10000)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        (cents / 100.0).alias("totalprice"),
        F.count(F.lit(1)).over(w).alias("n_near"),
        F.sum(cents).over(w).alias("near_total_c"),
    )


# ---------------------------------------------------------------------------
# skew-salted join, oracle-checked result-identical to the plain join
# ---------------------------------------------------------------------------

_SALTED_JOIN_ORACLE = """
SELECT p_brand,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 10
GROUP BY p_brand
"""


@register(
    "rel_skew_salted_join",
    _SALTED_JOIN_ORACLE,
    doc="salted fact-dim join: result-identical to the plain join",
)
def rel_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew weapon in the driver-checked registry: the fact side
    gets a deterministic per-row salt, the dimension is replicated
    ×n_salt, and the join key becomes (key, salt) — a hot part key
    fans out over 8 shuffle partitions instead of melting one task.
    The oracle is the PLAIN SQL join: salting must be invisible in the
    result (operators/skew.py guarantees row-identity; this query pins
    it at the value-hash level, under aggregation)."""
    from web_attack_detection_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 10)
        .select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    )
    joined = salted_join(li, part, "l_partkey", n_salt=8)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                "long"
            )
        ).alias("revenue_c"),
    )
