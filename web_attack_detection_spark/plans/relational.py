"""Relational core: scans, filters, joins, aggregates, windows, set ops.

The reference uses almost none of these directly (SURVEY.md §2.2 — its
only relational ops are union/select/rename), but the north-star
extension operators and the driver's oracle harness require a full
relational core. Every query here is a named, oracle-checked exemplar
of one operator family, written DataFrame-first so Catalyst plans it
(pushdown, pruning, broadcast selection, AQE).

Scale notes per query are in the docstrings; the common themes:
- filters + projections sit directly on the parquet scan (pushdown);
- small dimensions are explicitly broadcast — fact tables never
  shuffle for those joins;
- top-k never global-sorts: per-group window rank or orderBy+limit
  (Spark's TakeOrdered physical op = per-partition heap + driver merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table, union_by_name
from web_attack_detection_spark.plans.registry import (
    money_avg,
    money_sum,
    register,
    sql_money_avg,
    sql_money_sum,
)

# ---------------------------------------------------------------------------
# q1_pricing_summary — TPC-H Q1 shape: scan → filter → groupBy 8-agg
# ---------------------------------------------------------------------------

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_money_sum('l_quantity')} AS sum_qty,
  {sql_money_sum('l_extendedprice')} AS sum_base_price,
  {sql_money_sum('l_extendedprice * (1 - l_discount)', 10000, 4)} AS sum_disc_price,
  {sql_money_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 1000000, 6)} AS sum_charge,
  {sql_money_avg('l_quantity')} AS avg_qty,
  {sql_money_avg('l_extendedprice')} AS avg_price,
  {sql_money_avg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_ORACLE, doc="TPC-H Q1: filtered scan + wide groupBy agg")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single scan → partial agg (map-side combine) → 6-group final agg.

    At 100 TB this is the canonical map-heavy query: the filter and the
    2-column grouping push into the scan stage; the shuffle moves only
    |groups| × |partial-agg| rows. Verified in tests: PushedFilters on
    l_shipdate, ReadSchema limited to the 7 used columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(disc_price, 10000, 4).alias("sum_disc_price"),
            money_sum(charge, 1000000, 6).alias("sum_charge"),
            money_avg(F.col("l_quantity")).alias("avg_qty"),
            money_avg(F.col("l_extendedprice")).alias("avg_price"),
            money_avg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q3_top_orders — TPC-H Q3 shape: 3-way join → agg → top-k
# ---------------------------------------------------------------------------

_Q3_ORACLE = f"""
SELECT
  l_orderkey,
  {sql_money_sum('l_extendedprice * (1 - l_discount)', 10000, 4)} AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


@register("q3_top_orders", _Q3_ORACLE, doc="TPC-H Q3: selective 3-way join + agg + top-k")
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer (filtered, broadcast) ⋈ orders ⋈ lineitem → agg → top-10.

    The filtered customer side is ~1/5 of an already-small dim →
    explicit broadcast; orders⋈lineitem is the one real shuffle, on the
    join key both sides. LIMIT 10 after ORDER BY compiles to
    TakeOrderedAndProject — per-partition heaps, no global sort.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 10000, 4
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q5_region_revenue — TPC-H Q5 shape: 6-way star join
# ---------------------------------------------------------------------------

_Q5_ORACLE = f"""
SELECT
  n_name,
  {sql_money_sum('l_extendedprice * (1 - l_discount)', 10000, 4)} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


@register("q5_region_revenue", _Q5_ORACLE, doc="TPC-H Q5: 6-way star join, dims broadcast")
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: every dimension (region, nation, supplier, customer)
    broadcasts; the only shuffle is lineitem⋈orders. This is the plan
    shape that survives 100 TB — fact-table rows move once.
    """
    t = {n: load_table(spark, sf_dir, n) for n in ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    region = t["region"].filter(F.col("r_name") == "ASIA")
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 10000, 4
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# q6_forecast_revenue — TPC-H Q6 shape: pure range-filter aggregation
# ---------------------------------------------------------------------------

_Q6_ORACLE = f"""
SELECT {sql_money_sum('l_extendedprice * l_discount', 10000, 4)} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", _Q6_ORACLE, doc="TPC-H Q6: range filters + global agg")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four range predicates push to the parquet scan (row-group
    min/max skipping); the aggregation reduces to one partial-agg per
    partition + a single-row final merge — the cheapest possible plan
    shape at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum(F.col("l_extendedprice") * F.col("l_discount"), 10000, 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q10_returned_revenue — TPC-H Q10 shape: join + agg + top-20
# ---------------------------------------------------------------------------

_Q10_ORACLE = f"""
SELECT c_custkey, c_name, n_name,
       {sql_money_sum('l_extendedprice * (1 - l_discount)', 10000, 4)} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


@register("q10_returned_revenue", _Q10_ORACLE, doc="TPC-H Q10: returned-item revenue top-20")
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem filtered on the scan, one fact-fact shuffle with
    orders, customer+nation broadcast, TakeOrderedAndProject top-20
    (per-partition heaps — no global sort)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 10000, 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# rel_filter_project — pushdown exemplar (row-level output)
# ---------------------------------------------------------------------------

_FILTER_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) / 100.0 AS disc_price
FROM lineitem
WHERE l_quantity < 3
  AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
"""


@register("rel_filter_project", _FILTER_ORACLE, doc="filter+project pushed to parquet scan")
def rel_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both predicates and the 5-column projection reach the parquet
    reader (PushedFilters + pruned ReadSchema) — at 100 TB the scan
    skips row groups via min/max stats instead of reading them."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") < 3)
            & (F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            # cents pattern, not ROUND(x, 2): digit-rounding doubles at a
            # sub-ulp grid diverges between engines at half boundaries
            (
                F.round(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100)
                .cast("long")
                / F.lit(100.0)
            ).alias("disc_price"),
        )
    )


# ---------------------------------------------------------------------------
# rel_groupby_agg — plain aggregate exemplar
# ---------------------------------------------------------------------------

_GROUPBY_ORACLE = f"""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       {sql_money_sum('o_totalprice')} AS total,
       {sql_money_avg('o_totalprice')} AS avg_price,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderstatus
"""


@register("rel_groupby_agg", _GROUPBY_ORACLE, doc="groupBy with count/sum/avg/min/max")
def rel_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("total"),
            money_avg(F.col("o_totalprice")).alias("avg_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


# ---------------------------------------------------------------------------
# rel_distinct — distinct exemplar
# ---------------------------------------------------------------------------

_DISTINCT_ORACLE = "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"


@register("rel_distinct", _DISTINCT_ORACLE, doc="distinct = shuffle on all output cols")
def rel_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct compiles to a groupBy on the output columns — partial
    dedup map-side first, so the shuffle carries unique pairs only."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------------
# rel_union — R1 (unionByName) exemplar
# ---------------------------------------------------------------------------

_UNION_ORACLE = """
SELECT o_orderstatus, COUNT(*) AS n
FROM (
  SELECT * FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT * FROM orders WHERE o_orderkey % 2 = 1
)
GROUP BY o_orderstatus
"""


@register("rel_union", _UNION_ORACLE, doc="unionByName of key-split halves (R1)")
def rel_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference unions partition files positionally
    (``/root/reference/main.py:39,42``); we split by key and reunite
    with ``unionByName`` — schema-aligned, and Catalyst flattens the
    union into one multi-child node (CombineUnions)."""
    orders = load_table(spark, sf_dir, "orders")
    even = orders.filter(F.col("o_orderkey") % 2 == 0)
    odd = orders.filter(F.col("o_orderkey") % 2 == 1)
    return union_by_name(even, odd).groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# rel_topk_per_group — window function exemplar
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT p_brand, p_partkey, p_retailprice, rn
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (
           PARTITION BY p_brand
           ORDER BY p_retailprice DESC, p_partkey ASC
         ) AS rn
  FROM part
)
WHERE rn <= 3
"""


@register("rel_topk_per_group", _TOPK_ORACLE, doc="top-3 per group via window row_number")
def rel_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: ONE shuffle on the group key, per-partition
    sort. Never a global sort; never a driver collect. (Spark ≥3.5
    further rewrites rn<=k into WindowGroupLimit — per-partition heaps
    before the shuffle.)"""
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey").asc())
    return (
        load_table(spark, sf_dir, "part")
        .select("p_brand", "p_partkey", "p_retailprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# rel_anti_join / rel_semi_join — existence joins
# ---------------------------------------------------------------------------

_ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@register("rel_anti_join", _ANTI_ORACLE, doc="customers without orders (left_anti)")
def rel_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti = NOT EXISTS. The orders side is reduced to its join
    key before the join — Catalyst prunes columns, so the shuffle (or
    broadcast) carries keys only."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


_SEMI_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_customers_with_orders
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


@register("rel_semi_join", _SEMI_ORACLE, doc="customers with ≥1 order (left_semi)")
def rel_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_with_orders"))
    )


# ---------------------------------------------------------------------------
# rel_rollup — grouping-sets exemplar
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n,
       {sql_money_sum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("rel_rollup", _ROLLUP_ORACLE, doc="rollup (grouping sets) with subtotals")
def rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rollup computes all prefix grouping sets in ONE pass — Spark
    expands rows per grouping set before the shuffle; subtotal levels
    share the same exchange."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), money_sum(F.col("l_quantity")).alias("sum_qty"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# events_hourly — batch twin of the streaming tumbling window
# ---------------------------------------------------------------------------

_HOURLY_ORACLE = f"""
SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n,
       {sql_money_sum('value')} AS total_value
FROM events
GROUP BY 1, 2
"""


@register("events_hourly", _HOURLY_ORACLE, doc="tumbling 1h window agg (batch twin of streaming)")
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same groupBy(window(...)) expression the streaming path uses
    (streaming/windows.py) run in batch mode — one code path, two
    execution modes. Aligned 1h tumbling windows == date_trunc('hour')."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), money_sum(F.col("value")).alias("total_value"))
        .select(
            # string-typed window edge: timestamp OUTPUT columns would
            # render in the driver process's OS timezone on collect —
            # formatting in-engine (session tz pinned UTC) is tz-proof
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# rel_asof_lag — ordered-analytics exemplar (per-user previous event)
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
SELECT event_id, user_id,
       CAST((epoch_us(ts2) - epoch_us(prev_ts)) // 1000 AS BIGINT) AS gap_ms
FROM (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts2,
         LAG(CAST(ts AS TIMESTAMP)) OVER (
           PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
         ) AS prev_ts
  FROM events
)
WHERE prev_ts IS NOT NULL
"""


@register("rel_asof_lag", _ASOF_ORACLE, doc="per-user as-of/lag over event time")
def rel_asof_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self as-of: each event paired with the previous event of the
    same user — the window form of an as-of join (one shuffle on
    user_id, per-partition sort on ts). The two-table as-of join lives
    in operators/asof.py."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            (
                (
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.col("prev_ts").cast("timestamp"))
                )
                / F.lit(1000)
            )
            .cast("long")
            .alias("gap_ms"),
        )
    )
