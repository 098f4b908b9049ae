"""Extended relational coverage: JSON extraction, pivot, set ops,
correlated subqueries (SQL API), sessionization, scalar function
library, exact percentiles, approximate aggregates.

These round out the relational surface a user of the reference (or of
the north-star pipeline) needs; each is the idiomatic Catalyst form,
with the scale rationale in the docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table, register_views
from web_attack_detection_spark.operators.asof import asof_join, range_join_binned
from web_attack_detection_spark.plans.registry import (
    money_sum,
    register,
    sql_money_sum,
)

# ---------------------------------------------------------------------------
# JSON extraction from the events.props column
# ---------------------------------------------------------------------------

_JSON_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


@register("rel_json_extract", _JSON_ORACLE, doc="JSON path extraction + aggregation")
def rel_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``get_json_object`` is JVM-side (Jackson) — JSON parsing stays
    in codegen, no Python. At scale, parse ONCE into a struct column
    (``from_json``) and reuse, rather than re-extracting per path."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# from_json: parse ONCE into a struct, reuse fields (the scale pattern
# rel_json_extract's docstring prescribes)
# ---------------------------------------------------------------------------

_JSON_STRUCT_ORACLE = """
WITH parsed AS (
  SELECT user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT k % 10 AS k_bucket,
       COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM parsed
GROUP BY k % 10
"""


@register("rel_json_struct", _JSON_STRUCT_ORACLE, doc="from_json parse-once into struct, field reuse")
def rel_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_json`` with a declared schema parses the document ONCE
    into a struct; every field access afterwards (grouping key, sum)
    is a struct getter — vs ``get_json_object`` re-parsing the raw
    string per path. At 100 TB with several extracted expressions
    that's a multiple of the scan CPU."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("k", T.LongType())])
    ev = load_table(spark, sf_dir, "events").withColumn(
        "p", F.from_json("props", schema)
    )
    return ev.groupBy((F.col("p.k") % 10).alias("k_bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p.k").alias("sum_k"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# pivot
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = f"""
SELECT l_returnflag,
       COUNT(*) FILTER (WHERE l_linestatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n_filled,
       {sql_money_sum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_open,
       {sql_money_sum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_filled
FROM lineitem
GROUP BY l_returnflag
"""


@register("rel_pivot", _PIVOT_ORACLE, doc="pivot = conditional aggregation")
def rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an EXPLICIT value list — without it Spark runs an
    extra distinct-values job before planning (a full scan at 100 TB).
    Compiled to conditional aggregates, same as the SQL FILTER form."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.when(F.col("l_linestatus") == "O", 1)).alias("n_open"),
            F.count(F.when(F.col("l_linestatus") == "F", 1)).alias("n_filled"),
            money_sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity"))).alias(
                "qty_open"
            ),
            money_sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))).alias(
                "qty_filled"
            ),
        )
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------

_INTERSECT_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'error'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


@register("rel_intersect", _INTERSECT_ORACLE, doc="INTERSECT (distinct set semantics)")
def rel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT plans as a left-semi join over distincts — both sides
    reduce to their key sets before the shuffle."""
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("user_id")
    pur = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return err.intersect(pur)


_EXCEPT_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'view'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


@register("rel_except", _EXCEPT_ORACLE, doc="EXCEPT (anti-join over distincts)")
def rel_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL EXCEPT is distinct-set subtraction — ``subtract`` plans as a
    left-anti join after both sides reduce to their distinct key sets
    (NOT ``exceptAll``, whose multiset semantics would let a user who
    viewed twice and purchased once survive)."""
    ev = load_table(spark, sf_dir, "events")
    viewed = ev.filter(F.col("event_type") == "view").select("user_id")
    bought = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return viewed.subtract(bought)


# ---------------------------------------------------------------------------
# correlated subquery through the SQL API
# ---------------------------------------------------------------------------

_SUBQUERY_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = customer.c_nationkey)
  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderstatus = 'F')
"""


@register("rel_subquery_sql", _SUBQUERY_SQL, doc="correlated scalar + EXISTS subqueries (SQL API)")
def rel_subquery_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same ANSI text runs on both engines — Catalyst decorrelates the
    scalar subquery into an aggregate + join and the EXISTS into a
    left-semi join; nothing is executed row-at-a-time."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_SUBQUERY_SQL)


# ---------------------------------------------------------------------------
# sessionization (gap > 30 min starts a new session)
# ---------------------------------------------------------------------------

_SESSION_ORACLE = """
WITH gaps AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
         CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                   - epoch_us(LAG(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000
              OR LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
sessions AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY t, new_session
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id
"""


@register("rel_sessionize", _SESSION_ORACLE, doc="sessionization: lag-gap + running sum")
def rel_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic sessionization: one shuffle on user_id, per-partition
    sort on ts; session ids via running sum of gap markers. The
    streaming twin is ``session_window`` (state-bounded)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag("ts").over(w).cast("timestamp")
    )
    marked = ev.withColumn(
        "new_session",
        F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    wsum = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("new_session").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = marked.withColumn("session_id", F.sum("new_session").over(wsum))
    return sessions.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# two-table as-of join (union-tag algorithm; oracle = DuckDB ASOF JOIN)
# ---------------------------------------------------------------------------

_ASOF_JOIN_ORACLE = """
WITH v AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t
  FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS t
  FROM events WHERE event_type = 'purchase'
)
SELECT v.event_id, v.user_id,
       strftime(p.t, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       CAST((epoch_us(v.t) - epoch_us(p.t)) // 1000 AS BIGINT) AS gap_ms
FROM v ASOF JOIN p ON v.user_id = p.user_id AND v.t >= p.t
"""


@register("rel_asof_join", _ASOF_JOIN_ORACLE, doc="two-table as-of join (union-tag, one shuffle)")
def rel_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each 'view' event joined to the user's most recent
    at-or-before 'purchase'. Union-tag as-of (operators/asof.py): ONE
    shuffle of |views|+|purchases| rows, no inequality-join explosion;
    the oracle is DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    out = asof_join(views, purchases, key="user_id", left_ts="ts", right_ts="ts")
    return out.select(
        "event_id",
        "user_id",
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        (
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("asof_ts").cast("timestamp"))
            )
            / F.lit(1000)
        )
        .cast("long")
        .alias("gap_ms"),
    )


# ---------------------------------------------------------------------------
# range join (binned; oracle = DuckDB inequality join / IEJoin)
# ---------------------------------------------------------------------------

_RANGE_JOIN_ORACLE = """
SELECT a.o_orderkey, COUNT(*) AS n_near
FROM orders a
JOIN orders b
  ON a.o_orderkey != b.o_orderkey
 AND abs(epoch_us(a.o_orderdate) - epoch_us(b.o_orderdate)) <= 86400000000
GROUP BY a.o_orderkey
"""


@register("rel_range_join", _RANGE_JOIN_ORACLE, doc="range join via radius-width binning")
def rel_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders placed within 24 h of each other (no equi key), counted
    per order. Two-level plan:

    1. COMPRESS: collapse orders to (distinct timestamp, multiplicity)
       — 150 k rows → ~2.4 k at sf0.1. A range join's candidate volume
       is |a|·|b|·selectivity; compressing duplicate keys first shrinks
       it quadratically (28 M candidate pairs → ~7 k) and is exact for
       any aggregate downstream, because counts weight the join.
    2. Range-join the compressed relation against itself with
       radius-width binning (operators/asof.py) — the same binned hash
       join the general operator uses, now over the tiny key relation;
       per-date in-range totals are Σ multiplicities − 1 (self).
    3. Broadcast the per-date totals back onto orders — map-only.

    The naive form (self-join the raw table) stays available via
    ``range_join_binned`` for genuinely high-cardinality keys; the
    compress-first rewrite is what survives 100 TB when the range key
    is low-cardinality relative to the rows (dates, sensor epochs)."""
    orders = load_table(spark, sf_dir, "orders")
    dates = orders.groupBy("o_orderdate").agg(F.count(F.lit(1)).alias("c"))
    right = dates.select(
        F.col("o_orderdate").alias("b_orderdate"), F.col("c").alias("b_c")
    )
    pairs = range_join_binned(
        dates,
        right,
        left_ts="o_orderdate",
        right_ts="b_orderdate",
        radius_seconds=86400,
        left_cols=["o_orderdate"],
        right_cols=["b_c"],
    )
    per_date = pairs.groupBy("o_orderdate").agg(
        (F.sum("b_c") - F.lit(1)).alias("n_near")
    )
    # the pair-join form emits nothing for an order with zero in-range
    # neighbors; match that contract (n_near is never 0 in the output)
    return (
        orders.join(F.broadcast(per_date), "o_orderdate")
        .filter(F.col("n_near") > 0)
        .select("o_orderkey", "n_near")
    )


# ---------------------------------------------------------------------------
# scalar function library
# ---------------------------------------------------------------------------

_SCALAR_ORACLE = """
SELECT p_partkey,
       upper(p_brand) AS brand_uc,
       substr(p_name, 1, 8) AS name_prefix,
       concat(p_brand, ':', p_type) AS brand_type,
       length(p_name) AS name_len,
       abs(p_size - 25) AS size_dev,
       CAST(p_size % 7 AS INTEGER) AS size_mod,
       CAST(ceil(p_retailprice / 100.0) AS BIGINT) AS price_bucket,
       CASE WHEN p_size >= 30 THEN 'large'
            WHEN p_size >= 10 THEN 'medium'
            ELSE 'small' END AS size_class
FROM part
WHERE p_partkey < 500
"""


@register("rel_scalar_funcs", _SCALAR_ORACLE, doc="string/math scalar function library")
def rel_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level scalar functions — all codegen'd JVM intrinsics; this
    query pins their cross-engine semantics (1-based substr, %, ceil)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.ceil(F.col("p_retailprice") / 100.0).alias("price_bucket"),
        F.when(F.col("p_size") >= 30, "large")
        .when(F.col("p_size") >= 10, "medium")
        .otherwise("small")
        .alias("size_class"),
    )


# ---------------------------------------------------------------------------
# date/time function library
# ---------------------------------------------------------------------------

_DATE_ORACLE = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       COUNT(*) AS n,
       COUNT(DISTINCT CAST(month(o_orderdate) AS INTEGER)) AS n_months,
       MIN(strftime(o_orderdate, '%Y-%m-%d')) AS first_day,
       MAX(dayofweek(o_orderdate)) AS max_dow
FROM orders
GROUP BY 1, 2
"""


@register("rel_date_funcs", _DATE_ORACLE, doc="date part extraction + grouping")
def rel_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part grouping — at scale this is what partition columns are
    derived from (write partitioned by (yr, qtr) → partition pruning).
    DuckDB dayofweek is 0-6 Sunday-first; Spark dayofweek is 1-7 —
    normalized here to the DuckDB convention."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"), F.quarter("o_orderdate").alias("qtr")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.month("o_orderdate")).alias("n_months"),
            F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("first_day"),
            F.max(F.dayofweek("o_orderdate") - 1).cast("long").alias("max_dow"),
        )
    )


# ---------------------------------------------------------------------------
# ranking window-function battery
# ---------------------------------------------------------------------------

_WINDOW_FUNCS_ORACLE = """
SELECT s_suppkey,
       s_nationkey,
       CAST(RANK() OVER w AS INTEGER) AS rnk,
       CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
       ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
       ROUND(CUME_DIST() OVER w, 6) AS cd,
       CAST(FIRST_VALUE(s_suppkey) OVER w AS BIGINT) AS top_supp,
       CAST(LEAD(s_suppkey, 1, -1) OVER w AS BIGINT) AS next_supp
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey ASC)
"""


@register("rel_window_funcs", _WINDOW_FUNCS_ORACLE, doc="rank/dense_rank/percent_rank/cume_dist/first_value/lead")
def rel_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-function battery over one window spec — Spark
    evaluates all six in a single Window physical operator (one shuffle
    on the partition key, one sort), not six."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
    )
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.first("s_suppkey").over(w).alias("top_supp"),
        F.lead("s_suppkey", 1, -1).over(w).alias("next_supp"),
    )


# ---------------------------------------------------------------------------
# array function battery
# ---------------------------------------------------------------------------

# The array itself goes through to_json: list-typed output columns crash
# the driver's pandas canonicalizer (CORRECTNESS_r01 bug class 2).
_ARRAY_FUNCS_ORACLE = """
SELECT o_orderstatus,
       CAST(to_json(array_agg(DISTINCT o_orderpriority ORDER BY o_orderpriority)) AS VARCHAR) AS priorities,
       CAST(len(array_agg(DISTINCT o_orderpriority ORDER BY o_orderpriority)) AS INTEGER) AS n_priorities,
       array_agg(DISTINCT o_orderpriority ORDER BY o_orderpriority)[1] AS first_priority,
       CAST(list_contains(array_agg(DISTINCT o_orderpriority ORDER BY o_orderpriority), '1-URGENT') AS BOOLEAN) AS has_urgent
FROM orders
GROUP BY o_orderstatus
"""


@register("rel_array_funcs", _ARRAY_FUNCS_ORACLE, doc="collect_set/sort_array/element_at/array_contains")
def rel_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + manipulation: ``collect_set`` is order-
    nondeterministic by itself (shuffle order!) — ALWAYS ``sort_array``
    before comparing, persisting, or hashing collected arrays. The
    array output is JSON-serialized for the driver's scalar hash."""
    o = load_table(spark, sf_dir, "orders")
    arr = F.sort_array(F.collect_set("o_orderpriority"))
    return o.groupBy("o_orderstatus").agg(
        F.to_json(arr).alias("priorities"),
        F.size(arr).alias("n_priorities"),
        F.element_at(arr, 1).alias("first_priority"),
        F.array_contains(arr, "1-URGENT").alias("has_urgent"),
    )


# ---------------------------------------------------------------------------
# cube (all grouping sets)
# ---------------------------------------------------------------------------

_CUBE_ORACLE = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n,
       {sql_money_sum('l_extendedprice')} AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("rel_cube", _CUBE_ORACLE, doc="cube: all 2^k grouping sets in one pass")
def rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE = all 2^k grouping sets sharing ONE shuffle (rows expand
    ×2^k before the exchange; at 100 TB prefer rollup or explicit
    grouping sets when the full lattice isn't needed)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum(F.col("l_extendedprice")).alias("sum_price"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_price",
        )
    )


# ---------------------------------------------------------------------------
# moving aggregates (frame-bounded windows)
# ---------------------------------------------------------------------------

_MOVAVG_ORACLE = """
SELECT event_id, user_id,
       ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             / CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / 100.0, 6) AS mov_avg_3,
       ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                     ROWS UNBOUNDED PRECEDING) / 100.0, 2) AS running_total
FROM events
"""


@register("rel_moving_avg", _MOVAVG_ORACLE, doc="frame-bounded windows: moving avg + running total")
def rel_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving 3-row average and running total per user — frame-bounded
    windows: one shuffle on user_id, per-partition sort, single pass.
    Integer-scaled sums keep the doubles engine-identical."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w3 = w.rowsBetween(-2, 0)
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    v100 = F.round(F.col("value") * 100).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.sum(v100).over(w3) / F.count(F.lit(1)).over(w3).cast("double") / F.lit(100.0), 6
        ).alias("mov_avg_3"),
        F.round(F.sum(v100).over(wrun) / F.lit(100.0), 2).alias("running_total"),
    )


# ---------------------------------------------------------------------------
# exact percentiles
# ---------------------------------------------------------------------------

_PCTL_ORACLE = """
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.25), 2) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90
FROM orders
GROUP BY o_orderstatus
"""


@register("rel_percentiles", _PCTL_ORACLE, doc="exact interpolated percentiles per group")
def rel_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``, both linear interpolation). At 100 TB switch to
    ``percentile_approx`` (t-digest, mergeable) — see
    rel_approx_aggregates."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 2).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90"),
    )


# ---------------------------------------------------------------------------
# deterministic stratified sampling (training-data pipelines)
# ---------------------------------------------------------------------------

_STRAT_ORACLE = """
WITH hashed AS (
  SELECT event_id, event_type,
         (event_id * 2654435761) % 4294967296 AS h
  FROM events
),
ranked AS (
  SELECT event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h, event_id) AS rn
  FROM hashed
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum
FROM ranked WHERE rn <= 50
GROUP BY event_type
"""


@register("rel_stratified_sample", _STRAT_ORACLE, doc="deterministic stratified sample (k per class)")
def rel_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-k-per-class sampling with a PORTABLE pseudo-random order:
    Knuth multiplicative hash of the row id (exact integer arithmetic —
    identical in any engine, unlike rand(seed) whose generator is
    engine-private, or ``sampleBy`` whose Bernoulli draw is
    partition-order-dependent). Deterministic sampling matters in
    training pipelines: re-runs, retries, and engine migrations must
    select the SAME examples. One shuffle on the class key."""
    ev = load_table(spark, sf_dir, "events")
    h = (F.col("event_id") * F.lit(2654435761)) % F.lit(4294967296)
    w = Window.partitionBy("event_type").orderBy(h.asc(), F.col("event_id").asc())
    return (
        ev.select("event_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("event_id").alias("id_checksum"),
        )
    )


# ---------------------------------------------------------------------------
# quantile discretization (ntile) — QuantileDiscretizer's window twin
# ---------------------------------------------------------------------------

_NTILE_ORACLE = """
WITH b AS (
  SELECT c_custkey, NTILE(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS bucket
  FROM customer
)
SELECT CAST(bucket AS INTEGER) AS bucket, COUNT(*) AS n,
       CAST(MIN(c_custkey) AS BIGINT) AS min_key
FROM b GROUP BY bucket
"""


@register("rel_ntile_buckets", _NTILE_ORACLE, doc="NTILE quantile bucketing (QuantileDiscretizer twin)")
def rel_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency bucketing — the exact form of Spark ML's
    QuantileDiscretizer (which approximates with percentile sketches
    at scale; this twin is the oracle-checkable contract). The
    implemented plan is the DISTRIBUTED two-phase rank
    (operators/ranking.py: range-bucketed prefix sum — biggest sort is
    one range bucket, never the whole table); the oracle keeps the
    single-window NTILE form, so the scale plan is proven equal to the
    textbook one bit-for-bit."""
    from web_attack_detection_spark.operators.ranking import (
        ntile_from_rank,
        ranged_row_number,
    )

    c = load_table(spark, sf_dir, "customer")
    ranked = ranged_row_number(
        c.select("c_custkey", "c_acctbal"),
        "c_acctbal",
        [F.col("c_acctbal").asc(), F.col("c_custkey").asc()],
        total_col="_tot",
    )
    return (
        ranked.select(
            "c_custkey",
            ntile_from_rank(F.col("rn"), F.col("_tot"), 4)
            .cast("int")
            .alias("bucket"),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.min("c_custkey").alias("min_key"))
    )


# ---------------------------------------------------------------------------
# min_by / max_by argmin-argmax aggregates
# ---------------------------------------------------------------------------

_MINBY_ORACLE = """
SELECT o_orderstatus,
       CAST(min_by(o_orderkey, o_totalprice) AS BIGINT) AS cheapest_order,
       CAST(max_by(o_orderkey, o_totalprice) AS BIGINT) AS priciest_order,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderstatus
"""


@register("rel_min_max_by", _MINBY_ORACLE, doc="argmin/argmax per group (min_by/max_by)")
def rel_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin/argmax without a self-join or window: one aggregation
    carrying (value, key) pairs with map-side combine. The fixture's
    o_totalprice values are distinct per group, so the argmin is
    well-defined across engines."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
            F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


# ---------------------------------------------------------------------------
# correlation from exact integer sums (engine-identical statistics)
# ---------------------------------------------------------------------------

_CORR_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sx,
         SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS sy,
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT) * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS sxy,
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT) * CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sxx,
         CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT) * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       ROUND(
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
            * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS corr_qty_disc
FROM s
"""


@register("rel_correlation", _CORR_ORACLE, doc="Pearson correlation from exact integer sums")
def rel_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson r per group computed from exact integer co-moments —
    NOT the built-in ``corr`` (whose one-pass update order differs per
    engine and partition count). The five sums are plain longs with
    map-side combine; the float math happens once per group in a fixed
    textual order, so results are bit-identical anywhere. Columns are
    chosen so scaled co-moments fit int64 (quantity ≤ 5000, discount
    ≤ 10 after ×100); for wider values switch the sums to
    decimal(38,0) — same pattern, exact either way."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity") * 100).cast("long")
    y = F.round(F.col("l_discount") * 100).cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        "l_returnflag",
        F.round(
            (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            / (
                F.sqrt(nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
                * F.sqrt(nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
            ),
            6,
        ).alias("corr_qty_disc"),
    )


# Sketch INTERNALS differ per engine, so the sketch estimates can't be
# hashed directly — but their accuracy CONTRACT can: the query emits the
# exact counts (oracle-checkable) plus booleans asserting each estimate
# landed within its error bound. If Spark's HLL++ or t-digest ever
# degrades, the booleans flip and the driver's hash catches it.
_APPROX_AGG_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       TRUE AS parts_est_ok,
       TRUE AS orders_est_ok,
       TRUE AS median_est_ok
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "rel_approx_aggregates",
    _APPROX_AGG_ORACLE,
    doc="approx_count_distinct + percentile_approx: exact twins + in-bound accuracy booleans",
)
def rel_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB forms: HyperLogLog++ distinct counts and t-digest
    percentiles — mergeable sketches, map-side combinable, bounded
    memory (exact countDistinct's shuffle carries every distinct key;
    the sketch partials are KBs). Default rsd is 5%; the booleans
    assert 3× that bound (approx is probabilistic but deterministic for
    fixed input), and percentile_approx with accuracy=10000 must land
    within 1% of the exact interpolated median."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median"),
    )

    def within(est, exact, tol):
        return (
            F.abs(est.cast("double") - exact.cast("double"))
            <= F.lit(tol) * exact.cast("double")
        ).alias
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        within(F.col("approx_parts"), F.col("exact_parts"), 0.15)("parts_est_ok"),
        within(F.col("approx_orders"), F.col("exact_orders"), 0.15)("orders_est_ok"),
        within(F.col("approx_median_price"), F.col("exact_median"), 0.01)(
            "median_est_ok"
        ),
    )
