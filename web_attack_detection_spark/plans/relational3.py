"""Third relational-coverage wave: grouping sets, unpivot/melt,
higher-order array functions, ordered string aggregation, time-range
window frames, lateral joins, median, and explode.

Nothing here maps 1:1 to a reference call site (the reference —
huunhan1804/web-attack-detection, see SURVEY.md §2.2 — has no
relational operators at all); these are the remaining engine-surface
gaps a user of the north-star pipeline hits: melt-for-plotting,
per-entity trailing-window features, set-valued group summaries, and
array analytics over tokenized text.

Scale notes per query are inline; the common rules from SCALE.md
apply: one shuffle per groupBy/window on the natural key, no
driver-side loops, integer-scaled sums for deterministic floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table, register_views
from web_attack_detection_spark.plans.registry import register

# ---------------------------------------------------------------------------
# GROUPING SETS with grouping_id — the general form of rollup/cube
# (rel_rollup / rel_cube cover the two shorthands; this is the explicit
# set list, which Catalyst expands into a single Expand + one shuffle).
# ---------------------------------------------------------------------------

_GROUPING_SETS_ORACLE = """
SELECT event_type,
       CAST(year(ts) AS INT) AS yr,
       CAST(GROUPING(event_type, year(ts)) AS BIGINT) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_val_c
FROM events
GROUP BY GROUPING SETS ((event_type), (year(ts)), ())
"""


@register(
    "rel_grouping_sets",
    _GROUPING_SETS_ORACLE,
    doc="explicit GROUPING SETS + grouping_id in one Expand pass",
)
def rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three grouping sets computed in ONE scan + ONE shuffle: Catalyst's
    Expand node replicates each input row once per set, then a single
    hash aggregate handles all of them. At 100 TB this beats three
    separate groupBy+union jobs 3:1 on scan cost; partial aggregation
    still applies map-side because the expanded rows carry the gid."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(year(ts) AS INT) AS yr,
               CAST(grouping_id(event_type, year(ts)) AS BIGINT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_val_c
        FROM events
        GROUP BY GROUPING SETS ((event_type), (year(ts)), ())
        """
    )


# ---------------------------------------------------------------------------
# Unpivot / melt — wide → long. The training-pipeline use: reshaping
# per-feature metric columns into (feature, value) rows for profiling.
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val
FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val
FROM part
"""


@register("rel_unpivot", _UNPIVOT_ORACLE, doc="unpivot/melt wide→long (inverse of pivot)")
def rel_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.unpivot`` is a single Expand node — one scan, zero
    shuffles, output = rows × n_value_cols. The naive alternative (one
    select per column + union) re-scans the table per column; at 100 TB
    with 50 metric columns that is a 50× scan amplification."""
    part = load_table(spark, sf_dir, "part").withColumn(
        "p_size", F.col("p_size").cast("double")
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="val",
    )


# ---------------------------------------------------------------------------
# Higher-order array functions — transform / filter / aggregate lambdas
# run inside codegen (no Python), the idiomatic way to do per-row token
# analytics without an explode+groupBy round trip.
# ---------------------------------------------------------------------------

_HOF_ORACLE = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       CAST(len(list_filter(string_split(text, ' '), w -> strlen(w) > 5)) AS BIGINT) AS n_long,
       CAST(list_aggregate(list_transform(string_split(text, ' '), w -> strlen(w)), 'sum') AS BIGINT) AS sum_len
FROM documents
"""


@register(
    "rel_higher_order_funcs",
    _HOF_ORACLE,
    doc="array lambdas: transform/filter/aggregate without explode",
)
def rel_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row array analytics stay inside whole-stage codegen — zero
    shuffle, zero Python. The explode+groupBy(doc_id) equivalent would
    shuffle ``n_words`` rows per document; lambdas make it a map-only
    stage, which is the difference between O(tokens) shuffle and none
    at corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.filter(words, lambda w: F.length(w) > 5)).cast("long").alias("n_long"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w)),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        .cast("long")
        .alias("sum_len"),
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation — set-valued group summary with a total
# order, so the concatenated result is deterministic.
# ---------------------------------------------------------------------------

_STRING_AGG_ORACLE = """
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
       COUNT(DISTINCT o_orderstatus) AS n_statuses
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "rel_string_agg",
    _STRING_AGG_ORACLE,
    doc="ordered string_agg via collect_set → array_sort → array_join",
)
def rel_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set is partial-aggregable (map-side sets merge), and the
    sort happens per GROUP on the tiny distinct set, not per row —
    deterministic output without a global sort. The anti-pattern is
    collect_list + driver-side dedup: unbounded per-group state AND
    nondeterministic order under shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


# ---------------------------------------------------------------------------
# Time-range window frame — trailing 1-hour per-user activity, the
# classic per-entity feature for fraud/attack scoring. RANGE frames
# bound by the ORDER BY *value*, so ties get identical frames and the
# result is deterministic even with duplicate timestamps.
# ---------------------------------------------------------------------------

_TIME_RANGE_ORACLE = """
SELECT event_id,
       COUNT(*) OVER w AS cnt_1h,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS sum_1h_c
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


@register(
    "rel_time_range_window",
    _TIME_RANGE_ORACLE,
    doc="trailing-1h RANGE frame per user (event-time feature)",
)
def rel_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle on user_id, then a per-partition ordered scan with a
    sliding frame — O(n log n) in partition size, no self-join. The
    self-join formulation (e ⋈ e ON same user AND ts BETWEEN ..) is
    O(n·k) with a full extra shuffle; at 100 TB the window form wins
    outright. Skewed users (bots) are the hazard: cap frame cost via
    AQE skew splitting, or pre-bucket by (user_id, day)."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("cnt_1h"),
        F.sum(F.round(F.col("value") * 100).cast("long")).over(w).alias("sum_1h_c"),
    )


# ---------------------------------------------------------------------------
# LATERAL correlated subquery — per-outer-row top-k, the SQL-standard
# spelling of "for each region, its 2 richest customers".
# ---------------------------------------------------------------------------

_LATERAL_ORACLE = """
SELECT r.r_name, t.c_name, t.c_acctbal
FROM region r,
     LATERAL (
       SELECT c.c_name, c.c_acctbal
       FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
       WHERE n.n_regionkey = r.r_regionkey
       ORDER BY c.c_acctbal DESC, c.c_custkey
       LIMIT 2
     ) t
"""


@register(
    "rel_lateral_topk",
    _LATERAL_ORACLE,
    doc="LATERAL correlated subquery: top-2 customers per region",
)
def rel_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst decorrelates the lateral subquery into a join + window
    top-k — same physical plan as the rel_topk_per_group spelling, so
    the scale story is one shuffle on the correlation key. The LATERAL
    form matters as API surface: it is how users port DuckDB/Postgres
    queries without hand-rewriting to window functions."""
    register_views(spark, sf_dir, "region", "nation", "customer")
    return spark.sql(
        """
        SELECT r.r_name, t.c_name, t.c_acctbal
        FROM region r,
             LATERAL (
               SELECT c.c_name, c.c_acctbal
               FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
               WHERE n.n_regionkey = r.r_regionkey
               ORDER BY c.c_acctbal DESC, c.c_custkey
               LIMIT 2
             ) t
        """
    )


# ---------------------------------------------------------------------------
# Median — exact interpolated 50th percentile per group. Distinct from
# rel_percentiles (array of quantiles) in that it exercises the
# dedicated median() aggregate.
# ---------------------------------------------------------------------------

_MEDIAN_ORACLE = """
SELECT l_returnflag,
       median(l_quantity) AS med_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


@register("rel_median", _MEDIAN_ORACLE, doc="exact median per group (interpolated)")
def rel_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median requires a full sort of each group's values — fine
    per-group here, but at 100 TB switch to approx_percentile (KLL-type
    sketch, mergeable map-side, bounded memory); rel_approx_aggregates
    is that scale path. Both Spark and DuckDB interpolate the even-n
    midpoint as (a+b)/2, so parity is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Explode → word count — the shuffle-side complement of the lambda
# query above: global token frequencies across the corpus.
# ---------------------------------------------------------------------------

_FULL_OUTER_ORACLE = """
SELECT COALESCE(o.d, l.d) AS d,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(l.n_ships, 0) AS n_ships
FROM (SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS d, COUNT(*) AS n_orders
      FROM orders GROUP BY 1) o
FULL OUTER JOIN
     (SELECT strftime(CAST(l_shipdate AS TIMESTAMP), '%Y-%m-%d') AS d, COUNT(*) AS n_ships
      FROM lineitem GROUP BY 1) l
ON o.d = l.d
"""


@register(
    "rel_full_outer_join",
    _FULL_OUTER_ORACLE,
    doc="FULL OUTER join of daily order vs ship counts (COALESCE keys)",
)
def rel_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily orders vs shipments reconciled with a full outer join —
    ship dates trail order dates, so BOTH sides contribute unmatched
    keys. The join runs on two pre-aggregated (tiny) relations: at
    scale the rule is aggregate-then-join whenever the join is on the
    grouping key — shuffling two |days|-row inputs instead of two raw
    fact tables."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    l = li.groupBy(F.date_format("l_shipdate", "yyyy-MM-dd").alias("d")).agg(
        F.count(F.lit(1)).alias("n_ships")
    )
    return (
        o.join(l, "d", "full_outer")
        .select(
            "d",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_ships", F.lit(0)).alias("n_ships"),
        )
    )


_NULL_SEM_ORACLE = """
WITH x AS (
  SELECT c_mktsegment,
         CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS v
  FROM customer
)
SELECT c_mktsegment,
       COUNT(*) AS n_all,
       COUNT(v) AS n_nonnull,
       CAST(SUM(CASE WHEN v IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_nullsafe,
       CAST(SUM(CAST(ROUND(v * 100) AS BIGINT)) AS BIGINT) AS sum_pos_c
FROM x GROUP BY c_mktsegment
"""


@register(
    "rel_null_semantics",
    _NULL_SEM_ORACLE,
    doc="SQL null semantics: COUNT(col) vs COUNT(*), null-safe equality, null-skipping SUM",
)
def rel_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The null contract every aggregate relies on, exercised in one
    query: COUNT(col) skips nulls, COUNT(*) doesn't; ``<=>`` (null-safe
    equality) treats NULL=NULL as true; SUM ignores nulls rather than
    poisoning the total. Matters at scale because imputation and
    quality filters produce null-dense columns — an operator that
    miscounts nulls silently corrupts training statistics."""
    c = load_table(spark, sf_dir, "customer")
    v = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal"))
    return (
        c.select("c_mktsegment", v.alias("v"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_all"),
            F.count("v").alias("n_nonnull"),
            F.sum(F.col("v").eqNullSafe(F.lit(None)).cast("int")).cast("long").alias(
                "n_null_nullsafe"
            ),
            F.sum(F.round(F.col("v") * 100).cast("long")).alias("sum_pos_c"),
        )
    )


# DECIMAL surfaces as float64 via fetchdf but as decimal.Decimal objects
# via Spark's toPandas — the driver's dtype-sensitive hash would always
# mismatch. Serialize the exact decimal to its canonical string instead:
# both engines print fixed-scale decimals identically ("1234.50").
_DECIMAL_ORACLE = """
SELECT l_returnflag,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS VARCHAR) AS sum_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l_discount AS DECIMAL(12,2))) AS DECIMAL(24,4)) AS VARCHAR) AS sum_revenue,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "rel_decimal_agg",
    _DECIMAL_ORACLE,
    doc="exact DECIMAL aggregation (no float drift by construction)",
)
def rel_decimal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money math in DECIMAL: sums are exact integers underneath, so
    the result is partition-order-independent WITHOUT the integer-
    scaling idiom the double queries use — the type system carries the
    guarantee. The cost at scale is wider aggregation state (128-bit)
    and no SIMD, which is why the hot queries keep scaled BIGINTs and
    DECIMAL is reserved for the ledger-grade outputs."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(12,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).cast("decimal(18,2)").cast("string").alias("sum_price"),
        # scale-4 products sum exactly; casting DOWN to scale 2 would hit
        # engine-specific rounding (HALF_UP vs half-even) on .xx5 ties.
        # Final cast to string: the exact fixed-scale decimal prints
        # identically in both engines, while pandas dtypes for decimals
        # do not agree (object vs float64).
        F.sum(price * disc).cast("decimal(24,4)").cast("string").alias("sum_revenue"),
        F.count(F.lit(1)).alias("n"),
    )


_WORDCOUNT_ORACLE = """
SELECT word, COUNT(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
ORDER BY cnt DESC, word
LIMIT 20
"""


_LOCF_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_val_c
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(date_trunc('hour', ts)) AS mn, max(date_trunc('hour', ts)) AS mx
  FROM events GROUP BY 1
), spine AS (
  SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM bounds
)
SELECT s.event_type,
       strftime(CAST(s.h AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS hour,
       last_value(hourly.sum_val_c IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_c,
       CAST(CASE WHEN hourly.sum_val_c IS NULL THEN 1 ELSE 0 END AS INT) AS was_gap
FROM spine s LEFT JOIN hourly ON s.event_type = hourly.event_type AND s.h = hourly.h
"""


@register(
    "rel_gap_fill_locf",
    _LOCF_ORACLE,
    doc="hourly spine + last-observation-carried-forward gap fill",
)
def rel_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: build the complete hourly spine per
    series with ``sequence()`` + explode (generated in-engine — never a
    driver-side date loop), left-join the observed aggregates, then
    carry the last non-null forward with ``last(ignorenulls) OVER``.

    Scale: the spine is O(series × hours) — tiny next to the raw
    events — and the observed side is already aggregated before the
    join, so the join input is two SMALL relations regardless of raw
    volume; the LOCF window shuffles only spine rows, partitioned by
    series. Output hours are strings (engine-side formatting is
    tz-proof; see events_hourly)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_val_c"))
    bounds = ev.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.date_trunc("hour", F.max("ts")).alias("mx"),
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return spine.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.last("sum_val_c", ignorenulls=True).over(w).alias("filled_c"),
        F.col("sum_val_c").isNull().cast("int").alias("was_gap"),
    )


_FUNNEL_ORACLE = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.t1 AND e.ts < v.t1 + INTERVAL 24 HOUR
      GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.t2 AND e.ts < c.t2 + INTERVAL 24 HOUR
      GROUP BY 1)
SELECT 'view' AS stage, 1 AS stage_ord, COUNT(*) AS n_users FROM v
UNION ALL SELECT 'click', 2, COUNT(*) FROM c
UNION ALL SELECT 'purchase', 3, COUNT(*) FROM p
"""


@register(
    "rel_funnel",
    _FUNNEL_ORACLE,
    doc="ordered 3-stage funnel (view→click→purchase, 24h steps)",
)
def rel_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel: users whose first click follows their first
    view within 24 h, then first purchase within 24 h of that click.
    Each stage is a filtered aggregate joined to the previous stage's
    (small) per-user result — the per-stage join key is user_id, the
    stage tables shrink monotonically, and Spark broadcasts them
    automatically once they fit, so each stage costs one scan-side
    filter plus a broadcast probe. The anti-pattern at scale is
    collect_list(ts) per user and Python sequence matching: unbounded
    per-user state and a Python boundary for what is plain relational
    algebra."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("INTERVAL 24 HOUR")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") >= F.col("t1")) & (F.col("ts") < F.col("t1") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") >= F.col("t2")) & (F.col("ts") < F.col("t2") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df: DataFrame, name: str, ord_: int) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.lit(ord_).cast("int").alias("stage_ord"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return stage(v, "view", 1).unionByName(stage(c, "click", 2)).unionByName(
        stage(p, "purchase", 3)
    )


_HISTOGRAM_ORACLE = """
WITH b AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx FROM lineitem)
SELECT LEAST(CAST(FLOOR((l_extendedprice - mn) / ((mx - mn) / 20.0)) AS INT), 19) AS bucket,
       COUNT(*) AS n
FROM lineitem, b
GROUP BY 1
"""


@register(
    "rel_histogram",
    _HISTOGRAM_ORACLE,
    doc="fixed-width 20-bucket histogram (two-pass min/max + bucket agg)",
)
def rel_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram: pass 1 computes global min/max (algebraic,
    map-side combine), pass 2 buckets every row against the broadcast
    1-row bounds and aggregates 20 groups. Both passes shuffle only
    aggregate state. The double arithmetic ((v-mn)/width) is identical
    IEEE ops in both engines, so bucket assignment is bit-exact; the
    LEAST(...) pins v == max into the last bucket."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    )
    return (
        li.crossJoin(F.broadcast(b))
        .select(
            F.least(
                F.floor(
                    (F.col("l_extendedprice") - F.col("mn"))
                    / ((F.col("mx") - F.col("mn")) / F.lit(20.0))
                ).cast("int"),
                F.lit(19),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "rel_explode_wordcount",
    _WORDCOUNT_ORACLE,
    doc="explode(split) → global top-20 token frequencies",
)
def rel_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generate (explode) stays pipelined with the scan — no
    materialization of the exploded rows before the partial aggregate,
    so the shuffle carries only (distinct-token, partial-count) pairs,
    not O(total tokens). Top-20 is a TakeOrderedAndProject (per-
    partition heap + driver merge), never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Navigation functions with IGNORE NULLS — nth_value / first_value /
# lag over null-dense columns (the sparse-sensor-reading shape).
# ---------------------------------------------------------------------------

_WINDOW_NULLS_ORACLE = """
WITH x AS (
  SELECT c_custkey, c_nationkey,
         CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS v
  FROM customer
)
SELECT c_custkey,
       nth_value(c_custkey, 2) OVER w AS second_key,
       first_value(v IGNORE NULLS) OVER w AS first_nonnull_v,
       lag(v, 1 IGNORE NULLS) OVER w AS prev_nonnull_v
FROM x
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register(
    "rel_window_ignore_nulls",
    _WINDOW_NULLS_ORACLE,
    doc="nth_value + IGNORE NULLS navigation (first_value/lag) over null-dense data",
)
def rel_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS navigation — 'previous valid reading' over sparse
    data WITHOUT a pre-filter join (the filter-then-self-join spelling
    shuffles twice; this is one window pass). The deterministic ORDER
    BY key (c_custkey, unique per partition) makes every navigation
    result reproducible — navigation over a non-unique order is the
    classic nondeterminism trap at scale, where partition order varies
    run to run."""
    register_views(spark, sf_dir, "customer")
    return spark.sql(
        """
        WITH x AS (
          SELECT c_custkey, c_nationkey,
                 CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS v
          FROM customer
        )
        SELECT c_custkey,
               nth_value(c_custkey, 2) OVER w AS second_key,
               first_value(v) IGNORE NULLS OVER w AS first_nonnull_v,
               lag(v, 1) IGNORE NULLS OVER wl AS prev_nonnull_v
        FROM x
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wl AS (PARTITION BY c_nationkey ORDER BY c_custkey)
        """
    )


# ---------------------------------------------------------------------------
# Rollup cascade — daily aggregates derived FROM the hourly partials,
# not from raw events (the continuous-aggregate / hypertable pattern).
# ---------------------------------------------------------------------------

_CASCADE_ORACLE = """
SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_val_c
FROM events
GROUP BY 1, 2
"""


@register(
    "rel_rollup_cascade",
    _CASCADE_ORACLE,
    doc="daily rollup computed from hourly partials (continuous-aggregate shape)",
)
def rel_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregation of partials: daily = SUM over the hourly rollup's
    (count, scaled-sum) state — exact because both aggregates are
    algebraic (counts add; integer-scaled sums add). This is the
    continuous-aggregate pattern at 100 TB: persist the fine-grain
    rollup once, answer every coarser grain from it — the raw table is
    scanned once per ingest, not once per query grain. The oracle
    aggregates raw events directly, proving the cascade is lossless."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_val_c"),
    )
    return (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", F.col("h")), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(F.sum("n").alias("n"), F.sum("sum_val_c").alias("sum_val_c"))
    )


# ---------------------------------------------------------------------------
# Sliding (overlapping) windows in batch — the twin of streaming
# window(ts, "1 hour", "30 minutes"); each event lands in 2 windows.
# ---------------------------------------------------------------------------

_SLIDING_ORACLE = """
WITH starts AS (
  SELECT CAST(ts AS TIMESTAMP) AS t, event_type, value,
         date_trunc('hour', CAST(ts AS TIMESTAMP))
           + CASE WHEN minute(CAST(ts AS TIMESTAMP)) >= 30
                  THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS s0
  FROM events
), expanded AS (
  SELECT event_type, value, s0 AS ws FROM starts
  UNION ALL
  SELECT event_type, value, s0 - INTERVAL 30 MINUTE FROM starts
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_val_c
FROM expanded GROUP BY 1, 2
"""


@register(
    "rel_sliding_window",
    _SLIDING_ORACLE,
    doc="sliding 1h/30m window agg (overlapping windows, batch twin of streaming)",
)
def rel_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping windows via ``F.window(ts, '1 hour', '30 minutes')``
    — Catalyst expands each row into window/slide = 2 copies and
    aggregates once (same Expand-then-aggregate shape as grouping
    sets). The oracle derives both window starts arithmetically,
    proving the engine's window assignment. At scale the expansion
    factor is the knob: a 1h/1m sliding window is a 60× row blowup —
    prefer the coarsest slide the consumer tolerates, or cascade from
    a tumbling rollup (rel_rollup_cascade)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_val_c"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_val_c",
        )
    )
