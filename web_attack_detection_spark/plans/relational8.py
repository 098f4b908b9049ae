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

from pyspark.sql import DataFrame, SparkSession
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
