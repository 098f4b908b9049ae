"""As-of and range joins — time-series operators Spark has no built-in
for (referenced from plans/relational.py rel_asof_lag; DuckDB has
native ``ASOF JOIN``, which serves as the oracle twin).

**As-of join** (backward): for each left row, the single most recent
right row with ``right.ts <= left.ts`` for the same key. The naive
formulation — inequality join then per-left-row argmax — explodes to
O(|left|·|right-per-key|) intermediate rows. The scalable form used
here is the *union-tag* algorithm:

1. tag right rows 0, left rows 1, union on (key, ts, tag, payload);
2. one shuffle on key, per-partition sort on (ts, tag);
3. running ``last(right_payload, ignorenulls=True)`` carries the most
   recent right value forward onto every subsequent left row;
4. keep the left rows.

Cost: ONE shuffle of |left|+|right| rows and one sort — the same
complexity as the window-lag self-as-of, regardless of how many right
rows precede each left row. Ties (right.ts == left.ts) sort the right
row first, so equality matches are included (DuckDB ASOF ``>=``
semantics).

**Range join**: all pairs with ``|left.ts - right.ts| <= radius`` (no
equi key). The naive plan is a BroadcastNestedLoopJoin over n² pairs.
The scalable form *bins* both sides into radius-width buckets and
equi-joins on the bucket id (each left row probes its own and its two
neighboring buckets), then applies the exact predicate — turning the
cross product into a hash join whose output is only the near-pairs.
This is the standard interval-join strategy (Flink's interval join and
DuckDB's IEJoin solve the same problem; on Spark the bucket key makes
it expressible as a plain shuffled hash join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: left rows + the latest right row at-or-
    before their timestamp (per key). Rows with no prior right row are
    dropped (inner as-of). Returns all left columns plus
    ``asof_<col>`` for each requested right value column (default: the
    right timestamp only).
    """
    rvals = right_value_cols or []
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        F.col(right_ts).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in rvals],
    )
    lcols = left.columns
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__r_ts"].dataType).alias("__r_ts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in rvals
        ],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    r = r.select(
        "__k", "__t", "__tag", "__r_ts",
        *[f"__r_{c}" for c in rvals],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    # right rows sort before left rows at equal ts → ts >= semantics
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [F.last("__r_ts", ignorenulls=True).over(w).alias("asof_ts")] + [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in rvals
    ]
    merged = r.unionByName(l).select("__tag", *[f"__l_{c}" for c in lcols], *carried)
    out = merged.filter((F.col("__tag") == 1) & F.col("asof_ts").isNotNull())
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        "asof_ts",
        *[F.col(f"asof_{c}") for c in rvals],
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    radius_seconds: int,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """All (left, right) pairs with |left_ts - right_ts| <= radius.

    Both sides are binned into radius-width buckets; each left row
    joins buckets {b-1, b, b+1} (explode of 3 ints — any qualifying
    pair is at most one bucket away), then the exact predicate filters.
    Shuffle volume: 3·|left| + |right| rows on the bucket key instead
    of an n² nested loop.
    """
    rad_us = radius_seconds * 1_000_000
    # NTZ columns (ms-unit parquet) need the cast; session tz is pinned
    # UTC (session.py) so the cast is instant-preserving
    lt_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rt_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    lb = left.select(
        *left_cols,
        lt_us.alias("__lt"),
        F.explode(
            F.array(*[F.floor(lt_us / rad_us).cast("long") + d for d in (-1, 0, 1)])
        ).alias("__bin"),
    )
    rb = right.select(
        *right_cols,
        rt_us.alias("__rt"),
        F.floor(rt_us / rad_us).cast("long").alias("__bin"),
    )
    return (
        lb.join(rb, "__bin")
        .filter(F.abs(F.col("__lt") - F.col("__rt")) <= rad_us)
        .select(*left_cols, *right_cols)
    )
