"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting (on in session.py) handles most skew by
splitting oversized shuffle partitions at runtime. These explicit
forms cover the cases AQE can't:

- **salted join**: a hot key whose rows exceed one executor's memory
  even after AQE splits (AQE splits the *partition*, but a broadcast-
  ineligible right side still sends ALL rows of the hot key to each
  split). Salting fans the hot key into ``n_salt`` distinct join keys:
  the big side gets a deterministic per-row salt, the small side is
  replicated once per salt value. Shuffle of the big side is unchanged
  in volume but uniform in distribution; the small side grows ×n_salt
  (choose n_salt ≈ hot-key-rows / target-partition-rows).
- **two-phase aggregation**: for high-cardinality-imbalanced groupBy
  where one group dominates; partial-aggregate on (key, salt) first so
  the hot group's rows reduce in parallel, then merge per key. Only
  valid for algebraic aggregates (sum/count/min/max — mergeable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def add_salt(df: DataFrame, n_salt: int, cols: list[str] | None = None) -> DataFrame:
    """Deterministic per-row salt in [0, n_salt): hash of the given
    (default: all) columns — reproducible across runs/retries, which a
    ``rand()`` salt is not (a retried task re-rolling salts breaks
    exactly-once shuffle semantics)."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn("__salt", F.pmod(F.xxhash64(*basis), F.lit(n_salt)).cast("int"))


def replicate_for_salt(df: DataFrame, n_salt: int) -> DataFrame:
    """Small-side twin: one copy per salt value (explode of a
    sequence literal — no shuffle, grows the side ×n_salt)."""
    return df.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys: join on (key, salt) instead of
    key. Result is row-identical to ``big.join(small, key, how)``."""
    b = add_salt(big, n_salt)
    s = replicate_for_salt(small, n_salt)
    return b.join(s, [key, "__salt"], how).drop("__salt")


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    n_salt: int,
    sum_cols: dict[str, str] | None = None,
    count_alias: str | None = "n",
) -> DataFrame:
    """Two-phase groupBy for skewed group keys: (key, salt) partial →
    key final. ``sum_cols`` maps input column → output alias."""
    sums = sum_cols or {}
    partial = add_salt(df, n_salt).groupBy(*key_cols, "__salt").agg(
        F.count(F.lit(1)).alias("__pn"),
        *[F.sum(c).alias(f"__ps_{c}") for c in sums],
    )
    aggs = []
    if count_alias is not None:
        aggs.append(F.sum("__pn").alias(count_alias))
    aggs.extend(F.sum(f"__ps_{c}").alias(alias) for c, alias in sums.items())
    return partial.groupBy(*key_cols).agg(*aggs)
