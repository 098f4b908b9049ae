"""MERGE INTO / upsert / SCD2 as DataFrame compositions.

Spark's open-source SQL surface has no ``MERGE INTO`` against plain
parquet (that's a table-format feature — Delta/Iceberg); the
relational algebra underneath is a single full-outer join, and that is
how a 100 TB merge actually executes anyway. Expressing it directly
keeps the whole operation in one shuffle:

- :func:`merge_upsert` — UPDATE-matched + INSERT-unmatched in ONE
  full-outer join (per-column coalesce). No second pass, no
  driver-side diffing. Broadcast the update side when it is small
  (the common CDC case: daily delta ≪ accumulated table).
- :func:`scd2_apply` — slowly-changing-dimension type 2: close the
  current version of changed keys, append the new version, keep
  history untouched. One full-outer join + one generator expression
  emits 0-2 output rows per joined row — no self-union of the big
  side, no window.

The reference (huunhan1804/web-attack-detection — SURVEY.md §2) has no
mutation surface at all; these close the training-data-pipeline gap
(labels get corrected, features get re-extracted — upsert is how those
land without rewriting the world).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
) -> DataFrame:
    """MERGE semantics over plain DataFrames.

    WHEN MATCHED THEN UPDATE SET <update_cols> (all non-key columns if
    None), WHEN NOT MATCHED THEN INSERT *. ``updates`` must be unique
    per key (standard MERGE precondition — enforce upstream, it is a
    correctness bug to feed duplicate update keys to any MERGE).

    One full-outer join on the key; matched rows take the update's
    values for ``update_cols`` and the target's for the rest,
    insert-only rows take everything from the update side. At scale
    the join shuffles both sides once on the key — if the target is
    bucketed by the key (io/sinks.py), the shuffle drops to the
    updates side only.
    """
    non_keys = [c for c in target.columns if c not in keys]
    upd = set(update_cols) if update_cols is not None else set(non_keys)
    t, u = target.alias("t"), updates.alias("u")
    cond = [t[k].eqNullSafe(u[k]) for k in keys]
    cols: list[Column] = [
        F.coalesce(t[k], u[k]).alias(k) for k in keys
    ]
    for c in non_keys:
        if c in upd:
            cols.append(F.coalesce(u[c], t[c]).alias(c))
        else:
            cols.append(F.coalesce(t[c], u[c]).alias(c))
    return t.join(u, cond, "full_outer").select(*cols)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    eff_col: str = "effective_date",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Type-2 SCD merge: ``dim`` rows carry ``valid_from``/``valid_to``
    (NULL valid_to = current); ``updates`` carries the key, the tracked
    attribute columns, and ``eff_col`` (when the new version takes
    effect).

    For each key: if the update's tracked values differ from the
    current version's (null-safe), the current row is CLOSED
    (valid_to := effective date) and a new OPEN row is appended; if
    equal, nothing changes; keys new to the dimension insert an open
    row. Historical (already-closed) rows pass through untouched.

    Plan shape: history passes through scan-only; current versions
    full-outer-join the updates once, and a generator (inline over a
    filtered struct array) emits the 0-2 result rows per key — the
    whole mutation is one shuffle + one narrow stage, independent of
    how many versions history holds.
    """
    cur = dim.filter(F.col(valid_to).isNull()).alias("c")
    hist = dim.filter(F.col(valid_to).isNotNull())
    u = updates.alias("u")
    c_key, u_key = F.col(f"c.{key}"), F.col(f"u.{key}")

    changed = F.lit(False)
    for t in tracked:
        changed = changed | ~F.col(f"c.{t}").eqNullSafe(F.col(f"u.{t}"))
    matched = c_key.isNotNull() & u_key.isNotNull()

    # existing version: kept open unless the update changes it
    old_row = F.when(
        c_key.isNotNull(),
        F.struct(
            c_key.alias(key),
            *[F.col(f"c.{t}").alias(t) for t in tracked],
            F.col(f"c.{valid_from}").alias(valid_from),
            F.when(matched & changed, F.col(f"u.{eff_col}"))
            .otherwise(F.col(f"c.{valid_to}"))
            .alias(valid_to),
        ),
    )
    # new version: on change or brand-new key
    new_row = F.when(
        (matched & changed) | (c_key.isNull() & u_key.isNotNull()),
        F.struct(
            u_key.alias(key),
            *[F.col(f"u.{t}").alias(t) for t in tracked],
            F.col(f"u.{eff_col}").alias(valid_from),
            F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
        ),
    )
    merged = (
        cur.join(u, c_key.eqNullSafe(u_key), "full_outer")
        .select(
            F.inline(
                F.filter(F.array(old_row, new_row), lambda x: x.isNotNull())
            )
        )
    )
    return hist.select(merged.columns).unionByName(merged)
