"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side and
compares row count, column names, and order-insensitive values. Used by
tests/test_oracle_parity.py so a mismatch is caught before the driver's
per-round CORRECTNESS gate.
"""

from __future__ import annotations

import math

import duckdb

from web_attack_detection_spark.io.sources import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = tuple(_norm(r[i]) for i in order)
        out.append(vals)
    return sorted(cols), sorted(out, key=repr)


def _approx_eq(a, b, rel=1e-9):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=rel, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_approx_eq(x, y, rel) for x, y in zip(a, b))
    return a == b


def compare(spark, sf_dir: str, fn, oracle: str, exact: bool = True) -> None:
    """Raise AssertionError with a diff preview on any mismatch.

    ``exact=True`` mimics the driver's value-hash (bit-exact floats) —
    our queries are engineered for it via integer-scaled aggregates.
    """
    sdf = fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    con = duckdb_con(sf_dir)
    res = con.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]
    con.close()

    s_cols, s_rows = _norm_rows(spark_cols, spark_rows)
    d_cols, d_rows = _norm_rows(duck_cols, duck_rows)

    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), f"row count: spark={len(s_rows)} duckdb={len(d_rows)}"
    bad = []
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        ok = (a == b) if exact else _approx_eq(a, b)
        if not ok:
            bad.append((i, a, b))
            if len(bad) >= 5:
                break
    assert not bad, "value mismatches (row, spark, duckdb): " + "\n".join(map(str, bad))
