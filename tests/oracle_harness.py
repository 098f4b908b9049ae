"""Local mirror of the driver's DuckDB-oracle comparison.

Driver-faithful by construction (VERDICT r1 "What's wrong" §4): the
round-1 harness compared ``fetchall()`` Python tuples, where DuckDB's
HUGEINT silently became ``int`` — so an oracle whose ``SUM(int)``
surfaced as float64 in pandas passed locally but hash-mismatched in the
driver. This version routes BOTH sides through pandas exactly like the
driver does:

- Spark side via ``DataFrame.toPandas()``;
- DuckDB side via ``fetchdf()`` (HUGEINT -> float64, LIST -> object);
- canonicalization = sort columns by name, then ``sort_values`` over all
  columns (which raises ``TypeError: unhashable type: 'list'`` on LIST
  columns, same as the driver's canonicalizer);
- value comparison via a dtype-sensitive CSV serialization, so int64
  ``100143`` vs float64 ``100143.0`` is a MISMATCH here too.

A query that passes :func:`compare` therefore passes the driver's
CORRECTNESS gate; a query that would crash or hash-mismatch there fails
here first.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from web_attack_detection_spark.io.sources import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: columns sorted by name, rows sorted
    by every column.  Raises on unsortable (list-valued) columns — that
    is deliberate: the driver's canonicalizer crashes on those too, so
    we must see the crash locally."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf.columns) and len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def _serialize(pdf: pd.DataFrame) -> list[str]:
    """Dtype-sensitive row serialization.  float64 100143.0 and int64
    100143 serialize differently — exactly the distinction the driver's
    value hash makes."""
    out = []
    for row in pdf.itertuples(index=False, name=None):
        parts = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                parts.append("<NULL>")
            elif v is pd.NaT:
                parts.append("<NULL>")
            else:
                parts.append(f"{type(v).__name__}:{v!r}")
        out.append("|".join(parts))
    return out


def _to_rows(pdf: pd.DataFrame) -> list[tuple]:
    return [tuple(r) for r in pdf.itertuples(index=False, name=None)]


def _approx_eq(a, b, rel=1e-9):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and math.isnan(a):
        return isinstance(b, float) and math.isnan(b)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return math.isclose(float(a), float(b), rel_tol=rel, abs_tol=1e-9)
    return a == b


def compare(spark, sf_dir: str, fn, oracle: str, exact: bool = True) -> None:
    """Raise AssertionError with a diff preview on any mismatch.

    ``exact=True`` mimics the driver's value hash: dtype-sensitive,
    bit-exact floats. ``exact=False`` relaxes numerics to a relative
    tolerance (used only by exploratory tests, never by the parity
    gate).
    """
    sdf = fn(spark, sf_dir)
    spdf = sdf.toPandas()

    con = duckdb_con(sf_dir)
    dpdf = con.execute(oracle).fetchdf()
    con.close()

    assert sorted(spdf.columns) == sorted(dpdf.columns), (
        f"column mismatch: spark={sorted(spdf.columns)} duckdb={sorted(dpdf.columns)}"
    )
    assert len(spdf) == len(dpdf), f"row count: spark={len(spdf)} duckdb={len(dpdf)}"

    # Canonicalize exactly like the driver — this line CRASHES on
    # list-valued columns, which is the point (driver bug class 2).
    s_c, d_c = _canon(spdf), _canon(dpdf)

    if exact:
        s_ser, d_ser = _serialize(s_c), _serialize(d_c)
        bad = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_ser, d_ser)) if a != b
        ][:5]
        assert not bad, (
            "dtype-sensitive value mismatches (row, spark, duckdb):\n"
            + "\n".join(map(str, bad))
            + f"\nspark dtypes: {dict(s_c.dtypes.astype(str))}"
            + f"\nduck  dtypes: {dict(d_c.dtypes.astype(str))}"
        )
    else:
        s_rows, d_rows = _to_rows(s_c), _to_rows(d_c)
        bad = []
        for i, (a, b) in enumerate(zip(s_rows, d_rows)):
            if not all(_approx_eq(x, y) for x, y in zip(a, b)):
                bad.append((i, a, b))
                if len(bad) >= 5:
                    break
        assert not bad, "value mismatches (row, spark, duckdb): " + "\n".join(map(str, bad))
