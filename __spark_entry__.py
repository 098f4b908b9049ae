"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship feature pipeline (the reference's
core query, SURVEY.md §3 entry point 2) on the sf0.001 fixtures.
``queries()`` / ``oracle_sql()`` expose the registry in
``web_attack_detection_spark.plans`` — one named, DuckDB-oracle-checked
query per implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from web_attack_detection_spark.plans import all_plans  # noqa: F401,E402
from web_attack_detection_spark.plans.registry import QUERIES  # noqa: E402


_PKG_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``web_attack_detection_spark`` importable on Spark's Python
    workers (Pandas-UDF/mapInPandas closures deserialize by module
    reference). ``addPyFile`` is the standard deploy mechanism — on a
    real cluster the same zip ships to every executor."""
    key = id(spark.sparkContext)
    if key in _PKG_SHIPPED:
        return
    import tempfile
    import zipfile

    pkg_dir = Path(_REPO) / "web_attack_detection_spark"
    zip_path = Path(tempfile.gettempdir()) / "web_attack_detection_spark_pkg.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for py in sorted(pkg_dir.rglob("*.py")):
            zf.write(py, py.relative_to(pkg_dir.parent))
    spark.sparkContext.addPyFile(str(zip_path))
    _PKG_SHIPPED.add(key)


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """Runtime confs the driver's own session may lack: the events
    fixture stores TIMESTAMP(NANOS) parquet (readable only with
    nanosAsLong; io/sources.py converts back to µs), and timestamps
    must collect as naive-UTC to match DuckDB's storage."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_nanos_conf(spark)
    from web_attack_detection_spark.plans.flagship import flagship_pipeline

    return flagship_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_nanos_conf(spark)
            return fn(spark, sf_dir)

        run.__name__ = fn.__name__
        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(spec.fn) for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; queries without one get the rows-only check."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
