"""Driver-fidelity check: run sensitive queries on a VANILLA SparkSession.

The driver's harness builds its own SparkSession — none of our
``session.py`` confs (UTC timezone, ``nanosAsLong``, NTZ inference off,
checkpoint checksum off) can be assumed. VERDICT r1 item 6 asks that the
streaming oracles (unsampled in round 1) be proven green on exactly such
a session. This script builds a bare ``local[8]`` session with ZERO
engine confs and sweeps:

- all 5 ``stream_*`` oracle queries (state-store + watermark machinery);
- every events-table query (TIMESTAMP(NANOS) parquet handling);
- the timezone-sensitive scalar queries.

Usage: python tools/vanilla_check.py [--all] [query_prefix ...]
``--all`` sweeps the entire oracle registry instead of the subset.
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
# Python WORKERS don't inherit the driver's sys.path mutation: when
# this script runs from any cwd other than the repo root, pickled-by-
# reference UDF functions (mapInPandas model math) fail to import on
# the worker side. Exporting PYTHONPATH before the JVM starts makes
# the spawned worker daemons inherit it (same guard as bench.py).
import os  # noqa: E402

os.environ["PYTHONPATH"] = os.pathsep.join(
    [str(REPO)]
    + ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH") else [])
)

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

SENSITIVE_PREFIXES = ("stream_",)
SENSITIVE_NAMES = {
    "events_hourly",
    "rel_sessionize",
    "rel_asof_lag",
    "rel_date_funcs",
    "rel_date_funcs2",
    "rel_timezone_convert",
    "rel_time_range_window",
    "rel_sliding_window",
    "rel_gap_fill_locf",
    "rel_gap_fill_lerp",
    "rel_funnel",
    "rel_scd2_upsert",
}


def main() -> int:
    # Deliberately bare: no timezone, no AQE, no parquet confs — the
    # driver's session could look like this.
    spark = (
        SparkSession.builder.appName("vanilla_check")
        .master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tests.oracle_harness import compare
    from web_attack_detection_spark.plans import all_plans  # noqa: F401
    from web_attack_detection_spark.plans.registry import QUERIES

    run_all = "--all" in sys.argv
    explicit = [a for a in sys.argv[1:] if not a.startswith("--")]
    names = [
        n
        for n, spec in sorted(QUERIES.items())
        if spec.oracle is not None
        and (
            run_all
            or (any(n.startswith(p) for p in explicit) if explicit else False)
            or (
                not explicit
                and (n.startswith(SENSITIVE_PREFIXES) or n in SENSITIVE_NAMES)
            )
        )
    ]
    failed = []
    for name in names:
        spec = QUERIES[name]
        t0 = time.time()
        try:
            compare(spark, SF_DIR, spec.fn, spec.oracle, exact=True)
            print(f"PASS  {name}  ({time.time() - t0:.1f}s)", flush=True)
        except Exception:
            failed.append(name)
            print(f"FAIL  {name}", flush=True)
            traceback.print_exc()
    print(f"\n{len(names) - len(failed)}/{len(names)} passed on vanilla session")
    if failed:
        print("failed:", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
