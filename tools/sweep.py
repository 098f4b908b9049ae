"""Full-registry driver-faithful parity sweep.

Usage: python tools/sweep.py [sf_dir] [name_prefix...]

Runs every oracle-backed registry query through the dtype-sensitive
harness (tests/oracle_harness.compare) and prints PASS/FAIL per query
plus a summary. This is the local twin of the driver's CORRECTNESS
gate; run it before committing oracle changes.
"""

from __future__ import annotations

import sys
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from web_attack_detection_spark.plans import all_plans  # noqa: F401, E402
from web_attack_detection_spark.plans.registry import QUERIES  # noqa: E402
from tests.oracle_harness import compare  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = tuple(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
    if prefixes:
        names = [n for n in names if n.startswith(prefixes)]
    fails: list[str] = []
    for name in names:
        spec = QUERIES[name]
        try:
            compare(spark, sf_dir, spec.fn, spec.oracle, exact=True)
            print(f"PASS {name}", flush=True)
        except Exception as e:
            msg = str(e).splitlines()
            head = msg[0] if msg else type(e).__name__
            print(f"FAIL {name}: {type(e).__name__}: {head[:200]}", flush=True)
            if "-v" in sys.argv:
                traceback.print_exc()
            fails.append(name)
    print(f"\n{len(names) - len(fails)}/{len(names)} pass")
    if fails:
        print("FAILURES:", " ".join(fails))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
