"""Registry integrity guard (VERDICT r3 #2).

``plans/all_plans.py`` used to wrap every plan-module import in
``try/except ImportError: pass`` — a module-level regression silently
dropped dozens of queries from ``queries()``.  Imports are now loud;
these tests additionally pin the module manifest and the registry
floor so deleting an import line (or a registration loop) fails CI
instead of shrinking the judged surface.
"""

from __future__ import annotations

import importlib


def test_every_plan_module_imports_loudly():
    from web_attack_detection_spark.plans.all_plans import PLAN_MODULES

    assert len(PLAN_MODULES) >= 25
    for mod in PLAN_MODULES:
        importlib.import_module(f"web_attack_detection_spark.plans.{mod}")


def test_registry_floor():
    from web_attack_detection_spark.plans import all_plans
    from web_attack_detection_spark.plans.registry import QUERIES

    n_oracles = sum(1 for q in QUERIES.values() if q.oracle is not None)
    assert len(QUERIES) >= all_plans.EXPECTED_MIN_QUERIES
    assert n_oracles >= all_plans.EXPECTED_MIN_ORACLES


def test_entrypoint_contract():
    """__spark_entry__ exposes queries()/oracle_sql() consistently."""
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs), "oracle_sql keys must be a subset of queries"
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())
