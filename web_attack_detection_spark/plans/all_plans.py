"""Import every plan module so its queries register (plans.registry).

``__spark_entry__.py`` imports this single module; adding a new plan
file means adding its name to ``PLAN_MODULES``.

VERDICT r3 #2: the old per-module ``try/except ImportError: pass``
meant a module-level regression silently dropped dozens of queries
from ``queries()`` — the driver would just see a shorter registry.
Imports now fail LOUDLY, and a post-import floor assertion catches
any other silent-shrink path (e.g. a module whose registration loop
is skipped).  ``tests/test_registry_integrity.py`` pins the exact
query-name set.
"""

import importlib

PLAN_MODULES = [
    "features",
    "relational",
    "relational2",
    "relational3",
    "relational4",
    "relational5",
    "relational6",
    "relational7",
    "relational8",
    "relational9",
    "relational10",
    "relational11",
    "dedup",
    "suffixq",
    "text",
    "text2",
    "text3",
    "text4",
    "text5",
    "text6",
    "treeq",
    "similarity",
    "similarity2",
    "similarity3",
    "pipelineq",
    "mlq",
    "mlq2",
    "rnnx",
    "cnnx",
    "lstmx",
    "deepq",
    "multimodal",
    "streamq",
    "refshape",
    "ioq",
    "graphq",
    "graphq2",
]

for _mod in PLAN_MODULES:
    importlib.import_module(f"web_attack_detection_spark.plans.{_mod}")

# Registry floor (bumped as queries land).  A registry smaller than
# this means a plan module loaded but failed to register (the one
# silent-shrink path imports can't catch).
EXPECTED_MIN_QUERIES = 332
EXPECTED_MIN_ORACLES = 320

from web_attack_detection_spark.plans.registry import QUERIES as _Q  # noqa: E402

_n_oracles = sum(1 for q in _Q.values() if q.oracle is not None)
if len(_Q) < EXPECTED_MIN_QUERIES or _n_oracles < EXPECTED_MIN_ORACLES:
    raise RuntimeError(
        f"plan registry shrank: {len(_Q)} queries / {_n_oracles} oracles "
        f"(expected >= {EXPECTED_MIN_QUERIES}/{EXPECTED_MIN_ORACLES}) — "
        "a plan module imported but did not register its queries"
    )
