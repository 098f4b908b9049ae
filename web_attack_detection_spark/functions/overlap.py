"""Overlap independent Spark job chains from driver threads.

Optimization-guide §2.6: Spark's scheduler happily runs several jobs
at once inside one application — actions are only sequential because
driver code calls them sequentially.  Several registry queries run an
expensive MLlib parity-audit chain that is COMPLETELY independent of
the portable path whose output it audits (separate inputs, separate
caches, results only compared at the end).  Executing the two chains
from two driver threads lets the audit's jobs back-fill the cores the
portable path leaves idle (and vice versa); per-query wall drops by
up to min(chain A, chain B) with zero change to any computed value —
the same DataFrames are evaluated, only their jobs interleave.

``pyspark.inheritable_thread_target`` is the documented way to run
driver threads so that JVM thread-local properties (job group, job
description, local properties) are inherited and cleaned up.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable

from pyspark import inheritable_thread_target


def overlap(*thunks: Callable):
    """Run each zero-arg thunk's Spark-action chain concurrently.

    Returns the thunk results in argument order.  Exceptions propagate
    (the first failing thunk's exception is raised after all threads
    finish submitting).  Thunks must be independent: no thunk may
    consume a DataFrame another thunk is still building, and any
    cache()/unpersist() pair must be contained within one thunk.
    """
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(inheritable_thread_target(t)) for t in thunks]
        return [f.result() for f in futures]
