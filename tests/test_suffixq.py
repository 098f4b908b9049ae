"""Prefix-doubling suffix spectrum: invariants the oracle hash-match
can't state on its own, plus a third-implementation (pure-Python)
twin of the level partition on the smoke corpus."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.suffixq import _LEVELS, dedup_suffix_doubling

from .conftest import SF_SMOKE


def _python_spectrum(rows):
    """Brute-force: group suffixes by materialized k-token prefix."""
    out = {}
    for k in _LEVELS:
        groups: dict[tuple, list[int]] = defaultdict(list)
        for doc_id, toks in rows:
            for i in range(len(toks) - k + 1):
                groups[tuple(toks[i : i + k])].append(doc_id)
        rep = {p: ds for p, ds in groups.items() if len(ds) >= 2}
        out[k] = {
            "n_groups": len(groups),
            "n_repeat_groups": len(rep),
            "n_repeat_positions": sum(len(ds) for ds in rep.values()),
            "max_group_positions": max((len(ds) for ds in rep.values()), default=0),
            "max_docs_sharing": max((len(set(ds)) for ds in rep.values()), default=0),
        }
    return out


def test_spectrum_matches_bruteforce(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    raw = [
        (r["doc_id"], r["t"])
        for r in docs.select("doc_id", F.split("text", r"\s+").alias("t")).collect()
    ]
    want = _python_spectrum(raw)
    got = {r["prefix_len"]: r.asDict() for r in dedup_suffix_doubling(spark, SF_SMOKE).collect()}
    assert sorted(got) == _LEVELS
    for k in _LEVELS:
        for col, v in want[k].items():
            assert got[k][col] == v, f"level {k} {col}: {got[k][col]} != {v}"


def test_spectrum_monotonicity(spark):
    """Longer prefixes can only split groups: repeat mass is
    non-increasing in k, and every level-2k repeat group implies a
    level-k repeat group (so counts are non-increasing too)."""
    rows = {r["prefix_len"]: r for r in dedup_suffix_doubling(spark, SF_SMOKE).collect()}
    for lo, hi in zip(_LEVELS, _LEVELS[1:]):
        assert rows[hi]["n_repeat_positions"] <= rows[lo]["n_repeat_positions"]
        assert rows[hi]["max_group_positions"] <= rows[lo]["max_group_positions"]
        assert rows[hi]["max_docs_sharing"] <= rows[lo]["max_docs_sharing"]


def test_cut_matches_bruteforce(spark):
    from web_attack_detection_spark.plans.suffixq import _CUT_K, dedup_suffix_cut

    docs = load_table(spark, SF_SMOKE, "documents")
    raw = [
        (r["doc_id"], r["t"])
        for r in docs.select("doc_id", F.split("text", r"\s+").alias("t")).collect()
    ]
    wins = defaultdict(list)
    for doc_id, toks in raw:
        for i in range(len(toks) - _CUT_K + 1):
            wins[tuple(toks[i : i + _CUT_K])].append((doc_id, i))
    covered = defaultdict(set)
    for occ in wins.values():
        if len(occ) >= 2:
            for doc_id, i in sorted(occ)[1:]:  # keep the first occurrence
                covered[doc_id].update(range(i, i + _CUT_K))
    got = {r["doc_id"]: r.asDict() for r in dedup_suffix_cut(spark, SF_SMOKE).collect()}
    assert set(got) == set(covered)
    sizes = {doc_id: len(toks) for doc_id, toks in raw}
    for doc_id, js in covered.items():
        assert got[doc_id]["n_removed"] == len(js)
        assert got[doc_id]["n_tokens"] == sizes[doc_id]
        assert got[doc_id]["n_kept"] == sizes[doc_id] - len(js)


def test_survivors_consistent_with_cut(spark):
    from web_attack_detection_spark.plans.suffixq import (
        dedup_suffix_cut,
        dedup_suffix_survivors,
    )

    s = dedup_suffix_survivors(spark, SF_SMOKE).first()
    cut = dedup_suffix_cut(spark, SF_SMOKE).collect()
    assert s["covered_tokens"] == sum(r["n_removed"] for r in cut)
    dropped = {r["doc_id"] for r in cut if 2 * r["n_removed"] >= r["n_tokens"]}
    assert s["n_survivors"] == s["n_docs"] - len(dropped)
    assert 0 < s["n_survivors"] <= s["n_docs"]
    assert s["surviving_tokens"] <= s["n_tokens"]
