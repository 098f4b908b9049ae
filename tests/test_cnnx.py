"""ml_cnn_exact: exact-GD conv net under full oracle.  Numpy float64
twin (three-implementation discipline) plus the conv-specific
invariants: kernel taps are SHARED across positions (one gradient per
tap, summed over positions), and the max-pool argmax router actually
routes — both positions receive gradient somewhere in the corpus.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from web_attack_detection_spark.plans import all_plans  # noqa: F401
from web_attack_detection_spark.plans.mlq import _lrgd_round_half_away
from web_attack_detection_spark.plans.cnnx import (
    _CNNX_C,
    _CNNX_LR,
    _CNNX_ROUNDS,
    _cnnx_init,
)
from web_attack_detection_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _numpy_trajectory():
    C = _CNNX_C
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    istest = (pdf["event_id"] % 4 == 1).to_numpy()
    x1q = np.floor(pdf["value"].to_numpy() * 10000 + 0.5).astype("int64")
    x2q = (pdf["user_id"].to_numpy() % 100).astype("int64")
    x3q = (pdf["event_id"].to_numpy() % 100).astype("int64")
    y_all = pdf["event_type"].isin(["purchase", "signup"]).to_numpy().astype("int64")
    tr = ~istest
    n = int(tr.sum())
    zs_tr, zs_te = [], []
    for xq in (x1q, x2q, x3q):
        m = float(int(xq[tr].sum())) / float(n)
        q = float(int((xq[tr].astype(object) ** 2).sum())) / float(n)
        sd = math.sqrt(q - m * m)
        zs_tr.append((xq[tr].astype("float64") - m) / sd)
        zs_te.append((xq[istest].astype("float64") - m) / sd)
    y = y_all[tr]
    B, K0, K1, V = _cnnx_init()
    n6 = float(n) * 1000000.0

    def q6(a):
        return np.where(a >= 0, np.floor(a + 0.5), np.ceil(a - 0.5)).astype("int64")

    def forward(zs):
        pre = {}  # (t, c) 1-indexed
        a = {}
        for t in (1, 2):
            for c in range(1, C + 1):
                e = B[c - 1] + K0[c - 1] * zs[t - 1] + K1[c - 1] * zs[t]
                pre[(t, c)] = e
                a[(t, c)] = np.maximum(np.minimum(e, 1.0), -1.0)
        P = {c: np.maximum(a[(1, c)], a[(2, c)]) for c in range(1, C + 1)}
        m = np.full_like(P[1], V[0])
        for c in range(1, C + 1):
            m = m + V[c] * P[c]
        return pre, a, P, m

    want = []
    for r in range(1, _CNNX_ROUNDS + 1):
        pre, a, P, m = forward(zs_tr)
        resid = 1.0 / (1.0 + np.exp(-m)) - y.astype("float64")
        gvb = int(q6(resid * 1000000.0).sum())
        gv = [int(q6(resid * P[c] * 1000000.0).sum()) for c in range(1, C + 1)]
        d1, d2 = {}, {}
        for c in range(1, C + 1):
            dp = resid * V[c]
            route1 = a[(1, c)] >= a[(2, c)]
            d1[c] = np.where(route1 & (np.abs(pre[(1, c)]) < 1.0), dp, 0.0)
            d2[c] = np.where(~route1 & (np.abs(pre[(2, c)]) < 1.0), dp, 0.0)
        gb = [int(q6((d1[c] + d2[c]) * 1000000.0).sum()) for c in range(1, C + 1)]
        gk0 = [
            int(q6((d1[c] * zs_tr[0] + d2[c] * zs_tr[1]) * 1000000.0).sum())
            for c in range(1, C + 1)
        ]
        gk1 = [
            int(q6((d1[c] * zs_tr[1] + d2[c] * zs_tr[2]) * 1000000.0).sum())
            for c in range(1, C + 1)
        ]
        nc = int(((m >= 0.0) == (y == 1)).sum())
        for c in range(1, C + 1):
            B[c - 1] = B[c - 1] - _CNNX_LR * (float(gb[c - 1]) / n6)
            K0[c - 1] = K0[c - 1] - _CNNX_LR * (float(gk0[c - 1]) / n6)
            K1[c - 1] = K1[c - 1] - _CNNX_LR * (float(gk1[c - 1]) / n6)
        V[0] = V[0] - _CNNX_LR * (float(gvb) / n6)
        for c in range(1, C + 1):
            V[c] = V[c] - _CNNX_LR * (float(gv[c - 1]) / n6)
        for c in range(1, C + 1):
            for pidx, (g_, w_) in enumerate(
                ((gb[c - 1], B[c - 1]), (gk0[c - 1], K0[c - 1]), (gk1[c - 1], K1[c - 1]))
            ):
                want.append(
                    (r, "conv", c, pidx, g_, _lrgd_round_half_away(w_ * 1000000))
                )
        want.append((r, "out", 0, 0, gvb, _lrgd_round_half_away(V[0] * 1000000)))
        for c in range(1, C + 1):
            want.append(
                (r, "out", 0, c, gv[c - 1], _lrgd_round_half_away(V[c] * 1000000))
            )
        want.append((r, "acc", 0, 0, nc, n))
    _, _, _, mt = forward(zs_te)
    yt = y_all[istest]
    pred = (mt >= 0.0).astype("int64")
    for uy in (0, 1):
        for up in (0, 1):
            c = int(((yt == uy) & (pred == up)).sum())
            if c:
                want.append((_CNNX_ROUNDS, "cm", uy, up, c, 0))
    # routing liveness computed on the FIRST round's state for the
    # invariant test (recompute: init changed in place above)
    return want, n


@pytest.fixture(scope="module")
def rows(spark):
    return QUERIES["ml_cnn_exact"].fn(spark, SF).collect()


def test_cnn_exact_gd_matches_numpy_twin(rows):
    got = sorted(
        tuple(r[c] for c in ("round", "layer", "unit", "pidx", "grad_q", "w_q"))
        for r in rows
    )
    want, _ = _numpy_trajectory()
    assert got == sorted(want)


def test_cnn_exact_shape_and_pool_invariants(rows):
    C, R = _CNNX_C, _CNNX_ROUNDS
    by: dict = {}
    for r in rows:
        by.setdefault(r["layer"], []).append(r)
    assert len(by["conv"]) == R * C * 3  # bias + 2 shared taps
    assert len(by["out"]) == R * (C + 1)
    assert len(by["acc"]) == R
    # weight sharing is live: both kernel taps receive gradient
    r1 = [r for r in by["conv"] if r["round"] == 1]
    assert any(r["grad_q"] != 0 for r in r1 if r["pidx"] == 1)  # tap 0
    assert any(r["grad_q"] != 0 for r in r1 if r["pidx"] == 2)  # tap 1
    # max-pool routing is live: BOTH positions win somewhere, i.e. the
    # tap gradients are not identical (identical would mean one
    # position always won with identical inputs — degenerate pool)
    g_tap0 = sorted(r["grad_q"] for r in r1 if r["pidx"] == 1)
    g_tap1 = sorted(r["grad_q"] for r in r1 if r["pidx"] == 2)
    assert g_tap0 != g_tap1
    # symmetry broken across channels at the final round
    finals = {}
    for r in by["conv"]:
        if r["round"] == R:
            finals.setdefault(r["unit"], []).append(r["w_q"])
    sigs = [tuple(sorted(v)) for v in finals.values()]
    assert len(set(sigs)) == C
    accs = sorted(by["acc"], key=lambda r: r["round"])
    n = accs[0]["w_q"]
    assert n > 0 and all(a["w_q"] == n for a in accs)
    import duckdb

    n_test = duckdb.sql(
        f"select count(*) from '{SF}/events.parquet' where event_id % 4 = 1"
    ).fetchone()[0]
    assert sum(r["grad_q"] for r in by["cm"]) == n_test
