"""ml_lstm_exact: exact-GD LSTM under full oracle.  Numpy float64
twin (three-implementation discipline) plus LSTM-specific invariants:
the cell-state carry must be live (forget-gate gradients nonzero —
gradient flowed through c_t into step t-1), all four gates must
receive gradient, and the held-out confusion covers the test split.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from web_attack_detection_spark.plans import all_plans  # noqa: F401
from web_attack_detection_spark.plans.mlq import _lrgd_round_half_away
from web_attack_detection_spark.plans.lstmx import (
    _GATES,
    _LSTMX_H,
    _LSTMX_LR,
    _LSTMX_ROUNDS,
    _lstmx_init,
)
from web_attack_detection_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _numpy_trajectory():
    H = _LSTMX_H
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
    W, V = _lstmx_init()
    n6 = float(n) * 1000000.0

    def q6(a):
        return np.where(a >= 0, np.floor(a + 0.5), np.ceil(a - 0.5)).astype("int64")

    def hsig(x):
        return np.maximum(np.minimum(0.2 * x + 0.5, 1.0), 0.0)

    def forward(zs):
        """Returns dicts keyed (t, j) for pre{gate}, activations,
        c, th, h — expression order mirrors the engine exactly."""
        pre = {g: {} for g in _GATES}
        act = {g: {} for g in _GATES}
        c, th, h = {}, {}, {}
        for t in (1, 2, 3):
            for g in _GATES:
                for j in range(1, H + 1):
                    e = W[g][j - 1][0] + W[g][j - 1][1] * zs[t - 1]
                    if t > 1:
                        for k in range(1, H + 1):
                            e = e + W[g][j - 1][1 + k] * h[(t - 1, k)]
                    pre[g][(t, j)] = e
                    if g == "g":
                        act[g][(t, j)] = np.maximum(np.minimum(e, 1.0), -1.0)
                    else:
                        act[g][(t, j)] = hsig(e)
            for j in range(1, H + 1):
                if t == 1:
                    c[(1, j)] = act["i"][(1, j)] * act["g"][(1, j)]
                else:
                    c[(t, j)] = (
                        act["f"][(t, j)] * c[(t - 1, j)]
                        + act["i"][(t, j)] * act["g"][(t, j)]
                    )
                th[(t, j)] = np.maximum(np.minimum(c[(t, j)], 1.0), -1.0)
                h[(t, j)] = act["o"][(t, j)] * th[(t, j)]
        m = np.full_like(h[(3, 1)], V[0])
        for j in range(1, H + 1):
            m = m + V[j] * h[(3, j)]
        return pre, act, c, th, h, m

    want = []
    for r in range(1, _LSTMX_ROUNDS + 1):
        pre, act, c, th, h, m = forward(zs_tr)
        resid = 1.0 / (1.0 + np.exp(-m)) - y.astype("float64")
        gvb = int(q6(resid * 1000000.0).sum())
        gv = [int(q6(resid * h[(3, j)] * 1000000.0).sum()) for j in range(1, H + 1)]
        dh = {(3, j): resid * V[j] for j in range(1, H + 1)}
        dp = {g: {} for g in _GATES}
        dc = {}
        for t in (3, 2, 1):
            for j in range(1, H + 1):
                dp["o"][(t, j)] = np.where(
                    np.abs(pre["o"][(t, j)]) < 2.5,
                    dh[(t, j)] * th[(t, j)] * 0.2,
                    0.0,
                )
                base_dc = np.where(
                    np.abs(c[(t, j)]) < 1.0, dh[(t, j)] * act["o"][(t, j)], 0.0
                )
                if t < 3:
                    base_dc = base_dc + dc[(t + 1, j)] * act["f"][(t + 1, j)]
                dc[(t, j)] = base_dc
            for j in range(1, H + 1):
                dp["i"][(t, j)] = np.where(
                    np.abs(pre["i"][(t, j)]) < 2.5,
                    dc[(t, j)] * act["g"][(t, j)] * 0.2,
                    0.0,
                )
                if t > 1:
                    dp["f"][(t, j)] = np.where(
                        np.abs(pre["f"][(t, j)]) < 2.5,
                        dc[(t, j)] * c[(t - 1, j)] * 0.2,
                        0.0,
                    )
                dp["g"][(t, j)] = np.where(
                    np.abs(pre["g"][(t, j)]) < 1.0,
                    dc[(t, j)] * act["i"][(t, j)],
                    0.0,
                )
            if t > 1:
                for k in range(1, H + 1):
                    e = None
                    for j in range(1, H + 1):
                        for g in _GATES:
                            term = W[g][j - 1][1 + k] * dp[g][(t, j)]
                            e = term if e is None else e + term
                    dh[(t - 1, k)] = e
        nc = int(((m >= 0.0) == (y == 1)).sum())
        gsum = {}
        for g in _GATES:
            ts = (2, 3) if g == "f" else (1, 2, 3)
            for j in range(1, H + 1):
                b = None
                for t in ts:
                    b = dp[g][(t, j)] if b is None else b + dp[g][(t, j)]
                gsum[f"gb{g}{j}"] = int(q6(b * 1000000.0).sum())
                u = None
                for t in ts:
                    term = dp[g][(t, j)] * zs_tr[t - 1]
                    u = term if u is None else u + term
                gsum[f"gu{g}{j}"] = int(q6(u * 1000000.0).sum())
                for k in range(1, H + 1):
                    rr = None
                    for t in (2, 3):
                        term = dp[g][(t, j)] * h[(t - 1, k)]
                        rr = term if rr is None else rr + term
                    gsum[f"gr{g}{j}_{k}"] = int(q6(rr * 1000000.0).sum())
        for g in _GATES:
            for j in range(1, H + 1):
                W[g][j - 1][0] -= _LSTMX_LR * (float(gsum[f"gb{g}{j}"]) / n6)
                W[g][j - 1][1] -= _LSTMX_LR * (float(gsum[f"gu{g}{j}"]) / n6)
                for k in range(1, H + 1):
                    W[g][j - 1][1 + k] -= _LSTMX_LR * (
                        float(gsum[f"gr{g}{j}_{k}"]) / n6
                    )
        V[0] -= _LSTMX_LR * (float(gvb) / n6)
        for j in range(1, H + 1):
            V[j] -= _LSTMX_LR * (float(gv[j - 1]) / n6)
        for g in _GATES:
            for j in range(1, H + 1):
                want.append(
                    (r, g, j, 0, gsum[f"gb{g}{j}"],
                     _lrgd_round_half_away(W[g][j - 1][0] * 1000000))
                )
                want.append(
                    (r, g, j, 1, gsum[f"gu{g}{j}"],
                     _lrgd_round_half_away(W[g][j - 1][1] * 1000000))
                )
                for k in range(1, H + 1):
                    want.append(
                        (r, g, j, 1 + k, gsum[f"gr{g}{j}_{k}"],
                         _lrgd_round_half_away(W[g][j - 1][1 + k] * 1000000))
                    )
        want.append((r, "out", 0, 0, gvb, _lrgd_round_half_away(V[0] * 1000000)))
        for j in range(1, H + 1):
            want.append(
                (r, "out", 0, j, gv[j - 1],
                 _lrgd_round_half_away(V[j] * 1000000))
            )
        want.append((r, "acc", 0, 0, nc, n))
    _, _, _, _, _, mt = forward(zs_te)
    yt = y_all[istest]
    pred = (mt >= 0.0).astype("int64")
    for uy in (0, 1):
        for up in (0, 1):
            cnt = int(((yt == uy) & (pred == up)).sum())
            if cnt:
                want.append((_LSTMX_ROUNDS, "cm", uy, up, cnt, 0))
    return want, n


@pytest.fixture(scope="module")
def rows(spark):
    return QUERIES["ml_lstm_exact"].fn(spark, SF).collect()


def test_lstm_exact_gd_matches_numpy_twin(rows):
    got = sorted(
        tuple(r[c] for c in ("round", "layer", "unit", "pidx", "grad_q", "w_q"))
        for r in rows
    )
    want, _ = _numpy_trajectory()
    assert got == sorted(want)


def test_lstm_exact_shape_and_cell_invariants(rows):
    H, R = _LSTMX_H, _LSTMX_ROUNDS
    by: dict = {}
    for r in rows:
        by.setdefault(r["layer"], []).append(r)
    # per gate: R rounds x H units x (bias + input + H recurrences)
    for g in _GATES:
        assert len(by[g]) == R * H * (2 + H)
    assert len(by["out"]) == R * (H + 1)
    assert len(by["acc"]) == R
    # ALL FOUR gates receive gradient in round 1; the forget gate's
    # nonzero gradient proves the cell-state carry dc_t*f is live
    # (c_{t-1} only reaches the loss through the carry chain)
    for g in _GATES:
        r1 = [r for r in by[g] if r["round"] == 1]
        assert any(r["grad_q"] != 0 for r in r1), f"gate {g} dead"
    # weights move off init for every gate
    W0, V0 = _lstmx_init()
    for g in _GATES:
        moved = [
            r
            for r in by[g]
            if r["round"] == R
            and r["w_q"]
            != _lrgd_round_half_away(W0[g][r["unit"] - 1][r["pidx"]] * 1e6)
        ]
        assert moved, f"gate {g} frozen"
    accs = sorted(by["acc"], key=lambda r: r["round"])
    n = accs[0]["w_q"]
    assert n > 0 and all(a["w_q"] == n for a in accs)
    import duckdb

    n_test = duckdb.sql(
        f"select count(*) from '{SF}/events.parquet' where event_id % 4 = 1"
    ).fetchone()[0]
    assert sum(r["grad_q"] for r in by["cm"]) == n_test
