"""Pallas fill kernel + device traceback vs the oracle (interpret mode
on the CPU test mesh)."""

import numpy as np
import pytest

from mtr_tpu.oracle.wrap_dp import wrap_dp_fill, traceback
from mtr_tpu.ops.wrap_dp_pallas import (
    get_wrap_dp_pallas,
    traceback_counts_batch,
    traceback_consensus_batch,
)


def oracle_all(rep, unit, mg, mp, ip):
    D, w, i, j = wrap_dp_fill(rep, unit, mg, mp, ip)
    path, i_final = traceback(D, w, i, j, rep, unit, mg, mp, ip)
    n = {k: sum(1 for mv, _, _ in path if mv == k) for k in "MXID"}
    return (w, i, j), (n["M"], n["X"], n["I"], n["D"]), i_final, path


def build_batch(rng, n, u_pad, r_pad, scheme):
    reps = np.full((n, r_pad), -1, np.int32)
    units = np.full((n, u_pad), -2, np.int32)
    scal = np.zeros((n, 8), np.int32)
    cases = []
    for b in range(n):
        ul = int(rng.integers(2, min(u_pad, 40)))
        rl = int(rng.integers(10, r_pad))
        unit = rng.integers(0, 4, ul)
        rep = np.tile(unit, rl // ul + 1)[:rl].copy()
        nse = rng.integers(0, rl, max(1, rl // 8))
        rep[nse] = rng.integers(0, 4, len(nse))
        reps[b, :rl] = rep
        units[b, :ul] = unit
        scal[b, 0] = rl
        scal[b, 1] = ul
        scal[b, 2:5] = scheme
        cases.append((rep, unit))
    return scal, reps, units, cases


@pytest.mark.parametrize("scheme", [(1, 1, 3), (1, 3, 1), (5, 1, 1)])
def test_pallas_fill_and_counts(scheme):
    rng = np.random.default_rng(7)
    u_pad, r_pad, n = 128, 256, 8
    scal, reps, units, cases = build_batch(rng, n, u_pad, r_pad, scheme)
    fn = get_wrap_dp_pallas(scal.shape[0], u_pad, r_pad)
    moves, best = fn(scal, reps, units)
    fused = np.asarray(
        traceback_counts_batch(moves, reps, units, scal[:, 1].copy(), best)
    )
    res = fused[:, :7]
    best = np.asarray(best)
    for b, (rep, unit) in enumerate(cases):
        (w0, i0, j0), counts0, ifin0, _ = oracle_all(rep, unit, *scheme)
        assert (best[b, 1], best[b, 2], best[b, 3]) == (w0, i0, j0), f"argmax b={b}"
        assert tuple(res[b, :4]) == counts0, f"counts b={b}"
        assert res[b, 5] == ifin0


def test_pallas_consensus_matches_oracle():
    rng = np.random.default_rng(3)
    u_pad, r_pad = 128, 256
    scal, reps, units, cases = build_batch(rng, 8, u_pad, r_pad, (5, 1, 1))
    fn = get_wrap_dp_pallas(scal.shape[0], u_pad, r_pad)
    moves, best = fn(scal, reps, units)
    fused = np.asarray(
        traceback_consensus_batch(moves, reps, scal[:, 1].copy(), best)
    )
    cons, miss = fused[:, :, :5], fused[:, :, 5:]
    for b, (rep, unit) in enumerate(cases):
        _, _, _, path = oracle_all(rep, unit, 5, 1, 1)
        c0 = np.zeros((500, 5), np.int64)
        m0 = np.zeros((500, 4), np.int64)
        for mv, i, j in path:
            if mv in "MX":
                c0[j][rep[i - 1]] += 1
            elif mv == "D":
                c0[j][4] += 1
            else:
                m0[j][rep[i - 1]] += 1
        assert np.array_equal(cons[b], c0)
        assert np.array_equal(miss[b], m0)
