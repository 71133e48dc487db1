"""Fused wrap-DP kernel vs the scalar oracle — counts, positions and
argmax must be bit-identical (the oracle itself is verified byte-level
against the reference binary, wrap_around_DP.c:222-354)."""

import numpy as np
import pytest

from mtr_tpu.oracle.wrap_dp import wrap_dp_fill, traceback
from mtr_tpu.ops.wrap_dp_fused import make_wrap_dp_fused, fused_limits

SCHEMES = ((1, 1, 3), (1, 3, 1), (5, 1, 1))


def oracle_counts(rep, unit, mg, mp, ip):
    D, max_wrd, max_i, max_j = wrap_dp_fill(rep, unit, mg, mp, ip)
    path, i_final = traceback(D, max_wrd, max_i, max_j, rep, unit, mg, mp, ip)
    n = {"M": 0, "X": 0, "I": 0, "D": 0}
    for mv, _, _ in path:
        n[mv] += 1
    scanned = n["M"] + n["X"] + n["D"]
    return (n["M"], n["X"], n["I"], n["D"], scanned, i_final,
            max_wrd, max_i, max_j)


def run_fused(jobs, u_pad, r_pad, b=128):
    fn = make_wrap_dp_fused(b, u_pad, r_pad, interpret=True)
    reps = np.full((b, r_pad), -1, np.int32)
    units = np.full((b, u_pad), -2, np.int32)
    scal = np.zeros((b, 8), np.int32)
    scal[:, 1] = 2
    scal[:, 2:5] = 1
    units[:, :2] = 0
    for q, (rep, unit, scheme) in enumerate(jobs):
        reps[q, : len(rep)] = rep
        units[q, : len(unit)] = unit
        scal[q, 0] = len(rep)
        scal[q, 1] = len(unit)
        scal[q, 2:5] = scheme
    return np.asarray(fn(scal, reps, units))


def check(jobs, u_pad, r_pad):
    fused = run_fused(jobs, u_pad, r_pad)
    for q, (rep, unit, scheme) in enumerate(jobs):
        om, ox, oi, od, osc, ofin, obv, obi, obj = oracle_counts(
            rep, unit, *scheme
        )
        m, x, ins, dl, sc, fin, done = fused[q, :7]
        bv, bi, bj = fused[q, 8], fused[q, 9], fused[q, 10]
        got = (m, x, ins, dl, sc, fin, bv, bi, bj)
        want = (om, ox, oi, od, osc, ofin, obv, obi, obj)
        assert got == want, f"job {q} scheme {scheme}: {got} != {want}"


def rand_jobs(rng, n, max_rep, max_unit, scheme=None, periodic=True):
    jobs = []
    for _ in range(n):
        rep_len = int(rng.integers(1, max_rep + 1))
        unit_len = int(rng.integers(2, max_unit + 1))
        unit = rng.integers(0, 4, unit_len).astype(np.int32)
        if periodic and rng.random() < 0.7:
            rep = np.tile(unit, rep_len // unit_len + 1)[:rep_len].copy()
            # sprinkle errors
            n_err = max(1, rep_len // 8)
            idx = rng.integers(0, rep_len, n_err)
            rep[idx] = rng.integers(0, 4, n_err)
        else:
            rep = rng.integers(0, 4, rep_len).astype(np.int32)
        sch = scheme or SCHEMES[int(rng.integers(0, len(SCHEMES)))]
        jobs.append((rep.astype(np.int32), unit, sch))
    return jobs


def test_fused_small_fuzz():
    rng = np.random.default_rng(0)
    check(rand_jobs(rng, 48, 60, 30), u_pad=32, r_pad=64)


def test_fused_tiny_units():
    # unit_len 2..7 exercise the u_pad=8 bucket and dense wrap traffic
    rng = np.random.default_rng(1)
    check(rand_jobs(rng, 48, 80, 7), u_pad=8, r_pad=128)


def test_fused_deletion_heavy():
    # ip=1 schemes make long in-row deletion chains (the packed-scan
    # copy path and the circular wrap fix-up)
    rng = np.random.default_rng(2)
    jobs = rand_jobs(rng, 32, 60, 30, scheme=(1, 3, 1), periodic=False)
    check(jobs, u_pad=32, r_pad=64)


def test_fused_scheme511():
    rng = np.random.default_rng(3)
    check(rand_jobs(rng, 32, 50, 20, scheme=(5, 1, 1)), u_pad=32, r_pad=64)


def test_fused_unit_at_pad_boundary():
    # unit_len == u_pad: the wrap column is the last sublane
    rng = np.random.default_rng(4)
    jobs = []
    for _ in range(16):
        unit = rng.integers(0, 4, 8).astype(np.int32)
        rep = np.tile(unit, 6)[:40].copy()
        rep[::7] = rng.integers(0, 4, len(rep[::7]))
        jobs.append((rep.astype(np.int32), unit, (1, 1, 3)))
    check(jobs, u_pad=8, r_pad=64)


def test_fused_empty_and_degenerate():
    jobs = [
        (np.zeros(1, np.int32), np.array([1, 2], np.int32), (1, 1, 3)),
        (np.array([3], np.int32), np.array([3, 3], np.int32), (1, 1, 3)),
        (np.zeros(5, np.int32), np.zeros(2, np.int32) + 2, (1, 3, 1)),
    ]
    check(jobs, u_pad=8, r_pad=8)


def test_fused_limits_cover_production():
    # the packing constants must admit every production job shape:
    # MG=1 jobs up to 1M rows, (5,1,1) polish jobs up to ~10.5k rows
    for u_pad in (8, 32, 128, 512):
        big, k = fused_limits(u_pad)
        assert 1_048_576 * 1 + 3 * u_pad < min(big, k)
        assert 10_500 * 5 + 1 * u_pad < min(big, k)


@pytest.mark.slow
def test_fused_large_fuzz():
    rng = np.random.default_rng(5)
    check(rand_jobs(rng, 24, 400, 120), u_pad=128, r_pad=512)
