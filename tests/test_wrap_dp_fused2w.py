"""Wide (u_span=256, right-aligned) fused wrap-DP kernel vs the scalar
oracle — counts, positions and argmax must be bit-identical (the oracle
is verified byte-level against the reference binary,
wrap_around_DP.c:222-354)."""

import numpy as np
import pytest

from mtr_tpu.ops.wrap_dp_fused2w import make_wrap_dp_fused2w
from tests.test_wrap_dp_fused import oracle_counts, rand_jobs


def run_fused2w(jobs, r_pad, u_span=256, b=64):
    fn = make_wrap_dp_fused2w(b, r_pad, u_span, interpret=True)
    reps = np.full((b, r_pad), -1, np.int8)
    units = np.full((b, u_span), -2, np.int8)
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


def check2w(jobs, r_pad, u_span=256):
    fused = run_fused2w(jobs, r_pad, u_span)
    for q, (rep, unit, scheme) in enumerate(jobs):
        om, ox, oi, od, osc, ofin, obv, obi, obj = oracle_counts(
            rep, unit, *scheme
        )
        m, x, ins, dl, sc, fin, done = fused[q, :7]
        bv, bi, bj = fused[q, 8], fused[q, 9], fused[q, 10]
        got = (m, x, ins, dl, sc, fin, bv, bi, bj)
        want = (om, ox, oi, od, osc, ofin, obv, obi, obj)
        assert got == want, f"job {q} scheme {scheme}: {got} != {want}"


def test_fused2w_long_units():
    # units 129-256: past the single-vreg gather span (split gathers)
    rng = np.random.default_rng(20)
    jobs = []
    for ul in (129, 150, 200, 255, 256):
        unit = rng.integers(0, 4, ul).astype(np.int32)
        rep = np.tile(unit, 3)[: ul * 2 + 37].copy()
        rep[::13] = rng.integers(0, 4, len(rep[::13]))
        jobs.append((rep, unit, (1, 1, 3)))
        jobs.append((rep, unit, (1, 3, 1)))
    check2w(jobs, r_pad=1024)


def test_fused2w_small_units_right_aligned():
    # short units sit at the top lanes; left lanes are dead padding
    rng = np.random.default_rng(21)
    check2w(rand_jobs(rng, 32, 60, 30), r_pad=128)
    check2w(rand_jobs(rng, 32, 80, 7), r_pad=128)


def test_fused2w_deletion_heavy():
    # ip=1 opens long in-row deletion chains crossing the 128-lane
    # half boundary (split-gather correctness) and the wrap fix-up
    rng = np.random.default_rng(22)
    jobs = rand_jobs(rng, 16, 80, 40, scheme=(1, 3, 1), periodic=False)
    for ul in (140, 200):
        unit = rng.integers(0, 4, ul).astype(np.int32)
        rep = rng.integers(0, 4, 3 * ul).astype(np.int32)
        jobs.append((rep, unit, (1, 3, 1)))
    check2w(jobs, r_pad=1024)


def test_fused2w_scheme511():
    rng = np.random.default_rng(23)
    check2w(rand_jobs(rng, 16, 50, 20, scheme=(5, 1, 1)), r_pad=128)


def test_fused2w_multi_tile():
    # rep_len spanning several grid tiles (scratch state carryover)
    rng = np.random.default_rng(24)
    jobs = []
    for ul in (150, 200):
        unit = rng.integers(0, 4, ul).astype(np.int32)
        rep = np.tile(unit, 4)[: ul * 3 + 11].copy()
        rep[::7] = rng.integers(0, 4, len(rep[::7]))
        jobs.append((rep, unit, (1, 1, 3)))
    check2w(jobs, r_pad=1024)


def test_fused2w_pack2_bucket():
    # r_pad = 32768: the largest two-scan packed-aux bucket
    rng = np.random.default_rng(25)
    jobs = rand_jobs(rng, 6, 300, 40)
    unit = rng.integers(0, 4, 200).astype(np.int32)
    rep = np.tile(unit, 3)[:500].copy()
    rep[::9] = rng.integers(0, 4, len(rep[::9]))
    jobs.append((rep, unit, (1, 1, 3)))
    check2w(jobs, r_pad=32768)


def test_fused2w_three_scan_bucket():
    # r_pad > 32768: counts exceed 15 bits, three one-payload scans
    # (rows stay small — tile-skip bounds the grid walk)
    rng = np.random.default_rng(26)
    jobs = rand_jobs(rng, 4, 250, 35)
    check2w(jobs, r_pad=65536)


def test_fused2w_degenerate():
    jobs = [
        (np.zeros(1, np.int32), np.array([1, 2], np.int32), (1, 1, 3)),
        (np.array([3], np.int32), np.array([3, 3], np.int32), (1, 1, 3)),
        (np.zeros(5, np.int32), np.zeros(2, np.int32) + 2, (1, 3, 1)),
    ]
    check2w(jobs, r_pad=128)
