"""Fused wrap-DP kernel v2 (lane layout + gathers) vs the scalar oracle
and the v1 fused kernel — counts, positions and argmax must be
bit-identical (the oracle is verified byte-level against the reference
binary, wrap_around_DP.c:222-354)."""

import numpy as np
import pytest

from mtr_tpu.ops.wrap_dp_fused2 import make_wrap_dp_fused2
from tests.test_wrap_dp_fused import oracle_counts, rand_jobs, SCHEMES


def run_fused2(jobs, r_pad, b=128):
    fn = make_wrap_dp_fused2(b, r_pad, interpret=True)
    reps = np.full((b, r_pad), -1, np.int8)
    units = np.full((b, 128), -2, np.int8)
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


def check2(jobs, r_pad):
    fused = run_fused2(jobs, r_pad)
    for q, (rep, unit, scheme) in enumerate(jobs):
        om, ox, oi, od, osc, ofin, obv, obi, obj = oracle_counts(
            rep, unit, *scheme
        )
        m, x, ins, dl, sc, fin, done = fused[q, :7]
        bv, bi, bj = fused[q, 8], fused[q, 9], fused[q, 10]
        got = (m, x, ins, dl, sc, fin, bv, bi, bj)
        want = (om, ox, oi, od, osc, ofin, obv, obi, obj)
        assert got == want, f"job {q} scheme {scheme}: {got} != {want}"


def test_fused2_small_fuzz():
    rng = np.random.default_rng(10)
    check2(rand_jobs(rng, 48, 60, 30), r_pad=128)


def test_fused2_tiny_units():
    rng = np.random.default_rng(11)
    check2(rand_jobs(rng, 48, 80, 7), r_pad=128)


def test_fused2_deletion_heavy():
    # ip=1 schemes make long in-row deletion chains (origin scan + the
    # circular wrap fix-up through the same row's last column)
    rng = np.random.default_rng(12)
    jobs = rand_jobs(rng, 32, 60, 30, scheme=(1, 3, 1), periodic=False)
    check2(jobs, r_pad=128)


def test_fused2_scheme511():
    rng = np.random.default_rng(13)
    check2(rand_jobs(rng, 32, 50, 20, scheme=(5, 1, 1)), r_pad=128)


def test_fused2_unit_at_lane_boundary():
    # unit_len == 128 == the full lane span: wrap gathers hit lane 127
    rng = np.random.default_rng(14)
    jobs = []
    for _ in range(8):
        unit = rng.integers(0, 4, 128).astype(np.int32)
        rep = np.tile(unit, 4)[:400].copy()
        rep[::11] = rng.integers(0, 4, len(rep[::11]))
        jobs.append((rep.astype(np.int32), unit, (1, 1, 3)))
    check2(jobs, r_pad=512)


def test_fused2_multi_tile():
    # rep_len spanning several 128-row grid tiles (state carried in
    # scratch across grid steps)
    rng = np.random.default_rng(15)
    check2(rand_jobs(rng, 12, 500, 60), r_pad=512)


def test_fused2_empty_and_degenerate():
    jobs = [
        (np.zeros(1, np.int32), np.array([1, 2], np.int32), (1, 1, 3)),
        (np.array([3], np.int32), np.array([3, 3], np.int32), (1, 1, 3)),
        (np.zeros(5, np.int32), np.zeros(2, np.int32) + 2, (1, 3, 1)),
    ]
    check2(jobs, r_pad=128)


def test_fused2_unpacked_bucket():
    # r_pad > 16384 switches to the unpacked aux path (three payload
    # planes instead of the packed (m, ins) pair) — same results
    rng = np.random.default_rng(17)
    jobs = rand_jobs(rng, 8, 300, 40)
    jobs += rand_jobs(rng, 4, 200, 25, scheme=(1, 3, 1), periodic=False)
    check2(jobs, r_pad=32768)


@pytest.mark.slow
def test_fused2_large_fuzz():
    rng = np.random.default_rng(16)
    check2(rand_jobs(rng, 24, 400, 120), r_pad=512)
