"""Device-resident read feeding for the fused wrap-DP kernels.

The reference fills each DP matrix from `orgInputString + query_start`
(wrap_around_DP.c:237-244) — every job's rep stream is a SEGMENT of the
read already sitting in memory.  Round 2 re-uploaded that segment per
job row ((B, r_pad) int32 padding buffers, hundreds of MB per chunk on
long-read workloads); here the batch's reads are uploaded ONCE as a flat
int8 array and each chunk's segments are gathered ON DEVICE with a
vmapped dynamic_slice (pure HBM traffic, measured ~free vs the kernel).

Correctness notes:
  * A segment gather may run past its own read into the next read's
    bases (rep_len < r_pad always): harmless, both kernels mask rows
    beyond scal[:, 0] (= rep_len) before any value is used.
  * The flat array carries >= R_BUCKETS[-1] trailing slack so
    dynamic_slice never clamps (a clamp would silently shift the
    segment).
  * Padded (unused) chunk rows use start = 0 with rep_len = 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gather_segments(flat, starts, r_pad: int):
    """(B,) starts -> (B, r_pad) int8 segments of the 1-D flat array."""
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(flat, (s,), (r_pad,))
    )(starts)


@functools.lru_cache(maxsize=64)
def get_wrap_dp_fused2_resident(b: int, r_pad: int, n_sub: int = 1):
    from mtr_tpu.ops.wrap_dp_fused2 import make_wrap_dp_fused2

    interpret = jax.default_backend() == "cpu"
    inner = make_wrap_dp_fused2(b, r_pad, interpret=interpret,
                                n_sub=n_sub)

    def fn(flat, starts, scal, unit):
        rep = _gather_segments(flat, starts, r_pad)
        return inner(scal, rep, unit)

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def get_wrap_dp_fused2w_resident(b: int, r_pad: int, u_span: int = 256,
                                 n_sub: int = 1):
    from mtr_tpu.ops.wrap_dp_fused2w import make_wrap_dp_fused2w

    interpret = jax.default_backend() == "cpu"
    inner = make_wrap_dp_fused2w(b, r_pad, u_span, interpret=interpret,
                                 n_sub=n_sub)

    def fn(flat, starts, scal, unit):
        rep = _gather_segments(flat, starts, r_pad)
        return inner(scal, rep, unit)

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def get_wrap_dp_consensus_resident(b: int, u_pad: int, r_pad: int,
                                   factor: int):
    """Resident consensus-mode pipeline in ONE dispatch: gather reps,
    Pallas fill (move tensor stays on device), bounded traceback to the
    (B, 500, 9) consensus/missing tensor.  factor bounds the traceback
    steps (see ops/wrap_dp_pallas.py)."""
    from mtr_tpu.ops.wrap_dp_pallas import (
        MAX_PERIOD,
        make_wrap_dp_pallas,
        traceback_consensus_batch_n,
    )

    interpret = jax.default_backend() == "cpu"
    fill = make_wrap_dp_pallas(b, u_pad, r_pad, interpret=interpret)
    steps = r_pad * factor + 2 * MAX_PERIOD

    def fn(flat, starts, scal, unit):
        rep = _gather_segments(flat, starts, r_pad).astype(jnp.int32)
        moves, best = fill(scal, rep, unit.astype(jnp.int32))
        return traceback_consensus_batch_n(
            steps, u_pad, moves, rep, scal[:, 1], best)

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def get_wrap_dp_fused_resident(b: int, u_pad: int, r_pad: int):
    from mtr_tpu.ops.wrap_dp_fused import make_wrap_dp_fused

    interpret = jax.default_backend() == "cpu"
    inner = make_wrap_dp_fused(b, u_pad, r_pad, interpret=interpret)

    def fn(flat, starts, scal, unit):
        # v1 computes in int32; the cast rides the same fusion as the
        # gather, so host traffic stays int8-sized
        rep = _gather_segments(flat, starts, r_pad).astype(jnp.int32)
        return inner(scal, rep, unit.astype(jnp.int32))

    return jax.jit(fn)
