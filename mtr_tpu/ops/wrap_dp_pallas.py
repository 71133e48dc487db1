"""Pallas TPU kernel for the batched wrap-around DP fill, plus a
device-side traceback.

Why Pallas: the pure-XLA scan formulation (ops/wrap_dp.py) compiles
pathologically slowly on TPU backends (minutes per shape bucket) and
materializes move tensors that would have to cross the slow host link.
Here the fill is a hand-written Mosaic kernel (compiles in seconds) and
the traceback runs on device, so only tiny count/consensus arrays are
ever pulled to the host.

Data layout: the query batch rides the SUBLANE dim and the unit the
LANE dim, so one (B, u_pad) VPU op advances B DP rows at once:

  rep   (B, r_pad)  int32   unit (B, u_pad) int32   scal (B, 8) int32
  moves (B, r_pad, u_pad) uint8   best (B, 8) int32

Grid = (row_tiles,), sequential; the previous DP row, wrap column and
running argmax persist in VMEM scratch across tiles.  The in-row
deletion chain D[j] = max(m[j], D[j-1]-IP) — which resets at match
cells and at j==1 (wrap_around_DP.c:269-274) — is a Hillis-Steele scan
over composed (max,+) affine maps: log2(u_pad) roll+max steps.

Move codes (0 stop / 1 diag / 2 del / 3 ins) are chosen with the
traceback precedence match > mismatch > deletion > insertion evaluated
on final neighbor values — including the wrap column
D[i][0] = D[i][unit_len] that the fill itself never uses at j==1 but
the traceback does (wrap_around_DP.c:302).  Moves row r = DP row r+1.

The traceback is a vmapped lax.while_loop over the move buffer —
sequential by nature, but each step is one batched gather; counts and
the polish consensus/missing matrices are bit-identical to the scalar
reference walk (wrap_around_DP.c:294-333, consensus.c:931-962).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = np.int32(-(2**30))
MAX_PERIOD = 500

# VMEM budget keeps B * r_tile * u_pad * 4 bytes ~ 4 MB
_VMEM_MV_BYTES = 4 << 20


def _fill_kernel(b: int, u_pad: int, r_tile: int):
    log2u = int(np.log2(u_pad))
    assert 1 << log2u == u_pad

    def kernel(scal_ref, match_ref, moves_ref, best_ref, prev_ref, mv_ref, st_ref):
        rt = pl.program_id(0)
        n_rt = pl.num_programs(0)
        rep_len = scal_ref[:, 0:1]   # (B, 1)
        unit_len = scal_ref[:, 1:2]
        mg = scal_ref[:, 2:3]
        mp = scal_ref[:, 3:4]
        ip = scal_ref[:, 4:5]

        jidx = jax.lax.broadcasted_iota(jnp.int32, (b, u_pad), 1)
        base = rt * r_tile

        # masks as int32 0/1 — Mosaic rejects some broadcasted i1 relayouts,
        # so all selects below are arithmetic blends
        lane_ok = (jidx < unit_len).astype(jnp.int32)
        wrap_sel = (jidx == unit_len - 1).astype(jnp.int32)
        j0 = (jidx == 0).astype(jnp.int32)
        notj0 = 1 - j0
        shmasks = [(jidx >= (1 << s)).astype(jnp.int32) for s in range(log2u)]

        @pl.when(rt == 0)
        def _():
            prev_ref[...] = jnp.zeros((b, u_pad), jnp.int32)
            st_ref[...] = jnp.zeros((b, 8), jnp.int32)

        max_rep_len = jnp.max(scal_ref[:, 0])

        @pl.when(base < max_rep_len)
        def _():
            def row_step(r, _):
                i = base + r + 1  # 1-origin DP row
                prev = prev_ref[...]
                st = st_ref[...]
                wrap_prev = st[:, 0:1]
                rolled = pltpu.roll(prev, 1, axis=1)
                diag = rolled * notj0 + wrap_prev * j0
                mi = match_ref[r].astype(jnp.int32)  # dim-0 dynamic index
                nmi = 1 - mi
                m_nomatch = jnp.maximum(0, jnp.maximum(diag - mp, prev - ip))
                m = mi * (diag + mg) + nmi * m_nomatch
                # deletion chain: scan of f_j(x) = max(a_j, x + c_j)
                a = m
                reset = jnp.maximum(mi, j0)
                c = reset * NEG + (1 - reset) * (-ip)
                for s in range(log2u):
                    sh = 1 << s
                    a_sh = pltpu.roll(a, sh, axis=1)
                    c_sh = pltpu.roll(c, sh, axis=1)
                    sm = shmasks[s]
                    nsm = 1 - sm
                    a = sm * jnp.maximum(a, a_sh + c) + nsm * a
                    c = sm * jnp.maximum(c + c_sh, NEG) + nsm * c
                row = mi * m + nmi * a
                validi = (i <= rep_len).astype(jnp.int32)  # (B, 1)
                ok = lane_ok * validi
                row = row * ok
                wrap_val = jnp.sum(row * wrap_sel, axis=1, keepdims=True)

                left = pltpu.roll(row, 1, axis=1) * notj0 + wrap_val * j0
                e2 = (row == diag - mp).astype(jnp.int32)
                e3 = (row == left - ip).astype(jnp.int32)
                e4 = (row == prev - ip).astype(jnp.int32)
                mv = mi + (1 - mi) * (e2 + (1 - e2) * (2 * e3 + (1 - e3) * 3 * e4))
                pos = (row > 0).astype(jnp.int32) * ok
                mv_ref[r] = mv * pos  # (r_tile, B, u_pad) scratch, dim-0 index

                masked = row * ok - (1 - ok)  # row where ok else -1
                row_max = jnp.max(masked, axis=1, keepdims=True)
                ismax = (masked == row_max).astype(jnp.int32)
                row_arg = jnp.min(
                    jidx * ismax + (u_pad + 1) * (1 - ismax),
                    axis=1,
                    keepdims=True,
                )
                better = (row_max > st[:, 1:2]).astype(jnp.int32)  # (B, 1)
                nb = 1 - better
                new_bv = better * row_max + nb * st[:, 1:2]
                new_bi = better * i + nb * st[:, 2:3]
                new_bj = better * (row_arg + 1) + nb * st[:, 3:4]
                st_ref[...] = jnp.concatenate(
                    [wrap_val, new_bv, new_bi, new_bj, st[:, 4:]], axis=1
                )
                prev_ref[...] = row
                return 0

            jax.lax.fori_loop(0, r_tile, row_step, 0)
            moves_ref[...] = mv_ref[...].astype(jnp.uint8)

        @pl.when(rt == n_rt - 1)
        def _():
            best_ref[...] = st_ref[...]

    return kernel


def make_wrap_dp_pallas(b: int, u_pad: int, r_pad: int, interpret: bool = False):
    """Batched fill for a (B, u_pad, r_pad) bucket.  Inputs:
      scal (B, 8) int32: rep_len, unit_len, mg, mp, ip, 0, 0, 0
      rep  (B, r_pad) int32 (pad -1), unit (B, u_pad) int32 (pad -2)
    Outputs: moves (r_pad, B, u_pad) uint8 [row r = DP row r+1],
             best (B, 8) int32 [wrap, best_val, best_i, best_j, ...].

    The match matrix rep[b,i]==unit[b,j] is precomputed by XLA in the
    row-major (r_pad, B, u_pad) layout the kernel wants, so the kernel
    needs no lane-dim dynamic indexing (Mosaic restriction).
    """
    # VMEM per grid step: mv scratch 4B/cell + double-buffered match in
    # and moves out at 1B/cell each (x2 buffers) = 8B per (b, u, r_tile)
    # cell, plus ~12 live (b, u_pad) int32 temporaries in the row body
    # (Mosaic spills them to the VMEM stack).  Budget 10 MB total.
    budget = (10 << 20) - 12 * b * u_pad * 4
    r_tile = max(1, budget) // (b * u_pad) // 8
    r_tile = max(1, min(r_pad, r_tile))
    while r_pad % r_tile:
        r_tile -= 1
    n_rt = r_pad // r_tile

    kernel = _fill_kernel(b, u_pad, r_tile)

    def fn(scal, rep, unit):
        # match[i, b, j] = rep[b, i] == unit[b, j]
        match = (rep.T[:, :, None] == unit[None, :, :]).astype(jnp.uint8)
        return pl.pallas_call(
            kernel,
            grid=(n_rt,),
            in_specs=[
                pl.BlockSpec((b, 8), lambda rt: (0, 0)),
                pl.BlockSpec((r_tile, b, u_pad), lambda rt: (rt, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((r_tile, b, u_pad), lambda rt: (rt, 0, 0)),
                pl.BlockSpec((b, 8), lambda rt: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((r_pad, b, u_pad), jnp.uint8),
                jax.ShapeDtypeStruct((b, 8), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((b, u_pad), jnp.int32),
                pltpu.VMEM((r_tile, b, u_pad), jnp.int32),
                pltpu.VMEM((b, 8), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(scal, match)

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# device traceback (counts + consensus)
#
# A data-dependent while_loop executes pathologically on proxied TPU
# backends, so the walk is a BOUNDED fori_loop with masked no-ops after
# the path ends.  The bound is provable: every path step consumes a read
# base or a deletion, deletions satisfy #del*IP <= MG*#match (the local
# score stays >= 0), so steps <= rep_len*(1 + MG/IP).  Callers pass
# steps = r_pad * factor with factor in {2, 6} per scheme group.
# ---------------------------------------------------------------------------


def _tb_counts_single(steps, u_pad, row_stride, moves_flat, qoff, rep, unit, unit_len, best):
    bi, bj = best[2], best[3]
    j0 = jnp.where(bj == 0, unit_len, bj)

    def step(_, st):
        i, j, c, done = st
        # flat 1-D gather on the UNBATCHED move buffer: a batched gather
        # on a (r, B, u) operand makes XLA relayout it every iteration
        idx = (i - 1) * row_stride + qoff + (j - 1)
        mv = jnp.where(done, 0, moves_flat[idx].astype(jnp.int32))
        stop = mv == 0
        is_diag = mv == 1
        is_del = mv == 2
        is_ins = mv == 3
        eq = rep[i - 1] == unit[j - 1]
        c = c.at[0].add(jnp.where(is_diag & eq, 1, 0))
        c = c.at[1].add(jnp.where(is_diag & ~eq, 1, 0))
        c = c.at[2].add(jnp.where(is_ins, 1, 0))
        c = c.at[3].add(jnp.where(is_del, 1, 0))
        ni = jnp.where(is_diag | is_ins, i - 1, i)
        nj = jnp.where(is_diag | is_del, j - 1, j)
        nj = jnp.where(nj == 0, unit_len, nj)
        i = jnp.where(stop, i, ni)
        j = jnp.where(stop, j, nj)
        done = done | stop | (i <= 0)
        return (i, j, c, done)

    init = (bi, j0, jnp.zeros(4, jnp.int32), bi <= 0)
    i, j, c, done = jax.lax.fori_loop(0, steps, step, init)
    scanned = c[0] + c[1] + c[3]
    return jnp.array([c[0], c[1], c[2], c[3], scanned, i, done], jnp.int32)


def _tb_consensus_single(steps, u_pad, row_stride, moves_flat, qoff, rep, unit_len, best):
    bi, bj = best[2], best[3]
    j0 = jnp.where(bj == 0, unit_len, bj)
    cons0 = jnp.zeros((MAX_PERIOD, 5), jnp.int32)
    miss0 = jnp.zeros((MAX_PERIOD, 4), jnp.int32)

    def step(_, st):
        i, j, cons, miss, done = st
        idx = (i - 1) * row_stride + qoff + (j - 1)
        mv = jnp.where(done, 0, moves_flat[idx].astype(jnp.int32))
        stop = mv == 0
        is_diag = mv == 1
        is_del = mv == 2
        is_ins = mv == 3
        base = rep[i - 1]
        cons = cons.at[j, base].add(jnp.where(is_diag, 1, 0))
        cons = cons.at[j, 4].add(jnp.where(is_del, 1, 0))
        miss = miss.at[j, base].add(jnp.where(is_ins, 1, 0))
        ni = jnp.where(is_diag | is_ins, i - 1, i)
        nj = jnp.where(is_diag | is_del, j - 1, j)
        nj = jnp.where(nj == 0, unit_len, nj)
        i = jnp.where(stop, i, ni)
        j = jnp.where(stop, j, nj)
        done = done | stop | (i <= 0)
        return (i, j, cons, miss, done)

    init = (bi, j0, cons0, miss0, bi <= 0)
    _, _, cons, miss, _ = jax.lax.fori_loop(0, steps, step, init)
    return cons, miss


@functools.partial(jax.jit, static_argnums=(0, 1))
def traceback_counts_batch_n(steps, u_pad, moves, reps, units, unit_lens, best):
    """moves has layout (r_pad, B, u_pad); other args lead with B.
    Returns ONE fused (B, 15) array [7 traceback cols | 8 best cols] so a
    chunk costs a single device->host pull.  Column 6 is a done flag
    (0 = the step bound was too small — never expected; asserted)."""
    r_pad, b, _ = moves.shape
    row_stride = b * u_pad
    moves_flat = moves.reshape(-1)
    qoffs = jnp.arange(b, dtype=jnp.int32) * u_pad
    f = functools.partial(_tb_counts_single, steps, u_pad, row_stride)
    res = jax.vmap(f, in_axes=(None, 0, 0, 0, 0, 0))(
        moves_flat, qoffs, reps, units, unit_lens, best
    )
    return jnp.concatenate([res, best], axis=1)


@functools.partial(jax.jit, static_argnums=(0, 1))
def traceback_consensus_batch_n(steps, u_pad, moves, reps, unit_lens, best):
    """Returns ONE fused (B, 500, 9) array [consensus(5) | missing(4)]."""
    r_pad, b, _ = moves.shape
    row_stride = b * u_pad
    moves_flat = moves.reshape(-1)
    qoffs = jnp.arange(b, dtype=jnp.int32) * u_pad
    f = functools.partial(_tb_consensus_single, steps, u_pad, row_stride)
    cons, miss = jax.vmap(f, in_axes=(None, 0, 0, 0, 0))(
        moves_flat, qoffs, reps, unit_lens, best
    )
    return jnp.concatenate([cons, miss], axis=2)


def traceback_counts_batch(moves, reps, units, unit_lens, best, factor=6):
    steps = moves.shape[0] * factor + 2 * MAX_PERIOD
    return traceback_counts_batch_n(
        steps, moves.shape[2], moves, reps, units, unit_lens, best
    )


def traceback_consensus_batch(moves, reps, unit_lens, best, factor=6):
    steps = moves.shape[0] * factor + 2 * MAX_PERIOD
    return traceback_consensus_batch_n(
        steps, moves.shape[2], moves, reps, unit_lens, best
    )


@functools.lru_cache(maxsize=64)
def get_wrap_dp_pallas(b: int, u_pad: int, r_pad: int):
    interpret = jax.default_backend() == "cpu"
    return make_wrap_dp_pallas(b, u_pad, r_pad, interpret=interpret)
