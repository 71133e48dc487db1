"""Fused Pallas TPU kernel: wrap-around DP fill WITH traceback counts in
one pass — no move tensor, no separate traceback program.

Round-1's device path (ops/wrap_dp_pallas.py) materialized a
(r_pad, B, u_pad) uint8 move tensor in HBM and walked it with a long
sequential gather loop; both the bandwidth and the extra dispatch made
the device path lose to the host engine.  This kernel removes both:

  * Layout is (u_pad, B): the unit rides the SUBLANE dim and the query
    batch the LANE dim, so the per-row match vector is one (1, B) read
    from a transposed rep tensor broadcast across sublanes — the
    (r_pad, B, u_pad) match tensor of the old kernel is never built.
  * Traceback counts are PROPAGATED THROUGH THE FILL.  For every cell
    we carry aux planes (num_matches m, num_insertions ins, path start
    row si) selected from the predecessor chosen by the traceback's
    fixed precedence match > mismatch > deletion > insertion evaluated
    on final values (wrap_around_DP.c:294-333).  The remaining two
    counts are derived EXACTLY from two path identities:
        D      = m*MG - x*MP - (ins + del)*IP      (score identity)
        max_i - i_final = m + x + ins              (read consumption)
    so x and del never need their own planes.

The in-row deletion chain (D[i][j] = max(base_j, D[i][j-1] - IP),
resetting at match cells and j==1 — wrap_around_DP.c:269-274) is solved
for VALUES with the segmented-running-max trick (m + IP*j + seg*BIG,
one cumsum scan + one max scan); for AUX the chain is a PURE COPY from
the nearest previous non-deletion cell (deletion moves add nothing to
m/ins/si), which a single packed running-max scan per plane computes:
key_j = j*K + payload_j at non-deletion cells, -1 at deletion cells;
the prefix max picks the nearest origin and carries its payload.

Cells whose whole prefix is deletion moves chain through the wrap
column into the SAME row's last column (the traceback's j==0 -> unit_len
wrap, wrap_around_DP.c:330); a full circular chain is impossible (it
would imply row[ul-1] == row[ul-1] - ul*IP), so the last column's aux is
always chain-free and one fix-up pass resolves wrapped lanes exactly.

Bounds (asserted by the batcher): rep_len*MG + IP*u_pad must stay below
both BIG = 2^(30-log2u) (segment separation) and K = 2^(31-log2u)
(payload packing).  All production schemes satisfy this: (1,1,3)/(1,3,1)
jobs have MG=1 and rep_len <= 1M; (5,1,1) only occurs in polish scoring
where rep_len <= ~10.5k (coverage gate, handle_one_read.c:95-98).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_limits(u_pad: int) -> tuple[int, int]:
    """(BIG, K) packing constants for a unit bucket."""
    log2u = int(np.log2(u_pad))
    assert 1 << log2u == u_pad
    return 1 << (30 - log2u), 1 << (31 - log2u)


def _fused_kernel(b: int, u_pad: int, r_tile: int):
    log2u = int(np.log2(u_pad))
    assert 1 << log2u == u_pad
    BIG, K = fused_limits(u_pad)

    def kernel(scal_ref, rep_ref, unit_ref, out_ref,
               prev_ref, auxm_ref, auxi_ref, auxs_ref, st_ref):
        rt = pl.program_id(0)
        n_rt = pl.num_programs(0)
        rep_len = scal_ref[0:1, :]    # (1, B)
        unit_len = scal_ref[1:2, :]
        mg = scal_ref[2:3, :]
        mp = scal_ref[3:4, :]
        ip = scal_ref[4:5, :]

        jidx = jax.lax.broadcasted_iota(jnp.int32, (u_pad, b), 0)
        base = rt * r_tile

        # masks as int32 0/1 (arithmetic blends; Mosaic rejects some i1
        # broadcast relayouts)
        sub_ok = (jidx < unit_len).astype(jnp.int32)
        wrap_sel = (jidx == unit_len - 1).astype(jnp.int32)
        j0 = (jidx == 0).astype(jnp.int32)
        notj0 = 1 - j0
        shm = [(jidx >= (1 << s)).astype(jnp.int32) for s in range(log2u)]
        fillneg = [1 - m_ for m_ in shm]
        ipj = ip * jidx               # hoisted: constant per row
        jK = jidx * K
        unit = unit_ref[...]

        @pl.when(rt == 0)
        def _():
            prev_ref[...] = jnp.zeros((u_pad, b), jnp.int32)
            auxm_ref[...] = jnp.zeros((u_pad, b), jnp.int32)
            auxi_ref[...] = jnp.zeros((u_pad, b), jnp.int32)
            auxs_ref[...] = jnp.zeros((u_pad, b), jnp.int32)
            st_ref[...] = jnp.zeros((16, b), jnp.int32)

        max_rep_len = jnp.max(scal_ref[0:1, :])

        @pl.when(base < max_rep_len)
        def _():
            def row_step(r, _):
                i = base + r + 1          # 1-origin DP row
                prev = prev_ref[...]
                st = st_ref[...]
                wrap_prev = st[0:1, :]    # prev row's last-column value
                rolled = pltpu.roll(prev, 1, axis=0)
                diag = rolled * notj0 + wrap_prev * j0
                mi = (unit == rep_ref[r]).astype(jnp.int32)
                nmi = 1 - mi
                m_nomatch = jnp.maximum(
                    0, jnp.maximum(diag - mp, prev - ip)
                )
                m = mi * (diag + mg) + nmi * m_nomatch

                # --- value chain: segmented running max of m + ip*j ---
                reset = jnp.maximum(mi, j0)
                seg = reset
                for s in range(log2u):
                    seg = seg + pltpu.roll(seg, 1 << s, axis=0) * shm[s]
                segbig = seg * BIG
                tt = m + ipj + segbig
                for s in range(log2u):
                    tt = jnp.maximum(tt, pltpu.roll(tt, 1 << s, axis=0) * shm[s])
                chain = tt - segbig - ipj
                row = mi * m + nmi * chain

                validi = (i <= rep_len).astype(jnp.int32)  # (1, B)
                ok = sub_ok * validi
                row = row * ok
                wrap_val = jnp.sum(row * wrap_sel, axis=0, keepdims=True)
                left = pltpu.roll(row, 1, axis=0) * notj0 + wrap_val * j0

                # --- traceback-precedence source selection ---
                pos = (row > 0).astype(jnp.int32) * ok
                is_m = mi * pos
                e2v = (row == diag - mp).astype(jnp.int32)
                sel_x = nmi * e2v * pos
                rem = pos * nmi * (1 - e2v)
                e3v = (row == left - ip).astype(jnp.int32)
                sel_d = rem * e3v
                sel_i = rem * (1 - e3v)  # e4 must hold if others fail
                sel_diag = is_m + sel_x
                notdel = 1 - sel_d

                # --- aux base from diag/up predecessors ---
                wa_m = st[7:8, :]
                wa_i = st[8:9, :]
                wa_s = st[9:10, :]
                auxm = auxm_ref[...]
                auxi = auxi_ref[...]
                auxs = auxs_ref[...]
                daux_m = pltpu.roll(auxm, 1, axis=0) * notj0 + wa_m * j0
                daux_i = pltpu.roll(auxi, 1, axis=0) * notj0 + wa_i * j0
                daux_s = pltpu.roll(auxs, 1, axis=0) * notj0 + wa_s * j0
                base_m = sel_diag * daux_m + is_m + sel_i * auxm
                base_i = sel_diag * daux_i + sel_i * (auxi + 1)
                base_s = sel_diag * daux_s + sel_i * auxs + (1 - pos) * i

                # --- deletion-chain copy scan (packed running max) ---
                km = notdel * (jK + base_m) - sel_d
                ki = notdel * (jK + base_i) - sel_d
                ks = notdel * (jK + base_s) - sel_d
                for s in range(log2u):
                    sh = 1 << s
                    km = jnp.maximum(km, pltpu.roll(km, sh, axis=0) * shm[s] - fillneg[s])
                    ki = jnp.maximum(ki, pltpu.roll(ki, sh, axis=0) * shm[s] - fillneg[s])
                    ks = jnp.maximum(ks, pltpu.roll(ks, sh, axis=0) * shm[s] - fillneg[s])
                open_ = (km < 0).astype(jnp.int32)
                closed = 1 - open_
                pay_m = km & (K - 1)
                pay_i = ki & (K - 1)
                pay_s = ks & (K - 1)
                # last valid column is provably chain-free: extract the
                # wrap source BEFORE the fix-up
                nwa_m = jnp.sum(pay_m * wrap_sel, axis=0, keepdims=True)
                nwa_i = jnp.sum(pay_i * wrap_sel, axis=0, keepdims=True)
                nwa_s = jnp.sum(pay_s * wrap_sel, axis=0, keepdims=True)
                fin_m = closed * pay_m + open_ * nwa_m
                fin_i = closed * pay_i + open_ * nwa_i
                fin_s = closed * pay_s + open_ * nwa_s

                # --- running argmax (first maximal cell in row-major
                # order, wrap_around_DP.c:276-281) ---
                masked = row * ok - (1 - ok)
                row_max = jnp.max(masked, axis=0, keepdims=True)
                ismax = (masked == row_max).astype(jnp.int32)
                row_arg = jnp.min(
                    jidx * ismax + (u_pad + 1) * (1 - ismax),
                    axis=0, keepdims=True,
                )
                onehot = (jidx == row_arg).astype(jnp.int32)
                arg_m = jnp.sum(fin_m * onehot, axis=0, keepdims=True)
                arg_i = jnp.sum(fin_i * onehot, axis=0, keepdims=True)
                arg_s = jnp.sum(fin_s * onehot, axis=0, keepdims=True)
                better = (row_max > st[1:2, :]).astype(jnp.int32)
                nb = 1 - better
                st_ref[...] = jnp.concatenate(
                    [
                        wrap_val,
                        better * row_max + nb * st[1:2, :],
                        better * i + nb * st[2:3, :],
                        better * (row_arg + 1) + nb * st[3:4, :],
                        better * arg_m + nb * st[4:5, :],
                        better * arg_i + nb * st[5:6, :],
                        better * arg_s + nb * st[6:7, :],
                        nwa_m, nwa_i, nwa_s,
                        st[10:, :],
                    ],
                    axis=0,
                )
                prev_ref[...] = row
                auxm_ref[...] = fin_m
                auxi_ref[...] = fin_i
                auxs_ref[...] = fin_s
                return 0

            jax.lax.fori_loop(0, r_tile, row_step, 0)

        @pl.when(rt == n_rt - 1)
        def _():
            out_ref[...] = st_ref[...]

    return kernel


def make_wrap_dp_fused(b: int, u_pad: int, r_pad: int, interpret: bool = False):
    """Batched fused wrap-DP for a (B, u_pad, r_pad) bucket.

    Inputs (host layout, transposed on device by XLA):
      scal (B, 8) int32: rep_len, unit_len, mg, mp, ip, 0, 0, 0
      rep  (B, r_pad) int32 (pad -1), unit (B, u_pad) int32 (pad -2)
    Output: fused (B, 15) int32 =
      [m, x, ins, del, scanned, i_final, done=1 | best 8 cols]
    — identical layout to ops.wrap_dp_pallas.traceback_counts_batch, so
    the batcher's collect path is unchanged.
    """
    r_tile = min(r_pad, max(8, (1 << 19) // (b * 4)))  # ~0.5 MB rep block
    while r_pad % r_tile:
        r_tile -= 1
    n_rt = r_pad // r_tile

    kernel = _fused_kernel(b, u_pad, r_tile)

    def fn(scal, rep, unit):
        scal_t = jnp.pad(scal.T, ((0, 8), (0, 0)))          # (16, B)
        rep3 = rep.T.reshape(r_pad, 1, b)
        unit_t = unit.T                                      # (u_pad, B)
        out = pl.pallas_call(
            kernel,
            grid=(n_rt,),
            in_specs=[
                pl.BlockSpec((16, b), lambda rt: (0, 0)),
                pl.BlockSpec((r_tile, 1, b), lambda rt: (rt, 0, 0)),
                pl.BlockSpec((u_pad, b), lambda rt: (0, 0)),
            ],
            out_specs=pl.BlockSpec((16, b), lambda rt: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((16, b), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((u_pad, b), jnp.int32),
                pltpu.VMEM((u_pad, b), jnp.int32),
                pltpu.VMEM((u_pad, b), jnp.int32),
                pltpu.VMEM((u_pad, b), jnp.int32),
                pltpu.VMEM((16, b), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(scal_t, rep3, unit_t)

        bv, bi = out[1], out[2]
        m, ins, si = out[4], out[5], out[6]
        mgv, mpv, ipv = scal[:, 2], scal[:, 3], scal[:, 4]
        x = bi - si - m - ins                    # read-consumption identity
        dl = (m * mgv - x * mpv - bv - ins * ipv) // ipv  # score identity
        scanned = m + x + dl
        done = jnp.ones_like(m)
        tb = jnp.stack([m, x, ins, dl, scanned, si, done], axis=1)
        return jnp.concatenate([tb, out[:8].T], axis=1)

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def get_wrap_dp_fused(b: int, u_pad: int, r_pad: int):
    interpret = jax.default_backend() == "cpu"
    return make_wrap_dp_fused(b, u_pad, r_pad, interpret=interpret)
