"""Fused wrap-around-DP kernel v2: lane-oriented layout, gather-based
traceback-count propagation.

Computes the identical function to ops/wrap_dp_fused.py (fill + traceback
counts of wrap_around_DP.c:222-354, precedence match > mismatch >
deletion > insertion evaluated on final cell values) but restructured for
VPU latency, which dominates the row loop on real hardware:

  * Layout is (B, 128): jobs ride the SUBLANE dim and the unit the LANE
    dim.  With the unit confined to one 128-lane vreg span, Mosaic's
    `tpu.dynamic_gather` is legal along the unit axis, so every
    "read a per-job column" operation (wrap column, deletion-chain
    origin, argmax payload) is ONE gather instead of a packed scan or a
    masked one-hot reduction.
  * The in-row deletion chain for VALUES rides the MXU + one plain
    max-scan: segment ids (inclusive prefix count of chain boundaries =
    match cells and j==0) are ONE bf16 matmul against an upper-triangular
    ones matrix — exact, counts <= 128 — and the segmented running max
    becomes an UNsegmented Kogge-Stone max over
    enc = (seg << SB) + m + ip*j (lexicographic (segment, value) order:
    earlier segments can never win).  3 ops/level instead of the 8 of a
    flag-carrying segmented scan, and the cumsum is VPU-free.
  * The deletion-chain COPY for aux payloads is one origin-index scan
    (nearest non-deletion cell to the left) plus lane gathers.
  * For rep buckets <= 16384 the (num_matches, num_insertions) payloads
    PACK into one plane (m << PKS | ins, both < 2^PKS, 2*PKS <= 30 bits),
    removing a third of the aux propagation ops on the hottest bucket.
  * No per-row reductions: the running argmax
    (wrap_around_DP.c:276-281, first strictly-greater cell in row-major
    order) is tracked per (job, lane) and resolved to the
    row-major-first cell once at the end: lanes tied at the global max
    are broken by smallest row, then smallest lane, exactly reproducing
    the scalar scan order.
  * rep codes stream as int8 blocks ((B, r_tile) per grid step), 4x less
    host->device traffic than v1's int32 rows.

Value-packing bound: enc needs (seg <= 128) * 2^SB + max(m) + ip*127 <
2^31 with SB sized for max(m) <= 5*r_pad (MG <= 5 for every production
scheme — (1,1,3)/(1,3,1)/(5,1,1), wrap_around_DP.c:357-429 and
consensus.c:1062); at the largest bucket (r_pad = 2^20) SB = 23 and
enc < 2^30 + 2^23.

Interface matches make_wrap_dp_fused: fn(scal, rep, unit) -> (B, 15)
int32 [m, x, ins, del, scanned, i_final, done | wrap, best, max_i,
max_j, m, ins, si, 0].  Restricted to unit_len <= 128 (the batcher
routes u_pad > 128 buckets to v1).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U_PAD = 128
NEG = -(1 << 30)


def _take(plane, idx):
    """Per-job gather along the unit (lane) axis: plane[b, idx[b, j]]."""
    return jnp.take_along_axis(plane, idx, axis=1)


def _fused2_kernel(b: int, r_tile: int, r_pad: int, packed: bool):
    SB = int(5 * r_pad + 3 * (U_PAD - 1)).bit_length()
    PKS = int(r_pad).bit_length()  # m, ins <= r_pad < 2^PKS

    def body(scal_ref, rep_ref, unit_ref, out_ref, refs):
        # grid = (n_sub, n_rt): sub-chunks of b jobs ride the leading
        # grid dim so ONE dispatch carries many rep_len-homogeneous
        # groups, each bounded by its OWN max_rep_len (a sub-chunk of
        # padding slots costs only its init/out steps)
        rt = pl.program_id(1)
        n_rt = pl.num_programs(1)

        rep_len = scal_ref[:, 0:1]                  # (B, 1)
        unit_len = scal_ref[:, 1:2]
        mg = scal_ref[:, 2:3]
        mp = scal_ref[:, 3:4]
        ip = scal_ref[:, 4:5]

        jidx = jax.lax.broadcasted_iota(jnp.int32, (b, U_PAD), 1)
        zero = jnp.zeros((b, U_PAD), jnp.int32)
        # per-level scan edge masks are row-invariant: hoisted out of
        # the row loop
        edges = [jidx < (1 << s) for s in range(7)]
        # upper-triangular ones (incl. diagonal): one bf16 matmul turns
        # the per-row boundary flags into inclusive segment ids (exact:
        # counts <= 128 << bf16/f32 integer range)
        tri_r = jax.lax.broadcasted_iota(jnp.int32, (U_PAD, U_PAD), 0)
        tri_c = jax.lax.broadcasted_iota(jnp.int32, (U_PAD, U_PAD), 1)
        triu = (tri_r <= tri_c).astype(jnp.bfloat16)
        # per-job planes, broadcast along lanes (recomputed per grid
        # step: a handful of ops per r_tile rows)
        ulm1 = jnp.maximum(unit_len - 1, 0) + zero  # gather index plane
        mg_p = mg + zero
        mp_p = mp + zero
        ip_p = ip + zero
        ipj = ip * jidx
        sub_ok = jidx < unit_len                    # bool (B, U)
        j0 = jidx == 0
        unit = unit_ref[...].astype(jnp.int32)
        rep_blk = rep_ref[...].astype(jnp.int32)    # (B, r_tile)
        base = rt * r_tile
        max_rep_len = jnp.max(rep_len)

        @pl.when(rt == 0)
        def _():
            for ref in refs.values():
                ref[...] = zero

        @pl.when(base < max_rep_len)
        def _():
            def row_step(r, _):
                i = base + r + 1                    # 1-origin DP row
                prev = refs["prev"][...]
                rep_c = _take(rep_blk, zero + r)    # (B, U) bcast of rep[i]
                mi = unit == rep_c
                wrapv = _take(prev, ulm1)           # prev row last column
                diag = jnp.where(j0, wrapv, pltpu.roll(prev, 1, axis=1))
                dmp = diag - mp_p
                m = jnp.where(
                    mi, diag + mg_p,
                    jnp.maximum(zero, jnp.maximum(dmp, prev - ip_p)),
                )

                # --- value deletion chain: segment ids via MXU cumsum,
                # then ONE plain max-scan over (seg << SB) + m + ip*j ---
                fi = jnp.logical_or(mi, j0)
                seg = jnp.dot(
                    fi.astype(jnp.bfloat16), triu,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
                segs = seg << SB
                enc = (m + ipj) + segs
                for s in range(7):
                    # shifted-in 0 can never win: every lane's enc
                    # carries seg >= 1 in the high bits
                    enc = jnp.maximum(
                        enc,
                        jnp.where(edges[s], 0, pltpu.roll(enc, 1 << s, axis=1)),
                    )
                # match cells open their own segment, so chain == m
                # there: no post-scan select needed
                row = (enc - segs) - ipj
                ok = jnp.logical_and(sub_ok, i <= rep_len)
                row = jnp.where(ok, row, zero)

                # --- traceback-precedence source selection on final
                # values (wrap_around_DP.c:294-333) ---
                pos = row > 0                       # ok-masked already
                is_m = jnp.logical_and(mi, pos)
                e2v = row == dmp
                not_mi = jnp.logical_not(mi)
                sel_x = jnp.logical_and(jnp.logical_and(not_mi, e2v), pos)
                rem = jnp.logical_and(
                    jnp.logical_and(pos, not_mi), jnp.logical_not(e2v)
                )
                left = jnp.where(
                    j0, _take(row, ulm1), pltpu.roll(row, 1, axis=1)
                )
                e3v = row == left - ip_p
                sel_d = jnp.logical_and(rem, e3v)
                sel_diag = jnp.logical_or(is_m, sel_x)

                # --- aux base from diag/up predecessors ---
                mi_i = mi.astype(jnp.int32)
                if packed:
                    auxP = refs["auxP"][...]
                    auxs = refs["auxs"][...]
                    wa_P = _take(auxP, ulm1)
                    wa_s = _take(auxs, ulm1)
                    dP = jnp.where(j0, wa_P, pltpu.roll(auxP, 1, axis=1))
                    dS = jnp.where(j0, wa_s, pltpu.roll(auxs, 1, axis=1))
                    base_P = jnp.where(
                        sel_diag, dP + (mi_i << PKS),
                        jnp.where(pos, auxP + 1, zero)  # sel_i: ins += 1
                    )
                    base_S = jnp.where(
                        sel_diag, dS,
                        jnp.where(pos, auxs, zero + i)  # value-0: start=i
                    )
                    planes = {"auxP": base_P, "auxs": base_S}
                else:
                    auxm = refs["auxm"][...]
                    auxi = refs["auxi"][...]
                    auxs = refs["auxs"][...]
                    wa_m = _take(auxm, ulm1)
                    wa_i = _take(auxi, ulm1)
                    wa_s = _take(auxs, ulm1)
                    daux_m = jnp.where(j0, wa_m, pltpu.roll(auxm, 1, axis=1))
                    daux_i = jnp.where(j0, wa_i, pltpu.roll(auxi, 1, axis=1))
                    daux_s = jnp.where(j0, wa_s, pltpu.roll(auxs, 1, axis=1))
                    base_m = jnp.where(
                        sel_diag, daux_m + mi_i,
                        jnp.where(pos, auxm, zero)
                    )
                    base_i = jnp.where(
                        sel_diag, daux_i, jnp.where(pos, auxi + 1, zero)
                    )
                    base_s = jnp.where(
                        sel_diag, daux_s, jnp.where(pos, auxs, zero + i)
                    )
                    planes = {"auxm": base_m, "auxi": base_i, "auxs": base_s}

                # --- deletion-chain copy: nearest non-deletion origin ---
                org = jnp.where(sel_d, -1, jidx)
                for s in range(7):
                    org = jnp.maximum(
                        org,
                        jnp.where(edges[s], -1, pltpu.roll(org, 1 << s, axis=1)),
                    )
                open_ = org < 0
                orgc = jnp.maximum(org, 0)
                # last valid column is provably chain-free; wrapped lanes
                # chain into the SAME row's last column
                org_last = _take(orgc, ulm1)
                fins = {}
                for name, plane in planes.items():
                    pay = _take(plane, orgc)
                    fins[name] = jnp.where(open_, _take(plane, org_last), pay)

                # --- per-(job, lane) argmax tracking: strict >, so the
                # FIRST row achieving a lane's max is kept ---
                better = row > refs["bv"][...]
                refs["bv"][...] = jnp.where(better, row, refs["bv"][...])
                refs["bi"][...] = jnp.where(better, zero + i, refs["bi"][...])
                if packed:
                    refs["bP"][...] = jnp.where(
                        better, fins["auxP"], refs["bP"][...])
                    refs["bsi"][...] = jnp.where(
                        better, fins["auxs"], refs["bsi"][...])
                else:
                    refs["bm"][...] = jnp.where(
                        better, fins["auxm"], refs["bm"][...])
                    refs["bins"][...] = jnp.where(
                        better, fins["auxi"], refs["bins"][...])
                    refs["bsi"][...] = jnp.where(
                        better, fins["auxs"], refs["bsi"][...])

                refs["prev"][...] = row
                for name, plane in fins.items():
                    refs[name][...] = plane
                return 0

            rows = jnp.minimum(max_rep_len - base, r_tile)
            jax.lax.fori_loop(0, rows, row_step, 0)

        @pl.when(rt == n_rt - 1)
        def _():
            # resolve the row-major-first global argmax: max value, then
            # smallest row, then smallest lane
            bv = refs["bv"][...]
            bi = refs["bi"][...]
            jidx2 = jax.lax.broadcasted_iota(jnp.int32, (b, U_PAD), 1)
            gmax = jnp.max(bv, axis=1, keepdims=True)          # (B, 1)
            cand = bv == gmax
            big = jnp.int32(1 << 30)
            bi_m = jnp.where(cand, bi, big)
            min_bi = jnp.min(bi_m, axis=1, keepdims=True)
            cand2 = jnp.logical_and(cand, bi == min_bi)
            j_m = jnp.where(cand2, jidx2, big)
            jstar = jnp.min(j_m, axis=1, keepdims=True)        # (B, 1)
            found = gmax > 0
            # Mosaic's dynamic_gather needs full-plane indices: broadcast,
            # gather, then take lane 0 (all lanes identical)
            jstar_p = jstar + jnp.zeros((b, U_PAD), jnp.int32)
            if packed:
                arg_P = jnp.take_along_axis(
                    refs["bP"][...], jstar_p, axis=1)[:, 0:1]
                arg_m = arg_P >> PKS
                arg_i = arg_P & ((1 << PKS) - 1)
            else:
                arg_m = jnp.take_along_axis(
                    refs["bm"][...], jstar_p, axis=1)[:, 0:1]
                arg_i = jnp.take_along_axis(
                    refs["bins"][...], jstar_p, axis=1)[:, 0:1]
            arg_s = jnp.take_along_axis(
                refs["bsi"][...], jstar_p, axis=1)[:, 0:1]
            max_i = jnp.where(found, min_bi, 0)
            max_j = jnp.where(found, jstar + 1, 0)
            ulm1b = (jnp.maximum(scal_ref[:, 1:2] - 1, 0)
                     + jnp.zeros((b, U_PAD), jnp.int32))
            wrap_val = jnp.take_along_axis(
                refs["prev"][...], ulm1b, axis=1)[:, 0:1]
            zcol = jnp.zeros((b, 1), jnp.int32)
            out_ref[...] = jnp.concatenate(
                [wrap_val, gmax, max_i, max_j,
                 jnp.where(found, arg_m, 0),
                 jnp.where(found, arg_i, 0),
                 jnp.where(found, arg_s, 0),
                 zcol] + [zcol] * 8,
                axis=1,
            )

    names = (
        ("prev", "auxP", "auxs", "bv", "bi", "bP", "bsi") if packed
        else ("prev", "auxm", "auxi", "auxs", "bv", "bi", "bm", "bins", "bsi")
    )

    def kernel(scal_ref, rep_ref, unit_ref, out_ref, *scratch):
        body(scal_ref, rep_ref, unit_ref, out_ref, dict(zip(names, scratch)))

    return kernel, len(names)


def make_wrap_dp_fused2(b: int, r_pad: int, interpret: bool = False,
                        r_tile: int = 128, n_sub: int = 1):
    # r_tile is capped at 128: the per-row rep-code broadcast is a lane
    # gather into the streamed (B, r_tile) block, and tpu.dynamic_gather
    # requires the gather dimension to span a single vreg (128 lanes).
    """Batched fused wrap-DP v2 for a (n_sub*b, 128, r_pad) bucket.

    Inputs:
      scal (n_sub*b, 8) int32: rep_len, unit_len, mg, mp, ip, 0, 0, 0
      rep  (n_sub*b, r_pad) int8 (pad -1), unit (n_sub*b, 128) int8
      (pad -2)
    Output: (n_sub*b, 15) int32, layout of make_wrap_dp_fused.  Rows are
    processed in b-sized sub-chunks, each row-bounded by its own max
    rep_len (callers sort jobs longest-first so sub-chunks stay
    homogeneous and padding slots are near-free).
    """
    r_tile = min(r_tile, r_pad)
    while r_pad % r_tile:
        r_tile -= 1
    n_rt = r_pad // r_tile
    packed = r_pad <= 16384  # m, ins pair fits one int32 plane
    kernel, n_scratch = _fused2_kernel(b, r_tile, r_pad, packed)

    def fn(scal, rep, unit):
        out = pl.pallas_call(
            kernel,
            grid=(n_sub, n_rt),
            in_specs=[
                pl.BlockSpec((b, 8), lambda s, rt: (s, 0)),
                pl.BlockSpec((b, r_tile), lambda s, rt: (s, rt)),
                pl.BlockSpec((b, U_PAD), lambda s, rt: (s, 0)),
            ],
            out_specs=pl.BlockSpec((b, 16), lambda s, rt: (s, 0)),
            out_shape=jax.ShapeDtypeStruct((n_sub * b, 16), jnp.int32),
            scratch_shapes=[pltpu.VMEM((b, U_PAD), jnp.int32)
                            for _ in range(n_scratch)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                # persistent (B,128) i32 state planes + temporaries: the
                # 16M default scoped-vmem limit caps B at ~1k; v5e has
                # far more physical VMEM
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(scal, rep, unit)

        bv, bi = out[:, 1], out[:, 2]
        m, ins, si = out[:, 4], out[:, 5], out[:, 6]
        mgv, mpv, ipv = scal[:, 2], scal[:, 3], scal[:, 4]
        x = bi - si - m - ins                    # read-consumption identity
        dl = (m * mgv - x * mpv - bv - ins * ipv) // ipv  # score identity
        scanned = m + x + dl
        done = jnp.ones_like(m)
        tb = jnp.stack([m, x, ins, dl, scanned, si, done], axis=1)
        return jnp.concatenate([tb, out[:, :8]], axis=1)

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def get_wrap_dp_fused2(b: int, r_pad: int, n_sub: int = 1):
    interpret = jax.default_backend() == "cpu"
    return make_wrap_dp_fused2(b, r_pad, interpret=interpret, n_sub=n_sub)
