"""Fused wrap-around-DP counts kernel, wide lane-oriented variant:
units up to 256 lanes, RIGHT-ALIGNED.

Same function as ops/wrap_dp_fused2.py (fill + traceback counts of
wrap_around_DP.c:222-354) extended past the 128-lane dynamic_gather
limit so the dominant long-unit buckets (real tandem repeats cluster at
unit 129-256 — e.g. the 200 bp north-star workload) run the cheap
lane-oriented row body instead of the v1 sublane kernel's three packed
aux scans.

Two structural changes against fused2:

  * Units are RIGHT-ALIGNED to the top of the lane span: job q's unit
    occupies lanes [u_span - ul, u_span).  The wrap column (last valid
    unit position) is then the STATIC last lane for every job, so the
    four per-row wrap reads (value + aux planes) and the deletion-chain
    wrap origin are static column slices instead of dynamic gathers.
    The alignment itself is one take_along_axis OUTSIDE the kernel.
  * The deletion-chain origin copies carry their payloads THROUGH the
    scan instead of gathering afterwards: each aux plane runs a
    Kogge-Stone max scan over (lane_pos << PB) + payload, where only
    non-deletion lanes encode (deletion lanes start at -1).  The max
    picks the NEAREST preceding non-deletion lane — position dominates
    the comparison — and its payload rides along in the low bits, so
    the per-row body contains ZERO data-dependent gathers.  (Round 4
    measured the gather-based origin copy at ~87% of row cost: the
    256-lane span forced every gather to split into three takes plus
    selects.  The scan variant lifted the kernel 9.9 -> ~3x GCUPS.)

Value-packing bound: the segmented max-scan encodes
(seg << SB) + m + ip*j with seg <= u_span; SB is sized for
max_m = r_pad (MG = 1 schemes, any length) and 5*16384 (MG = 5 only
occurs in polish re-scoring whose rep_len is coverage-bounded far
below that, handle_one_read.c:95-98).  Dispatchers must assert
rep_len*MG + ip*(u_span-1) < 2^SB via w_limit().

Interface matches make_wrap_dp_fused2: fn(scal, rep, unit) with
LEFT-aligned int8 units; output (B, 15) int32 [m, x, ins, del, scanned,
i_final, done | wrap, best, max_i, max_j, m, ins, si, 0].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 30)


def w_limit(u_span: int, r_pad: int) -> int:
    """Max legal rep_len*MG + IP*(u_span-1) for this kernel shape."""
    sb = _sb(u_span, r_pad)
    return 1 << sb


def rep_cap(r_pad: int) -> int:
    """Max rep_len admissible for this kernel shape: the two-scan
    packed aux (r_pad <= 32768) needs counts <= 32767 (15 bits), so
    the 32768 bucket admits one row less than its padding; dispatchers
    must route rep_len == 32768 to the next bucket."""
    return min(r_pad, 32767)


def _sb(u_span: int, r_pad: int) -> int:
    max_m = max(r_pad, 5 * 16384) + 3 * (u_span - 1)
    sb = int(max_m).bit_length()
    # seg <= u_span must fit above SB within int32
    assert (u_span << sb) < (1 << 31), (u_span, r_pad, sb)
    return sb


def _take(plane, idx):
    return jnp.take_along_axis(plane, idx, axis=1)


def _gather_col(plane, col, u_span: int):
    """plane[b, col[b, 0]] broadcast over lanes; col is (B, 1)."""
    b = plane.shape[0]
    if u_span <= 128:
        idx = col + jnp.zeros((b, u_span), jnp.int32)
        return _take(plane, idx)
    lo, hi = plane[:, :128], plane[:, 128:]
    idx = col + jnp.zeros((b, 128), jnp.int32)
    v = jnp.where(
        idx < 128,
        _take(lo, jnp.minimum(idx, 127)),
        _take(hi, jnp.clip(idx - 128, 0, 127)),
    )
    return jnp.concatenate([v, v], axis=1)


def _fused2w_kernel(b: int, r_tile: int, r_pad: int, u_span: int,
                    ablate: str = ""):
    """ablate (measurement only, output invalid unless ""):
    "values" = drop the aux block entirely; "bases" = aux bases but no
    propagation scans (fins = bases).  Used by scripts/ablate_f2w.py to
    locate row-cost hot spots on real hardware."""
    SB = _sb(u_span, r_pad)
    # Aux payload packing.  pack2 (r_pad <= 32768, rep_len <= 32767 by
    # the dispatch contract): counts and si fit 15 bits, so TWO scans
    # carry all three quantities — P1 = m << 8 | si_lo8,
    # P2 = ins << 7 | si_hi7 — both under position at bit 23
    # (255 << 23 + (32767 << 8 | 255) < 2^31, checked below).  Both
    # scans pick the same origin lane (position strictly dominates and
    # positions are distinct), so the fields recombine exactly.
    # Otherwise three scans, one payload each, bounded by r_pad + 1.
    pack2 = r_pad <= 32768
    if pack2:
        PB = 23
        assert ((u_span - 1) << PB) + (32767 << 8 | 255) < (1 << 31)
    else:
        PB = int(r_pad + 1).bit_length()
        assert (u_span << PB) <= (1 << 31), (u_span, r_pad, PB)
    levels = (u_span - 1).bit_length()

    track = ((("auxP1", "bP1"), ("auxP2", "bP2")) if pack2 else
             (("auxm", "bm"), ("auxi", "bins"), ("auxs", "bsi")))

    def body(scal_ref, rep_ref, unit_ref, out_ref, refs):
        # grid = (n_sub, n_rt): see ops/wrap_dp_fused2.py — sub-chunks
        # carry their own max_rep_len row bound within one dispatch
        rt = pl.program_id(1)
        n_rt = pl.num_programs(1)

        rep_len = scal_ref[:, 0:1]                  # (B, 1)
        unit_len = scal_ref[:, 1:2]
        mg = scal_ref[:, 2:3]
        mp = scal_ref[:, 3:4]
        ip = scal_ref[:, 4:5]

        jidx = jax.lax.broadcasted_iota(jnp.int32, (b, u_span), 1)
        zero = jnp.zeros((b, u_span), jnp.int32)
        edges = [jidx < (1 << s) for s in range(levels)]
        tri_r = jax.lax.broadcasted_iota(jnp.int32, (u_span, u_span), 0)
        tri_c = jax.lax.broadcasted_iota(jnp.int32, (u_span, u_span), 1)
        triu = (tri_r <= tri_c).astype(jnp.bfloat16)
        start = u_span - unit_len                   # (B, 1) first lane
        mg_p = mg + zero
        mp_p = mp + zero
        ip_p = ip + zero
        # unit position of lane j is j - start: iota minus per-job start
        ipj = ip * (jidx - start)
        sub_ok = jidx >= start                      # bool (B, U)
        jsl = jidx == start                         # unit's first lane
        unit = unit_ref[...].astype(jnp.int32)
        rep_blk = rep_ref[...].astype(jnp.int32)    # (B, r_tile<=128)
        zero_t = jnp.zeros((b, r_tile), jnp.int32)
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
                # row's rep code: one 128-lane gather (Mosaic dynamic
                # lane slices must be 128-aligned), widened by concat
                rc = _take(rep_blk, zero_t + r)
                rep_c = (jnp.concatenate([rc, rc], axis=1)
                         if u_span > r_tile else rc[:, :u_span])
                mi = unit == rep_c
                # wrap column is the STATIC last lane (right-aligned)
                wrapv = prev[:, u_span - 1:u_span]
                diag = jnp.where(jsl, wrapv, pltpu.roll(prev, 1, axis=1))
                dmp = diag - mp_p
                m = jnp.where(
                    mi, diag + mg_p,
                    jnp.maximum(zero, jnp.maximum(dmp, prev - ip_p)),
                )

                # --- value deletion chain: MXU segment ids + one plain
                # max-scan (see ops/wrap_dp_fused2.py) ---
                fi = jnp.logical_or(
                    jnp.logical_or(mi, jsl), jnp.logical_not(sub_ok)
                )
                seg = jnp.dot(
                    fi.astype(jnp.bfloat16), triu,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
                segs = seg << SB
                enc = (m + ipj) + segs
                for s in range(levels):
                    enc = jnp.maximum(
                        enc,
                        jnp.where(edges[s], 0,
                                  pltpu.roll(enc, 1 << s, axis=1)),
                    )
                row = (enc - segs) - ipj
                ok = jnp.logical_and(sub_ok, i <= rep_len)
                row = jnp.where(ok, row, zero)

                # --- traceback-precedence source selection ---
                pos = row > 0
                is_m = jnp.logical_and(mi, pos)
                e2v = row == dmp
                not_mi = jnp.logical_not(mi)
                sel_x = jnp.logical_and(jnp.logical_and(not_mi, e2v), pos)
                rem = jnp.logical_and(
                    jnp.logical_and(pos, not_mi), jnp.logical_not(e2v)
                )
                left = jnp.where(
                    jsl, row[:, u_span - 1:u_span],
                    pltpu.roll(row, 1, axis=1),
                )
                e3v = row == left - ip_p
                sel_d = jnp.logical_and(rem, e3v)
                sel_diag = jnp.logical_or(is_m, sel_x)

                if ablate == "values":
                    better = row > refs["bv"][...]
                    refs["bv"][...] = jnp.where(better, row,
                                                refs["bv"][...])
                    refs["bi"][...] = jnp.where(better, zero + i,
                                                refs["bi"][...])
                    refs["prev"][...] = row
                    return 0

                # --- aux base from diag/up predecessors ---
                mi_i = mi.astype(jnp.int32)
                if pack2:
                    auxP1 = refs["auxP1"][...]
                    auxP2 = refs["auxP2"][...]
                    d1 = jnp.where(jsl, auxP1[:, u_span - 1:u_span],
                                   pltpu.roll(auxP1, 1, axis=1))
                    d2 = jnp.where(jsl, auxP2[:, u_span - 1:u_span],
                                   pltpu.roll(auxP2, 1, axis=1))
                    # diag: m+1 on match; up: ins+1; zero-start: si = i
                    base_1 = jnp.where(
                        sel_diag, d1 + (mi_i << 8),
                        jnp.where(pos, auxP1, zero + (i & 255)))
                    base_2 = jnp.where(
                        sel_diag, d2,
                        jnp.where(pos, auxP2 + (1 << 7),
                                  zero + (i >> 8)))
                    planes = {"auxP1": base_1, "auxP2": base_2}
                else:
                    auxm = refs["auxm"][...]
                    auxi = refs["auxi"][...]
                    auxs = refs["auxs"][...]
                    dm = jnp.where(jsl, auxm[:, u_span - 1:u_span],
                                   pltpu.roll(auxm, 1, axis=1))
                    di_ = jnp.where(jsl, auxi[:, u_span - 1:u_span],
                                    pltpu.roll(auxi, 1, axis=1))
                    ds = jnp.where(jsl, auxs[:, u_span - 1:u_span],
                                   pltpu.roll(auxs, 1, axis=1))
                    base_m = jnp.where(
                        sel_diag, dm + mi_i, jnp.where(pos, auxm, zero))
                    base_i = jnp.where(
                        sel_diag, di_, jnp.where(pos, auxi + 1, zero))
                    base_s = jnp.where(
                        sel_diag, ds, jnp.where(pos, auxs, zero + i))
                    planes = {"auxm": base_m, "auxi": base_i,
                              "auxs": base_s}

                # --- deletion-chain copy, gather-free: each plane runs
                # a max scan over (lane_pos << PB) + payload.  Deletion
                # lanes (and lanes left of the unit) start at -1, so the
                # max picks the NEAREST preceding non-deletion lane —
                # position dominates — with its payload in the low bits.
                # Open chains (no origin anywhere left) wrap into the
                # SAME row's last lane (static, right-aligned), whose
                # scanned value is the row's rightmost origin payload.
                valid = jnp.logical_and(jnp.logical_not(sel_d), sub_ok)
                posenc = jidx << PB
                maskP = (1 << PB) - 1
                fins = {}
                if ablate == "bases":
                    fins = planes
                for name, plane in () if ablate else planes.items():
                    penc = jnp.where(valid, posenc + plane, -1)
                    for s in range(levels):
                        penc = jnp.maximum(
                            penc,
                            jnp.where(edges[s], -1,
                                      pltpu.roll(penc, 1 << s, axis=1)),
                        )
                    last = penc[:, u_span - 1:u_span]  # chain-free lane
                    fins[name] = jnp.where(penc < 0, last, penc) & maskP

                # --- per-(job, lane) argmax tracking ---
                better = row > refs["bv"][...]
                refs["bv"][...] = jnp.where(better, row, refs["bv"][...])
                refs["bi"][...] = jnp.where(better, zero + i,
                                            refs["bi"][...])
                for aux_name, b_name in track:
                    refs[b_name][...] = jnp.where(
                        better, fins[aux_name], refs[b_name][...])

                refs["prev"][...] = row
                for name, plane in fins.items():
                    refs[name][...] = plane
                return 0

            rows = jnp.minimum(max_rep_len - base, r_tile)
            jax.lax.fori_loop(0, rows, row_step, 0)

        @pl.when(rt == n_rt - 1)
        def _():
            # row-major-first global argmax: max value, then smallest
            # row, then smallest lane (right-aligned lanes preserve the
            # unit-position order)
            bv = refs["bv"][...]
            bi = refs["bi"][...]
            jidx2 = jax.lax.broadcasted_iota(jnp.int32, (b, u_span), 1)
            gmax = jnp.max(bv, axis=1, keepdims=True)
            cand = bv == gmax
            big = jnp.int32(1 << 30)
            bi_m = jnp.where(cand, bi, big)
            min_bi = jnp.min(bi_m, axis=1, keepdims=True)
            cand2 = jnp.logical_and(cand, bi == min_bi)
            j_m = jnp.where(cand2, jidx2, big)
            jstar = jnp.min(j_m, axis=1, keepdims=True)
            found = gmax > 0
            zcol = jnp.zeros((b, 1), jnp.int32)
            args = [
                _gather_col(refs[b_name][...], jstar, u_span)[:, 0:1]
                for _, b_name in track
            ]
            while len(args) < 3:  # pack2 emits raw P1/P2; fn unpacks
                args.append(zcol)
            max_i = jnp.where(found, min_bi, 0)
            start1 = u_span - scal_ref[:, 1:2]
            max_j = jnp.where(found, jstar - start1 + 1, 0)
            wrap_val = refs["prev"][:, u_span - 1:u_span]
            out_ref[...] = jnp.concatenate(
                [wrap_val, gmax, max_i, max_j]
                + [jnp.where(found, a, 0) for a in args]
                + [zcol] * 9,
                axis=1,
            )

    names = (("prev", "auxP1", "auxP2", "bv", "bi", "bP1", "bP2")
             if pack2 else
             ("prev", "auxm", "auxi", "auxs", "bv", "bi", "bm", "bins",
              "bsi"))

    def kernel(scal_ref, rep_ref, unit_ref, out_ref, *scratch):
        body(scal_ref, rep_ref, unit_ref, out_ref,
             dict(zip(names, scratch)))

    return kernel, len(names)


def make_wrap_dp_fused2w(b: int, r_pad: int, u_span: int = 256,
                         interpret: bool = False, r_tile: int = 128,
                         n_sub: int = 1, ablate: str = ""):
    """Batched fused wrap-DP (wide lane variant) for a
    (n_sub*b, u_span, r_pad) bucket; unit_len <= u_span <= 256.

    Inputs (LEFT-aligned, same as make_wrap_dp_fused2):
      scal (n_sub*b, 8) int32: rep_len, unit_len, mg, mp, ip, 0, 0, 0
      rep  (n_sub*b, r_pad) int8 (pad -1), unit (n_sub*b, u_span) int8
    Output: (n_sub*b, 15) int32, layout of make_wrap_dp_fused; rows
    process in b-sized sub-chunks each bounded by its own max rep_len.
    """
    r_tile = min(r_tile, r_pad)
    while r_pad % r_tile:
        r_tile -= 1
    n_rt = r_pad // r_tile
    # the per-row rep-code read widens a (B, r_tile) gather by concat
    assert u_span <= 128 or r_tile * 2 == u_span, (u_span, r_tile)
    kernel, n_scratch = _fused2w_kernel(b, r_tile, r_pad, u_span,
                                        ablate)

    def fn(scal, rep, unit):
        # right-align each job's unit: lane j holds unit[(j - start)]
        # for j >= start = u_span - ul; left lanes keep the -2 pad
        ul = scal[:, 1:2]
        jidx = jnp.arange(u_span, dtype=jnp.int32)[None, :]
        src = jnp.clip(jidx - (u_span - ul), 0, u_span - 1)
        unit_ra = jnp.take_along_axis(
            unit.astype(jnp.int32), src, axis=1)
        unit_ra = jnp.where(jidx >= u_span - ul, unit_ra, -2)
        out = pl.pallas_call(
            kernel,
            grid=(n_sub, n_rt),
            in_specs=[
                pl.BlockSpec((b, 8), lambda s, rt: (s, 0)),
                pl.BlockSpec((b, r_tile), lambda s, rt: (s, rt)),
                pl.BlockSpec((b, u_span), lambda s, rt: (s, 0)),
            ],
            out_specs=pl.BlockSpec((b, 16), lambda s, rt: (s, 0)),
            out_shape=jax.ShapeDtypeStruct((n_sub * b, 16), jnp.int32),
            scratch_shapes=[pltpu.VMEM((b, u_span), jnp.int32)
                            for _ in range(n_scratch)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(scal, rep, unit_ra.astype(jnp.int8))

        bv, bi = out[:, 1], out[:, 2]
        if r_pad <= 32768:  # pack2: unpack P1/P2 (see _fused2w_kernel)
            p1, p2 = out[:, 4], out[:, 5]
            m, ins = p1 >> 8, p2 >> 7
            si = ((p2 & 127) << 8) | (p1 & 255)
        else:
            m, ins, si = out[:, 4], out[:, 5], out[:, 6]
        mgv, mpv, ipv = scal[:, 2], scal[:, 3], scal[:, 4]
        x = bi - si - m - ins
        dl = (m * mgv - x * mpv - bv - ins * ipv) // ipv
        scanned = m + x + dl
        done = jnp.ones_like(m)
        tb = jnp.stack([m, x, ins, dl, scanned, si, done], axis=1)
        return jnp.concatenate([tb, out[:, :8]], axis=1)

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def get_wrap_dp_fused2w(b: int, r_pad: int, u_span: int = 256,
                        n_sub: int = 1):
    interpret = jax.default_backend() == "cpu"
    return make_wrap_dp_fused2w(b, r_pad, u_span, interpret=interpret,
                                n_sub=n_sub)
