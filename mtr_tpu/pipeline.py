"""Production pipeline: batched device compute + host sequential logic.

Processes reads in batches; per batch the work is organized into phases
so every wrap-around DP lands in a few large device dispatches instead
of the reference's one-matrix-at-a-time scalar fills:

  1. DI + candidate ranges   (host numpy / sequential pairing — the
                              arena reuse semantics force read order)
  2. DBG walks               (host, all (range, k) queries)
  3. DP batch #1             (device: every walk candidate x 2 schemes)
  4. scheme + direction selection, acceptance gates
  5. polish + 2 revision rounds (each: device consensus-DP batch +
                              host rebuild + device re-score DP batch)
  6. k-sweep selection, sequential acceptance replay, chaining, output

Phases 3/5 speculate across ranges: the reference suppresses some
pending ranges after an acceptance (handle_one_read.c:178-188), which
only SKIPS queries, so computing every range up front and replaying the
acceptance order afterwards yields byte-identical output.  With
MTR_TPU_WAVES=1 the speculation is wave-pruned instead (see
process_batch): ~99% of suppressible ranges never compute, at the cost
of serializing the later waves against the device leg — measured
slower on the shipping hybrid engine, hence opt-in (PERF.md).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import time
from collections import defaultdict

import numpy as np

from mtr_tpu.utils.timers import TIMERS

from mtr_tpu.config import MTRConfig, DEFAULT_CONFIG
from mtr_tpu.records import RepeatRecord, ratio_less
from mtr_tpu.io.fasta import iter_fasta, Read
from mtr_tpu.chaining import chain_records
from mtr_tpu.utils.encoding import encode_bases
from mtr_tpu.oracle.arena import Arena
from mtr_tpu.oracle.directional_index import fill_directional_index_with_end
from mtr_tpu.oracle.dbg import (
    walk_candidates,
    select_dp_candidate,
    MIN_PERIOD,
    MIN_NUM_FREQ_UNIT,
    MAX_PERIOD,
)
from mtr_tpu.oracle.wrap_dp import _assign
from mtr_tpu.oracle.consensus import polish_repeat

# Every distinct (B, u_pad, r_pad) bucket is a separate Pallas program
# whose FIRST execution on a proxied TPU backend costs minutes of
# terminal-side compile, so buckets are deliberately coarse; jobs are
# sorted by rep_len inside each group so the kernel's tile-skip bounds
# compute by the chunk's longest query, not the bucket size.
import os as _os


def _env_flag(name: str) -> bool:
    """Boolean env knob: unset, empty, and "0" are all OFF (a plain
    truthiness test would read FLAG=0 as enabled)."""
    return _os.environ.get(name, "") not in ("", "0")


R_BUCKETS = (4096, 32768, 65536, 262144, 1048576)
# consensus-mode (polish) jobs are coverage-bounded (repeat_len <=
# 20*MAX_PERIOD, handle_one_read.c:95-98): finer rep buckets keep the
# move tensor small, so the MOVES_BYTES_CAP admits 4-8x more jobs per
# dispatch (dispatch latency dominates the polish phase on proxied
# runtimes)
R_BUCKETS_CONS = (4096, 8192, 16384, 32768, 65536, 262144, 1048576)
# Counts-mode jobs run on the FUSED kernel (ops/wrap_dp_fused.py): one
# program per (u, r) bucket, no move tensor, no traceback program.  The
# unit rides the SUBLANE dim there, so small-unit buckets are cheap —
# a u_pad=8 chunk does 16x less VPU work per row than u_pad=128.
# MTR_TPU_MIN_PROGRAMS coarsens the set (proxied backends pay a large
# per-program first-execution cost; bench mode sets this).
U_BUCKETS_FUSED = (
    (256, 512) if _os.environ.get("MTR_TPU_MIN_PROGRAMS")
    else (8, 32, 128, 256, 512)
)
# batch rides the LANE dim in the fused kernel; B*u_pad bounds VMEM
# (4 persistent planes + ~12 live temporaries per row step).
B_FUSED = {8: 4096, 32: 2048, 128: 1024, 256: 512, 512: 256}
# Counts-mode jobs with unit_len <= 128 take the v2 kernel
# (ops/wrap_dp_fused2.py): jobs on sublanes, unit on the 128-lane vreg
# span, int8 rep streaming.  One program per r bucket.
B_FUSED2 = 2048
# unit_len 129-256 takes the wide right-aligned v2 kernel
# (ops/wrap_dp_fused2w.py) when the job fits its value-packing bound;
# oversized jobs (MG=5 with huge spans — not produced by the reference
# pipeline) fall back to the v1 sublane kernel.
B_FUSED2W = 1024
# Mega-dispatch sub-chunk sizes: the kernel grid's leading dim carries
# b_sub-row sub-chunks, each bounded by its own max rep_len, so one
# dispatch serves a whole (mode, r bucket) group.
SUB_B = {"counts2": 256, "counts2w": 128}
REP_BYTES_CAP = 1 << 30  # gathered rep segments per mega-dispatch
# Consensus-mode (polish) jobs keep the move-tensor + device-traceback
# path: their per-column consensus/missing matrices cannot ride the
# fused argmax propagation, and they are a small minority of jobs.
U_BUCKETS = (512,) if _os.environ.get("MTR_TPU_MIN_PROGRAMS") else (128, 512)
B_FOR_U = {128: 1024, 512: 256}
MOVES_BYTES_CAP = 1 << 30  # cap per-dispatch move-tensor footprint
TB_FACTOR = 6  # one traceback bound for every scheme -> one program


_ENCODE_CACHE: dict = {}


def _encode_unit(s: str) -> np.ndarray:
    """encode_bases with memoization: the same few unit strings appear in
    thousands of DP jobs per batch.  Returned arrays are read-only by
    convention (DP job padding copies out of them)."""
    a = _ENCODE_CACHE.get(s)
    if a is None:
        from mtr_tpu.utils.encoding import encode_bases

        if len(_ENCODE_CACHE) > 65536:
            _ENCODE_CACHE.clear()
        a = encode_bases(s)
        _ENCODE_CACHE[s] = a
    return a


def _bucket(v: int, buckets) -> int:
    for b in buckets:
        if v <= b:
            return b
    return buckets[-1]


def _fits_w(job: "DPJob", rep_len: int, r_pad: int) -> bool:
    """Value-packing bound of the wide v2 kernel (wrap_dp_fused2w.w_limit)."""
    from mtr_tpu.ops.wrap_dp_fused2w import w_limit

    return (rep_len * job.scheme[0] + job.scheme[2] * 255
            < w_limit(256, r_pad))


def _f2w_rep_cap(r_pad: int) -> int:
    """Aux-count packing bound of the wide v2 kernel (rep_cap)."""
    from mtr_tpu.ops.wrap_dp_fused2w import rep_cap

    return rep_cap(r_pad)


@functools.lru_cache(maxsize=1)
def _cpu_backend() -> bool:
    import jax

    return jax.default_backend() == "cpu"


def _put(*arrays):
    """Async explicit host->device transfers (no-op on CPU: device_put
    would copy what jit aliases zero-copy)."""
    if _cpu_backend():
        return arrays
    import jax

    return tuple(jax.device_put(a) for a in arrays)


@functools.lru_cache(maxsize=64)
def _resident_inner(kind: str, b_pad: int, u_pad: int, r_pad: int,
                    factor: int = 0, n_sub: int = 1):
    """Single-device resident kernel for a chunk shape."""
    if kind != "consensus" and _os.environ.get("MTR_TPU_XLA_DP"):
        # pure-XLA counts engine: no Mosaic — survives proxied
        # runtimes whose Pallas compile service is wedged while
        # plain XLA still works (bench preflight sets this)
        from mtr_tpu.ops.wrap_dp_xla import (
            get_wrap_dp_counts_xla_resident,
        )

        return get_wrap_dp_counts_xla_resident(b_pad, u_pad, r_pad)
    from mtr_tpu.ops.wrap_dp_resident import (
        get_wrap_dp_consensus_resident,
        get_wrap_dp_fused2_resident,
        get_wrap_dp_fused2w_resident,
        get_wrap_dp_fused_resident,
    )

    if kind == "counts2":
        return get_wrap_dp_fused2_resident(b_pad, r_pad, n_sub)
    if kind == "counts2w":
        return get_wrap_dp_fused2w_resident(b_pad, r_pad, u_pad, n_sub)
    if kind == "counts":
        return get_wrap_dp_fused_resident(b_pad, u_pad, r_pad)
    return get_wrap_dp_consensus_resident(b_pad, u_pad, r_pad, factor)


@functools.lru_cache(maxsize=64)
def _resident_fn_packed(kind: str, b_pad: int, u_pad: int, r_pad: int,
                        factor: int = 0, n_sub: int = 1):
    """Packed-argument shim over _resident_inner: unpacks the single
    (n, 9 + u_pad/4) int32 chunk array on device — col 0 starts, cols
    1:9 scal, the rest the int8 unit rows bitcast 4-per-word (XLA
    bitcast-convert orders parts least-significant-first, matching the
    host's little-endian numpy view)."""
    import jax
    import jax.numpy as jnp

    inner = _resident_inner(kind, b_pad, u_pad, r_pad, factor, n_sub)

    def f(flat, packed):
        starts = packed[:, 0]
        scal = packed[:, 1:9]
        units = jax.lax.bitcast_convert_type(
            packed[:, 9:], jnp.int8).reshape(packed.shape[0], u_pad)
        return inner(flat, starts, scal, units)

    return jax.jit(f)


def dedup_jobs(jobs: list["DPJob"]) -> tuple[list["DPJob"], list[int]]:
    """Many k values discover the SAME unit for the same range, and the
    DP result depends only on (read segment, unit, scheme, mode) — so
    identical jobs are computed once and fanned out.  Returns the unique
    job list and, per original job, its index into it."""
    uniq: dict = {}
    uniq_jobs: list[DPJob] = []
    remap: list[int] = []
    for job in jobs:
        key = (
            id(job.org), job.qs, job.qe,
            job.unit.tobytes(), job.scheme, job.mode,
        )
        idx = uniq.get(key)
        if idx is None:
            idx = len(uniq_jobs)
            uniq[key] = idx
            uniq_jobs.append(job)
        remap.append(idx)
    return uniq_jobs, remap


@dataclasses.dataclass
class DPJob:
    org: np.ndarray  # effective per-read arena view (codes + stale tail)
    qs: int
    qe: int
    unit: np.ndarray  # int32 unit codes
    scheme: tuple
    mode: str = "counts"  # 'counts' | 'consensus'
    result: object = None


class WrapDPBatcher:
    """Groups DP jobs into (rep, unit, batch, mode) buckets, runs the
    Pallas fill kernel, and walks the move tensors ON DEVICE — only the
    small count/consensus arrays ever cross the host link."""

    def __init__(self):
        # Freelist of padding-buffer triples per shape.  A buffer is
        # only reused after its chunk's RESULT has materialized (inputs
        # fully consumed): JAX may alias page-aligned numpy args
        # zero-copy on the CPU backend, so refilling a buffer while a
        # prior dispatch is still in flight would corrupt that chunk.
        self._free: dict = defaultdict(list)
        self._seq = 0
        self._flat = None      # device-resident flat reads (int8)
        self._offsets: dict = {}  # id(org) -> offset into flat
        self.mesh = None       # set by ShardedWrapDPBatcher

    def _fn(self, kind: str, b_pad: int, u_pad: int, r_pad: int,
            factor: int = 0, n_sub: int = 1):
        """Resident kernel for a chunk shape; sharded over self.mesh's
        'dp' axis when a mesh is attached."""
        if self.mesh is not None:
            from mtr_tpu.parallel.mesh import sharded_resident_fn

            return sharded_resident_fn(
                self.mesh, kind, b_pad, u_pad, r_pad, factor, n_sub)
        return _resident_inner(kind, b_pad, u_pad, r_pad, factor, n_sub)

    def _dispatch_resident(self, kind, b_pad, u_pad, r_pad, starts,
                           scal, units, factor=0, n_sub=1):
        """One dispatch of a resident chunk.  The per-chunk inputs ship
        as ONE packed int32 put and split on device: each device_put
        costs a full proxy roundtrip (measured 23 ms — three separate
        puts were ~40% of the device leg's wall), so starts/scal/units
        ride together.  The sharded (mesh) path keeps the three-array
        interface."""
        n = scal.shape[0]
        if self.mesh is not None:
            fn = self._fn(kind, b_pad, u_pad, r_pad, factor, n_sub)
            return fn(self._flat, *_put(starts, scal, units))
        fn = _resident_fn_packed(kind, b_pad, u_pad, r_pad, factor,
                                 n_sub)
        packed = np.empty((n, 9 + u_pad // 4), np.int32)
        packed[:, 0] = starts[:n]
        packed[:, 1:9] = scal
        packed[:, 9:] = units.view(np.int32)
        return fn(self._flat, *_put(packed))

    def begin_batch(self, orgs: list[np.ndarray]) -> None:
        """Upload the batch's read arrays once; counts-mode chunks then
        gather their rep segments on device (ops/wrap_dp_resident.py)
        instead of re-uploading (B, r_pad) padding buffers per chunk."""
        import jax

        from mtr_tpu import native

        total = sum(len(o) for o in orgs)
        # trailing slack >= the largest r bucket so dynamic_slice never
        # clamps; power-of-two total length bounds distinct jit traces
        need = total + R_BUCKETS[-1]
        pad = 1 << max(20, (need - 1).bit_length())
        # double-buffered: the previous batch's device_put is async and
        # its source must not be refilled while potentially in flight
        self._seq += 1
        flat = native.POOL.get(
            f"resident_flat_{self._seq % 2}", (pad,), np.int8)
        off: dict = {}
        p = 0
        for o in orgs:
            flat[p : p + len(o)] = o
            off[id(o)] = p
            p += len(o)
        self._offsets = off
        self._flat = jax.device_put(flat)  # async

    def _acquire(self, b_pad, r_pad, u_pad, dtype=np.int32):
        from mtr_tpu import native

        tag = np.dtype(dtype).name
        lst = self._free[(b_pad, r_pad, u_pad, tag)]
        if lst:
            return lst.pop()
        self._seq += 1
        s = self._seq
        reps = native.POOL.get(
            f"dev_reps_{tag}_{b_pad}x{r_pad}_{s}", (b_pad, r_pad), dtype)
        units = native.POOL.get(
            f"dev_units_{tag}_{b_pad}x{u_pad}_{s}", (b_pad, u_pad), dtype)
        scal = native.POOL.get(f"dev_scal_{tag}_{b_pad}_{s}", (b_pad, 8), np.int32)
        return (reps, units, scal)

    def _acquire_resident(self, b_pad, u_pad):
        """[units int8, scal int32, starts int32, dirty_rows] — no rep
        buffer; the rep segments are gathered on device from the
        resident flat.  Fresh buffers come pre-set to the padding-row
        defaults; reused ones re-clean only the rows the previous
        dispatch wrote (dirty_rows), so a mostly-empty mega arena costs
        no full memset."""
        from mtr_tpu import native

        lst = self._free[("res", b_pad, u_pad)]
        if lst:
            buf = lst.pop()
            units, scal, starts, dirty = buf
            units[:dirty].fill(-2)
            units[:dirty, :2] = 0
            scal[:dirty].fill(0)
            scal[:dirty, 1] = 2
            scal[:dirty, 2:5] = 1
            starts[:dirty] = 0
            return buf
        self._seq += 1
        s = self._seq
        units = native.POOL.get(
            f"res_units_{b_pad}x{u_pad}_{s}", (b_pad, u_pad), np.int8)
        scal = native.POOL.get(f"res_scal_{b_pad}_{s}", (b_pad, 8), np.int32)
        starts = native.POOL.get(f"res_starts_{b_pad}_{s}", (b_pad,), np.int32)
        units.fill(-2)
        units[:, :2] = 0
        scal.fill(0)
        scal[:, 1] = 2
        scal[:, 2:5] = 1
        starts.fill(0)
        return [units, scal, starts, 0]

    def run(self, jobs: list[DPJob], deduped: bool = False) -> None:
        uniq_jobs, remap = (jobs, None) if deduped else dedup_jobs(jobs)
        to_run = uniq_jobs
        if (_os.environ.get("MTR_TPU_XLA_DP") and not _cpu_backend()
                and self.mesh is None):
            # no-Mosaic mode: the consensus path has no pure-XLA device
            # variant (its move tensor + bounded traceback are Pallas),
            # so polish jobs take the native host engine
            cons = [j for j in uniq_jobs if j.mode == "consensus"]
            if cons:
                from mtr_tpu import native

                if native.available():
                    HostDPBatcher()._run(cons)
                    to_run = [j for j in uniq_jobs
                              if j.mode != "consensus"]
        self._run(to_run)
        if remap is not None and len(uniq_jobs) != len(jobs):
            # results live on the job objects; remap indexes the intact
            # uniq_jobs list
            for job, ui in zip(jobs, remap):
                job.result = uniq_jobs[ui].result

    def _run(self, jobs: list[DPJob]) -> None:
        resident_all = self._flat is not None and not _os.environ.get(
            "MTR_TPU_XLA_DP")
        groups: dict[tuple[int, int, str], list[int]] = defaultdict(list)
        mega_groups: dict[tuple[str, int], list[int]] = defaultdict(list)
        for idx, job in enumerate(jobs):
            rep_len = job.qe - job.qs + 1
            r_pad = _bucket(rep_len, R_BUCKETS)
            if job.mode == "consensus":
                r_pad = _bucket(rep_len, R_BUCKETS_CONS)
                u_pad = _bucket(len(job.unit), U_BUCKETS)
                mode = "consensus"
            elif len(job.unit) <= 128:
                # v2 kernel: unit on the 128-lane vreg span
                u_pad, mode = 128, "counts2"
            elif len(job.unit) <= 256 and _fits_w(job, rep_len, r_pad):
                # wide v2 kernel: unit right-aligned over two vregs;
                # the packed two-scan aux caps counts at 15 bits, so a
                # rep_len above the cap bumps to the next bucket
                u_pad, mode = 256, "counts2w"
                if rep_len > _f2w_rep_cap(r_pad):
                    r_pad = _bucket(rep_len + 1, R_BUCKETS)
            else:
                u_pad = _bucket(len(job.unit), U_BUCKETS_FUSED)
                mode = "counts"
            if (mode in ("counts2", "counts2w") and resident_all
                    and id(job.org) in self._offsets):
                mega_groups[(mode, u_pad)].append(idx)
            else:
                groups[(r_pad, u_pad, mode)].append(idx)

        pending = []
        for (mode, u_pad), idxs in sorted(mega_groups.items()):
            # mega-dispatch: sub-chunks ride the kernel grid and each
            # bounds its own rows, so ALL rep buckets of a mode ship in
            # ONE dispatch (3 host->device puts total — a blocking put
            # costs a proxy roundtrip).  Jobs sort longest-first; a
            # dispatch slice takes the rep bucket of its LONGEST job
            # and is capped by the gathered-rep HBM footprint, so the
            # tail of short jobs lands in cheaper narrow dispatches.
            idxs.sort(key=lambda i: jobs[i].qs - jobs[i].qe)
            b_sub = SUB_B[mode]
            lo = 0
            while lo < len(idxs):
                j0 = jobs[idxs[lo]]
                rl0 = j0.qe - j0.qs + 1
                r_pad = _bucket(rl0, R_BUCKETS)
                if mode == "counts2w" and rl0 > _f2w_rep_cap(r_pad):
                    r_pad = _bucket(rl0 + 1, R_BUCKETS)
                max_jobs = max(
                    b_sub,
                    (REP_BYTES_CAP // r_pad) // b_sub * b_sub,
                )
                part = idxs[lo : lo + max_jobs]
                pending.append(self._dispatch_mega(
                    jobs, part, r_pad, u_pad, mode, b_sub))
                lo += len(part)

        for (r_pad, u_pad, mode), idxs in sorted(groups.items()):
            # longest-first ordering keeps chunks rep_len homogeneous
            idxs.sort(key=lambda i: jobs[i].qs - jobs[i].qe)
            if mode == "consensus":
                cap = max(1, MOVES_BYTES_CAP // ((r_pad + 1) * u_pad))
                cap = min(cap, B_FOR_U[u_pad])
            elif mode == "counts2":
                cap = B_FUSED2
            elif mode == "counts2w":
                cap = B_FUSED2W
            else:
                cap = B_FUSED[u_pad]
            # chunk cuts trade padded rows against the ~fixed per-chunk
            # dispatch+pull latency, so a cut must save thousands of
            # rows; short-read workloads stay in few chunks
            chunk: list[int] = []
            chunk_max_rl = 0
            CUT_ROWS = 4096
            for i in idxs:
                rl = jobs[i].qe - jobs[i].qs + 1
                if chunk and (
                    len(chunk) >= cap
                    or (rl * 4 < chunk_max_rl
                        and chunk_max_rl - rl > CUT_ROWS
                        and len(chunk) >= 32)
                ):
                    pending.append(self._dispatch_chunk(
                        jobs, chunk, r_pad, u_pad, mode, cap))
                    chunk = []
                if not chunk:
                    chunk_max_rl = rl
                chunk.append(i)
            if chunk:
                # dispatch is async: later chunks' host-side padding
                # overlaps earlier chunks' device execution
                pending.append(self._dispatch_chunk(
                    jobs, chunk, r_pad, u_pad, mode, cap))
        # start all device->host transfers before blocking on any: each
        # blocking pull on a proxied TPU costs a full tunnel roundtrip,
        # async copies overlap with the remaining executions
        for item in pending:
            for arr in item[2]:
                try:
                    arr.copy_to_host_async()
                except AttributeError:
                    pass
        # single-pull: the axon proxy serializes blocking pulls at a
        # full roundtrip each (measured 30-360 ms/chunk, ~1.8 s per
        # north-star batch for ~6 MB of results), so 2-D counts
        # payloads concatenate ON DEVICE and cross the link once;
        # chunk shapes are quantized, so the concat trace cache stays
        # small
        flat2d = [
            (i, item[2][0]) for i, item in enumerate(pending)
            if item[1] == "counts" and getattr(item[2][0], "ndim", 0) == 2
        ]
        if len(flat2d) > 1 and not _cpu_backend():
            import jax.numpy as jnp

            by_w: dict[int, list] = defaultdict(list)
            for i, a in flat2d:
                by_w[a.shape[1]].append((i, a))
            for group in by_w.values():
                if len(group) < 2:
                    continue
                with TIMERS.section("dp_wait"):
                    big = np.asarray(
                        jnp.concatenate([a for _, a in group], axis=0))
                off = 0
                for i, a in group:
                    rows = a.shape[0]
                    it = pending[i]
                    pending[i] = (it[0], it[1], (big[off:off + rows],),
                                  it[3], it[4])
                    off += rows
        for item in pending:
            self._collect_chunk(jobs, *item)

    def _dispatch_mega(self, jobs, part, r_pad, u_pad, mode, b_sub):
        """One dispatch for a longest-first job slice: rows pack into
        b_sub-sized sub-chunks on the kernel grid; n_sub is padded to a
        power of two (empty sub-chunks skip all row work) to bound the
        number of compiled programs."""
        n = len(part)
        n_sub = -(-n // b_sub)
        n_sub = 1 << (n_sub - 1).bit_length()
        if self.mesh is not None:
            n_dev = int(self.mesh.devices.size)
            n_sub = max(n_sub, n_dev)  # both powers of two -> divisible
        b_tot = n_sub * b_sub
        buffers = self._acquire_resident(b_tot, u_pad)
        units, scal, starts = buffers[:3]
        buffers[3] = n  # dirty rows for the next reuse
        # vectorized row fill: python-per-job only for attribute
        # extraction; unit payloads write once per distinct unit
        qs_a = np.fromiter(
            (jobs[i].qs for i in part), np.int64, n)
        qe_a = np.fromiter(
            (jobs[i].qe for i in part), np.int64, n)
        off_a = np.fromiter(
            (self._offsets[id(jobs[i].org)] for i in part), np.int64, n)
        starts[:n] = off_a + qs_a + 1
        scal[:n, 0] = qe_a - qs_a + 1
        scal[:n, 2:5] = [jobs[i].scheme for i in part]
        by_unit: dict = defaultdict(list)
        for row, idx in enumerate(part):
            by_unit[jobs[idx].unit.tobytes()].append(row)
        ulen = np.empty(n, np.int32)
        for key, rows in by_unit.items():
            unit = jobs[part[rows[0]]].unit
            units[np.asarray(rows), : len(unit)] = unit
            ulen[rows] = len(unit)
        scal[:n, 1] = ulen
        with TIMERS.section("dp_dispatch"):
            fused = self._dispatch_resident(
                mode, b_sub, u_pad, r_pad, starts, scal, units,
                n_sub=n_sub)
        TIMERS.count("dp_jobs", n)
        TIMERS.count("dp_chunks")
        return (part, "counts", (fused,), ("res", b_tot, u_pad),
                buffers)

    def _dispatch_chunk(self, jobs, chunk, r_pad, u_pad, mode, cap=None):
        from mtr_tpu.ops.wrap_dp_pallas import (
            get_wrap_dp_pallas,
            traceback_consensus_batch,
        )
        from mtr_tpu.ops.wrap_dp_fused import get_wrap_dp_fused, fused_limits

        n = len(chunk)
        if mode == "consensus":
            b_pad = B_FOR_U[u_pad]
        elif mode == "counts2":
            b_pad = B_FUSED2
        elif mode == "counts2w":
            b_pad = B_FUSED2W
        else:
            b_pad = B_FUSED[u_pad]
        if cap is not None:
            # quantized partial-fill shapes: padding slots cost full
            # kernel time, so underfilled chunks shrink to the smallest
            # quantum that holds them (3 program shapes per bucket)
            for q in (max(8, cap // 16), max(8, cap // 4), cap):
                if n <= q:
                    b_pad = q
                    break
        if _cpu_backend():
            # interpret-mode cost scales with b_pad regardless of chunk
            # fill; shrink to the chunk (tests / CPU fallback only)
            b_pad = min(b_pad, max(128, 1 << (max(n, 1) - 1).bit_length()))
        if self.mesh is not None:
            n_dev = int(self.mesh.devices.size)
            b_pad = max(b_pad, n_dev)
            b_pad = -(-b_pad // n_dev) * n_dev  # local shards equal-sized
        # resident path: reads were uploaded once by begin_batch; ship
        # only per-job (start, scal, unit) and gather the rep segments
        # on device
        resident = (
            self._flat is not None
            and all(id(jobs[i].org) in self._offsets for i in chunk)
        )
        if resident:
            buffers = self._acquire_resident(b_pad, u_pad)
            units, scal, starts = buffers[:3]
            buffers[3] = n  # dirty rows for the next reuse
        else:
            # pooled per shape via a freelist: fresh per-chunk np.full
            # buffers would pay the lazy-memory first-touch cost (see
            # native._BufPool), and shape-keyed reuse alone would race
            # in-flight dispatches
            dtype = np.int8 if mode in ("counts2", "counts2w") else np.int32
            buffers = self._acquire(b_pad, r_pad, u_pad, dtype)
            reps, units, scal = buffers
            reps.fill(-1)
            units.fill(-2)
            scal.fill(0)
            units[:, :2] = 0
            scal[:, 1] = 2
            scal[:, 2:5] = 1
        for row, idx in enumerate(chunk):
            job = jobs[idx]
            rep_len = job.qe - job.qs + 1
            if resident:
                starts[row] = self._offsets[id(job.org)] + job.qs + 1
            else:
                seg = job.org[job.qs + 1 : job.qs + 1 + rep_len]
                reps[row, : len(seg)] = seg
            units[row, : len(job.unit)] = job.unit
            scal[row, 0] = rep_len
            scal[row, 1] = len(job.unit)
            scal[row, 2:5] = job.scheme
        if mode in ("counts2", "counts2w"):
            with TIMERS.section("dp_dispatch"):
                # explicit async device_put: the jit argument-transfer
                # path moves host buffers an order of magnitude slower
                # than device_put on proxied backends
                if resident:
                    fused = self._dispatch_resident(
                        mode, b_pad, u_pad, r_pad, starts, scal, units)
                elif mode == "counts2":
                    from mtr_tpu.ops.wrap_dp_fused2 import (
                        get_wrap_dp_fused2,
                    )

                    fn = get_wrap_dp_fused2(b_pad, r_pad)
                    fused = fn(*_put(scal, reps, units))
                else:
                    from mtr_tpu.ops.wrap_dp_fused2w import (
                        get_wrap_dp_fused2w,
                    )

                    fn = get_wrap_dp_fused2w(b_pad, r_pad, u_pad)
                    fused = fn(*_put(scal, reps, units))
            TIMERS.count("dp_jobs", len(chunk))
            TIMERS.count("dp_chunks")
            return (chunk, "counts", (fused,),
                    ("res", b_pad, u_pad) if resident
                    else (b_pad, r_pad, u_pad, "int8"),
                    buffers)
        if mode == "counts":
            # fused fill+counts kernel: one dispatch, no move tensor
            limit = min(fused_limits(u_pad))
            peak = int(
                (scal[:, 0] * scal[:, 2] + scal[:, 4] * u_pad).max()
            )
            assert peak < limit, (
                f"job exceeds fused packing bound: {peak} >= {limit}"
            )
            from mtr_tpu.ops.wrap_dp_resident import (
                get_wrap_dp_fused_resident,
            )

            with TIMERS.section("dp_dispatch"):
                if resident:
                    fused = self._dispatch_resident(
                        "counts", b_pad, u_pad, r_pad, starts, scal,
                        units)
                else:
                    fn = get_wrap_dp_fused(b_pad, u_pad, r_pad)
                    fused = fn(*_put(scal, reps, units))
            TIMERS.count("dp_jobs", len(chunk))
            TIMERS.count("dp_chunks")
            return (chunk, mode, (fused,),
                    ("res", b_pad, u_pad) if resident
                    else (b_pad, r_pad, u_pad, "int32"),
                    buffers)
        # provable path bound: steps <= rep_len * (1 + ceil(MG/IP));
        # quantized to {2, 6} so at most two traceback programs per mode
        factor = 1 + max(
            -(-jobs[i].scheme[0] // jobs[i].scheme[2]) for i in chunk
        )
        factor = 2 if factor <= 2 else TB_FACTOR
        if resident:
            with TIMERS.section("dp_dispatch"):
                fused = self._dispatch_resident(
                    "consensus", b_pad, u_pad, r_pad, starts, scal,
                    units, factor=factor)
            TIMERS.count("dp_jobs", len(chunk))
            TIMERS.count("dp_chunks")
            return (chunk, mode, (fused,), ("res", b_pad, u_pad), buffers)
        fn = get_wrap_dp_pallas(b_pad, u_pad, r_pad)
        with TIMERS.section("dp_dispatch"):
            moves, best = fn(*_put(scal, reps, units))
        TIMERS.count("dp_jobs", len(chunk))
        TIMERS.count("dp_chunks")
        unit_lens = scal[:, 1].copy()
        fused = traceback_consensus_batch(moves, reps, unit_lens, best, factor)
        return (chunk, mode, (fused,), (b_pad, r_pad, u_pad, "int32"), buffers)

    def _collect_chunk(self, jobs, chunk, mode, payload, shape_key, buffers) -> None:
        # the blocked device->host wait, split from dispatch so the -c
        # stage summary attributes device time unambiguously (VERDICT r3
        # #7; reference timer granularity: main.c:108-121)
        with TIMERS.section("dp_wait"):
            fused = np.asarray(payload[0])
        # result materialized => the dispatch consumed its inputs; the
        # padding buffers may now be reused by a later chunk
        self._free[shape_key].append(buffers)
        if mode == "counts":
            assert fused[: len(chunk), 6].all(), "traceback step bound exceeded"
            for row, idx in enumerate(chunk):
                m, x, ins, dele, scanned, i_final = (int(v) for v in fused[row, :6])
                jobs[idx].result = (
                    (m, x, ins, dele, scanned),
                    i_final,
                    int(fused[row, 7 + 2]),
                )
        else:
            for row, idx in enumerate(chunk):
                jobs[idx].result = (fused[row, :, :5], fused[row, :, 5:])


class ShardedWrapDPBatcher(WrapDPBatcher):
    """WrapDPBatcher whose resident kernels run under shard_map over a
    device mesh: every chunk's job batch is split evenly across the
    mesh's 'dp' axis (SURVEY.md 2.13 — reads/queries are the
    embarrassingly parallel axis), the flat read array is replicated,
    and each device fills its local shard with the same Pallas program.
    Results concatenate back on the batch axis, so outputs are
    bit-identical to the single-device batcher."""

    def __init__(self, mesh):
        super().__init__()
        self.mesh = mesh


class HostDPBatcher:
    """Native C++ wrap-DP engine (threaded scalar fills) with the same
    job interface as WrapDPBatcher.  Used when no TPU is usable and as a
    cross-check implementation."""

    def begin_batch(self, orgs: list[np.ndarray]) -> None:
        pass  # host engine reads segments in place

    def run(self, jobs: list[DPJob], deduped: bool = False) -> None:
        if deduped:
            self._run(jobs)
            return
        uniq_jobs, remap = dedup_jobs(jobs)
        self._run(uniq_jobs)
        if len(uniq_jobs) != len(jobs):
            for job, ui in zip(jobs, remap):
                job.result = uniq_jobs[ui].result

    def _run(self, jobs: list[DPJob]) -> None:
        from mtr_tpu import native

        if not jobs:
            return
        if not native.available():
            # dependency-free degrade: exact oracle DP per job.  Slow,
            # but a checkout whose native build failed (no compiler)
            # must still "just work" like the reference CLI (main.c:48)
            self._run_oracle(jobs)
            return
        n = len(jobs)
        # pooled: the C side reads only units[q, :ulens[q]], so stale data
        # beyond each unit is never seen
        units = native.POOL.get("dpb_units", (n, 500), np.int32)
        ulens = np.zeros(n, np.int32)
        schemes = np.zeros((n, 3), np.int32)
        modes = np.zeros(n, np.int32)
        orgs, qss, qes = [], [], []
        for q, job in enumerate(jobs):
            units[q, : len(job.unit)] = job.unit
            ulens[q] = len(job.unit)
            schemes[q] = job.scheme
            modes[q] = 0 if job.mode == "counts" else 1
            orgs.append(np.ascontiguousarray(job.org, np.int32))
            qss.append(job.qs)
            qes.append(job.qe)
        with TIMERS.section("dp_fill"):
            res = native.wrap_dp_batch(orgs, qss, qes, units, ulens, schemes, modes)
        if res is None:
            self._run_oracle(jobs)
            return
        counts, cons, miss = res
        TIMERS.count("dp_jobs", n)
        clist = counts[:n].tolist()  # one C-level conversion for all rows
        for q, job in enumerate(jobs):
            if job.mode == "counts":
                m, x, ins, dele, scanned, i_final, max_i = clist[q]
                job.result = ((m, x, ins, dele, scanned), i_final, max_i)
            else:
                job.result = (cons[q], miss[q])


    def _run_oracle(self, jobs: list[DPJob]) -> None:
        """Pure-Python engine (oracle wrap_dp_fill + traceback,
        wrap_around_DP.c:222-354): byte-identical to the native/device
        engines, used only when libmtr_host.so cannot be built."""
        from mtr_tpu.oracle.wrap_dp import traceback, wrap_dp_fill

        with TIMERS.section("dp_fill"):
            for job in jobs:
                rep_len = job.qe - job.qs + 1
                rep = job.org[job.qs + 1 : job.qs + 1 + rep_len]
                mg, mp, ip = job.scheme
                D, max_wrd, max_i, max_j = wrap_dp_fill(
                    rep, job.unit, mg, mp, ip)
                path, i_final = traceback(
                    D, max_wrd, max_i, max_j, rep, job.unit, mg, mp, ip)
                if job.mode == "counts":
                    n_m = n_x = n_i = n_d = 0
                    for mv, _, _ in path:
                        if mv == "M":
                            n_m += 1
                        elif mv == "X":
                            n_x += 1
                        elif mv == "I":
                            n_i += 1
                        else:
                            n_d += 1
                    job.result = (
                        (n_m, n_x, n_i, n_d, n_m + n_x + n_d),
                        i_final, max_i,
                    )
                else:
                    cons = np.zeros((501, 5), np.int64)
                    miss = np.zeros((501, 4), np.int64)
                    for mv, i, j in path:
                        if mv in ("M", "X"):
                            cons[j][rep[i - 1]] += 1
                        elif mv == "D":
                            cons[j][4] += 1
                        else:
                            miss[j][rep[i - 1]] += 1
                    job.result = (cons, miss)
        TIMERS.count("dp_jobs", len(jobs))


class HybridDPBatcher:
    """Big DP jobs go to the TPU (where ~97% of the cells are on repeat
    workloads), small jobs to the native host engine, overlapped: the
    device chunks execute asynchronously while the host threads chew the
    small-job tail.  Every engine is bit-exact, so the split is free of
    semantic risk.  cell_threshold picks the crossover; the default
    (4M cells) amortizes even high dispatch latencies.

    Degradation: if the device leg ever fails, or its first batch blows
    the compile/dispatch budget (MTR_TPU_DEVICE_BUDGET_S, default 900 s
    — generous enough for a cold Pallas compile, small vs the hours a
    wedged proxied runtime can burn), the failed jobs are re-run on the
    host engine and the device leg is disabled for the rest of the run
    with a stderr notice.  The reference CLI "just works" (main.c:48);
    so must ours on hardware with a flaky accelerator path."""

    def __init__(self, cell_threshold: int | None = None):
        self.device = WrapDPBatcher()
        self.host = HostDPBatcher()
        if cell_threshold is None:
            # resident feeding dropped the device's per-job transfer
            # cost to ~nothing, so the crossover sits far lower than
            # round 2's 4M-cell default: >=256k-cell jobs (~96% of all
            # cells on long-read workloads) amortize a dispatch easily
            env_cells = _os.environ.get("MTR_TPU_HYBRID_CELLS")
            if env_cells is not None:
                cell_threshold = int(env_cells)  # explicit override wins
            else:
                cell_threshold = 1 << 18
                from mtr_tpu import native

                if not native.available():
                    # no native host leg: its oracle fallback is orders
                    # of magnitude slower than a device dispatch, so ship
                    # every counts job to the device (consensus stays host)
                    cell_threshold = 0
        self.cell_threshold = cell_threshold
        # polish (consensus-mode) jobs ship to the device above this
        # many cells; default keeps them host (the measured win on
        # polish-heavy coverage-[5,20] sets decides the shipping value)
        self.cons_threshold = int(
            _os.environ.get("MTR_TPU_HYBRID_CONS_CELLS", str(1 << 62)))
        self.device_ok = True
        self._first_done = False
        self.dev_idle_s = 0.0
        self.budget_s = float(
            _os.environ.get("MTR_TPU_DEVICE_BUDGET_S", "900"))

    def pop_dev_idle(self) -> float:
        """Host-idle-waiting-on-device seconds since the last call."""
        v = self.dev_idle_s
        self.dev_idle_s = 0.0
        return v

    def begin_batch(self, orgs: list[np.ndarray]) -> None:
        # DEFERRED: the flat upload only happens once a device-bound
        # job set materializes, and then on the device thread — on
        # short-read workloads whose jobs all stay under the floor the
        # upload would be a pure tax on the critical path
        self._batch_orgs = orgs if self.device_ok else None

    def run(self, jobs: list[DPJob], deduped: bool = False) -> None:
        import threading

        uniq_jobs, remap = (
            (jobs, None) if deduped else dedup_jobs(jobs))

        cells = [
            (j.qe - j.qs + 1) * len(j.unit) if j.mode == "counts"
            else -(j.qe - j.qs + 1) * len(j.unit)
            for j in uniq_jobs
        ]
        thr = self.cell_threshold
        counts_cells = [c for c in cells if c >= 0]
        if self.device_ok and counts_cells and max(counts_cells) < thr:
            # small-job workloads (e.g. 3 kb reads: biggest jobs ~100 k
            # cells) would otherwise never touch the device.  Round-5
            # re-sweep on the 100x10 set (real chip, warm, interleaved):
            # 16 k/32 k floors run 0.85-0.93 s vs 0.96-1.01 s at the
            # round-4 4 k floor and ~0.92 s pure host — the round-5 host
            # engine (walk memo + early-out) is fast enough that only
            # the larger jobs amortize a dispatch.  Bit-exact either
            # way — the split is pure scheduling.
            thr = max(thr >> 4, 1 << 14)

        def to_device(c):
            if c >= 0:
                return self.device_ok and c >= thr
            # consensus-mode (polish) jobs (cells encoded negative):
            # their device path pulls per-column consensus tensors
            # (~5 KB/job vs the 120 B fused counts row), so they ride
            # the device only above their own threshold
            # (consensus.c:851-1009; VERDICT r3 #4)
            return self.device_ok and -c >= self.cons_threshold

        big = [j for j, c in zip(uniq_jobs, cells) if to_device(c)]
        small = [j for j, c in zip(uniq_jobs, cells) if not to_device(c)]
        if big:
            # jobs outside the mega path (unit > 256 / w-limit misses)
            # dispatch as standalone (r, u) chunks whose kernel cost is
            # b_pad x max_rep regardless of fill — a 2-job chunk burns
            # ~64x its useful cells on device while the AVX-512 host
            # fill does those cells in milliseconds.  Keep only groups
            # big enough to fill a dispatch.
            v1_groups: dict = defaultdict(list)
            for j in big:
                rep_len = j.qe - j.qs + 1
                if j.mode != "counts" or len(j.unit) <= 128:
                    continue
                r_pad = _bucket(rep_len, R_BUCKETS)
                if len(j.unit) <= 256 and _fits_w(j, rep_len, r_pad):
                    continue  # counts2w: merged by the mega path
                v1_groups[(r_pad,
                           _bucket(len(j.unit), U_BUCKETS_FUSED))].append(j)
            demote = {id(j) for js in v1_groups.values()
                      if len(js) <= 16 for j in js}
            if demote:
                small.extend(j for j in big if id(j) in demote)
                big = [j for j in big if id(j) not in demote]
        if big:
            # engagement gate: a device round costs a ~fixed dispatch +
            # pull latency (~0.15 s through this proxy) whatever it
            # carries; when the offloadable work is small (short-read
            # batches: ~20 M cells), paying it LOSES outright —
            # measured on the 100x10 set: the device leg relieved
            # 0.015 s of host work for 0.145 s of wait.  Engage only
            # when the shipped cells could plausibly amortize it.
            dev_cells = sum(
                (j.qe - j.qs + 1) * len(j.unit) for j in big
                if j.mode == "counts")
            if dev_cells < int(_os.environ.get(
                    "MTR_TPU_MIN_DEVICE_CELLS", str(1 << 26))):
                small.extend(big)
                big = []
        if big:
            err: list = []
            t0 = time.time()

            def dev_run():
                try:
                    orgs = getattr(self, "_batch_orgs", None)
                    if orgs is not None:
                        self.device.begin_batch(orgs)
                        self._batch_orgs = None
                    self.device._run(big)
                except Exception as e:  # handled on the caller thread
                    err.append(e)

            t = threading.Thread(target=dev_run)
            t.start()
            self.host._run(small)
            _t_host_done = time.time()
            t.join(None if self._first_done else self.budget_s)
            over_budget = t.is_alive()
            if not over_budget:
                # host-idle time spent waiting on the device leg: the
                # adaptive wave policy compares it to walk wall time
                self.dev_idle_s += time.time() - _t_host_done
            if over_budget:
                # the dispatch thread cannot be cancelled; ABANDON it (a
                # late completion writes bit-identical results, so the
                # race is value-free) and stop feeding the device.  Its
                # padding buffers stay owned by the abandoned chunks and
                # are never reused.
                import sys

                print(
                    f"warning: device DP batch exceeded the "
                    f"{self.budget_s:.0f}s budget; degrading to the host "
                    f"engine for the rest of this run",
                    file=sys.stderr,
                )
            if err and self.device_ok:
                import sys

                print(
                    f"warning: device DP engine failed ({err[0]}); "
                    f"degrading to the host engine",
                    file=sys.stderr,
                )
            if err or over_budget:
                self.device_ok = False
                self.host._run(big)
            self._first_done = True
        else:
            self.host._run(small)
        if remap is not None and len(uniq_jobs) != len(jobs):
            for job, ui in zip(jobs, remap):
                job.result = uniq_jobs[ui].result


def make_batcher(cfg: MTRConfig):
    """Pick the DP engine.  `auto` chooses the hybrid engine when an
    accelerator is present: it is the fastest TPU-using configuration
    AND self-degrades to host if the device path stalls (first-use UX on
    machines with a slow/proxied accelerator runtime must not hang)."""
    if cfg.backend == "device":
        return WrapDPBatcher()
    if cfg.backend == "host":
        return HostDPBatcher()
    if cfg.backend == "hybrid":
        return HybridDPBatcher()
    # auto: the hybrid engine self-degrades (budget/device failure) and
    # its host leg now works even without the native library (oracle
    # fallback), so it is safe whenever any accelerator is present
    try:
        import jax

        if jax.default_backend() != "cpu":
            return HybridDPBatcher()
    except Exception:
        pass
    from mtr_tpu import native

    # no accelerator: native host engine, or the XLA-CPU device batcher
    # when the native build is unavailable (far faster than the oracle)
    return HostDPBatcher() if native.available() else WrapDPBatcher()


def apply_counts(rr: RepeatRecord, job: DPJob) -> None:
    """Fill record fields from a counts-mode DP result
    (wrap_around_DP.c:337-350)."""
    (n_m, n_x, n_i, n_d, scanned), i_final, max_i = job.result
    rr.rep_start = job.qs + i_final + 1
    rr.rep_end = job.qs + max_i
    rr.repeat_len = max_i - i_final
    rr.num_freq_unit = scanned // len(job.unit) if len(job.unit) else 0
    rr.num_matches = n_m
    rr.num_mismatches = n_x
    rr.num_insertions = n_i
    rr.num_deletions = n_d
    rr.match_gain, rr.mismatch_penalty, rr.indel_penalty = job.scheme


@dataclasses.dataclass
class RangeQuery:
    read_idx: int
    qs: int
    qe: int
    w: int
    k: int
    candidates: list = dataclasses.field(default_factory=list)
    found: int = 0
    result: RepeatRecord | None = None  # post-selection record (or cleared)


@dataclasses.dataclass
class ReadState:
    read: Read
    org: np.ndarray  # effective arena view, length L+1
    di: np.ndarray
    di_end: np.ndarray
    di_w: np.ndarray
    ridx: int = -1   # file-order read index (multi-host merge key)


def _wrap_dp_schemes(batcher, queries_with_candidates) -> None:
    """Phase 3+4a: batched wrap_around_DP (both schemes) for every walk
    candidate; per candidate keep the higher-ratio scheme
    (wrap_around_DP.c:357-429).

    Candidates are deduplicated by (read, range, unit) BEFORE job
    construction — different k values routinely discover the same unit,
    and the DP + scheme selection depend only on this key — so each
    unique candidate builds one job pair and runs one selection."""
    dpjobs: list[DPJob] = []
    uniq: dict = {}           # key -> index into selections
    sel_jobs: list = []       # per unique key: (job113, job131)
    meta: list = []           # per candidate: (cand, uniq_idx)
    for q, org_arr in queries_with_candidates:
        for cand in q.candidates:
            unit = _encode_unit(cand.string)
            key = (id(org_arr), q.qs, q.qe, cand.string)
            ui = uniq.get(key)
            if ui is None:
                ui = len(sel_jobs)
                uniq[key] = ui
                j113 = DPJob(org_arr, q.qs, q.qe, unit, (1, 1, 3))
                j131 = DPJob(org_arr, q.qs, q.qe, unit, (1, 3, 1))
                dpjobs.append(j113)
                dpjobs.append(j131)
                sel_jobs.append((j113, j131))
            meta.append((cand, ui))
    # dpjobs is already unique under the batcher's dedup key (one job
    # pair per (org, range, unit); schemes differ within a pair)
    batcher.run(dpjobs, deduped=True)
    # one scheme selection per unique candidate, vectorized: the scalar
    # loop's semantics (wrap_around_DP.c:357-429 via ratio_less) reduce
    # to: take (1,3,1) iff its ratio is non-NaN and either (1,1,3)'s is
    # NaN or strictly smaller; else (1,1,3) if non-NaN; else neither.
    n_sel = len(sel_jobs)
    if n_sel:
        cnt = np.empty((2 * n_sel, 2), np.int64)
        for idx, job in enumerate(dpjobs):
            (n_m, n_x, n_i, n_d, _scanned), _, _ = job.result
            cnt[idx, 0] = n_m
            cnt[idx, 1] = n_m + n_x + n_i + n_d
        with np.errstate(invalid="ignore"):
            # denom == 0 implies m == 0 (counts are nonnegative), so the
            # only singular case is 0/0 -> NaN, exactly C float math
            r = cnt[:, 0].astype(np.float32) / cnt[:, 1].astype(np.float32)
        r113, r131 = r[0::2], r[1::2]
        nan113, nan131 = np.isnan(r113), np.isnan(r131)
        pick131 = ~nan131 & (nan113 | (r131 > r113))
        pick113 = ~pick131 & ~nan113
        rs = r.astype(np.float64)
        ms = cnt[:, 0].tolist()
        ds = cnt[:, 1].tolist()
    empty = RepeatRecord()
    for cand, ui in meta:
        if pick131[ui]:
            best_job, ji = sel_jobs[ui][1], 2 * ui + 1
        elif pick113[ui]:
            best_job, ji = sel_jobs[ui][0], 2 * ui
        else:
            _assign(cand, empty)
            continue
        # apply_counts touches exactly the fields set_rr would copy
        # from a counts-updated clone, so write cand directly
        apply_counts(cand, best_job)
        cand._rk = (ds[ji], ms[ji], float(rs[ji]))  # pre-fill ratio cache


def _polish_phase(batcher, states, polish_set, cfg) -> None:
    """Phase 5: polish_repeat then two revision rounds, batched.

    Each item of polish_set is (query, record); records are revised in
    place.  Mirrors revise_representative_unit (consensus.c:1048-1087):
    both rounds compare against the PRE-revision ratio."""
    if not polish_set:
        return
    items = []
    for q, rr in polish_set:
        org = states[q.read_idx].org
        input_len = states[q.read_idx].read.length
        polish_repeat(org, input_len, rr)
        items.append((q, rr, rr.match_ratio()))

    for scheme in ((5, 1, 1), (1, 1, 3)):
        # consensus DP on current units
        consjobs = []
        tmps = []
        for q, rr, base_ratio in items:
            org = states[q.read_idx].org
            tmp = rr.copy()
            tmp.match_gain, tmp.mismatch_penalty, tmp.indel_penalty = scheme
            consjobs.append(
                DPJob(org, tmp.rep_start, tmp.rep_end, _encode_unit(tmp.string),
                      scheme, mode="consensus")
            )
            tmps.append(tmp)
        batcher.run(consjobs)
        # host rebuild (batched argmax), then re-score the revised units
        from mtr_tpu.oracle.consensus import rebuild_units_batch

        rebuild_units_batch(tmps, [job.result for job in consjobs])
        scorejobs = []
        score_meta = []
        for (q, rr, base_ratio), tmp, job in zip(items, tmps, consjobs):
            if tmp.rep_period < MAX_PERIOD:
                org = states[q.read_idx].org
                sj = DPJob(org, tmp.rep_start, tmp.rep_end,
                           _encode_unit(tmp.string), scheme)
                scorejobs.append(sj)
                score_meta.append(((q, rr, base_ratio), tmp, sj))
        batcher.run(scorejobs)
        for (q, rr, base_ratio), tmp, sj in score_meta:
            apply_counts(tmp, sj)
            if ratio_less(base_ratio, tmp.match_ratio()):
                _assign(rr, tmp)


def _live_positions(st) -> np.ndarray:
    """Candidate-range start positions of a read (collection-time live
    set: di_end in [0, L) — handle_one_read.c:227-246)."""
    L = st.read.length
    return np.nonzero((st.di_end > -1) & (st.di_end < L))[0]


def waves_enabled(force=None) -> bool:
    """Wave-pruning switch: MTR_TPU_WAVES=1 forces on, MTR_TPU_NO_WAVES
    forces off; otherwise `force` (the adaptive policy's verdict)
    decides, defaulting to off."""
    if _env_flag("MTR_TPU_NO_WAVES"):
        return False
    if _env_flag("MTR_TPU_WAVES"):
        return True
    return bool(force)


def waves_policy(walk_s: float | None, dev_idle_s: float | None) -> bool:
    """Adaptive wave pruning (VERDICT r4 #6): full speculation hides
    ALL walk work behind the device leg, so pruning only pays when the
    walk queue is the scarce resource — i.e. the previous batch spent
    clearly more wall time walking than it spent idle-waiting on the
    device.  Measured on the 2-core box the device wait dominates and
    waves lose ~3-8% (PERF.md round 4); on many-core hosts feeding one
    chip the inequality flips."""
    if walk_s is None or dev_idle_s is None:
        return False
    return walk_s > 2.0 * dev_idle_s + 0.2


def wave1_positions(states, cfg=None, force=None):
    """Wave-1 selection for suppression pruning: the positions that NO
    earlier range can ever suppress.  A range q < p can only suppress p
    when its accepted repeat reaches past p's end (rep_end > qe_p with
    rep_end <= qe_q — handle_one_read.c:178-188), so p is safe iff the
    running max of earlier ends <= qe_p.

    Default OFF (every position becomes wave 1): pruning cuts total
    work 20%+ on repeat-dense sets, but on the shipping hybrid engine
    the wave-2 walks serialize against the device leg that full
    speculation overlaps, and measured end-to-end it loses ~3-8%
    (PERF.md round-4 notes).  MTR_TPU_WAVES=1 enables pruning — the
    right trade when walk CPU is the scarce resource (e.g. many-core
    hosts feeding one chip, or host-only runs at parity)."""
    sel = []
    waves = waves_enabled(force)
    for st in states:
        pos = _live_positions(st)
        if not waves or not len(pos):
            sel.append(pos)
            continue
        qe = st.di_end[pos].astype(np.int64)
        runmax = np.maximum.accumulate(qe)
        excl = np.empty_like(runmax)
        excl[0] = -1
        excl[1:] = runmax[:-1]
        # strict <: an equal-end earlier range CAN still suppress p
        # (rep_end = qs + max_i may reach qe_q + 1, so rep_end > qe_p
        # is possible when qe_q == qe_p); keeping such positions out of
        # wave 1 preserves the "no earlier range can suppress" invariant
        sel.append(pos[excl < qe])
    return sel


def _collect_queries(states, cfg, pos_sel=None):
    """Phase 2a: flat (read_idx, qs, qe, w, k) arrays for every candidate
    range x k, built with vectorized repeats (the k sweep is a function
    of w only — config.k_sweep / handle_one_read.c:104-118).  RangeQuery
    objects are only materialized for the few % of queries whose walk
    finds a unit.  pos_sel optionally restricts each read to an explicit
    position subset (wave pruning)."""
    lo_small = cfg.min_kmer - 3
    lo_big = cfg.min_kmer
    hi_small = cfg.max_kmer - 5
    hi_mid = cfg.max_kmer - 3
    hi_big = cfg.max_kmer
    chunks = []
    for ridx, st in enumerate(states):
        pos = (_live_positions(st) if pos_sel is None else pos_sel[ridx])
        if not len(pos):
            continue
        qe = st.di_end[pos].astype(np.int64)
        w = st.di_w[pos].astype(np.int64)
        k_lo = np.where(w < 1000, lo_small, lo_big)
        k_hi = np.where(w < 100, hi_small, np.where(w < 1000, hi_mid, hi_big))
        counts = k_hi - k_lo + 1
        total = int(counts.sum())
        # per-segment aranges: offset within each range's k run
        seg_start = np.repeat(np.cumsum(counts) - counts, counts)
        ks = np.repeat(k_lo, counts) + (np.arange(total) - seg_start)
        chunks.append((
            np.full(total, ridx, np.int32),
            np.repeat(pos, counts).astype(np.int32),
            np.repeat(qe, counts).astype(np.int32),
            np.repeat(w, counts).astype(np.int32),
            ks.astype(np.int32),
        ))
    if not chunks:
        z = np.zeros(0, np.int32)
        return z, z, z, z, z
    return tuple(np.concatenate([c[i] for c in chunks]) for i in range(5))


def walk_batch(states: list[ReadState], cfg: MTRConfig, pos_sel=None):
    """Phase 2 — (range, k) walk queries for a batch (optionally a wave
    subset).  Pure host (or device-walk) work with no DP-batcher
    dependency, so run_file overlaps it with the PREVIOUS batch's device
    DP wait."""
    from mtr_tpu import native
    from mtr_tpu.oracle.dbg import freq_2mer_array
    from mtr_tpu.utils.encoding import decode_bases

    _t_period = time.time()  # walk share of "Computing periods"

    ridx_a, qs_a, qe_a, w_a, k_a = _collect_queries(states, cfg, pos_sel)
    n_q = len(ridx_a)
    queries: list[RangeQuery] = []  # materialized for walk hits only

    _t_walk = time.time()
    use_dev_walks = (
        cfg.backend == "device" and cfg.use_device_walks and n_q > 0
    )
    if use_dev_walks or (cfg.use_native and native.available() and n_q):
        if use_dev_walks:
            from mtr_tpu.ops.dbg_device import dbg_walk_device_batch

            res = dbg_walk_device_batch(
                [st.org for st in states],
                [st.read.length for st in states],
                ridx_a, qs_a, qe_a, k_a,
            )
        else:
            orgs = [st.org for st in states]
            lens = [st.read.length for st in states]
            sub = None
            if (cfg.backend == "hybrid" and n_q >= 32768
                    and not _cpu_backend()
                    and _env_flag("MTR_TPU_MF_FILTER")):
                # device pre-filter: the walk gate max_freq >
                # MIN_NUM_FREQ_UNIT is pure dense counting — one TPU
                # dispatch per V-bucket classifies every query exactly,
                # so the host builds tables only for queries that walk
                # (ops/mf_filter.py; gate: consensus.c:532).  OPT-IN:
                # measured 2.7 us/query through the tunneled runtime
                # (per-query segment gathers + chunk roundtrips) vs
                # ~0.5 us/query for the host build WITH the ascending-k
                # early-out — the device filter pays only when host
                # cores are scarcer relative to the chip than this
                # 2-core box (PERF.md round 5)
                try:
                    from mtr_tpu.ops.mf_filter import walked_mask

                    sub = np.nonzero(walked_mask(
                        orgs, lens, ridx_a, qs_a, qe_a, k_a))[0]
                except Exception:
                    sub = None  # any device hiccup: full native path
            if sub is not None and len(sub) < n_q:
                r = native.dbg_walk_batch2(
                    orgs, lens, ridx_a[sub], qs_a[sub], qe_a[sub],
                    k_a[sub])
                res = {
                    "fwd_row": np.full(n_q, -1, np.int32),
                    "bwd_row": np.full(n_q, -1, np.int32),
                    "fwd_period": np.zeros(n_q, np.int32),
                    "bwd_period": np.zeros(n_q, np.int32),
                    "found_last": np.zeros(n_q, np.int32),
                    "units": r["units"],
                    "scores": r["scores"],
                }
                for key in ("fwd_row", "bwd_row", "fwd_period",
                            "bwd_period", "found_last"):
                    res[key][sub] = r[key][: len(sub)]
            else:
                res = native.dbg_walk_batch2(
                    orgs, lens, ridx_a, qs_a, qe_a, k_a)
        frow, brow = res["fwd_row"], res["bwd_row"]
        units_rows, scores_rows = res["units"], res["scores"]
        unit_cache: dict = {}  # unit bytes -> (string, freq_2mer)
        hits = np.nonzero((frow[:n_q] >= 0) | (brow[:n_q] >= 0))[0]
        # bulk int conversion: per-element np scalar indexing costs ~1 us
        # a pop over tens of thousands of hit queries
        h_ridx = ridx_a[hits].tolist()
        h_qs = qs_a[hits].tolist()
        h_qe = qe_a[hits].tolist()
        h_w = w_a[hits].tolist()
        h_k = k_a[hits].tolist()
        h_f = frow[hits].tolist()
        h_b = brow[hits].tolist()
        h_fp = res["fwd_period"][hits].tolist()
        h_bp = res["bwd_period"][hits].tolist()
        h_found = res["found_last"][hits].tolist()
        cand_proto = RepeatRecord().__dict__
        for hi in range(len(hits)):
            ridx = h_ridx[hi]
            st = states[ridx]
            q = RangeQuery(ridx, h_qs[hi], h_qe[hi], h_w[hi], h_k[hi])
            q.found = h_found[hi]
            for row, period in ((h_f[hi], h_fp[hi]), (h_b[hi], h_bp[hi])):
                if row < 0:
                    continue
                ukey = units_rows[row][:period].tobytes()
                ent = unit_cache.get(ukey)
                if ent is None:
                    unit = units_rows[row][:period].tolist()
                    ent = (decode_bases(unit), freq_2mer_array(unit))
                    unit_cache[ukey] = ent
                cand = RepeatRecord.__new__(RepeatRecord)
                cand.__dict__.update(cand_proto)
                cand.read_id = st.read.read_id
                cand.input_len = st.read.length
                cand.kmer = q.k
                cand.rep_period = period
                cand.string = ent[0]
                # ndarray copy, not tolist(): ~10x cheaper per candidate
                # (all consumers index it; RepeatRecord.copy() listifies)
                cand.string_score = scores_rows[row][:period].copy()
                cand.freq_2mer = list(ent[1])
                q.candidates.append(cand)
            queries.append(q)
    else:
        for i in range(n_q):
            ridx = int(ridx_a[i])
            st = states[ridx]
            q = RangeQuery(ridx, int(qs_a[i]), int(qe_a[i]), int(w_a[i]), int(k_a[i]))
            template = RepeatRecord()
            template.read_id = st.read.read_id
            template.input_len = st.read.length
            template.kmer = q.k
            q.candidates, q.found = walk_candidates(
                st.org, st.read.length, q.qs, q.qe, template
            )
            if q.candidates:
                queries.append(q)

    TIMERS.add("walks", time.time() - _t_walk)
    if native.available():
        # real measured init_inputString / count-table sections from the
        # walk engine (zeros unless -c enabled them)
        init_s, count_s, _walk_s = native.read_stage_timers()
        TIMERS.add("initialize", init_s)
        TIMERS.add("count_table", count_s)
    TIMERS.count("speculative_queries", n_q)
    TIMERS.add("period", time.time() - _t_period)
    return queries


def _accepts(rr: RepeatRecord | None) -> bool:
    """Acceptance gate of handle_one_read.c:239-240."""
    return (
        rr is not None
        and rr.repeat_len > 0
        and rr.rep_start + MIN_PERIOD * MIN_NUM_FREQ_UNIT < rr.rep_end
    )


def _process_wave(states, batcher, cfg, queries, range_result) -> None:
    """Phases 3-6a for one wave of walk queries: batched DP scheme
    selection, acceptance gates, polish/revision rounds, k-sweep
    selection.  Merges per-range winners into range_result (keyed
    (read_idx, qs, qe); value None = computed but no qualifying
    record)."""
    # phase 3+4a: scheme selection for every candidate
    _wrap_dp_schemes(batcher, [(q, states[q.read_idx].org) for q in queries])

    # phase 4b: direction selection + gates -> per-query result; build
    # polish set (queries without candidates were never materialized =
    # cleared records)
    polish_set = []
    for q in queries:
        if not q.candidates or q.found == 0:
            q.result = None
            continue
        st = states[q.read_idx]
        rr = RepeatRecord()
        rr.read_id = st.read.read_id
        rr.input_len = st.read.length
        rr.kmer = q.k
        select_dp_candidate(rr, q.candidates, cfg.min_match_ratio)
        if rr.rep_period * (q.qe - q.qs + 1) > cfg.wrap_dp_size:
            q.result = None
            continue
        q.result = rr
        coverage = rr.repeat_len // rr.rep_period
        if 5 <= coverage <= 20 and rr.rep_period > 5:
            polish_set.append((q, rr))

    # phase 5: polish + revision rounds
    with TIMERS.section("polish"):
        _polish_phase(batcher, states, polish_set, cfg)

    # phase 6a: k-sweep selection per range
    by_range: dict[tuple[int, int, int], list[RangeQuery]] = defaultdict(list)
    for q in queries:
        by_range[(q.read_idx, q.qs, q.qe)].append(q)
    for key, qs_list in by_range.items():
        best = None
        max_ratio = -1.0
        for q in sorted(qs_list, key=lambda x: x.k):
            tmp = q.result
            if tmp is None:
                continue  # cleared records never pass the filters below
            r = tmp.match_ratio()
            if (
                ratio_less(max_ratio, r)
                and cfg.min_match_ratio <= r
                and tmp.num_freq_unit > MIN_NUM_FREQ_UNIT
                and MIN_PERIOD <= tmp.rep_period
            ):
                max_ratio = r
                best = tmp
        range_result[key] = best


MAX_WAVES = 6


def process_batch(states: list[ReadState], batcher: WrapDPBatcher,
                  cfg: MTRConfig, queries: list[RangeQuery] | None = None,
                  pos_sel=None):
    """Wave-pruned batch processing.

    The reference suppresses pending ranges after each acceptance
    (handle_one_read.c:178-188) and never computes their queries; the
    round-3 pipeline speculatively computed EVERY range and replayed the
    acceptance order afterwards — byte-identical but ~22% dead walk/DP
    work on repeat-dense reads.  Waves recover most of the skips while
    keeping device batches large:

      wave 1: positions no earlier range can ever suppress (the running
              max of earlier ends <= own end) — computable up front, so
              run_file's overlap thread can pre-walk them;
      replay: advance each read's acceptance cursor through computed or
              killed positions, applying the reference's kills exactly;
      wave k: positions an optimistic simulation (kills from all
              computed acceptances, uncomputed positions assumed
              non-accepting) leaves alive.  A misprediction only costs
              a later wave — every computation is pure, and the replay
              consumes results strictly in position order, so output
              equality is unconditional.
    """
    # register the batch's reads with the device engine (resident
    # feeding): uploaded once, gathered per chunk on device
    batcher.begin_batch([st.org for st in states])

    _t0 = time.time()  # DP share of "Computing periods" (main.c:113)
    _t_walks = 0.0     # inner walk_batch calls self-report their time

    all_pos = [_live_positions(st) for st in states]
    for p in all_pos:
        TIMERS.count("ranges_total", len(p))
    computed = [np.zeros(len(st.di_end), bool) for st in states]
    if queries is None:
        pos_sel = wave1_positions(states, cfg)
        _tw = time.time()
        queries = walk_batch(states, cfg, pos_sel)
        _t_walks += time.time() - _tw
    elif pos_sel is None:
        pos_sel = all_pos  # legacy callers pre-walk every position

    range_result: dict[tuple[int, int, int], RepeatRecord | None] = {}
    cursor = [0] * len(states)
    accepted: list[list[RepeatRecord]] = [[] for _ in states]
    nq = [0] * len(states)
    wave = 0
    while True:
        wave += 1
        for ridx, ps in enumerate(pos_sel):
            if len(ps):
                computed[ridx][ps] = True
                TIMERS.count("computed_ranges", len(ps))
        _process_wave(states, batcher, cfg, queries, range_result)

        # exact replay: advance cursors, apply kills to the live arrays
        alldone = True
        for ridx, st in enumerate(states):
            di, di_end, di_w = st.di, st.di_end, st.di_w
            pos = all_pos[ridx]
            c = cursor[ridx]
            comp = computed[ridx]
            while c < len(pos):
                p = int(pos[c])
                qe = int(di_end[p])
                if qe < 0:
                    # suppressed before its turn: if never computed, its
                    # walks + DP were skipped exactly as the reference
                    # skips them
                    TIMERS.count("suppressed_ranges")
                    if not comp[p]:
                        TIMERS.count("pruned_ranges")
                    c += 1
                    continue
                if not comp[p]:
                    break  # a later wave must compute this position
                nq[ridx] += 1  # reference query_counter: per live range
                rr = range_result.get((ridx, p, qe))
                if _accepts(rr):
                    accepted[ridx].append(rr)
                    span = np.arange(rr.rep_start, rr.rep_end)
                    kill = span[(di[span] != -1) & (di_end[span] < rr.rep_end)]
                    di[kill] = -1.0
                    di_end[kill] = -1
                    di_w[kill] = -1
                c += 1
            cursor[ridx] = c
            if c < len(pos):
                alldone = False
        if alldone:
            break

        # next wave: optimistic simulation from each cursor
        pos_sel = []
        n_new = 0
        for ridx, st in enumerate(states):
            pos = all_pos[ridx]
            c = cursor[ridx]
            if c >= len(pos):
                pos_sel.append(pos[:0])
                continue
            comp = computed[ridx]
            if wave >= MAX_WAVES:
                # bound the wave count: compute everything still alive
                rem = pos[c:]
                live = rem[(st.di_end[rem] >= 0) & ~comp[rem]]
                pos_sel.append(live)
                n_new += len(live)
                continue
            di_s = st.di.copy()
            de_s = st.di_end.copy()
            need: list[int] = []
            for p in pos[c:]:
                p = int(p)
                qe = int(de_s[p])
                if qe < 0:
                    continue
                if not comp[p]:
                    need.append(p)
                    continue
                rr = range_result.get((ridx, p, qe))
                if _accepts(rr):
                    span = np.arange(rr.rep_start, rr.rep_end)
                    kill = span[(di_s[span] != -1) & (de_s[span] < rr.rep_end)]
                    di_s[kill] = -1.0
                    de_s[kill] = -1
            pos_sel.append(np.asarray(need, dtype=pos.dtype))
            n_new += len(need)
        if n_new == 0:  # explicit raise: an assert vanishes under -O,
            # turning a selection stall into a silent infinite loop
            raise RuntimeError(
                "wave selection stalled with unfinished reads")
        TIMERS.count("waves_extra")
        _tw = time.time()
        queries = walk_batch(states, cfg, pos_sel)
        _t_walks += time.time() - _tw

    TIMERS.add("period", time.time() - _t0 - _t_walks)

    out = []
    for ridx in range(len(states)):
        TIMERS.count("queries", nq[ridx])
        with TIMERS.section("chaining"):
            out.append(chain_records(accepted[ridx]))
    return out


@functools.lru_cache(maxsize=4)
def _device_di_compute_cached(manhattan: bool):
    """Long reads compute the DI sweep on device (the sliding histograms
    dominate their runtime); pairing/redundancy stay host-sequential for
    parity.  On multi-device meshes the Manhattan stencil shards read
    POSITIONS with a ring halo exchange (sequence parallelism,
    SURVEY.md 2.13; the stencil is fill_directional_index.c:171-295)."""
    import jax

    from mtr_tpu.ops.directional_index import (
        di_manhattan_device,
        di_pearson_device,
        make_di_manhattan_sharded,
    )

    if manhattan:
        if jax.device_count() > 1:
            from mtr_tpu.parallel.mesh import make_mesh

            return make_di_manhattan_sharded(make_mesh())
        return di_manhattan_device
    return di_pearson_device


def _device_di_compute(cfg: MTRConfig):
    return _device_di_compute_cached(cfg.manhattan_distance)


def run_file(
    path: str,
    cfg: MTRConfig = DEFAULT_CONFIG,
    out=None,
    checkpoint: str | None = None,
    strict: bool = True,
    record_sink=None,
    read_filter=None,
    read_meta=None,
):
    """Batched device-backed equivalent of handle_one_file.

    checkpoint: optional path recording the number of fully emitted
    reads; on restart, reads up to that count are skipped and output
    resumes exactly where the previous run stopped (the reference has no
    resume story — partial runs restart from scratch).
    strict: when False, a failing read batch is reported to stderr and
    skipped instead of aborting the file (failure isolation for
    production sweeps).
    record_sink: optional callable receiving every emitted RepeatRecord
    (used by the --cluster stage, which needs fields such as freq_2mer
    that the 13-field text format does not carry).
    read_filter: optional callable(ridx) -> bool selecting the reads
    this process handles (multi-host sharding; the arena is still
    replayed over every read for bit-exactness).  checkpoint counts
    SELECTED reads only.
    read_meta: optional callable(ridx, n_records) invoked per emitted
    read (the multi-host merge needs per-read record counts).
    """
    import gc
    import sys

    if out is None:
        out = sys.stdout
    # the pipeline allocates millions of small acyclic records per
    # batch; default generation-0 thresholds trigger thousands of
    # collections per file (each also running XLA's gc callback —
    # ~1.5 s profiled on the north-star set).  Widen while running.
    _gc_thresh = gc.get_threshold()
    gc.set_threshold(200_000, 50, 50)
    if cfg.print_computation_time:
        from mtr_tpu import native

        native.enable_stage_timers()  # real -c stage sections (mTR.h:142)
    arena = Arena(cfg.max_input_length)
    batcher = make_batcher(cfg)
    batch: list[ReadState] = []
    done_reads = 0
    skip = 0
    if checkpoint:
        try:
            with open(checkpoint) as f:
                skip = int(f.read().strip() or 0)
        except FileNotFoundError:
            skip = 0

    # Two-stage batch pipeline: stage A (walks — pure host CPU) and
    # stage B (DP + polish + selection — owns the batcher, mostly
    # device wait) run in worker threads.  A(k) overlaps B(k-1)'s
    # device wait, and the main thread's FASTA read + DI pass overlaps
    # both; emission stays in order because B batches are serialized
    # and drained before the next B starts.
    import threading

    pending_a = None  # (thread, states, holderA)
    pending_b = None  # (thread, states, holderB)

    def drain_b():
        nonlocal pending_b, done_reads
        if pending_b is None:
            return
        t, states, holder = pending_b
        t.join()
        pending_b = None
        if "error" in holder:
            if strict:
                raise holder["error"]
            print(
                f"warning: batch of {len(states)} reads failed "
                f"({holder['error']}); skipped",
                file=sys.stderr,
            )
            holder["results"] = [[] for _ in states]
        for st, records in zip(states, holder["results"]):
            for rec in records:
                out.write(rec.format_record() + "\n")
                if record_sink is not None:
                    record_sink(rec)
                if cfg.print_alignment:
                    from mtr_tpu.pretty import pretty_print_alignment

                    out.write("\n")
                    pretty_print_alignment(st.org, rec, out)
            if read_meta is not None:
                read_meta(st.ridx, len(records))
            done_reads += 1
        out.flush()
        if checkpoint:
            with open(checkpoint, "w") as f:
                f.write(str(done_reads + skip))

    def promote_a():
        """Wait for the pending walk stage, then start its DP stage
        (after the previous DP batch fully drains)."""
        nonlocal pending_a, pending_b
        if pending_a is None:
            return
        t, states, ha = pending_a
        t.join()
        pending_a = None
        drain_b()
        hb: dict = {}

        def work_b():
            try:
                if "error" in ha:
                    raise ha["error"]
                hb["results"] = process_batch(
                    states, batcher, cfg, queries=ha["queries"],
                    pos_sel=ha["pos_sel"])
            except Exception as e:  # pragma: no cover - failure isolation
                hb["error"] = e

        t2 = threading.Thread(target=work_b)
        t2.start()
        pending_b = (t2, states, hb)

    # adaptive wave pruning: decided per batch from the PREVIOUS
    # batch's measured walk wall time vs host-idle-on-device wait
    # (waves_policy); env vars force either way, output is identical
    adapt = {"walk_s": None, "on": False}

    def flush():
        nonlocal batch, pending_a
        if not batch:
            return
        promote_a()
        pop_idle = getattr(batcher, "pop_dev_idle", None)
        if pop_idle is not None:
            adapt["on"] = waves_policy(adapt["walk_s"], pop_idle())
        states = batch
        batch = []
        ha: dict = {}

        def work_a():
            try:
                # pre-walk only wave 1: later waves depend on acceptance
                # replay, so process_batch computes them itself
                ha["pos_sel"] = wave1_positions(
                    states, cfg, force=adapt["on"])
                _t0 = time.time()
                ha["queries"] = walk_batch(states, cfg, ha["pos_sel"])
                adapt["walk_s"] = time.time() - _t0
            except Exception as e:  # pragma: no cover - failure isolation
                ha["error"] = e

        t = threading.Thread(target=work_a)
        t.start()
        pending_a = (t, states, ha)

    min_rsl = 100
    own = 0
    batch_bases = 0
    try:
        for ridx, read in enumerate(iter_fasta(path, cfg.max_input_length)):
          arena.load_read(read.codes)  # keep arena reuse semantics even when skipping
          if read_filter is not None and not read_filter(ridx):
              continue
          own += 1
          if own <= skip:
              continue
          L = read.length
          org_eff = arena.org_input[: L + 1].copy()
          rsl = min_rsl if L < min_rsl * 10 else L // 10
          di_compute = None
          if cfg.backend == "device" and L >= cfg.device_di_threshold:
              # hybrid deliberately keeps DI on host: the sweep is many
              # small (k, w) dispatches whose per-call proxy roundtrips
              # cost far more than the 2-core host pass (measured 40x
              # slower through a tunneled runtime)
              di_compute = _device_di_compute(cfg)
          with TIMERS.section("range"):
              di, di_end, di_w = fill_directional_index_with_end(
                  arena, L, rsl, manhattan=cfg.manhattan_distance,
                  di_compute=di_compute, use_native=cfg.use_native,
              )
          batch.append(ReadState(read, org_eff, di, di_end, di_w, ridx))
          batch_bases += L
          if (len(batch) >= cfg.reads_per_batch
                  or batch_bases >= cfg.bases_per_batch):
              flush()
              batch_bases = 0
        flush()
        promote_a()
        drain_b()
    finally:
        gc.set_threshold(*_gc_thresh)
