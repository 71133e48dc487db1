"""Directional-index sliding window on device (plain XLA, no Pallas).

D(i) = sum_v |count_v(codes[i:i+w]) - count_v(codes[i+w:i+2w])| for all
positions i — the Manhattan DI numerator (fill_directional_index.c:
171-295; DI(i+w) = (D(i) - D(i+w)) / 2w).  Exact in integers via
per-symbol prefix sums; the window width w is a traced scalar
(dynamic_slice offsets), so one compiled program per (position-bucket,
k) pair covers every w of the sweep.

The host path (oracle.directional_index.sliding_l1) remains the default
in the pipeline — DI is ~2% of reference runtime and host numpy avoids
extra device programs on high-latency proxied backends — but this op is
the drop-in device equivalent for large-read batches, and doubles as
the position-sharded stencil entry point (shard positions + halo 3w).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

POS_BUCKETS = (16384, 131072, 1048576 + 65536)
_CHUNK = 256


@functools.partial(jax.jit, static_argnums=(1,))
def _sliding_l1_device(codes, k: int, w):
    """codes: (n_pad,) int32, padded with -1.  Returns D over the full
    padded range (entries needing out-of-range positions are garbage and
    must be masked by the caller)."""
    n_pad = codes.shape[0]
    n4k = 4**k
    D = jnp.zeros(n_pad, jnp.int64)
    for lo in range(0, n4k, _CHUNK):
        hi = min(lo + _CHUNK, n4k)
        width = hi - lo
        onehot = (codes[:, None] == (lo + jnp.arange(width))[None, :]).astype(
            jnp.int32
        )
        # P padded so dynamic_slice offsets up to 2w never clamp
        # (jax dynamic_slice silently clamps out-of-bounds starts)
        P = jnp.concatenate(
            [
                jnp.zeros((1, width), jnp.int32),
                jnp.cumsum(onehot, axis=0),
                jnp.zeros((2 * n_pad, width), jnp.int32),
            ],
            axis=0,
        )
        # diff(i) = 2*P[i+w] - P[i] - P[i+2w]
        Pw = jax.lax.dynamic_slice(P, (w, 0), (n_pad, width))
        P2w = jax.lax.dynamic_slice(P, (2 * w, 0), (n_pad, width))
        diff = 2 * Pw - P[:n_pad] - P2w
        D = D + jnp.abs(diff.astype(jnp.int64)).sum(axis=1)
    return D


def _bucket(n: int) -> int:
    for b in POS_BUCKETS:
        if n <= b:
            return b
    return POS_BUCKETS[-1]


def sliding_l1_device(vals: np.ndarray, w: int, n_out: int) -> np.ndarray:
    """Drop-in for oracle.directional_index.sliding_l1 backed by the
    device op."""
    n_pos = n_out + 2 * w - 1
    n_pad = _bucket(n_pos)
    codes = np.full(n_pad, -1, np.int32)
    codes[:n_pos] = vals[:n_pos]
    k = 1
    vmax = int(vals[:n_pos].max()) if n_pos else 0
    while 4**k <= vmax:
        k += 1
    D = np.asarray(_sliding_l1_device(codes, k, w))
    return D[:n_out]


def di_manhattan_device(buf: np.ndarray, di_len: int, w: int, k: int, rsl: int) -> np.ndarray:
    """Device-backed DI pass with the oracle's exact bounds/placement;
    plugs into fill_directional_index_with_end(di_compute=...)."""
    di_tmp = np.full(di_len, -1.0)
    n_i = di_len - w - rsl - k + 1
    if n_i <= 0:
        return di_tmp
    D = sliding_l1_device(buf, w, n_i + w)
    d01 = D[:n_i]
    d12 = D[w : w + n_i]
    di_tmp[w : w + n_i] = (d01 - d12) / float(2 * w)
    return di_tmp


# ---------------------------------------------------------------------------
# Pearson (-p) device op: the O(n * 4^k) integer moment sums run on
# device; the final sqrt/divide combination stays in host float64 so the
# DI values match the C double math bit-for-bit
# (fill_directional_index.c:298-450).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1,))
def _pearson_moments_device(codes, k: int, w):
    """Returns (q0, q1, q2, ip01, ip12) int32 arrays over the padded
    range: per-position squared sums and inner products of the three
    adjacent w-windows' k-mer count vectors (all < w^2 <= 2^27)."""
    n_pad = codes.shape[0]
    n4k = 4**k
    q0 = jnp.zeros(n_pad, jnp.int32)
    q1 = jnp.zeros(n_pad, jnp.int32)
    q2 = jnp.zeros(n_pad, jnp.int32)
    ip01 = jnp.zeros(n_pad, jnp.int32)
    ip12 = jnp.zeros(n_pad, jnp.int32)
    for lo in range(0, n4k, _CHUNK):
        hi = min(lo + _CHUNK, n4k)
        width = hi - lo
        onehot = (codes[:, None] == (lo + jnp.arange(width))[None, :]).astype(
            jnp.int32
        )
        P = jnp.concatenate(
            [
                jnp.zeros((1, width), jnp.int32),
                jnp.cumsum(onehot, axis=0),
                jnp.zeros((3 * n_pad, width), jnp.int32),
            ],
            axis=0,
        )
        Pw = jax.lax.dynamic_slice(P, (w, 0), (n_pad, width))
        P2w = jax.lax.dynamic_slice(P, (2 * w, 0), (n_pad, width))
        P3w = jax.lax.dynamic_slice(P, (3 * w, 0), (n_pad, width))
        W0 = Pw - P[:n_pad]
        W1 = P2w - Pw
        W2 = P3w - P2w
        q0 = q0 + (W0 * W0).sum(axis=1)
        q1 = q1 + (W1 * W1).sum(axis=1)
        q2 = q2 + (W2 * W2).sum(axis=1)
        ip01 = ip01 + (W0 * W1).sum(axis=1)
        ip12 = ip12 + (W1 * W2).sum(axis=1)
    return q0, q1, q2, ip01, ip12


def di_pearson_device(buf: np.ndarray, di_len: int, w: int, k: int, rsl: int) -> np.ndarray:
    """Device-backed Pearson DI pass, drop-in for
    fill_directional_index_with_end(di_compute=...)."""
    di_tmp = np.full(di_len, -1.0)
    n_i = di_len - w - rsl - k + 1
    if n_i <= 0:
        return di_tmp
    n_pos = n_i + 3 * w - 1
    n_pad = _bucket(n_pos)
    codes = np.full(n_pad, -1, np.int32)
    codes[:n_pos] = buf[:n_pos]
    q0, q1, q2, ip01, ip12 = (
        np.asarray(a[:n_i], dtype=np.int64)
        for a in _pearson_moments_device(codes, k, w)
    )
    n4k = float(4**k)
    s = float(w)
    sd0 = np.sqrt(q0 * n4k - s * s)
    sd1 = np.sqrt(q1 * n4k - s * s)
    sd2 = np.sqrt(q2 * n4k - s * s)
    with np.errstate(divide="ignore", invalid="ignore"):
        p01 = np.where(sd0 * sd1 > 0, (ip01 * n4k - s * s) / (sd0 * sd1), 0.0)
        p12 = np.where(sd1 * sd2 > 0, (ip12 * n4k - s * s) / (sd1 * sd2), 0.0)
    di_tmp[w : w + n_i] = p12 - p01
    return di_tmp


# ---------------------------------------------------------------------------
# Position-sharded DI stencil (SURVEY.md 2.13 long-context row): shard
# read positions across a 1-D mesh; each device computes D for its
# contiguous block from its local codes plus a 2w halo pulled from the
# right neighbor with one ppermute.  Collectives ride ICI on real
# slices; exact-integer arithmetic keeps shard outputs bit-identical to
# the single-device op.
# ---------------------------------------------------------------------------


def make_sharded_sliding_l1(mesh, n_pad: int, k: int, halo: int, axis: str = "dp"):
    """Builds fn(codes (n_pad,), w) -> D (n_pad,) int32 with positions
    sharded over the mesh axis.  halo must be >= 2*w_max for the sweep
    (w <= 10240 -> halo 20480); n_pad must divide the axis size."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n_dev = mesh.devices.size
    assert n_pad % n_dev == 0
    local_n = n_pad // n_dev

    # when the halo exceeds a shard's length the stencil window spans
    # SEVERAL right neighbors: hop the ring that many times, pulling one
    # full block per hop (hop h delivers neighbor s+h+1's codes)
    hops = max(1, -(-halo // local_n))

    def local_stencil(codes_local, w):
        perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        blocks = []
        cur = codes_local
        for _ in range(hops):
            cur = jax.lax.ppermute(cur, axis, perm)
            blocks.append(cur)
        ext = jnp.concatenate([codes_local] + blocks)[: local_n + halo]
        n4k = 4**k
        D = jnp.zeros(local_n, jnp.int32)
        for lo in range(0, n4k, _CHUNK):
            hi = min(lo + _CHUNK, n4k)
            width = hi - lo
            onehot = (ext[:, None] == (lo + jnp.arange(width))[None, :]).astype(
                jnp.int32
            )
            P_ = jnp.concatenate(
                [jnp.zeros((1, width), jnp.int32), jnp.cumsum(onehot, axis=0)],
                axis=0,
            )
            Pw = jax.lax.dynamic_slice(P_, (w, 0), (local_n, width))
            P2w = jax.lax.dynamic_slice(P_, (2 * w, 0), (local_n, width))
            diff = 2 * Pw - P_[:local_n] - P2w
            D = D + jnp.abs(diff).sum(axis=1)
        return D

    fn = shard_map(
        local_stencil,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
    )
    return jax.jit(fn)


def sliding_l1_sharded(vals: np.ndarray, w: int, n_out: int, mesh, k: int,
                       halo: int = 20480) -> np.ndarray:
    """Multi-device drop-in for sliding_l1: positions sharded over the
    mesh with a 2w halo (w <= halo/2 asserted)."""
    assert 2 * w <= halo
    n_dev = mesh.devices.size
    n_pos = n_out + 2 * w - 1
    n_pad = -(-max(n_pos, 1) // n_dev) * n_dev
    codes = np.full(n_pad, -1, np.int32)
    codes[:n_pos] = vals[:n_pos]
    fn = _sharded_cache_get(mesh, n_pad, k, halo)
    D = np.asarray(fn(codes, w))
    return D[:n_out].astype(np.int64)


def make_di_manhattan_sharded(mesh):
    """di_compute plug-in for fill_directional_index_with_end that runs
    the Manhattan sliding-L1 stencil POSITION-SHARDED over the mesh
    (SURVEY.md 2.13 long-context row; the stencil being sharded is
    fill_directional_index.c:171-295).  Bit-identical to the
    single-device op: exact integer prefix sums + ring halo exchange."""

    def di_compute(buf, di_len: int, w: int, k: int, rsl: int):
        di_tmp = np.full(di_len, -1.0)
        n_i = di_len - w - rsl - k + 1
        if n_i <= 0:
            return di_tmp
        n_pos = n_i + 3 * w - 1
        kk = 1
        vmax = int(buf[:n_pos].max()) if n_pos > 0 else 0
        while 4**kk <= vmax:
            kk += 1
        D = sliding_l1_sharded(buf, w, n_i + w, mesh, kk)
        d01 = D[:n_i]
        d12 = D[w : w + n_i]
        di_tmp[w : w + n_i] = (d01 - d12) / float(2 * w)
        return di_tmp

    return di_compute


_SHARDED_CACHE: dict = {}


def _sharded_cache_get(mesh, n_pad: int, k: int, halo: int):
    key = (id(mesh), n_pad, k, halo)
    fn = _SHARDED_CACHE.get(key)
    if fn is None:
        if len(_SHARDED_CACHE) > 32:
            _SHARDED_CACHE.clear()
        fn = make_sharded_sliding_l1(mesh, n_pad, k, halo)
        _SHARDED_CACHE[key] = fn
    return fn
