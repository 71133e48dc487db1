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
