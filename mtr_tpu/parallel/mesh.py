"""Device mesh + sharding layer.

The per-read pipeline is embarrassingly parallel over reads/queries, so
the primary axis is data parallelism: DP query batches and DI read
batches shard their leading dim across a 1-D 'dp' mesh
(SURVEY.md 2.13).  All collectives are XLA-inserted from sharding
annotations (no hand-written NCCL-style code), so they ride ICI on a
real slice and plain host memory on the CPU test mesh.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mtr_tpu.ops.wrap_dp import make_wrap_dp


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_wrap_dp(mesh: Mesh, u_pad: int, r_pad: int, axis: str = "dp"):
    """Batched wrap-DP jitted with the query batch sharded over the mesh.

    Inputs shard on their leading (batch) dim; each device fills its
    queries' DP matrices locally; outputs stay sharded (the host gathers
    only the small argmax vectors plus the move tensors it needs)."""
    base = make_wrap_dp(u_pad, r_pad)  # already jit; re-jit with shardings
    batch_sh = NamedSharding(mesh, P(axis))

    fn = jax.jit(
        base,
        in_shardings=(batch_sh,) * 5,
        out_shardings=(batch_sh,) * 4,
    )
    return fn


def device_count() -> int:
    return jax.device_count()
