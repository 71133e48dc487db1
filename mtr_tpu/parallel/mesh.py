"""Device mesh + sharding layer.

The per-read pipeline is embarrassingly parallel over reads/queries, so
the primary axis is data parallelism: DP query batches shard their batch
dim across a 1-D 'dp' mesh (SURVEY.md 2.13).  Collectives are
XLA-inserted from sharding annotations — no hand-written communication —
so they ride ICI on a real slice and host memory on the CPU test mesh.

The Pallas fill kernel itself is single-device; shard_map runs one
instance per device on its local shard of the query batch, which is the
right granularity (queries are independent; no cross-query reduction).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mtr_tpu.ops.wrap_dp_fused import make_wrap_dp_fused


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        # a silent truncation here would let multichip checks pass
        # vacuously on a 1-device machine
        assert len(devs) >= n_devices, (
            f"requested a {n_devices}-device mesh but only "
            f"{len(devs)} devices are visible"
        )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_wrap_dp_step(mesh: Mesh, b: int, u_pad: int, r_pad: int, axis: str = "dp"):
    """Full DP step (fill + traceback) with the query batch sharded over
    the mesh; each device runs the Pallas kernel on its local shard."""
    n_dev = mesh.devices.size
    assert b % n_dev == 0, "batch must divide the dp axis"
    local_b = b // n_dev
    interpret = jax.default_backend() == "cpu"
    fused = make_wrap_dp_fused(local_b, u_pad, r_pad, interpret=interpret)

    def local_step(scal, rep, unit):
        counts = fused(scal, rep, unit)
        return counts, counts[:, 7:]

    spec = P(axis)
    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, spec),
        check_vma=False,  # pallas_call out_shape carries no vma info
    )
    return jax.jit(fn)


def device_count() -> int:
    return jax.device_count()
