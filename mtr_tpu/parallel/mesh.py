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

import functools

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


@functools.lru_cache(maxsize=128)
def sharded_resident_fn(mesh: Mesh, kind: str, b: int, u_pad: int,
                        r_pad: int, factor: int = 0, n_sub: int = 1,
                        axis: str = "dp"):
    """Resident wrap-DP chunk kernel under shard_map: the flat read
    array is replicated, per-job (starts, scal, units) shard their batch
    dim over the mesh, and each device runs the single-device Pallas
    program on its local shard.  kind in {counts2, counts2w, counts,
    consensus} (see pipeline.WrapDPBatcher._fn).  For the sub-chunked
    kinds, b is the SUB-chunk size and the global batch is b*n_sub;
    whole sub-chunks land on each device (n_sub divisible by the mesh,
    both powers of two)."""
    from mtr_tpu.ops.wrap_dp_resident import _gather_segments

    n = int(mesh.devices.size)
    interpret = jax.default_backend() == "cpu"
    if kind in ("counts2", "counts2w"):
        assert n_sub % n == 0, (n_sub, n)
        ls = n_sub // n
        if kind == "counts2":
            from mtr_tpu.ops.wrap_dp_fused2 import make_wrap_dp_fused2

            inner = make_wrap_dp_fused2(b, r_pad, interpret=interpret,
                                        n_sub=ls)
        else:
            from mtr_tpu.ops.wrap_dp_fused2w import make_wrap_dp_fused2w

            inner = make_wrap_dp_fused2w(b, r_pad, u_pad,
                                         interpret=interpret, n_sub=ls)

        def local(flat, starts, scal, unit):
            rep = _gather_segments(flat, starts, r_pad)
            return inner(scal, rep, unit)

        spec = P(axis)
        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None), spec, spec, spec),
            out_specs=spec,
            check_vma=False,
        )
        return jax.jit(fn)
    assert b % n == 0, f"chunk batch {b} must divide the {n}-way dp axis"
    lb = b // n
    if kind == "counts":
        from mtr_tpu.ops.wrap_dp_fused import make_wrap_dp_fused

        inner = make_wrap_dp_fused(lb, u_pad, r_pad, interpret=interpret)

        def local(flat, starts, scal, unit):
            rep = _gather_segments(flat, starts, r_pad).astype(jnp.int32)
            return inner(scal, rep, unit.astype(jnp.int32))

    else:  # consensus
        from mtr_tpu.ops.wrap_dp_pallas import (
            MAX_PERIOD,
            make_wrap_dp_pallas,
            traceback_consensus_batch_n,
        )

        fill = make_wrap_dp_pallas(lb, u_pad, r_pad, interpret=interpret)
        steps = r_pad * factor + 2 * MAX_PERIOD

        def local(flat, starts, scal, unit):
            rep = _gather_segments(flat, starts, r_pad).astype(jnp.int32)
            moves, best = fill(scal, rep, unit.astype(jnp.int32))
            return traceback_consensus_batch_n(
                steps, u_pad, moves, rep, scal[:, 1], best)

    spec = P(axis)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None), spec, spec, spec),
        out_specs=spec,
        check_vma=False,  # pallas_call out_shape carries no vma info
    )
    return jax.jit(fn)


def device_count() -> int:
    return jax.device_count()
