"""Raw fused wrap-around-DP throughput (GCUPS/chip).

Measures the fused fill+traceback Pallas kernel (ops/wrap_dp_fused.py)
on a full bucket: cells = B * rep_len * unit_len per invocation, steady
state over several warm runs.  This is the production device kernel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_bucket(b, u_pad, r_pad, unit_len, rep_len, reps=5):
    import jax
    from mtr_tpu.ops.wrap_dp_fused import get_wrap_dp_fused

    rng = np.random.default_rng(0)
    unit = rng.integers(0, 4, unit_len)
    rep = np.tile(unit, rep_len // unit_len + 1)[:rep_len]
    repa = np.full((b, r_pad), -1, np.int32)
    units = np.full((b, u_pad), -2, np.int32)
    repa[:, :rep_len] = rep
    units[:, :unit_len] = unit
    scal = np.zeros((b, 8), np.int32)
    scal[:, 0] = rep_len
    scal[:, 1] = unit_len
    scal[:, 2:5] = (1, 1, 3)

    fn = get_wrap_dp_fused(b, u_pad, r_pad)
    t0 = time.time()
    out = fn(scal, repa, units)
    _ = np.asarray(out)
    print(f"[{b}x{u_pad}x{r_pad}] first exec: {time.time()-t0:.1f}s", flush=True)

    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(scal, repa, units)
        _ = np.asarray(out)
        times.append(time.time() - t0)
    dt = min(times)
    cells = b * rep_len * unit_len
    print(
        f"[{b}x{u_pad}x{r_pad}] fused: {dt*1e3:.1f} ms for "
        f"{cells/1e9:.3f} Gcells -> {cells/dt/1e9:.1f} GCUPS",
        flush=True,
    )
    return cells / dt / 1e9


def main():
    # headline bucket (matches gcups_bench.py for comparability)
    run_bucket(1024, 128, 4096, 100, 4000)
    # small-unit bucket (the common production shape on the 100x10 set)
    run_bucket(1024, 128, 1024, 100, 1000)


if __name__ == "__main__":
    main()
