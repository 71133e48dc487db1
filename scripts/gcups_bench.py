"""Raw wrap-around-DP fill throughput (GCUPS/chip).

Measures the Pallas fill kernel on a full bucket: cells = B * rep_len *
unit_len per invocation, steady state over several warm runs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from mtr_tpu.ops.wrap_dp_pallas import get_wrap_dp_pallas

    b, u_pad, r_pad = 1024, 128, 4096
    unit_len, rep_len = 100, 4000
    rng = np.random.default_rng(0)
    unit = rng.integers(0, 4, unit_len)
    rep = np.tile(unit, rep_len // unit_len + 1)[:rep_len]
    reps = np.full((b, r_pad), -1, np.int32)
    units = np.full((b, u_pad), -2, np.int32)
    reps[:, :rep_len] = rep
    units[:, :unit_len] = unit
    scal = np.zeros((b, 8), np.int32)
    scal[:, 0] = rep_len
    scal[:, 1] = unit_len
    scal[:, 2:5] = (1, 1, 3)

    fn = get_wrap_dp_pallas(b, u_pad, r_pad)
    t0 = time.time()
    moves, best = fn(scal, reps, units)
    jax.block_until_ready((moves, best))
    _ = np.asarray(best)
    print(f"first exec (program load): {time.time()-t0:.1f}s")

    times = []
    for _ in range(5):
        t0 = time.time()
        moves, best = fn(scal, reps, units)
        _ = np.asarray(best)
        times.append(time.time() - t0)
    dt = min(times)
    cells = b * rep_len * unit_len
    print(f"fill: {dt*1e3:.1f} ms for {cells/1e9:.2f} Gcells -> {cells/dt/1e9:.1f} GCUPS")


if __name__ == "__main__":
    main()
