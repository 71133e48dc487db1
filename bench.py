"""Benchmark driver: reads/s on the reference's headline workload.

Workload = test_single_TR/test.sh defaults: synthetic reads with a
100 bp unit x 10 copies, flanks of unit_len*freq on both sides
(~3 kb/read), error profile sub/ins/del = 1.6/9.0/3.8%.  The reference
binary (gcc, no -O, 1 CPU core) measures ~17 reads/s on this set
(BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

A preflight subprocess probes the TPU with a deadline; when the device
is unreachable (the axon terminal can wedge — see project memory) the
bench falls back to the host/oracle path so a number is always
reported.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_READS_PER_S = 17.0
N_READS = int(os.environ.get("MTR_BENCH_READS", "100"))
PREFLIGHT_S = int(os.environ.get("MTR_BENCH_PREFLIGHT_S", "420"))


def preflight_device() -> bool:
    """Probe TPU usability (incl. one pallas first-exec) in a subprocess
    with a hard deadline."""
    code = (
        "import numpy as np, jax, jax.numpy as jnp\n"
        "from jax.experimental import pallas as pl\n"
        "def k(x_ref, o_ref): o_ref[...] = x_ref[...] * 2\n"
        "f = jax.jit(lambda x: pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.int32))(x))\n"
        "print(int(np.asarray(f(np.ones((8,128), np.int32)))[0,0]))\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            timeout=PREFLIGHT_S,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return r.returncode == 0 and b"2" in r.stdout
    except subprocess.TimeoutExpired:
        return False


class _Null:
    def write(self, s):
        pass

    def flush(self):
        pass


def main():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/mtr_tpu_jax")
    )

    from mtr_tpu.testutil.rand_seq import write_fasta
    from mtr_tpu.config import MTRConfig

    fasta = "/tmp/mtr_bench_100x10.fasta"
    units = "/tmp/mtr_bench_100x10.units"
    if not os.path.exists(fasta) or os.environ.get("MTR_BENCH_REGEN"):
        write_fasta(fasta, units, 100, 10, 1.6, 9.0, 3.8, 1000, 1000, N_READS, seed=12345)

    force = os.environ.get("MTR_BENCH_BACKEND")
    use_device = force == "device" or (force is None and preflight_device())

    sink = _Null()
    if use_device:
        from mtr_tpu.pipeline import run_file

        cfg = MTRConfig(reads_per_batch=min(128, N_READS))
        warm = "/tmp/mtr_bench_warm.fasta"
        if not os.path.exists(warm):
            write_fasta(warm, "/tmp/mtr_bench_warm.units", 100, 10, 1.6, 9.0, 3.8,
                        1000, 1000, 3, seed=999)
        run_file(warm, cfg, sink)  # compiles the workload's kernel buckets
        t0 = time.time()
        run_file(fasta, cfg, sink)
        dt = time.time() - t0
        metric = "reads_per_s_singleTR_100x10"
    else:
        from mtr_tpu.pipeline import run_file

        cfg = MTRConfig(backend="host", reads_per_batch=min(64, N_READS))
        run_file(fasta, cfg, sink)  # warm caches / native lib build
        t0 = time.time()
        run_file(fasta, cfg, sink)
        dt = time.time() - t0
        metric = "reads_per_s_singleTR_100x10_hostfallback"

    reads_per_s = N_READS / dt
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(reads_per_s, 3),
                "unit": "reads/s",
                "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
