"""Benchmark driver: reads/s on the reference's headline workload.

Workload = test_single_TR/test.sh defaults: synthetic reads with a
100 bp unit x 10 copies, flanks of unit_len*freq on both sides
(~3 kb/read), error profile sub/ins/del = 1.6/9.0/3.8%.  The reference
binary (gcc, no -O, 1 CPU core) measures ~17 reads/s on this set
(BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Engine selection is empirical: after warmup, both the Pallas TPU path
and the native host path run a small subset and the faster one runs the
measured set (a proxied TPU with ~0.2 s roundtrips loses to the
in-process native engine on 3 kb reads; locally attached hardware wins).
A wedged TPU terminal is handled by a hard preflight deadline.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_READS_PER_S = 17.0
N_READS = int(os.environ.get("MTR_BENCH_READS", "100"))
PREFLIGHT_S = int(os.environ.get("MTR_BENCH_PREFLIGHT_S", "600"))


def preflight_device() -> bool:
    """TPU usability probe (incl. one pallas first-exec) in a subprocess
    with a hard deadline — a wedged terminal must not hang the bench."""
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


def _run(fasta, backend, n_reads):
    from mtr_tpu.config import MTRConfig
    from mtr_tpu.pipeline import run_file

    cfg = MTRConfig(backend=backend, reads_per_batch=min(128, n_reads))
    t0 = time.time()
    run_file(fasta, cfg, _Null())
    return time.time() - t0


def main():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/mtr_tpu_jax")
    )
    from mtr_tpu.testutil.rand_seq import write_fasta

    fasta = "/tmp/mtr_bench_100x10.fasta"
    units = "/tmp/mtr_bench_100x10.units"
    if not os.path.exists(fasta) or os.environ.get("MTR_BENCH_REGEN"):
        write_fasta(fasta, units, 100, 10, 1.6, 9.0, 3.8, 1000, 1000, N_READS, seed=12345)
    trial = "/tmp/mtr_bench_trial.fasta"
    if not os.path.exists(trial):
        write_fasta(trial, "/tmp/mtr_bench_trial.units", 100, 10, 1.6, 9.0, 3.8,
                    1000, 1000, 10, seed=999)

    force = os.environ.get("MTR_BENCH_BACKEND")
    if force:
        backend = force
        _run(trial, backend, 10)  # warm
    else:
        candidates = ["host"]
        if preflight_device():
            candidates.append("device")
        trials = {}
        for b in candidates:
            _run(trial, b, 10)  # warm (compiles/loads programs)
            trials[b] = _run(trial, b, 10)
        backend = min(trials, key=trials.get)

    t0 = time.time()
    _run(fasta, backend, N_READS)
    dt = time.time() - t0
    reads_per_s = N_READS / dt
    print(
        json.dumps(
            {
                "metric": f"reads_per_s_singleTR_100x10_{backend}",
                "value": round(reads_per_s, 3),
                "unit": "reads/s",
                "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
