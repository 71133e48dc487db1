"""Benchmark driver: reads/s on the reference's headline workload.

Workload = test_single_TR/test.sh defaults: synthetic reads with a
100 bp unit x 10 copies, flanks of unit_len*freq on both sides
(~3 kb/read), error profile sub/ins/del = 1.6/9.0/3.8%.  The reference
binary (gcc, no -O, 1 CPU core) measures ~17 reads/s on this set
(BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Engine selection is empirical: each candidate engine (native host path,
Pallas TPU path) runs the measured set in its OWN subprocess — the JAX
runtime's service threads would otherwise steal CPU from the host
engine on small containers — with one warmup pass plus best-of-N
repetitions to ride out noisy-neighbor/lazy-memory variance.  A wedged
TPU terminal is handled by a hard preflight deadline.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_READS_PER_S = 17.0
N_READS = int(os.environ.get("MTR_BENCH_READS", "100"))
N_REPS = int(os.environ.get("MTR_BENCH_REPS", "3"))
PREFLIGHT_S = int(os.environ.get("MTR_BENCH_PREFLIGHT_S", "600"))
FASTA = "/tmp/mtr_bench_100x10.fasta"

# keep glibc from returning freed arenas to the OS: on lazy-memory hosts
# re-faulting returned pages costs ~30 us/page (see mtr_tpu/native.py)
_CHILD_ENV = {
    "MALLOC_MMAP_MAX_": "0",
    "MALLOC_TRIM_THRESHOLD_": "1073741824",
    "JAX_COMPILATION_CACHE_DIR": os.path.expanduser("~/.cache/mtr_tpu_jax"),
}


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
            env={**os.environ, **_CHILD_ENV},
        )
        return r.returncode == 0 and b"2" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def child(backend: str, n_reads: int, n_reps: int) -> int:
    """Measured run: warmup pass + n_reps timed passes; prints best dt."""
    import io

    from mtr_tpu.config import MTRConfig
    from mtr_tpu.pipeline import run_file

    cfg = MTRConfig(backend=backend, reads_per_batch=min(128, n_reads))
    best = float("inf")
    run_file(FASTA, cfg, io.StringIO())  # warmup: compiles, pools, pages
    for _ in range(n_reps):
        t0 = time.time()
        run_file(FASTA, cfg, io.StringIO())
        best = min(best, time.time() - t0)
    print(json.dumps({"dt": best}))
    return 0


def run_engine(backend: str, n_reads: int, n_reps: int, timeout_s: int):
    """One engine's measurement in an isolated subprocess; returns best
    seconds or None on failure/timeout."""
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", backend,
             str(n_reads), str(n_reps)],
            capture_output=True,
            timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            env={**os.environ, **_CHILD_ENV},
        )
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        return None
    try:
        return float(json.loads(r.stdout.splitlines()[-1])["dt"])
    except Exception:
        return None


def main():
    from mtr_tpu.testutil.rand_seq import write_fasta

    units = "/tmp/mtr_bench_100x10.units"
    if not os.path.exists(FASTA) or os.environ.get("MTR_BENCH_REGEN"):
        write_fasta(FASTA, units, 100, 10, 1.6, 9.0, 3.8, 1000, 1000, N_READS, seed=12345)

    force = os.environ.get("MTR_BENCH_BACKEND")
    if force:
        candidates = [force]
    else:
        candidates = ["host"]
        if preflight_device():
            candidates.extend(["device", "hybrid"])

    results = {}
    for b in candidates:
        # generous deadline: device path pays minutes-long program loads
        # on proxied TPU terminals
        dt = run_engine(b, N_READS, N_REPS, timeout_s=3600)
        if dt is not None:
            results[b] = dt
    if not results:
        print(json.dumps({"metric": "reads_per_s_singleTR_100x10", "value": 0.0,
                          "unit": "reads/s", "vs_baseline": 0.0, "error": "no engine"}))
        return 1
    backend = min(results, key=results.get)
    reads_per_s = N_READS / results[backend]
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
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        sys.exit(child(sys.argv[2], int(sys.argv[3]), int(sys.argv[4])))
    sys.exit(main())
