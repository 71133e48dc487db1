"""Benchmark driver: reads/s on the reference's headline workload.

Workload = test_single_TR/test.sh defaults: synthetic reads with a
100 bp unit x 10 copies, flanks of unit_len*freq on both sides
(~3 kb/read), error profile sub/ins/del = 1.6/9.0/3.8%.  The reference
binary (gcc, no -O, 1 CPU core) measures ~17 reads/s on this set
(BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

BASELINE_READS_PER_S = 17.0
N_READS = int(os.environ.get("MTR_BENCH_READS", "100"))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mtr_jax_cache")
    from mtr_tpu.testutil.rand_seq import write_fasta
    from mtr_tpu.config import MTRConfig
    from mtr_tpu.pipeline import run_file

    fasta = "/tmp/mtr_bench_100x10.fasta"
    units = "/tmp/mtr_bench_100x10.units"
    if not os.path.exists(fasta) or os.environ.get("MTR_BENCH_REGEN"):
        write_fasta(fasta, units, 100, 10, 1.6, 9.0, 3.8, 1000, 1000, N_READS, seed=12345)

    cfg = MTRConfig(reads_per_batch=min(64, N_READS))

    class _Null:
        def write(self, s):
            pass

        def flush(self):
            pass

    sink = _Null()
    # warmup: compile all kernel buckets on a small prefix
    warm = "/tmp/mtr_bench_warm.fasta"
    if not os.path.exists(warm):
        write_fasta(warm, "/tmp/mtr_bench_warm.units", 100, 10, 1.6, 9.0, 3.8, 1000, 1000, 4, seed=999)
    run_file(warm, cfg, sink)

    t0 = time.time()
    run_file(fasta, cfg, sink)
    dt = time.time() - t0

    reads_per_s = N_READS / dt
    print(
        json.dumps(
            {
                "metric": "reads_per_s_singleTR_100x10",
                "value": round(reads_per_s, 3),
                "unit": "reads/s",
                "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
