"""Benchmark driver: the north-star metrics on real hardware.

BASELINE.json defines the metric set: reads/s/chip on the 200_200
Nanopore set, wrap-around-DP GCUPS/chip, and output-equality rate vs the
reference binary.  The bundled 200_200 Badread zips are absent from the
reference snapshot (PacBio_Nanopore_read/Readme, .MISSING_LARGE_BLOBS),
so the set is regenerated with the reference's own generator semantics:
rand_seq, unit 200 bp x 200 copies, flanks unit*freq, Nanopore-profile
error rates sub/ins/del = 9.7/2.9/7.5% (test_single_TR/test.sh:16-18).

Prints ONE JSON line.  Primary fields {"metric", "value", "unit",
"vs_baseline"} = reads/s on the 200_200 set for the fastest engine;
extra fields carry the other north-star metrics:
  wrap_dp_gcups        fused wrap-DP kernel throughput, slope method
                       (two rep_len points on one program -> transfer
                       and dispatch fixed costs cancel)
  output_equality_rate identical output lines vs the reference binary
                       (GLIBC_TUNABLES=glibc.malloc.tcache_count=0 -- see
                       PARITY.md) across the 200_200 + 100x10 sets
  singleTR_100x10      round-1 headline workload (vs 17 reads/s C ref)

Engine selection is empirical: each candidate engine runs in its OWN
subprocess (JAX service threads otherwise steal CPU from the host
engine) with one warmup pass plus best-of-N timed passes.
"""

import json
import os
import subprocess
import sys
import time

# Reference-binary rates measured on this container (1 core, stock
# Makefile, no -O): BASELINE.md.  Re-derivable: /tmp/refbuild/mTR.
BASELINE_200x200_READS_PER_S = 0.328   # 5 reads in 15.24 s
BASELINE_100x10_READS_PER_S = 17.0
# The stock Makefile ships NO -O flag (Makefile:5-12).  The honest
# comparison is the same source at -O2 (VERDICT r4 #1): rebuilt with
# CFLAGS += -O2 (output byte-identical on both bench sets), measured
# best-of-N on this container, 1 core: 20 north-star reads in 24.84 s;
# 100 short reads in 2.22 s.  Re-derivable: build_reference_O2().
BASELINE_200x200_O2_READS_PER_S = 0.805
BASELINE_100x10_O2_READS_PER_S = 44.9

N_READS_200 = int(os.environ.get("MTR_BENCH_READS_200", "20"))
N_READS_100 = int(os.environ.get("MTR_BENCH_READS", "100"))
N_REPS = int(os.environ.get("MTR_BENCH_REPS", "3"))
PREFLIGHT_S = int(os.environ.get("MTR_BENCH_PREFLIGHT_S", "420"))
FASTA_200 = "/tmp/mtr_bench_200x200.fasta"
FASTA_100 = "/tmp/mtr_bench_100x10.fasta"
REF_BIN = "/tmp/refbuild/mTR"

_CHILD_ENV = {
    # keep glibc from returning freed arenas to the OS: on lazy-memory
    # hosts re-faulting returned pages costs ~30 us/page (mtr_tpu/native.py)
    "MALLOC_MMAP_MAX_": "0",
    "MALLOC_TRIM_THRESHOLD_": "1073741824",
    "JAX_COMPILATION_CACHE_DIR": os.path.expanduser("~/.cache/mtr_tpu_jax"),
    # the proxy's FIRST Pallas compile in a process has been measured to
    # stall up to ~12 min before the service warms (subsequent shapes
    # take seconds); the preflight already rules out a true wedge, so
    # children get a budget that tolerates the cold start instead of
    # falsely degrading the hybrid to host mid-warmup
    "MTR_TPU_DEVICE_BUDGET_S": os.environ.get(
        "MTR_TPU_DEVICE_BUDGET_S", "2000"),
}
REPO = os.path.dirname(os.path.abspath(__file__))


def ensure_sets():
    from mtr_tpu.testutil.rand_seq import write_fasta

    regen = os.environ.get("MTR_BENCH_REGEN")

    def stale(fasta, n):
        # a sidecar records the read count the file was generated with;
        # changing MTR_BENCH_READS* must regenerate, not skew reads/s
        # against a stale file
        meta = fasta + ".n"
        if not os.path.exists(fasta):
            return True
        try:
            return int(open(meta).read().strip()) != n
        except (FileNotFoundError, ValueError):
            return True

    if stale(FASTA_200, N_READS_200) or regen:
        write_fasta(FASTA_200, FASTA_200[:-6] + ".units",
                    200, 200, 9.7, 2.9, 7.5, 40000, 40000, N_READS_200,
                    seed=20200)
        open(FASTA_200 + ".n", "w").write(str(N_READS_200))
    if stale(FASTA_100, N_READS_100) or regen:
        write_fasta(FASTA_100, FASTA_100[:-6] + ".units",
                    100, 10, 1.6, 9.0, 3.8, 1000, 1000, N_READS_100,
                    seed=12345)
        open(FASTA_100 + ".n", "w").write(str(N_READS_100))


def ensure_reference():
    """Build the unmodified reference binary for equality goldens."""
    if os.path.exists(REF_BIN):
        return True
    import glob
    import shutil

    src = "/root/reference"
    if not os.path.isdir(src):
        return False
    bld = "/tmp/refbuild"
    os.makedirs(bld, exist_ok=True)
    for pat in ("*.c", "*.cpp", "*.h", "Makefile"):
        for f in glob.glob(os.path.join(src, pat)):
            shutil.copy(f, bld)
    r = subprocess.run(["make"], cwd=bld, capture_output=True)
    return r.returncode == 0 and os.path.exists(REF_BIN)


def build_reference_O2(dest="/tmp/refbuild/mTR_O2"):
    """Rebuild the unmodified reference source at -O2 (the honest
    baseline build — the stock Makefile has no -O flag).  Returns the
    binary path or None."""
    if os.path.exists(dest):
        return dest
    if not ensure_reference():
        return None
    import glob
    import shutil

    bld = "/tmp/refbuild_O2"
    os.makedirs(bld, exist_ok=True)
    for pat in ("*.c", "*.cpp", "*.h", "Makefile"):
        for f in glob.glob(os.path.join("/tmp/refbuild", pat)):
            shutil.copy(f, bld)
    mk = os.path.join(bld, "Makefile")
    txt = open(mk).read().replace(
        "CFLAGS\t= -std=c99", "CFLAGS\t= -O2 -std=c99").replace(
        "$(CPP) -c $<", "$(CPP) -O2 -c $<")
    open(mk, "w").write(txt)
    r = subprocess.run(["make"], cwd=bld, capture_output=True)
    built = os.path.join(bld, "mTR")
    if r.returncode != 0 or not os.path.exists(built):
        return None
    shutil.copy(built, dest)
    return dest


def reference_golden(fasta, pearson=False):
    """Reference output under the deterministic-allocator configuration
    (PARITY.md), cached beside the fasta."""
    golden = fasta + (".p.refout" if pearson else ".refout")
    if os.path.exists(golden) and os.path.getmtime(golden) >= os.path.getmtime(fasta):
        return golden
    if not ensure_reference():
        return None
    env = {**os.environ, "GLIBC_TUNABLES": "glibc.malloc.tcache_count=0"}
    cmd = [REF_BIN] + (["-p"] if pearson else []) + [fasta]
    try:
        with open(golden, "w") as out:
            r = subprocess.run(cmd, stdout=out, env=env, timeout=3600)
        ok = r.returncode == 0
    except Exception:  # incl. TimeoutExpired: never keep a partial golden
        ok = False
    if not ok:
        try:
            os.unlink(golden)
        except FileNotFoundError:
            pass
        return None
    return golden


WORM = "/root/reference/test_multiple_TRs/data/worm_chrII_1.fasta"
MULTI90K = "/root/reference/test_multiple_TRs/data/2_5_10_20_50_100_200_set.fasta"
FASTA_STRUCT = "/tmp/mtr_bench_structured.fasta"
FASTA_800K = "/tmp/mtr_bench_800k.fasta"


def ensure_800k():
    """One 800 kbp synthetic read (PARITY.md long-read case): inside the
    reference's well-defined envelope (< ~833 kbp), so a golden exists;
    exercises the long-context path in the equality metric."""
    if os.path.exists(FASTA_800K):
        return
    from mtr_tpu.testutil.rand_seq import write_fasta

    write_fasta(FASTA_800K, FASTA_800K[:-6] + ".units",
                100, 2000, 9.7, 2.9, 7.5, 300000, 300000, 1, seed=80080)


def ensure_structured():
    """Badread-style structured-error set (burst indels, homopolymer
    slips, read-level identity spread — VERDICT r2 #8) extended with
    Badread's artifact classes (junk/random reads, chimeras, ligation
    adapters — VERDICT r3 #8)."""
    marker = FASTA_STRUCT + ".v2"
    if os.path.exists(FASTA_STRUCT) and os.path.exists(marker):
        return
    from mtr_tpu.testutil.structured_errors import write_structured_fasta

    write_structured_fasta(FASTA_STRUCT, FASTA_STRUCT[:-6] + ".units",
                           50, 12, 0.08, 600, 12, seed=4242,
                           junk_frac=0.1, random_frac=0.05,
                           chimera_frac=0.15, adapters=True)
    open(marker, "w").write("1")


def _eqout_path(fasta, backend, pearson):
    # always under /tmp: the fasta may live in the read-only reference
    suffix = f".{backend}.p.eqout" if pearson else f".{backend}.eqout"
    return os.path.join("/tmp", os.path.basename(fasta) + suffix)


def equality_child(backend, fasta, pearson):
    """Equality-only run: one pass, output to _eqout_path."""
    import io

    from mtr_tpu.config import MTRConfig
    from mtr_tpu.pipeline import run_file

    cfg = MTRConfig(backend=backend, manhattan_distance=not pearson)
    buf = io.StringIO()
    run_file(fasta, cfg, buf)
    with open(_eqout_path(fasta, backend, pearson), "w") as f:
        f.write(buf.getvalue())
    print(json.dumps({"ok": True}))
    return 0


_PALLAS_CODE = (
    "import numpy as np, jax, jax.numpy as jnp\n"
    "from jax.experimental import pallas as pl\n"
    "def k(x_ref, o_ref): o_ref[...] = x_ref[...] * 2\n"
    "f = jax.jit(lambda x: pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.int32))(x))\n"
    "print(int(np.asarray(f(np.ones((8,128), np.int32)))[0,0]))\n"
)
_XLA_CODE = (
    "import numpy as np, jax, jax.numpy as jnp\n"
    "print(int(np.asarray(jax.jit(lambda x: x * 2)"
    "(jnp.ones((8, 128), jnp.int32)))[0, 0]))\n"
)


def _probe(code, budget):
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            timeout=budget, cwd=REPO, env={**os.environ, **_CHILD_ENV},
        )
        return r.returncode == 0 and b"2" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def preflight_device():
    """Returns "pallas" (full device path), "xla" (Mosaic wedged but
    plain XLA alive -> MTR_TPU_XLA_DP engines), or None (no device).

    Probe ORDER matters on this proxy: a hung Pallas compile has been
    observed to poison the server for ALL subsequent programs until the
    server restarts.  So: (1) plain-XLA probe establishes the device is
    alive at all; (2) the Pallas probe runs with a bounded budget;
    (3) if Pallas hung, a SECOND plain-XLA probe checks whether the
    server survived it — if not, report no device rather than letting
    the measurement children hang."""
    if not _probe(_XLA_CODE, 300):
        return None
    if _probe(_PALLAS_CODE, PREFLIGHT_S):
        return "pallas"
    return "xla" if _probe(_XLA_CODE, 300) else None


def child(backend, fasta, n_reads, n_reps):
    """Measured run in-process: warmup + n_reps timed passes, best dt.
    Also emits the output lines (for the equality metric).

    backend may be a comma-separated list: the engines then measure
    INTERLEAVED (round-robin passes in one process), so tunnel/session
    drift hits every engine equally — sequential per-engine children
    were observed to flip winners purely on minutes-apart drift."""
    import io

    from mtr_tpu.config import MTRConfig
    from mtr_tpu.pipeline import run_file

    backends = backend.split(",")
    cfgs = {
        b: MTRConfig(backend=b, reads_per_batch=min(128, n_reads))
        for b in backends
    }
    for b in backends:  # warmup: compiles, pools, pages
        buf = io.StringIO()
        run_file(fasta, cfgs[b], buf)
        with open(fasta + f".{b}.out", "w") as f:
            f.write(buf.getvalue())
    best = {b: float("inf") for b in backends}
    for _ in range(n_reps):
        for b in backends:
            t0 = time.time()
            run_file(fasta, cfgs[b], io.StringIO())
            best[b] = min(best[b], time.time() - t0)
    print(json.dumps({"dt": {b: best[b] for b in backends}}))
    return 0


def _gcups_one(fn, b, u_pad, unit_len, r_pad, r1, r2, chain=8):
    """Slope-method GCUPS for one engine: two rep_len points on ONE
    compiled program, so dispatch/transfer fixed costs cancel.

    The raw slope signal (a few ms) can drown under per-dispatch proxy
    latency (30-70 ms on tunneled sessions — the round-4 null).  Fix:
    CHAIN `chain` kernel invocations inside one jitted program (batch
    rolled between iterations so XLA cannot CSE them), multiplying the
    device-time signal without multiplying dispatch cost.  If the
    ratio gate still fails after escalating reps, fall back to a
    single-point estimate that DIVIDES BY the full call time — fixed
    costs then deflate, never inflate, the published number."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    unit = rng.integers(0, 4, unit_len)

    def inputs(rep_len):
        rep = np.tile(unit, rep_len // unit_len + 1)[:rep_len]
        repa = np.full((b, r_pad), -1, np.int8)
        repa[:, :rep_len] = rep
        units = np.full((b, u_pad), -2, np.int8)
        units[:, :unit_len] = unit
        scal = np.zeros((b, 8), np.int32)
        scal[:, 0] = rep_len
        scal[:, 1] = unit_len
        scal[:, 2:5] = (1, 1, 3)
        return scal, repa, units

    @jax.jit
    def chained(scal, rep, units):
        acc = jnp.zeros((), jnp.int32)
        r = rep
        for _ in range(chain):
            acc = acc + jnp.sum(fn(scal, r, units))
            r = jnp.roll(r, 1, axis=0)  # defeats CSE across iterations
        return acc

    def t(args, reps):
        # sync via host pull: on the axon proxy block_until_ready has
        # been observed to return before the computation finishes
        # (measured: chained x8 "completed" in single-call time)
        int(chained(*args))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            int(chained(*args))
            ts.append(time.time() - t0)
        return min(ts)

    i1, i2 = inputs(r1), inputs(r2)
    reps = 3
    for _attempt in range(6):
        # interleaved: session drift hits both points equally
        t1, t2 = t(i1, reps), t(i2, reps)
        t1, t2 = min(t1, t(i1, reps)), min(t2, t(i2, reps))
        # r2/r1 = 3-4x rows: a slope with t2 barely above t1 is a
        # session-speed glitch that INFLATES GCUPS arbitrarily (one run
        # published 76.8 for a kernel that measures 27 carefully);
        # demand a plausible ratio before trusting the difference
        if t2 > 1.5 * t1:
            per_row = (t2 - t1) / (r2 - r1) / chain
            return b * unit_len / per_row / 1e9
        reps = min(reps + 2, 7)
    # noise won 6 rounds: publish the conservative single-point bound
    # (full call time incl. dispatch) rather than null (VERDICT r4 #2)
    return chain * b * unit_len * r2 / t2 / 1e9


def child_gcups():
    """GCUPS on BOTH production kernels (VERDICT r3 #2): fused2 at
    unit 100 (short-unit bucket) and fused2w at unit 200 (the wide
    kernel that carries 84% of north-star cells)."""
    from mtr_tpu.pipeline import B_FUSED2, B_FUSED2W

    if os.environ.get("MTR_TPU_XLA_DP"):
        from mtr_tpu.ops.wrap_dp_xla import make_wrap_dp_counts_xla

        g1 = _gcups_one(make_wrap_dp_counts_xla(B_FUSED2, 128, 4096),
                        B_FUSED2, 128, 100, 4096, 1024, 4096, chain=32)
        print(json.dumps({"gcups": g1, "gcups_w": None}))
        return 0
    from mtr_tpu.ops.wrap_dp_fused2 import make_wrap_dp_fused2
    from mtr_tpu.ops.wrap_dp_fused2w import make_wrap_dp_fused2w

    # chain=32 at unit 100: the per-call device time (~1 ms) needs the
    # multiplier to rise above tunnel dispatch latency; the wide kernel
    # is ~30 ms/call already, chain=8 suffices
    g1 = _gcups_one(make_wrap_dp_fused2(B_FUSED2, 4096),
                    B_FUSED2, 128, 100, 4096, 1024, 4096, chain=32)
    g2 = _gcups_one(make_wrap_dp_fused2w(B_FUSED2W, 32768),
                    B_FUSED2W, 256, 200, 32768, 8192, 24576, chain=8)
    print(json.dumps({"gcups": g1, "gcups_w": g2}))
    return 0


def run_child(args, timeout_s, extra_env=None):
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *args],
            capture_output=True, timeout=timeout_s, cwd=REPO,
            env={**os.environ, **_CHILD_ENV, **(extra_env or {})},
        )
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        return None
    try:
        return json.loads(r.stdout.splitlines()[-1])
    except Exception:
        return None


def equality_rate(pairs):
    """(rate, n_compared): fraction of identical output lines across the
    (ours, golden) pairs where BOTH files exist — sets whose golden or
    output is missing are excluded from the count, not silently folded
    in (VERDICT r3 #6)."""
    total = match = n_compared = 0
    for ours, golden in pairs:
        if not (ours and golden and os.path.exists(ours) and os.path.exists(golden)):
            continue
        n_compared += 1
        a = open(ours).read().splitlines()
        b = open(golden).read().splitlines()
        total += max(len(a), len(b))
        match += sum(1 for x, y in zip(a, b) if x == y)
    return ((match / total) if total else None), n_compared


def measure_set(fasta, n_reads, candidates, n_reps, timeout_s,
                extra_env=None):
    results = {}
    # host + hybrid measure interleaved in ONE child (drift-fair);
    # the pure-device child stays separate — it has no self-degrade
    # path, so a wedged proxy must not stall the main measurement
    grouped = [b for b in candidates if b != "device"]
    if grouped:
        r = run_child(
            ["--child", ",".join(grouped), fasta, str(n_reads),
             str(n_reps)], timeout_s, extra_env)
        if r is not None:
            dt = r["dt"]
            if isinstance(dt, dict):
                results.update(dt)
            else:  # single-backend child (forced via MTR_BENCH_BACKEND)
                results[grouped[0]] = dt
    if "device" in candidates:
        r = run_child(
            ["--child", "device", fasta, str(n_reads), str(n_reps)],
            min(timeout_s, 2400), extra_env)
        if r is not None:
            dt = r["dt"]
            results["device"] = (
                dt["device"] if isinstance(dt, dict) else dt)
    if not results:
        return None, None, {}
    best = min(results, key=results.get)
    per_engine = {k: round(n_reads / v, 3) for k, v in results.items()}
    return best, n_reads / results[best], per_engine


def main():
    ensure_sets()
    force = os.environ.get("MTR_BENCH_BACKEND")
    extra_env = {}
    if force:
        candidates = [force]
    else:
        candidates = ["host"]
        mode = preflight_device()
        if mode:
            candidates.extend(["hybrid", "device"])
        if mode == "xla":
            extra_env = {"MTR_TPU_XLA_DP": "1"}

    # the north-star workload
    b200, rate200, eng200 = measure_set(
        FASTA_200, N_READS_200, candidates, N_REPS, timeout_s=5400,
        extra_env=extra_env)
    # round-1 headline workload (comparability across rounds)
    b100, rate100, eng100 = measure_set(
        FASTA_100, N_READS_100, candidates, N_REPS, timeout_s=5400,
        extra_env=extra_env)

    gc = gcw = None
    if "hybrid" in candidates or "device" in candidates or force in ("hybrid", "device"):
        g = run_child(["--gcups"], timeout_s=3600, extra_env=extra_env)
        gc = round(g["gcups"], 2) if g and g.get("gcups") is not None else None
        gcw = (round(g["gcups_w"], 2)
               if g and g.get("gcups_w") is not None else None)

    pairs = []
    for fasta, backend in ((FASTA_200, b200), (FASTA_100, b100)):
        if backend:
            pairs.append((f"{fasta}.{backend}.out", reference_golden(fasta)))

    # heterogeneous equality sets (VERDICT r2 #8): real Nanopore worm
    # read, Pearson (-p) mode on the 7-type 90 kb fixture, and a
    # Badread-style structured-error set — all run on the winning
    # backend and folded into the published metric
    import shutil

    eq_backend = b200 or b100 or "host"
    ensure_structured()
    ensure_800k()
    extra = []
    for src, pearson in ((WORM, False), (MULTI90K, True),
                         (FASTA_STRUCT, False), (FASTA_800K, False)):
        if not os.path.exists(src):
            continue
        fasta = src
        if src.startswith("/root/reference"):
            fasta = "/tmp/mtr_bench_" + os.path.basename(src)
            if not os.path.exists(fasta):
                shutil.copy(src, fasta)
        extra.append((fasta, pearson))
    for fasta, pearson in extra:
        args = ["--child-eq", eq_backend, fasta, "1" if pearson else "0"]
        if run_child(args, timeout_s=1800) is not None:
            pairs.append((_eqout_path(fasta, eq_backend, pearson),
                          reference_golden(fasta, pearson)))
    # a set counts only when BOTH our output and the golden exist
    eq, n_eq_sets = equality_rate(pairs)

    if rate200 is None:
        print(json.dumps({"metric": "reads_per_s_nanopore_200x200",
                          "value": 0.0, "unit": "reads/s",
                          "vs_baseline": 0.0, "error": "no engine"}))
        return 1
    print(json.dumps({
        "metric": f"reads_per_s_nanopore_200x200_{b200}",
        "value": round(rate200, 3),
        "unit": "reads/s",
        "vs_baseline": round(rate200 / BASELINE_200x200_READS_PER_S, 3),
        # vs the same source rebuilt at -O2 (the fair-compile baseline)
        "vs_baseline_O2": round(rate200 / BASELINE_200x200_O2_READS_PER_S, 3),
        "wrap_dp_gcups": gc,
        "wrap_dp_gcups_u200": gcw,
        "output_equality_rate": eq,
        "equality_sets": n_eq_sets,
        "singleTR_100x10": {
            "backend": b100,
            "reads_per_s": round(rate100, 3) if rate100 else None,
            "vs_baseline": round(rate100 / BASELINE_100x10_READS_PER_S, 3)
            if rate100 else None,
            "vs_baseline_O2": round(
                rate100 / BASELINE_100x10_O2_READS_PER_S, 3)
            if rate100 else None,
        },
        # per-engine reads/s (transparency: winner margins vs session
        # noise are visible, not just the argmax)
        "engines_200x200": eng200,
        "engines_100x10": eng100,
    }))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        sys.exit(child(sys.argv[2], sys.argv[3], int(sys.argv[4]),
                       int(sys.argv[5])))
    if len(sys.argv) > 1 and sys.argv[1] == "--child-eq":
        sys.exit(equality_child(sys.argv[2], sys.argv[3],
                                sys.argv[4] == "1"))
    if len(sys.argv) > 1 and sys.argv[1] == "--gcups":
        sys.exit(child_gcups())
    sys.exit(main())
