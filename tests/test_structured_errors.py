"""Badread-style structured-error evaluation (VERDICT r2 missing #5 /
next-step #8): parity and accuracy must generalize beyond rand_seq's
independently planted errors to burst indels + homopolymer slips +
read-level identity spread (PacBio_Nanopore_read/Readme's error model).
"""

import io
import os
import subprocess

import pytest

from mtr_tpu.config import MTRConfig
from mtr_tpu.pipeline import run_file
from mtr_tpu.testutil.structured_errors import write_structured_fasta
from mtr_tpu.testutil.evaluators import count_match

REF_BIN = "/tmp/refbuild/mTR"


def _gen(tmp_path, n_reads=8, seed=99):
    # freq 12 => coverage ~12: inside the polish gate [5, 20]
    # (handle_one_read.c:95-98), so the revision rounds are exercised
    fa = str(tmp_path / "struct.fasta")
    units = str(tmp_path / "struct.units")
    write_structured_fasta(fa, units, 50, 12, 0.08, 600, n_reads,
                           seed=seed)
    return fa, units


def test_structured_parity_vs_reference(tmp_path):
    """Byte-identical output to the reference binary on structured-error
    reads (same deterministic-allocator config as PARITY.md)."""
    if not os.path.exists(REF_BIN):
        import bench

        if not bench.ensure_reference():
            pytest.skip("reference binary unavailable")
    fa, _units = _gen(tmp_path)
    env = {**os.environ, "GLIBC_TUNABLES": "glibc.malloc.tcache_count=0"}
    ref = subprocess.run([REF_BIN, fa], capture_output=True, env=env,
                         timeout=600)
    assert ref.returncode == 0
    ours = io.StringIO()
    run_file(fa, MTRConfig(backend="host"), ours)
    assert ours.getvalue() == ref.stdout.decode()


def test_structured_accuracy_floor(tmp_path):
    """The pipeline must still recover most planted units as exact
    cyclic matches under structured errors (floor well below the 62%
    rand_seq level to absorb the harsher error model, but far above
    chance)."""
    fa, units = _gen(tmp_path, n_reads=16, seed=5)
    out = io.StringIO()
    run_file(fa, MTRConfig(backend="host"), out)
    n = count_match(out.getvalue().splitlines(),
                    open(units).read().splitlines())
    # measured 12/16 at this profile; floor leaves margin for seed drift
    assert n >= 8, f"only {n}/16 structured-error units recovered"


def _gen_artifacts(tmp_path, n_reads=20, seed=31):
    """Extended Badread artifact set (VERDICT r3 #8): junk reads,
    uniform-random reads, chimeras, and ligation adapters."""
    fa = str(tmp_path / "artifacts.fasta")
    units = str(tmp_path / "artifacts.units")
    write_structured_fasta(fa, units, 50, 12, 0.08, 600, n_reads,
                           seed=seed, junk_frac=0.1, random_frac=0.1,
                           chimera_frac=0.2, adapters=True)
    return fa, units


def test_artifact_parity_vs_reference(tmp_path):
    """Byte-identical output to the reference binary on the full
    artifact mix — junk, random, chimera, adapters."""
    if not os.path.exists(REF_BIN):
        import bench

        if not bench.ensure_reference():
            pytest.skip("reference binary unavailable")
    fa, _units = _gen_artifacts(tmp_path)
    env = {**os.environ, "GLIBC_TUNABLES": "glibc.malloc.tcache_count=0"}
    ref = subprocess.run([REF_BIN, fa], capture_output=True, env=env,
                         timeout=600)
    assert ref.returncode == 0
    ours = io.StringIO()
    run_file(fa, MTRConfig(backend="host"), ours)
    assert ours.getvalue() == ref.stdout.decode()


def test_artifact_accuracy_floors(tmp_path):
    """Unit recovery on the artifact set: plain TR reads must keep
    their exact-cyclic-match floor despite adapters; chimera reads must
    recover at least one of their two planted units most of the time."""
    from mtr_tpu.testutil.evaluators import parse_records

    fa, units = _gen_artifacts(tmp_path, n_reads=24, seed=12)
    out = io.StringIO()
    run_file(fa, MTRConfig(backend="host"), out)
    truth = open(units).read().splitlines()
    by_read = {}
    for rid, seq in parse_records(out.getvalue().splitlines()):
        by_read.setdefault(rid, []).append(seq)

    def cyc_eq(a, b):
        return len(a) == len(b) and any(
            b[i:] + b[:i] == a for i in range(len(b)))

    plain_tot = plain_ok = chim_tot = chim_ok = 0
    for rid, t in enumerate(truth):
        preds = by_read.get(rid, [])
        if t in ("junk", "random"):
            continue
        if t.startswith("chimera "):
            chim_tot += 1
            ua, ub = t.split()[1:]
            if any(cyc_eq(p, ua) or cyc_eq(p, ub) for p in preds):
                chim_ok += 1
        else:
            plain_tot += 1
            if any(cyc_eq(p, t) for p in preds):
                plain_ok += 1
    # measured 13/16 plain and 4/4 chimera at this profile/seed; floors
    # leave margin for generator drift
    assert plain_tot >= 8 and chim_tot >= 3, (plain_tot, chim_tot)
    assert plain_ok >= plain_tot * 0.5, (plain_ok, plain_tot)
    assert chim_ok >= chim_tot * 0.6, (chim_ok, chim_tot)
