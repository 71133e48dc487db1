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
