"""Cross-engine fuzz: every backend must emit identical records.

Randomized single-TR reads over a spread of unit lengths and error
rates; the batched host pipeline must byte-match the sequential oracle
(which is itself golden-verified against the reference binary).  This
catches engine divergence on inputs no fixture covers.
"""

import io
import os

import pytest

from mtr_tpu.config import MTRConfig
from mtr_tpu.pipeline import run_file
from mtr_tpu.oracle.pipeline import run_file_oracle
from mtr_tpu.testutil.rand_seq import write_fasta


def _oracle(fasta: str) -> str:
    out = io.StringIO()
    for _read, records in run_file_oracle(fasta, MTRConfig()):
        for rec in records:
            out.write(rec.format_record() + "\n")
    return out.getvalue()


def _host(fasta: str, reads_per_batch: int) -> str:
    out = io.StringIO()
    run_file(fasta, MTRConfig(backend="host", reads_per_batch=reads_per_batch), out)
    return out.getvalue()


@pytest.mark.parametrize(
    "unit_len,freq,sub,ins,dele,seed",
    [
        (3, 20, 5.0, 5.0, 5.0, 101),
        (17, 8, 1.6, 9.0, 3.8, 202),
        (59, 10, 9.7, 2.9, 7.5, 303),
        (211, 6, 2.0, 2.0, 2.0, 404),
    ],
)
def test_host_matches_oracle_fuzz(tmp_path, unit_len, freq, sub, ins, dele, seed):
    fasta = str(tmp_path / "fuzz.fasta")
    write_fasta(fasta, str(tmp_path / "u.txt"), unit_len, freq,
                sub, ins, dele, unit_len * 2, unit_len * 2, 6, seed=seed)
    # odd batch size exercises cross-batch arena state
    assert _host(fasta, reads_per_batch=4) == _oracle(fasta)


@pytest.mark.slow
def test_long_read_beyond_reference_overflow(tmp_path):
    """Reads longer than ~833 kbp overflow the reference's 1 Mbp DI
    arrays (the reference binary segfaults); the arena headroom lets us
    process every read the FASTA limit admits.  An 800 kbp read (where
    the reference is well-defined) was verified byte-identical."""
    fasta = str(tmp_path / "big.fasta")
    write_fasta(fasta, str(tmp_path / "u.txt"), 100, 10, 1.6, 9.0, 3.8,
                449500, 449500, 1, seed=5150)
    out = io.StringIO()
    run_file(fasta, MTRConfig(backend="host"), out)
    recs = [r.split("\t") for r in out.getvalue().splitlines()]
    assert recs
    # the planted 1 kbp repeat at ~449.5 kbp must be among the detections
    # (the inferred period may drift a few bases from 100 after polish)
    assert any(
        int(f[4]) >= 900 and 448_000 < int(f[2]) < 451_000 and 90 <= int(f[5]) <= 110
        for f in recs
    )


def test_find_repeats_api():
    """Library entry point mirrors the CLI (verified against the
    reference binary on the same input)."""
    import mtr_tpu

    seq = "ACGT" * 50 + "GATTACA" * 30 + "TTGCA" * 40
    res = mtr_tpu.find_repeats([("myread", seq), ("norep", "ACGTTGCAAT" * 20)])
    assert len(res) == 2
    assert [r.string for r in res[0]] == ["GATTACA"]
    assert res[0][0].rep_start + 1 == 201 and res[0][0].rep_end + 1 == 410
    assert res[1] == []
