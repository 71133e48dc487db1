"""Device DI stencil vs the host oracle: DI ranges must be identical."""

import numpy as np

from mtr_tpu.io.fasta import iter_fasta
from mtr_tpu.oracle.arena import Arena
from mtr_tpu.oracle.directional_index import (
    fill_directional_index_with_end,
    sliding_l1,
)
from mtr_tpu.ops.directional_index import sliding_l1_device, di_manhattan_device

FASTA = "/root/reference/test_multiple_TRs/data/3_5.fasta"


def test_sliding_l1_matches_oracle():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 64, 5000).astype(np.int32)
    for w in (5, 20, 80):
        a = sliding_l1(vals, w, 1000)
        b = sliding_l1_device(vals, w, 1000)
        assert np.array_equal(a, b), f"w={w}"


def test_full_di_ranges_match():
    read = next(iter_fasta(FASTA))
    a1, a2 = Arena(), Arena()
    a1.load_read(read.codes)
    a2.load_read(read.codes)
    rsl = 100 if read.length < 1000 else read.length // 10
    di0, de0, dw0 = fill_directional_index_with_end(a1, read.length, rsl)
    di1, de1, dw1 = fill_directional_index_with_end(
        a2, read.length, rsl, di_compute=di_manhattan_device
    )
    assert np.array_equal(di0, di1)
    assert np.array_equal(de0, de1)
    assert np.array_equal(dw0, dw1)
