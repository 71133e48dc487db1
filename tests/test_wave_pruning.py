"""Wave-based suppression pruning (VERDICT r3 #1b): opt-in scheduling
that skips walks/DP for ranges the acceptance replay will suppress
(handle_one_read.c:178-188).  Output must be byte-identical to full
speculation, and the pruning must actually engage (counters).
"""

import io
import os

import pytest

from mtr_tpu.config import MTRConfig
from mtr_tpu.pipeline import run_file
from mtr_tpu.utils.timers import TIMERS

FIXTURE = "/root/reference/test_multiple_TRs/data/2_5_10_20_set.fasta"


@pytest.fixture
def waves_env():
    os.environ["MTR_TPU_WAVES"] = "1"
    yield
    os.environ.pop("MTR_TPU_WAVES", None)


def test_wave_pruning_byte_identical(waves_env):
    if not os.path.exists(FIXTURE):
        pytest.skip("reference fixture unavailable")
    cfg = MTRConfig(backend="host")
    os.environ.pop("MTR_TPU_WAVES", None)
    full = io.StringIO()
    run_file(FIXTURE, cfg, full)
    os.environ["MTR_TPU_WAVES"] = "1"
    TIMERS.counters.clear()
    waved = io.StringIO()
    run_file(FIXTURE, cfg, waved)
    assert waved.getvalue() == full.getvalue()
    c = TIMERS.counters
    # pruning engaged: some ranges were never computed, and the live
    # query count matches the reference's replay exactly either way
    assert c["computed_ranges"] < c["ranges_total"]
    assert c["computed_ranges"] + c["pruned_ranges"] >= c["queries"]


def test_wave_counters_account_for_all_ranges(waves_env):
    if not os.path.exists(FIXTURE):
        pytest.skip("reference fixture unavailable")
    TIMERS.counters.clear()
    run_file(FIXTURE, MTRConfig(backend="host"), io.StringIO())
    c = TIMERS.counters
    # every collection-time range is either computed or pruned-dead
    assert c["computed_ranges"] + c["pruned_ranges"] == c["ranges_total"]
