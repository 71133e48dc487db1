"""On-chip row-cost ablation for the wide fused wrap-DP kernel.

Measures GCUPS (chained slope method, bench._gcups_one) at three
build levels of ops/wrap_dp_fused2w.py — full kernel, aux bases
without propagation scans, values-only core — to locate where row
time goes.  Outputs are INVALID at the ablated levels; this is a
measurement harness only.  Usage: python scripts/ablate_f2w.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _gcups_one  # noqa: E402
from mtr_tpu.ops.wrap_dp_fused2w import make_wrap_dp_fused2w  # noqa: E402


def main():
    b, u_span, unit_len, r_pad = 1024, 256, 200, 32768
    r1, r2 = 8192, 24576
    out = {}
    for ablate in ("", "bases", "values"):
        fn = make_wrap_dp_fused2w(b, r_pad, u_span, ablate=ablate)
        g = _gcups_one(fn, b, u_span, unit_len, r_pad, r1, r2, chain=8)
        out[ablate or "full"] = round(g, 2) if g else None
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
