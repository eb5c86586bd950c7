"""Seeded mini-fuzz of streamed==offline equivalence (bounded cost).

The full sweep lives in scripts/fuzz_streaming.py; this keeps a small
deterministic slice in the suite so geometry/dtype regressions (like the
bf16 stock-DPARN dtype bugs or the wide-kernel scratch-shape bug, both of
which hid behind fixed-geometry tests) are caught at PR time.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_streaming_slice(trial):
    import fuzz_streaming as fz
    import numpy as np

    from puresound_tpu.nnet.dparn import DPARN
    from puresound_tpu.nnet.dpcrn import DPCRN

    rng = np.random.default_rng(1000 + trial)
    fams = [lambda r, h: fz._run_dual_path(r, DPCRN, h),
            lambda r, h: fz._run_dual_path(r, DPARN, h),
            lambda r, h: fz._run_skim_tse(r, h)]
    fams[trial % len(fams)](rng, bool(trial % 2))
