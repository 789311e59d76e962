"""Exact-parity guard for the packed replay layout.

tests/golden/packing_golden.npz was captured from the pre-packing
revision (separate [E, L+1] field arrays, 5-scatter write-backs,
tools/gen_packing_golden.py at commit e91fef8). These tests re-run the
identical training scenarios on the current (packed) code and assert the
trajectories match — the packing is a pure layout change, so params,
ReF-ER beta, far-policy counts and replay contents must all agree to
float tolerance. Measured residual: reductions over strided slices of
the packed record reassociate (state-stats init), giving ~1-ulp param
drift that amplifies to ~1e-3 in replay-content sums over ~100 steps;
a genuine layout bug (wrong channel, lost write) shifts these sums by
O(1). Tolerance 1e-3 rel / 5e-3 abs separates the two regimes.

Covers every write-back flavor: fused V-RACER, interleaved DQN, ACER's
windowed write-back, PPO's on-policy horizon + clear_all, LSTM BPTT
windows, and Gaussian-advantage RACER. Reference semantics under guard:
MiniBatch::setMseDklImpw + setValues (MiniBatch.h:161-221).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from gen_packing_golden import OUT, SCENARIOS, capture  # noqa: E402

GOLD = np.load(OUT) if os.path.exists(OUT) else None


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_packing_parity(name):
    assert GOLD is not None, "golden file missing; run tools/gen_packing_golden.py"
    tr = SCENARIOS[name]()
    got = capture(tr)
    for k, v in got.items():
        want = GOLD[f"{name}/{k}"]
        np.testing.assert_allclose(
            np.asarray(v), want, rtol=1e-3, atol=5e-3,
            err_msg=f"{name}/{k} diverged from the pre-packing golden")
