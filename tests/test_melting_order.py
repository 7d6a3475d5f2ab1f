"""The melting protocol's phase diagnostic: the x-binned Bragg
amplitude must separate a thermally-rattled bcc solid from a uniform
liquid by a wide margin at the 0.25 classification threshold."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

from melting_run import A0, order_profile, solid_fraction  # noqa: E402


@pytest.mark.smoke
def test_order_profile_separates_phases():
    rng = np.random.RandomState(0)
    reps = (12, 6, 6)
    cell = np.diag([reps[i] * A0 for i in range(3)])
    basis = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    pts = []
    for i in range(reps[0] // 2):
        for j in range(reps[1]):
            for k in range(reps[2]):
                for b in basis:
                    pts.append((np.array([i, j, k]) + b) * A0)
    # 0.08 A rms rattle ~ tungsten near its melting point
    solid = np.array(pts) + rng.normal(scale=0.08,
                                       size=(len(pts), 3))
    liq = rng.uniform(size=(len(pts), 3)) @ np.diag(
        [cell[0, 0] / 2, cell[1, 1], cell[2, 2]])
    liq[:, 0] += cell[0, 0] / 2
    pos = np.vstack([solid, liq])
    prof = order_profile(pos, cell, n_bins=24)
    left, right = prof[:12], prof[12:]
    # solid bins far above the threshold; liquid bins at the
    # 1/sqrt(n_bin) noise floor.  This synthetic box has only 72
    # atoms/bin (floor 0.12, occasional bins to ~0.3); the production
    # runs use ~650 atoms/bin (floor 0.04), so the 0.25 threshold has
    # a wide margin there
    assert left.min() > 0.6
    assert right.mean() < 0.18
    assert 0.35 <= solid_fraction(prof) <= 0.65
    # invariant under isotropic cell rescaling (the NPT barostat)
    prof2 = order_profile(pos * 1.03, cell * 1.03, n_bins=24)
    assert np.allclose(prof2, prof, atol=1e-12)
