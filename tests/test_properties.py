"""
Physics validation of the property modules on the reference demo
2+3-body tungsten potential: elastic constants and phonons must stay
in the physically sensible range (experimental W: C11 522, C12 204,
C44 161, B ~310 GPa; max phonon ~6.5 THz) and the crystal must be
dynamically stable (no imaginary modes).
"""

import os

import numpy as np
import pytest

from uf3_tpu.data.atoms import bulk
from uf3_tpu.forcefield.calculator import UFCalculator
from uf3_tpu.regression import least_squares as ls


@pytest.fixture(scope="module")
def w_calc():
    model = ls.WeightedLinearModel.from_json(
        os.path.join("benchmarks_data", "model_2and3.json"))
    return UFCalculator(model)


def test_elastic_constants_bcc_w(w_calc):
    from uf3_tpu.forcefield.properties.elastic import \
        get_elastic_constants
    geom = bulk("W", "bcc", a=3.1652) * 3
    res = get_elastic_constants(geom, w_calc)
    # golden values from this model (regression); physical window
    assert 450 < res["C11"] < 620
    assert 120 < res["C12"] < 260
    assert 80 < res["C44"] < 220
    assert 250 < res["bulk_modulus"] < 360
    # cubic symmetry of the tensor itself
    C = np.asarray(res["elastic_tensor"])
    assert np.allclose(C, C.T, atol=5.0)
    assert np.allclose([C[0, 0], C[1, 1], C[2, 2]], res["C11"],
                       atol=10.0)


def test_phonons_bcc_w(w_calc):
    from uf3_tpu.forcefield.properties.phonon import compute_phonon_data
    ph = compute_phonon_data(bulk("W", "bcc", a=3.1652), w_calc,
                             n_super=3, n_points=8)
    f = np.asarray(ph["frequencies"])
    assert 5.0 < f.max() < 7.5          # expt ~6.5 THz
    assert f.min() > -0.05              # dynamically stable
    # acoustic branches vanish at Gamma (first q-point of the path)
    assert np.all(np.sort(np.abs(f[0]))[:3] < 0.05)
