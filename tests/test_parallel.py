"""
Device-mesh tests on the virtual 8-device CPU mesh: sharded Gram
accumulation matches the host result and mesh-parallel fitting matches
single-process fitting.
"""

import jax
import numpy as np
import pytest

from uf3_tpu.data.composition import ChemicalSystem
from uf3_tpu.parallel import mesh as pmesh
from uf3_tpu.regression import least_squares as ls
from uf3_tpu.representation.basis import BSplineBasis


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.make_mesh(8)


def test_sharded_gram_matches_host(mesh8):
    rng = np.random.RandomState(0)
    x = rng.rand(103, 17)  # deliberately not divisible by 8
    y = rng.rand(103)
    gram, ordinate = pmesh.sharded_gram(x, y, mesh8)
    assert np.allclose(np.asarray(gram), x.T @ x)
    assert np.allclose(np.asarray(ordinate), x.T @ y)


def test_fit_sharded_matches_host(mesh8):
    config = BSplineBasis(ChemicalSystem(["Al"]))
    n_features = sum(config.partition_sizes)
    rng = np.random.RandomState(1)
    x_e = rng.rand(40, n_features)
    y_e = rng.rand(40)
    x_f = rng.rand(200, n_features)
    y_f = rng.rand(200)
    host = ls.WeightedLinearModel(config)
    host.fit(x_e, y_e, x_f, y_f)
    sharded = ls.WeightedLinearModel(config)
    pmesh.fit_sharded(sharded, x_e, y_e, x_f, y_f, mesh=mesh8)
    assert np.allclose(sharded.coefficients, host.coefficients,
                       atol=1e-8)
