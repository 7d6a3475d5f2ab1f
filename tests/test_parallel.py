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


def test_sharded_md_matches_single_device(mesh8):
    """The mesh-sharded NVE chunk must reproduce the single-device
    trajectory exactly (f64, deterministic NVE)."""
    import os
    import jax.numpy as jnp
    from uf3_tpu.data.atoms import bulk
    from uf3_tpu.forcefield import units
    from uf3_tpu.forcefield.md import MDSystem

    model = ls.WeightedLinearModel.from_json(
        os.path.join("benchmarks_data", "model_2and3.json"))
    geom = bulk("W", "bcc", a=3.1652) * 4   # 128 atoms = 16 per shard
    geom.rattle(0.03, seed=6)
    system = MDSystem(model, geom, dtype=jnp.float64,
                      capacity_2b=64, capacity_3b=16)
    state = system.init_state(temperature=120.0, seed=1)
    dt = jnp.asarray(1.0 * units.fs, dtype=jnp.float64)
    n_steps = 5
    # single-device reference: identical inner math
    m = system.masses[:, None]
    x, v, f = state.positions, state.velocities, state.forces
    for _ in range(n_steps):
        v = v + 0.5 * dt * f / m
        x = x + dt * v
        _, f, _ = system.energy_forces(x, state.nbr2, state.nbr3,
                                       with_energy=False)
        v = v + 0.5 * dt * f / m
    e_ref, f_ref, _ = system.energy_forces(x, state.nbr2, state.nbr3)
    # sharded chunk
    chunk, shard_atoms = pmesh.sharded_md_step_factory(
        system, mesh8, n_steps=n_steps)
    nbr2 = shard_atoms(state.nbr2)
    nbr3 = shard_atoms(state.nbr3)
    xs, vs, fs, es = chunk(state.positions, state.velocities,
                           state.forces, nbr2, nbr3, dt)
    assert np.allclose(np.asarray(xs), np.asarray(x), atol=1e-12)
    assert np.allclose(np.asarray(vs), np.asarray(v), atol=1e-12)
    assert np.allclose(np.asarray(fs), np.asarray(f_ref), atol=1e-10)
    assert np.isclose(float(es), float(e_ref), atol=1e-10)


def test_fit_from_file_sharded_matches_host(mesh8, tmp_path):
    """Streaming HDF5 mesh fit (sharded Gram + streaming variance +
    sample weights) must reproduce the host fit_from_file exactly."""
    import pandas as pd

    from uf3_tpu.data.atoms import Atoms
    from uf3_tpu.representation.process import (BasisFeaturizer,
                                                save_feature_db)

    chemistry = ChemicalSystem(["W"])
    config = BSplineBasis(chemistry,
                          r_min_map={("W", "W"): 1.5},
                          r_max_map={("W", "W"): 5.5},
                          resolution_map={("W", "W"): 12})
    featurizer = BasisFeaturizer(config)
    rng = np.random.RandomState(2)
    rows = {}
    for i in range(6):
        geom = Atoms("W2", positions=[[0, 0, 0],
                                      [2.2 + 0.2 * i, 0, 0]],
                     pbc=False)
        rows.update(featurizer.evaluate_configuration(
            geom, name=f"0_{i}", energy=-1.0 + 0.1 * i,
            forces=rng.normal(size=(3, 2)) * 0.1))
    df = pd.DataFrame.from_dict(rows, orient="index",
                                columns=featurizer.columns)
    df.index = pd.MultiIndex.from_tuples(df.index)
    filename = str(tmp_path / "features.h5")
    # two chunks exercises the streaming accumulation
    save_feature_db(df.iloc[:df.shape[0] // 2], filename,
                    table_name="features_000")
    save_feature_db(df.iloc[df.shape[0] // 2:], filename,
                    table_name="features_001")
    subset = [f"0_{i}" for i in range(6)]
    weights = {f"0_{i}": 1.0 + 0.2 * i for i in range(6)}
    # the tiny dimer problem is rank-deficient, so raw coefficients
    # amplify summation-order fp noise; regularize and compare
    # predictions (the well-conditioned observable)
    host = ls.WeightedLinearModel(config, r2=1e-6, c2=1e-6)
    host.fit_from_file(filename, subset=subset, weight=0.3,
                       sample_weights=weights)
    sharded = ls.WeightedLinearModel(config, r2=1e-6, c2=1e-6)
    pmesh.fit_from_file_sharded(sharded, filename, subset=subset,
                                weight=0.3, mesh=mesh8,
                                sample_weights=weights)
    probe = df.to_numpy()[:, 1:]
    assert np.allclose(probe @ sharded.coefficients,
                       probe @ host.coefficients, atol=1e-8)
    # dropping the sample weights must change the solution (i.e. the
    # weights actually flowed through the sharded path)
    unweighted = ls.WeightedLinearModel(config, r2=1e-6, c2=1e-6)
    pmesh.fit_from_file_sharded(unweighted, filename, subset=subset,
                                weight=0.3, mesh=mesh8)
    assert not np.allclose(probe @ unweighted.coefficients,
                           probe @ host.coefficients, atol=1e-8)
