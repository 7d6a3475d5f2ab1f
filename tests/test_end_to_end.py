"""
End-to-end integration on real DFT data (the reference's 128-atom
tungsten extended-xyz test set): parse -> featurize -> fit -> predict
-> calculator and MD cross-checks.  Exercises BASELINE configs 1-2 at
test scale.
"""

import os

import numpy as np
import pytest

from uf3_tpu.data import io
from uf3_tpu.data.composition import ChemicalSystem
from uf3_tpu.forcefield.calculator import UFCalculator
from uf3_tpu.regression import least_squares as ls
from uf3_tpu.representation.basis import BSplineBasis
from uf3_tpu.representation.process import (BasisFeaturizer,
                                            analyze_hdf_tables,
                                            save_feature_db)

REF_XYZ = "/root/reference/tests/data/extended_xyz/test.xyz"

needs_data = pytest.mark.skipif(not os.path.isfile(REF_XYZ),
                                reason="reference dataset unavailable")


@needs_data
def test_full_pipeline_tungsten(tmp_path):
    # -- parse --------------------------------------------------------------
    coordinator = io.DataCoordinator()
    coordinator.dataframe_from_trajectory(REF_XYZ, prefix="dft")
    df_data = coordinator.consolidate()
    assert len(df_data) == 5
    assert df_data["size"].iloc[0] == 128

    # -- featurize into the HDF5 store (2+3-body demo settings) -------------
    chemistry = ChemicalSystem(["W"], degree=3)
    basis = BSplineBasis(
        chemistry,
        r_min_map={("W", "W"): 1.5, ("W", "W", "W"): [1.5] * 3},
        r_max_map={("W", "W"): 5.5, ("W", "W", "W"): [3.5, 3.5, 7.0]},
        resolution_map={("W", "W"): 15, ("W", "W", "W"): [6, 6, 12]})
    featurizer = BasisFeaturizer(basis)
    features_path = str(tmp_path / "features.h5")
    featurizer.batched_to_hdf(features_path, df_data, batch_size=3)
    n_tables, n_entries, _, _ = analyze_hdf_tables(features_path)
    assert n_tables == 2
    assert n_entries == 5 * (1 + 3 * 128)

    # restartability: a rerun skips existing chunks
    featurizer.batched_to_hdf(features_path, df_data, batch_size=3)
    n_tables2, n_entries2, _, _ = analyze_hdf_tables(features_path)
    assert (n_tables2, n_entries2) == (n_tables, n_entries)

    # -- fit ------------------------------------------------------------
    model = ls.WeightedLinearModel(basis, c2=1e-8, c3=1e-8)
    keys = list(df_data.index)
    model.fit_from_file(features_path, subset=keys[:4], weight=0.5)
    assert np.all(np.isfinite(model.coefficients))

    # training-set errors should be small (5 similar MD frames)
    y_e, p_e, y_f, p_f = model.batched_predict(features_path,
                                               keys=keys, score=False)
    rmse_e = np.sqrt(np.mean((y_e - p_e) ** 2)) * 1000  # meV/atom
    rmse_f = np.sqrt(np.mean((y_f - p_f) ** 2))
    assert rmse_e < 5.0, f"energy RMSE {rmse_e} meV/atom"
    assert rmse_f < 0.2, f"force RMSE {rmse_f} eV/A"

    # -- model JSON round trip ----------------------------------------------
    model_path = str(tmp_path / "model.json")
    model.to_json(model_path)
    model2 = ls.WeightedLinearModel.from_json(model_path)
    assert np.allclose(model2.coefficients, model.coefficients,
                       atol=1e-10)

    # -- calculator consistency with the fit -------------------------------
    calc = UFCalculator(model2)
    geom = df_data["geometry"].iloc[4]  # holdout frame
    energy = calc.get_potential_energy(geom)
    assert abs(energy - df_data["energy"].iloc[4]) / len(geom) < 0.01
    forces = calc.get_forces(geom)
    f_ref = np.stack([df_data[c].iloc[4] for c in ("fx", "fy", "fz")],
                     axis=1)
    assert np.sqrt(np.mean((forces - f_ref) ** 2)) < 0.25

    # -- MD runs stably with the freshly fitted model ------------------------
    import jax.numpy as jnp
    from uf3_tpu.forcefield.md import MDSystem
    system = MDSystem(model2, geom, dtype=jnp.float64, rebuild_every=5)
    state = system.init_state(temperature=300.0, seed=0)
    e0 = float(state.energy) + system.kinetic_energy(state)
    state = system.run(state, n_steps=20, dt_fs=1.0)
    e1 = float(state.energy) + system.kinetic_energy(state)
    assert abs(e1 - e0) / len(geom) < 5e-4
    # device energy/forces match the host calculator for this geometry
    assert np.isclose(float(system.init_state().energy),
                      calc.get_potential_energy(geom), atol=1e-8)
