"""
Device-featurizer tests: exact agreement with the host (oracle)
featurizer for small-cell (multi-image) and larger periodic tungsten
configurations, and an end-to-end device-featurized fit matching the
host-featurized fit.
"""

import numpy as np
import pytest

from uf3_tpu.data.atoms import bulk
from uf3_tpu.data.composition import ChemicalSystem
from uf3_tpu.ops import featurize_jax as fj
from uf3_tpu.regression import least_squares as ls
from uf3_tpu.representation.basis import BSplineBasis
from uf3_tpu.representation.process import BasisFeaturizer


@pytest.fixture(scope="module")
def tungsten_basis():
    chem = ChemicalSystem(["W"], degree=3)
    return BSplineBasis(
        chem,
        r_min_map={("W", "W"): 1.5, ("W", "W", "W"): [1.5] * 3},
        r_max_map={("W", "W"): 5.5, ("W", "W", "W"): [3.5, 3.5, 7.0]},
        resolution_map={("W", "W"): 15, ("W", "W", "W"): [6, 6, 12]})


@pytest.mark.parametrize("reps,seed", [(2, 0), (3, 7)])
def test_device_matches_host_featurizer(tungsten_basis, reps, seed):
    featurizer = BasisFeaturizer(tungsten_basis)
    spec = fj.build_featurize_spec(tungsten_basis)
    assert spec is not None
    geom = bulk("W", "bcc", a=3.1652) * reps
    geom.rattle(0.05, seed=seed)
    n_atoms = len(geom)
    ref = featurizer.evaluate_configuration(
        geom, energy=0.0, forces=np.zeros((3, n_atoms)))
    e_ref = np.array(ref["energy"])[1:]
    f_ref = np.stack([[np.array(ref[f"f{c}_{a}"])[1:] for c in "xyz"]
                      for a in range(n_atoms)])
    e_dev, f_dev = fj.featurize_configuration_device(
        tungsten_basis, geom, spec)
    assert np.allclose(e_dev, e_ref, atol=1e-9)
    assert np.allclose(f_dev, f_ref, atol=1e-9)


def test_device_fit_matches_host_fit(tungsten_basis):
    rng = np.random.RandomState(0)
    geometries = []
    energies = []
    forces = []
    for i in range(3):
        geom = bulk("W", "bcc", a=3.1652) * 2
        geom.rattle(0.04, seed=i)
        geometries.append(geom)
        energies.append(-8.9 * len(geom) + rng.rand())
        forces.append(rng.normal(scale=0.2, size=(len(geom), 3)))
    # host path
    featurizer = BasisFeaturizer(tungsten_basis)
    import pandas as pd
    rows = {}
    for i, (geom, energy, force) in enumerate(
            zip(geometries, energies, forces)):
        rows.update(featurizer.evaluate_configuration(
            geom, name=f"c_{i}", energy=energy, forces=force.T))
    df = pd.DataFrame.from_dict(rows, orient="index",
                                columns=featurizer.columns)
    df.index = pd.MultiIndex.from_tuples(df.index)
    x_e, y_e, x_f, y_f = ls.dataframe_to_tuples(df, n_elements=1)
    host_model = ls.WeightedLinearModel(tungsten_basis, r2=1e-6,
                                        c2=1e-6, r3=1e-6, c3=1e-6)
    host_model.fit(x_e, y_e, x_f, y_f)
    # device path
    xd_e, yd_e, xd_f, yd_f = fj.featurize_dataset_device(
        tungsten_basis, geometries, energies, forces)
    assert np.allclose(xd_e, x_e, atol=1e-9)
    assert np.allclose(yd_e, y_e)
    assert np.allclose(xd_f, x_f, atol=1e-9)
    assert np.allclose(yd_f, y_f)
    device_model = ls.WeightedLinearModel(tungsten_basis, r2=1e-6,
                                          c2=1e-6, r3=1e-6, c3=1e-6)
    device_model.fit(xd_e, yd_e, xd_f, yd_f)
    # the tiny problem is ill-conditioned (kappa ~ 1e12), so raw
    # coefficients amplify 1e-13 feature noise; predictions are the
    # well-conditioned comparison
    assert np.allclose(device_model.predict(x_e),
                       host_model.predict(x_e), atol=1e-8)
    assert np.allclose(device_model.predict(x_f),
                       host_model.predict(x_f), atol=1e-8)


@pytest.fixture(scope="module")
def binary_basis():
    """Ne-Xe binary with deliberately ASYMMETRIC per-interaction
    ranges/resolutions so any leg/species mix-up breaks exactness."""
    chem = ChemicalSystem(["Ne", "Xe"], degree=3)
    r_min = {pair: 1.5 for pair in chem.interactions_map[2]}
    r_min.update({trio: [1.5] * 3 for trio in chem.interactions_map[3]})
    r_max = {("Ne", "Ne"): 4.5, ("Ne", "Xe"): 5.0, ("Xe", "Xe"): 5.5}
    res = {("Ne", "Ne"): 12, ("Ne", "Xe"): 14, ("Xe", "Xe"): 15}
    for trio in chem.interactions_map[3]:
        pairs = [tuple(sorted((trio[0], trio[1]),
                              key=["Ne", "Xe"].index)),
                 tuple(sorted((trio[0], trio[2]),
                              key=["Ne", "Xe"].index)),
                 tuple(sorted((trio[1], trio[2]),
                              key=["Ne", "Xe"].index))]
        r_max[trio] = [min(3.5, r_max[p]) for p in pairs[:2]] \
            + [min(7.0, 2 * 3.5)]
        res[trio] = [5, 6, 12]
    return BSplineBasis(chem, r_min_map=r_min, r_max_map=r_max,
                        resolution_map=res)


def _mixed_crystal(seed):
    from uf3_tpu.data.atoms import Atoms
    base = bulk("Ne", "fcc", a=5.2) * 2
    numbers = np.asarray(base.get_atomic_numbers()).copy()
    rng = np.random.RandomState(seed)
    xe = rng.choice(len(numbers), size=len(numbers) // 2,
                    replace=False)
    numbers[xe] = 54
    geom = Atoms(numbers=numbers, positions=base.get_positions(),
                 cell=base.get_cell(), pbc=True)
    geom.rattle(0.08, seed=seed)
    return geom


@pytest.mark.parametrize("seed", [0, 5])
def test_multi_device_matches_host_featurizer(binary_basis, seed):
    featurizer = BasisFeaturizer(binary_basis)
    mspec = fj.build_featurize_spec_multi(binary_basis)
    assert mspec is not None
    geom = _mixed_crystal(seed)
    n_atoms = len(geom)
    ref = featurizer.evaluate_configuration(
        geom, energy=0.0, forces=np.zeros((3, n_atoms)))
    e_ref = np.array(ref["energy"])[1:]
    f_ref = np.stack([[np.array(ref[f"f{c}_{a}"])[1:] for c in "xyz"]
                      for a in range(n_atoms)])
    e_dev, f_dev = fj.featurize_configuration_device_multi(
        binary_basis, geom, mspec)
    assert e_dev.shape == e_ref.shape
    assert np.allclose(e_dev, e_ref, atol=1e-9)
    assert np.allclose(f_dev, f_ref, atol=1e-9)
