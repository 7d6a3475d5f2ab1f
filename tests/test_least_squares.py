"""
Regression tests mirroring the reference suite
(reference tests/test_least_squares.py): synthetic linear-problem
recovery, frozen-coefficient round-trip, energy+force fitting, the
loss-function optimality property, and model JSON round-trips.
"""

import numpy as np
import pandas as pd
import pytest

from uf3_tpu.data.atoms import Atoms
from uf3_tpu.data.composition import ChemicalSystem
from uf3_tpu.regression import least_squares as ls
from uf3_tpu.representation.basis import BSplineBasis
from uf3_tpu.representation.process import BasisFeaturizer, save_feature_db


def simple_problem(n_features, n_samples, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.rand(n_samples, n_features)
    c = rng.rand(n_features)
    return x, np.dot(x, c), c


class TestBasicModel:
    def test_fit_predict_score(self):
        x, y, c = simple_problem(20, 500, seed=0)
        model = ls.BasicLinearModel(regularizer=np.eye(20) * 1e-6)
        model.fit(x, y)
        assert np.allclose(model.coefficients, c)
        assert np.allclose(model.predict(x), y)
        assert model.score(x, y) < 1e-6


def test_linear_least_squares():
    x, y, c = simple_problem(10, 30, seed=0)
    assert np.allclose(ls.linear_least_squares(x, y), c)


def test_weighted_least_squares():
    x1, y1, c1 = simple_problem(5, 10, seed=0)
    x2, y2, c2 = simple_problem(5, 20, seed=1)
    x = np.concatenate([x1, x2])
    y = np.concatenate([y1, y2])
    w1 = np.concatenate([np.ones(10), np.zeros(20)])
    assert np.allclose(ls.weighted_least_squares(x, y, w1), c1)
    w2 = np.concatenate([np.zeros(10), np.ones(20)])
    assert np.allclose(ls.weighted_least_squares(x, y, w2), c2)
    w3 = np.full(30, 0.5)
    blended = ls.weighted_least_squares(x, y, w3)
    assert not np.allclose(blended, c1) and not np.allclose(blended, c2)


def test_frozen_coefficients():
    n_dims = 5
    x1, y1, _ = simple_problem(n_dims, 10, seed=0)
    x2, y2, _ = simple_problem(n_dims, 20, seed=1)
    x = np.concatenate([x1, x2])
    y = np.concatenate([y1, y2])
    r = np.eye(n_dims) * 1e-6
    col_idx = np.array([0, 2, 4])
    frozen_c = np.array([10, 4, 0])
    mask = ls.get_freezing_mask(n_dims, col_idx)
    r = ls.freeze_regularizer(r, mask)
    x, y = ls.freeze_columns(x, y, mask, frozen_c, col_idx)
    solution = ls.weighted_least_squares(x, y, np.full(30, 0.5),
                                         regularizer=r)
    solution = ls.revert_frozen_coefficients(solution, n_dims, mask,
                                             frozen_c, col_idx)
    assert solution[0] == 10
    assert solution[2] == 4
    assert solution[4] == 0


def test_singlepoint_fit():
    config = BSplineBasis(ChemicalSystem(["Al"]))
    n_features = sum(config.partition_sizes)
    x_e, y_e, _ = simple_problem(n_features, 1, seed=0)
    x_f, y_f, _ = simple_problem(n_features, 3, seed=1)
    model = ls.WeightedLinearModel(config,
                                   regularizer=np.eye(n_features) * 1e-6)
    model.fit(x_e, y_e, x_f, y_f)
    assert np.all(np.isfinite(model.coefficients))


def test_loss_function_optimality():
    # reference tests/test_least_squares.py:123-171: fitted coefficients
    # minimize the analytic weighted loss
    config = BSplineBasis(ChemicalSystem(["Al"], degree=2),
                          leading_trim=0, trailing_trim=0)
    n_features = sum(config.partition_sizes)
    n_e, n_f = 30, 500
    x, y_true, _ = simple_problem(n_features, n_e + n_f, seed=0)
    rng = np.random.RandomState(5)
    y = y_true + rng.normal(0, 0.1, n_e + n_f)
    x_e, y_e = x[:n_e], y[:n_e]
    x_f, y_f = x[n_e:], y[n_e:]
    model = ls.WeightedLinearModel(
        config, regularizer=np.zeros((n_features, n_features)))
    kappa = 0.25
    model.fit(x_e, y_e, x_f, y_f, weight=kappa)
    e_weight = kappa / len(y_e) / np.var(y_e)
    f_weight = (1 - kappa) / len(y_f) / np.var(y_f)

    def loss(c):
        return (np.sum((y_e - x_e @ c) ** 2) * e_weight
                + np.sum((y_f - x_f @ c) ** 2) * f_weight)

    c_ref = model.coefficients
    loss_ref = loss(c_ref)
    for i in range(len(c_ref)):
        for delta in (1e-6, -1e-6):
            c = c_ref.copy()
            c[i] += delta
            assert loss(c) > loss_ref
    for _ in range(10):
        c = c_ref + rng.normal(0, 1e-6, len(c_ref))
        assert loss(c) > loss_ref


def test_fit_from_file_roundtrip(tmp_path):
    """End-to-end: featurize two tungsten configs, store to HDF5,
    fit from file, and check finite coefficients + self-prediction."""
    chemistry = ChemicalSystem(["W"])
    config = BSplineBasis(chemistry,
                          r_min_map={("W", "W"): 1.5},
                          r_max_map={("W", "W"): 5.5},
                          resolution_map={("W", "W"): 12})
    featurizer = BasisFeaturizer(config)
    rng = np.random.RandomState(0)
    rows = {}
    geoms = []
    for i in range(4):
        geom = Atoms("W2", positions=[[0, 0, 0],
                                      [2.2 + 0.3 * i, 0, 0]], pbc=False)
        geoms.append(geom)
        energy = -1.0 + 0.1 * i
        forces = rng.normal(size=(3, 2)) * 0.1
        rows.update(featurizer.evaluate_configuration(
            geom, name=f"0_{i}", energy=energy, forces=forces))
    df = pd.DataFrame.from_dict(rows, orient="index",
                                columns=featurizer.columns)
    df.index = pd.MultiIndex.from_tuples(df.index)
    filename = str(tmp_path / "features.h5")
    save_feature_db(df, filename, table_name="features_000")
    model = ls.WeightedLinearModel(config)
    model.fit_from_file(filename, subset=[f"0_{i}" for i in range(4)])
    assert np.all(np.isfinite(model.coefficients))
    y_e, p_e, y_f, p_f = model.batched_predict(filename, score=False)
    assert len(y_e) == 4
    assert len(y_f) == 4 * 6


def test_model_json_roundtrip(tmp_path):
    config = BSplineBasis(ChemicalSystem(["W"], degree=3),
                          r_min_map={("W", "W"): 1.5,
                                     ("W", "W", "W"): [1.5, 1.5, 1.5]},
                          r_max_map={("W", "W"): 5.5,
                                     ("W", "W", "W"): [3.5, 3.5, 7.0]},
                          resolution_map={("W", "W"): 15,
                                          ("W", "W", "W"): [6, 6, 12]})
    model = ls.WeightedLinearModel(config)
    rng = np.random.RandomState(1)
    coefficients = rng.randn(config.n_feats)
    # apply trims so the round-trip through the symmetrized full grid
    # is exact for frozen entries
    coefficients[config.col_idx] = 0.0
    model.coefficients = coefficients
    path = str(tmp_path / "model.json")
    model.to_json(path)
    model2 = ls.WeightedLinearModel.from_json(path)
    assert np.allclose(model2.coefficients, model.coefficients)
    assert model2.bspline_config.symmetry[("W", "W", "W")] == \
        config.symmetry[("W", "W", "W")]


def test_variance_recorder():
    rng = np.random.RandomState(2)
    data = rng.randn(1000)
    recorder = ls.VarianceRecorder()
    for chunk in np.array_split(data, 7):
        recorder.update(chunk)
    assert np.isclose(recorder.mean, np.mean(data))
    assert np.isclose(recorder.std, np.std(data))
    assert recorder.n == 1000


def test_postprocess_coefficients_2b():
    coefficients = np.array([0.0, 0.0, 1.0, 0.5, -1.0, -0.5, 0.0, 0.0])
    out = ls.postprocess_coefficients_2b(coefficients, min_core=2.0,
                                         smooth_cutoff=True)
    assert out[0] >= 2.0
    assert np.all(out[-2:] == 0)
    # monotonically decreasing repulsive core up to the peak
    assert np.all(np.diff(out[:3]) <= 0)
