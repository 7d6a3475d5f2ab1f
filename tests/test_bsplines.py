"""
Knot, B-spline-basis, and regularizer tests.  Golden values mirror
the reference suite (reference tests/test_bsplines.py); the two full
regularizer matrices live in tests/data/golden_regularizers.json.
"""

import json
import os

import numpy as np
import pytest
from scipy import interpolate

from uf3_tpu.data.composition import ChemicalSystem
from uf3_tpu.representation import knots as kn
from uf3_tpu.representation import splines as sp
from uf3_tpu.representation.basis import (BSplineBasis, find_symmetry_3B,
                                          get_symmetry_weights)


class TestFindSymmetry3B:
    CASES = [
        # (trio kind, r_min, r_max, resolution, expected per trio kind)
        (dict(r_min=[.1, .1, .1], r_max=[8., 8., 8.], resolution=[10] * 3),
         {"unary": 3, "sym": 2, "unsym": 1}),
        (dict(r_min=[.1, .1, .1], r_max=[5., 5., 10.], resolution=[6] * 3),
         {"unary": 2, "sym": 2, "unsym": 1}),
        (dict(r_min=[.1, .1, .1], r_max=[5., 10., 5.], resolution=[6] * 3),
         {"unary": 1, "sym": 1, "unsym": 1}),
        (dict(r_min=[.1, .1, .1], r_max=[10., 5., 5.], resolution=[6] * 3),
         {"unary": 1, "sym": 1, "unsym": 1}),
        (dict(r_min=[.1, .1, .2], r_max=[8.] * 3, resolution=[6] * 3),
         {"unary": 2, "sym": 2, "unsym": 1}),
        (dict(r_min=[.2, .1, .1], r_max=[8.] * 3, resolution=[6] * 3),
         {"unary": 1, "sym": 1, "unsym": 1}),
        (dict(r_min=[.1, .2, .1], r_max=[8.] * 3, resolution=[6] * 3),
         {"unary": 1, "sym": 1, "unsym": 1}),
        (dict(r_min=[.1] * 3, r_max=[8.] * 3, resolution=[6, 6, 12]),
         {"unary": 2, "sym": 2, "unsym": 1}),
        (dict(r_min=[.1] * 3, r_max=[8.] * 3, resolution=[12, 6, 6]),
         {"unary": 1, "sym": 1, "unsym": 1}),
        (dict(r_min=[.1] * 3, r_max=[8.] * 3, resolution=[6, 12, 6]),
         {"unary": 1, "sym": 1, "unsym": 1}),
        (dict(r_min=[.1] * 3, r_max=[4., 5., 10.], resolution=[6] * 3),
         {"unary": 1, "sym": 1, "unsym": 1}),
        (dict(r_min=[.1, .2, .3], r_max=[8.] * 3, resolution=[6] * 3),
         {"unary": 1, "sym": 1, "unsym": 1}),
        (dict(r_min=[.1] * 3, r_max=[8.] * 3, resolution=[4, 6, 12]),
         {"unary": 1, "sym": 1, "unsym": 1}),
        (dict(r_min=[.1, .1, .2], r_max=[5., 10., 5.],
              resolution=[10, 20, 20]),
         {"unary": 1, "sym": 1, "unsym": 1}),
    ]
    TRIOS = {"unary": ("Si", "Si", "Si"),
             "sym": ("Si", "N", "N"),
             "unsym": ("Si", "Si", "N")}

    @pytest.mark.parametrize("case", CASES)
    def test_symmetry_cases(self, case):
        config, expected = case
        for kind, trio in self.TRIOS.items():
            assert find_symmetry_3B(trio, **config) == expected[kind]


class TestKnots:
    def test_sequence_from_points(self):
        assert np.allclose(kn.knot_sequence_from_points([1, 2, 3]),
                           [1, 1, 1, 1, 2, 3, 3, 3, 3])

    def test_subintervals(self):
        seq = kn.knot_sequence_from_points([1, 2, 3])
        subs = kn.get_knot_subintervals(seq)
        assert np.allclose(subs[0], [1, 1, 1, 1, 2])
        assert np.allclose(subs[2], [1, 1, 2, 3, 3])
        assert np.allclose(subs[4], [2, 3, 3, 3, 3])

    def test_uniform(self):
        points = kn.generate_uniform_knots(1, 6, 5, sequence=False)
        seq = kn.generate_uniform_knots(1, 6, 5, sequence=True)
        assert np.allclose(points, [1, 2, 3, 4, 5, 6])
        assert np.allclose(seq, [1, 1, 1, 1, 2, 3, 4, 5, 6, 6, 6, 6])

    def test_lammps(self):
        points = np.round(kn.generate_lammps_knots(0, 1, 2), 4)
        assert np.allclose(points, [0, 0, 0, 0, 0.7071, 1, 1, 1, 1])


class TestDeBoor:
    def test_unit_interval_values(self):
        # reference test_bsplines.py:529-547
        points = np.array([1e-10, 0.5, 1 - 1e-10])
        seq = kn.knot_sequence_from_points([0, 1])
        sums = sp.evaluate_basis_sums(points, seq)
        assert np.allclose(sums, [1.125, 0.375, 0.375, 1.125])
        values, idx = sp.deboor_values(points, seq)
        dense = np.zeros((3, 4))
        for tap in range(4):
            dense[np.arange(3), idx + tap] += values[:, tap]
        assert np.allclose(dense[:, 0], [1, 0.125, 0])
        assert np.allclose(dense[:, 1], [0, 0.375, 0])
        assert np.allclose(dense[:, 2], [0, 0.375, 0])
        assert np.allclose(dense[:, 3], [0, 0.125, 1])

    @pytest.mark.parametrize("strategy,args", [
        ("linear", (1.0, 6.0, 7)),
        ("lammps", (0.5, 4.0, 5)),
        ("geometric", (0.8, 6.0, 6)),
        ("inverse", (0.9, 5.0, 8)),
    ])
    @pytest.mark.parametrize("nu", [0, 1, 2])
    def test_matches_scipy(self, strategy, args, nu):
        seq = kn.get_knot_spacer(strategy)(*args)
        n_splines = len(seq) - 4
        basis = [interpolate.BSpline.basis_element(seq[i:i + 5],
                                                   extrapolate=False)
                 for i in range(n_splines)]
        rng = np.random.RandomState(3)
        pts = rng.uniform(seq[0] + 1e-9, seq[-1] - 1e-9, 500)
        pts = np.concatenate([pts, seq[4:-4]])  # include interior knots
        values, idx = sp.deboor_values(pts, seq, nu=nu)
        dense = np.zeros((len(pts), n_splines))
        rows = np.arange(len(pts))
        for tap in range(4):
            dense[rows, idx + tap] += values[:, tap]
        ref = np.zeros_like(dense)
        for i, b in enumerate(basis):
            v = b(pts, nu=nu)
            v[np.isnan(v)] = 0
            ref[:, i] = v
        assert np.allclose(dense, ref, atol=1e-9)

    def test_partition_of_unity(self):
        seq = kn.generate_uniform_knots(1.0, 5.5, 15)
        pts = np.linspace(1.0, 5.5 - 1e-12, 777)
        values, _ = sp.deboor_values(pts, seq)
        assert np.allclose(values.sum(axis=1), 1.0)
        derivs, _ = sp.deboor_values(pts, seq, nu=1)
        assert np.allclose(derivs.sum(axis=1), 0.0, atol=1e-10)

    def test_force_feature_invariants(self):
        # reference test_bsplines.py:550-571: three-atom triangle
        distances = np.array([3., 4, 3, 5, 4, 5])
        drij_dR = np.array([[[-1., -0., -1., -0., 0., 0.],
                             [-0., -1., 0., 0., -1., -0.],
                             [-0., -0., 0., 0., 0., 0.]],
                            [[1., 0., 1., 0.6, 0., 0.6],
                             [0., 0., -0., -0.8, -0., -0.8],
                             [0., 0., -0., -0., 0., 0.]],
                            [[0., 0., -0., -0.6, -0., -0.6],
                             [0., 1., 0., 0.8, 1., 0.8],
                             [0., 0., 0., 0., -0., -0.]]])
        seq = kn.knot_sequence_from_points([2, 6])
        x = sp.featurize_force_2b(distances, drij_dR, seq)
        assert x.shape == (3, 3, 4)
        assert np.ptp(x[:, 2, :]) == 0
        assert np.ptp(np.sum(x, axis=0)) < 1e-10
        assert np.any(np.ptp(x, axis=0) > 0)
        assert np.ptp(np.sum(x, axis=2)) < 1e-10
        assert np.any(np.ptp(x, axis=2) > 0)

    def test_evaluate_spline_matches_scipy(self):
        seq = kn.generate_uniform_knots(1.0, 6.0, 10)
        rng = np.random.RandomState(7)
        coeff = rng.randn(len(seq) - 4)
        curve = interpolate.BSpline(seq, coeff, 3, extrapolate=False)
        pts = rng.uniform(1.0 + 1e-9, 6.0 - 1e-9, 300)
        for nu in (0, 1, 2):
            ours = sp.evaluate_spline(pts, seq, coeff, nu=nu)
            assert np.allclose(ours, curve(pts, nu=nu), atol=1e-10)

    def test_fit_spline_1d(self):
        # reference test_bsplines.py:512-526
        x = np.linspace(-1, 7, 1000)
        y = np.sin(x) + 0.5 * x
        seq = kn.generate_lammps_knots(0, 6, 5)
        coeff = sp.fit_spline_1d(x, y, seq)
        assert np.allclose(np.round(coeff, 2),
                           [-0.06, 1.59, 2.37, 1.16, 1.23, 1.77, 2.43, 2.71])
        mask = (x > 0) & (x < 6)
        yp = sp.evaluate_spline(x[mask], seq, coeff)
        rmse = np.sqrt(np.mean((y[mask] - yp) ** 2))
        assert rmse < 0.017


class TestBSplineBasisConfig:
    def test_partition_sizes_default(self):
        basis = BSplineBasis(ChemicalSystem(["Ne", "Xe"]))
        assert np.allclose(basis.get_feature_partition_sizes(),
                           [1, 1, 18, 18, 18])

    def test_custom_knots(self):
        chemistry = ChemicalSystem(["Au", "Ag"])
        knots_map = {("Ag", "Au"): [1, 1, 1, 1, 1.1, 1.1, 1.1, 1.1]}
        basis = BSplineBasis(chemistry, knots_map=knots_map)
        assert basis.r_min_map[("Ag", "Au")] == 1.0
        assert basis.r_max_map[("Ag", "Au")] == 1.1
        assert basis.resolution_map[("Ag", "Au")] == 1
        assert basis.r_min_map[("Au", "Au")] == 1.0
        assert basis.r_max_map[("Au", "Au")] == 8.0
        assert basis.resolution_map[("Au", "Au")] == 15

    def test_unary_override(self):
        basis = BSplineBasis(ChemicalSystem(["Au"]),
                             r_min_map={("Au", "Au"): 1.1})
        assert basis.r_min_map[("Au", "Au")] == 1.1
        assert basis.r_max_map[("Au", "Au")] == 8.0

    def test_binary_resolution_override(self):
        basis = BSplineBasis(ChemicalSystem(["Ne", "Xe"]),
                             resolution_map={("Ne", "Xe"): 10})
        assert basis.r_min_map[("Ne", "Ne")] == 1.0
        assert basis.r_max_map[("Xe", "Xe")] == 8.0
        assert basis.resolution_map[("Ne", "Xe")] == 10

    def test_r_cut_from_trio_center_legs(self):
        chemistry = ChemicalSystem(["Au"], degree=3)
        basis = BSplineBasis(
            chemistry,
            r_max_map={("Au", "Au"): 5.0,
                       ("Au", "Au", "Au"): [5.1, 5.2, 10.3]})
        assert basis.r_cut == 5.2

    def test_regularizer_degree_2_golden(self, data_dir):
        chemistry = ChemicalSystem(["Ne", "Xe"], degree=2)
        basis = BSplineBasis(chemistry,
                             resolution_map={("Ne", "Xe"): 2,
                                             ("Ne", "Ne"): 3,
                                             ("Xe", "Xe"): 4})
        matrix = basis.get_regularization_matrix({1: 4, 2: 0.25}, {2: 1})
        golden = json.load(open(os.path.join(data_dir,
                                             "golden_regularizers.json")))
        assert np.allclose(matrix, golden["regularizer_degree2"])

    def test_regularizer_degree_3_golden(self, data_dir):
        chemistry = ChemicalSystem(["Ne"], degree=3)
        knots_map = {
            ("Ne", "Ne"): np.array([0, 0, 0, 0, 3, 6, 6, 6, 6]),
            ("Ne", "Ne", "Ne"): [
                np.array([0, 0, 0, 0, 1, 2, 3, 3, 3, 3]),
                np.array([0, 0, 0, 0, 1, 2, 3, 3, 3, 3]),
                np.array([0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 6, 6, 6])]}
        basis = BSplineBasis(chemistry, knots_map=knots_map,
                             leading_trim=0, trailing_trim=3)
        assert basis.symmetry[("Ne", "Ne", "Ne")] == 2
        assert np.all(basis.template_mask[("Ne", "Ne", "Ne")] == np.array(
            [0, 1, 2, 3, 4, 9, 10, 11, 12, 13, 14, 18, 19, 20, 21, 22, 23,
             63, 64, 65, 66, 67, 68, 72, 73, 74, 75, 76, 77,
             126, 127, 128, 129, 130, 131]))
        matrix = basis.get_regularization_matrix(r1=4, r2=9, r3=25,
                                                 c2=16, c3=1)
        golden = json.load(open(os.path.join(data_dir,
                                             "golden_regularizers.json")))
        ref = np.array(golden["regularizer_degree3"])
        assert matrix.shape == ref.shape
        assert np.all(matrix == ref)

    def test_column_names(self):
        basis = BSplineBasis(ChemicalSystem(["W"]),
                             resolution_map={("W", "W"): 5})
        names = basis.get_column_names()
        assert names[:2] == ["y", "n_W"]
        assert names[2] == "WW0"
        assert len(names) == 2 + 8
