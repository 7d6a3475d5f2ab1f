"""
Calculator tests: golden end-to-end energies/forces against the
precalculated reference model files (tests/data/model_unary.json,
model_binary.json; reference tests/test_calculator.py).
"""

import os

import numpy as np
import pytest

from uf3_tpu.data.atoms import Atoms
from uf3_tpu.data.composition import ChemicalSystem
from uf3_tpu.forcefield.calculator import UFCalculator
from uf3_tpu.regression import least_squares as ls
from uf3_tpu.representation import splines as sp
from uf3_tpu.representation.basis import BSplineBasis


class TestCalculator:
    def test_unary_dimer_lj_fit(self):
        # reference tests/test_calculator.py:12-50
        config = BSplineBasis(ChemicalSystem(["W"]),
                              r_min_map={("W", "W"): 2.0},
                              r_max_map={("W", "W"): 6.0},
                              resolution_map={("W", "W"): 20},
                              knot_strategy="lammps")
        model = ls.WeightedLinearModel(bspline_config=config)
        pair = config.interactions_map[2][0]
        x = np.linspace(2.0, 6.0, 1000)
        y = 4 * 0.87 * ((2.5 / x) ** 12 - (2.5 / x) ** 6)
        coeff = sp.fit_spline_1d(x, y, config.knots_map[pair])
        model.coefficients = np.insert(coeff, 0, 0)
        calc = UFCalculator(model)
        assert len(calc.solutions) == 2
        assert len(calc.pair_potentials) == 1
        geom = Atoms("W2", positions=[[0, 0, 0], [1.5, 1.5, 1.5]],
                     pbc=False)
        energy = calc.get_potential_energy(geom)
        assert np.isclose(energy, -1.21578)
        geom.calc = calc
        forces = geom.get_forces()
        assert np.allclose(forces,
                           [[-3.96244881, -3.96244881, -3.96244881],
                            [3.96244881, 3.96244881, 3.96244881]])
        geom.pbc = np.array([True, True, True])
        geom.set_cell([[3, 0, 0], [3, 5, 0], [0, 0, 3]])
        assert np.isclose(geom.get_potential_energy(), -15.33335)
        forces = geom.get_forces()
        assert np.allclose(forces, [[0, -17.3656864, 0],
                                    [0, 17.3656864, 0]])

    def test_unary_trimer(self, data_dir):
        # reference tests/test_calculator.py:52-70
        geom = Atoms("W3", positions=[[0, 0, 0], [2, 0, 0], [0, 3, 0]],
                     pbc=False)
        model = ls.WeightedLinearModel.from_json(
            os.path.join(data_dir, "model_unary.json"))
        calc = UFCalculator(model)
        geom.calc = calc
        assert np.isclose(geom.get_potential_energy(), -18.79979353611411)
        assert np.allclose(geom.get_forces(),
                           [[-12.26367499, 0.15140673, 0.0],
                            [12.05608935, 0.31137845, 0.0],
                            [0.20758563, -0.46278518, 0.0]])

    def test_unary_pbc(self, data_dir):
        # reference tests/test_calculator.py:72-98
        geom = Atoms("W8",
                     positions=[[0.00, 0.00, 0.00], [2.89, 0.12, -0.04],
                                [-0.32, 2.71, -0.11], [2.65, 2.81, 0.37],
                                [0.00, 0.00, 3.00], [2.64, 0.00, 3.00],
                                [-0.08, 2.94, 3.16], [2.53, 2.87, 3.23]],
                     pbc=True, cell=np.eye(3) * 2.74 * 2)
        model = ls.WeightedLinearModel.from_json(
            os.path.join(data_dir, "model_unary.json"))
        calc = UFCalculator(model)
        geom.calc = calc
        assert np.isclose(geom.get_potential_energy(), -76.358888229785)
        assert np.allclose(geom.get_forces(),
                           [[1.36696442, -0.46307, 1.78573347],
                            [0.20112587, 0.17014795, 1.22172728],
                            [-0.66043959, -1.08374173, 6.78845939],
                            [-1.30913745, 0.36888897, 1.48182124],
                            [-0.33315563, 1.28359885, -1.56572912],
                            [0.01504262, 0.06574851, -2.38044283],
                            [0.25436762, 0.2491558, -7.48063062],
                            [0.46523214, -0.59072835, 0.14906119]])

    def test_binary(self, data_dir):
        # reference tests/test_calculator.py:100-114
        geom = Atoms("NeXe", positions=[[0, 0, 0], [3.1, 0, 0]],
                     pbc=False)
        model = ls.WeightedLinearModel.from_json(
            os.path.join(data_dir, "model_binary.json"))
        calc = UFCalculator(model)
        geom.calc = calc
        assert np.isclose(geom.get_potential_energy(), 0.3464031387757268)
        assert np.allclose(geom.get_forces(),
                           [[-0.28138023, 0.0, 0.0],
                            [0.28138023, 0.0, 0.0]])

    def test_forces_match_finite_difference(self, data_dir):
        geom = Atoms("W3", positions=[[0, 0, 0], [2.1, 0, 0], [0.3, 2.8, 0]],
                     pbc=False)
        model = ls.WeightedLinearModel.from_json(
            os.path.join(data_dir, "model_unary.json"))
        calc = UFCalculator(model)
        forces = calc.get_forces(geom)
        eps = 1e-6
        for a in range(3):
            for c in range(3):
                plus = geom.copy()
                plus.positions[a, c] += eps
                minus = geom.copy()
                minus.positions[a, c] -= eps
                numeric = -(calc.get_potential_energy(plus)
                            - calc.get_potential_energy(minus)) / (2 * eps)
                assert np.isclose(forces[a, c], numeric, atol=1e-5)

    def test_relaxation_dimer(self):
        # LJ-like pair potential: relaxation should find the minimum
        config = BSplineBasis(ChemicalSystem(["W"]),
                              r_min_map={("W", "W"): 2.0},
                              r_max_map={("W", "W"): 6.0},
                              resolution_map={("W", "W"): 20},
                              knot_strategy="lammps")
        model = ls.WeightedLinearModel(bspline_config=config)
        pair = config.interactions_map[2][0]
        x = np.linspace(2.0, 6.0, 1000)
        y = 4 * 0.87 * ((2.5 / x) ** 12 - (2.5 / x) ** 6)
        coeff = sp.fit_spline_1d(x, y, config.knots_map[pair])
        model.coefficients = np.insert(coeff, 0, 0)
        calc = UFCalculator(model)
        geom = Atoms("W2", positions=[[0, 0, 0], [3.4, 0, 0]], pbc=False)
        relaxed = calc.relax_fmax(geom, fmax=0.01, steps=300)
        r_final = np.linalg.norm(relaxed.positions[1]
                                 - relaxed.positions[0])
        # LJ minimum at 2^(1/6) * 2.5 = 2.806
        assert abs(r_final - 2.5 * 2 ** (1 / 6)) < 0.05
