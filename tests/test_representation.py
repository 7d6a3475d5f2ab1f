"""
Featurization tests: golden energy-feature vectors for strained H2O and
methane, permutation-invariance checks, and the periodic rattled-steel
(Fe8C3) energy+force fixture from the reference package
(tests/data/rattled_steel_features.json; reference
tests/test_representation.py).
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from uf3_tpu.data.atoms import Atoms
from uf3_tpu.data.composition import ChemicalSystem
from uf3_tpu.representation.basis import BSplineBasis
from uf3_tpu.representation.process import (BasisFeaturizer,
                                            flatten_by_interactions)


@pytest.fixture()
def strained_h2o():
    return Atoms("H2O",
                 positions=[[0, 0, 0], [1.5, 0, 0], [0, 2.0, 0]],
                 pbc=False)


@pytest.fixture()
def methane():
    return Atoms("CH4",
                 positions=[[15.0, 15.0, 15.000010729],
                            [15.629117489, 15.629117489, 15.629128218],
                            [14.370881617, 14.370881617, 15.629128218],
                            [15.629117489, 14.370881617, 14.370892346],
                            [14.370881617, 15.629117489, 14.370892346]],
                 pbc=True, cell=[30, 30, 30])


@pytest.fixture()
def rattled_steel():
    return Atoms("Fe8C3",
                 positions=[[1.99342831e-01, 7.23471398e-02, 2.29537708e-01],
                            [3.27460597e+00, 3.16932506e-03, -9.68273914e-02],
                            [3.65842563e-01, 3.07348695e+00, -1.43894877e-01],
                            [3.02851201e+00, 2.85731646e+00, 6.85404929e-03],
                            [-1.60754569e-03, -3.82656049e-01, 2.57501643e+00],
                            [2.80754249e+00, -3.02566224e-01, 2.88284947e+00],
                            [-8.16048151e-02, 2.53753926e+00, 3.26312975e+00],
                            [2.92484474e+00, 2.93350564e+00, 2.58505036e+00],
                            [1.32612346e+00, 1.45718452e+00, -1.80198715e-01],
                            [1.51013960e+00, -7.01277380e-02, 1.37666125e+00],
                            [-7.03413224e-02, 1.80545564e+00, 1.43230056e+00]],
                 pbc=True, cell=[5.74, 5.74, 5.74])


def interaction_slices(bspline_config, features_con):
    """Slice the concatenated 2B+3B feature vector per interaction,
    skipping the two 1-body columns (not present in features_con)."""
    sizes, offsets = bspline_config.get_interaction_partitions()
    n_el = len(bspline_config.element_list)
    out = {}
    for degree in (2, 3):
        for interaction in bspline_config.interactions_map.get(degree, []):
            start = offsets[interaction] - n_el
            out[interaction] = features_con[
                start:start + sizes[interaction]]
    return out


class TestGoldenEnergyFeatures:
    def test_strained_h2o(self, strained_h2o):
        # reference tests/test_representation.py:137-165 (default trims)
        chemistry = ChemicalSystem(["H", "O"], degree=3)
        config = BSplineBasis(chemistry)
        featurizer = BasisFeaturizer(config)
        con = np.concatenate([featurizer.featurize_energy_2B(strained_h2o),
                              featurizer.featurize_energy_3B(strained_h2o)])
        feats = interaction_slices(config, con)
        assert np.allclose(feats[("H", "H")][:5],
                           [0.0, 0.40032798833819255, 1.1900510204081631,
                            0.40949951409135077, 0.00012147716229348758])
        assert np.allclose(feats[("H", "H")][5:], 0.0)
        assert np.allclose(feats[("H", "O")][:7],
                           [0.0, 0.0, 0.20991253644314867,
                            1.4571185617103986, 1.745019436345967,
                            0.5846695821185617, 0.0032798833819242057])
        assert np.allclose(feats[("O", "O")], 0.0)
        # 3B golden (values are half the reference fixture's
        # double-counted values)
        hho = feats[("H", "H", "O")]
        nz = np.where(hho != 0)[0]
        assert np.allclose(nz, [0, 1, 2, 7, 8, 9])
        assert np.allclose(hho[nz] * 2,
                           [0.11179061530876638, 0.02854780141611156,
                            5.380932829072594e-05, 0.046232917007898805,
                            0.00356407243123478, 4.6287594228581435e-06])
        ohh = feats[("O", "H", "H")]
        nz = np.where(ohh != 0)[0]
        assert np.allclose(nz, [0, 7, 14])
        assert np.allclose(ohh[nz] * 2,
                           [0.033415592868540726, 0.03629005247013563,
                            0.0028744596015948995])
        for key in [("H", "H", "H"), ("H", "O", "O"), ("O", "H", "O"),
                    ("O", "O", "O")]:
            assert np.allclose(feats[key], 0.0)

    def test_methane(self, methane):
        # reference tests/test_representation.py:236-263 (default trims)
        chemistry = ChemicalSystem(["H", "C"], degree=3)
        config = BSplineBasis(chemistry)
        featurizer = BasisFeaturizer(config)
        con = np.concatenate([featurizer.featurize_energy_2B(methane),
                              featurizer.featurize_energy_3B(methane)])
        feats = interaction_slices(config, con)
        assert np.allclose(feats[("H", "H")][:5],
                           [0.0, 0.10764117873003697, 4.380510760509621,
                            6.909855011070257, 0.6019930496900838])
        assert np.allclose(feats[("H", "C")][:4],
                           [4.217956715718236, 3.381599561086582,
                            0.3909862297136271, 0.009457493481554552])
        assert np.allclose(feats[("C", "C")], 0.0)
        hhh = feats[("H", "H", "H")]
        nz = np.where(hhh != 0)[0]
        assert np.allclose(nz, [0, 1, 7, 8, 14, 15])
        assert np.allclose(hhh[nz] * 2,
                           [0.6640224780125649, 0.0007053656017778708,
                            0.01702949612348602, 1.8089780359648227e-05,
                            0.00010918445829116121, 1.159824609519897e-07])
        hhc = feats[("H", "H", "C")]
        nz = np.where(hhc != 0)[0]
        assert np.allclose(nz, [0, 14])
        assert np.allclose(hhc[nz] * 2,
                           [1.624998081281485e-06, 2.083732060447781e-08])
        chh = feats[("C", "H", "H")]
        nz = np.where(chh != 0)[0]
        assert np.allclose(nz, [0, 1])
        assert np.allclose(chh[nz] * 2,
                           [8.505596144699058e-07, 9.035168449480808e-10])


class TestInvariance:
    def test_equal_order_key_swap(self):
        # Yb/La systems give identical features regardless of input order
        geom = Atoms("Yb2La2",
                     positions=[[0, 0, 0], [0, 0, 2], [0, 1.5, 0], [2, 0, 0]],
                     pbc=True, cell=[30, 30, 30])
        f1 = BasisFeaturizer(BSplineBasis(
            ChemicalSystem(["Yb", "La"], degree=3))).featurize_energy_3B(geom)
        f2 = BasisFeaturizer(BSplineBasis(
            ChemicalSystem(["La", "Yb"], degree=3))).featurize_energy_3B(geom)
        assert np.allclose(f1, f2)

    def test_atom_order_swap_3b(self):
        config = BSplineBasis(ChemicalSystem(["C", "Pt"], degree=3))
        featurizer = BasisFeaturizer(config)
        g1 = Atoms("CPtC", positions=[[0, 0, 0], [0, 1.5, 0], [0, 0, 2]],
                   pbc=True, cell=[30, 30, 30])
        g2 = Atoms("CCPt", positions=[[0, 0, 0], [0, 0, 2], [0, 1.5, 0]],
                   pbc=True, cell=[30, 30, 30])
        f1 = featurizer.featurize_energy_3B(g1)
        f2 = featurizer.featurize_energy_3B(g2)
        assert np.allclose(f1[f1 != 0], f2[f2 != 0])


class TestEvaluate:
    def test_evaluate_shapes(self):
        chemistry = ChemicalSystem(["Ar"])
        featurizer = BasisFeaturizer(BSplineBasis(chemistry))
        geom = Atoms("Ar3", positions=[[0, 0, 0], [3, 0, 0], [0, 4, 0]])
        eval_map = featurizer.evaluate_configuration(geom, energy=1.5)
        assert len(eval_map["energy"]) == 1 + 18 + 1
        assert eval_map["energy"][0] == 1.5
        assert eval_map["energy"][1] == 3
        eval_map = featurizer.evaluate_configuration(
            geom, name="sample",
            forces=[[2, 0, 0], [0, 0, 0], [0, 0, 0]])
        assert len(eval_map) == 9
        assert eval_map[("sample", "fx_0")][0] == 2
        assert eval_map[("sample", "fy_1")][1] == 0
        assert len(eval_map[("sample", "fz_2")]) == 20

    def test_evaluate_dataframe(self):
        chemistry = ChemicalSystem(["Ar"])
        featurizer = BasisFeaturizer(BSplineBasis(chemistry))
        geom = Atoms("Ar3", positions=[[0, 0, 0], [3, 0, 0], [0, 4, 0]])
        df = pd.DataFrame({
            "geometry": [geom, geom],
            "energy": [1.5, 1.5],
            "fx": [np.array([4., 3, 0]), np.array([4.1, 3.1, 0])],
            "fy": [np.array([0., 1, 2]), np.array([0., 1.1, 2.1])],
            "fz": [np.array([2., 1, 0]), np.array([2., 1, 0])]})
        df_features = featurizer.evaluate(df)
        assert len(df_features) == 2 + 6 * 3
        assert len(df_features.columns) == 1 + 18 + 1
        y = df_features.to_numpy()[:, 0]
        assert np.allclose(y[:10], [1.5, 4, 3, 0, 0, 1, 2, 2, 1, 0])


class TestRattledSteelGolden:
    def test_energy_and_forces(self, rattled_steel, data_dir):
        # reference tests/test_representation.py:605-648: periodic binary
        # 2B+3B energy and force features vs precalculated fixture
        chemistry = ChemicalSystem(["Fe", "C"], degree=3)
        trios = chemistry.interactions_map[3]
        pairs = chemistry.interactions_map[2]
        config = BSplineBasis(
            chemistry,
            r_min_map={**{p: 0.1 for p in pairs},
                       **{t: [1.5] * 3 for t in trios}},
            r_max_map={**{p: 6.0 for p in pairs},
                       **{t: [5.0, 5.0, 10.0] for t in trios}},
            resolution_map={**{p: 12 for p in pairs},
                            **{t: [4, 4, 8] for t in trios}},
            knot_strategy="linear", offset_1b=True,
            leading_trim=0, trailing_trim=3)
        featurizer = BasisFeaturizer(config)
        n_atoms = len(rattled_steel)
        eval_map = featurizer.evaluate_configuration(
            rattled_steel, energy=0, forces=np.zeros((3, n_atoms)))
        with open(os.path.join(data_dir,
                               "rattled_steel_features.json")) as f:
            ref = json.load(f)
        assert set(eval_map) == set(ref)
        for key in eval_map:
            assert np.allclose(eval_map[key], np.array(ref[key]),
                               atol=1e-10), key


def test_flatten_by_interactions():
    vector_map = {("A", "A"): np.array([1, 1, 1]),
                  ("A", "B"): np.array([2, 2]),
                  ("B", "B"): np.array([3, 3, 3, 3])}
    out = flatten_by_interactions(
        vector_map, [("A", "A"), ("A", "B"), ("B", "B")])
    assert np.allclose(out, [1, 1, 1, 2, 2, 3, 3, 3, 3])
