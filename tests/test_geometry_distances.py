"""
Supercell/ghost-generation and pair-distance tests (reference
tests/test_geometry.py, tests/test_distances.py).
"""

import numpy as np
import pytest

from uf3_tpu.data import geometry
from uf3_tpu.data.atoms import Atoms, bulk
from uf3_tpu.data.composition import ChemicalSystem
from uf3_tpu.representation import featurize_np as fnp


class TestSupercell:
    def test_replica_counts_sc(self):
        # 2-atom cell, 4 A box, r_cut 6 -> ceil(6/4)=2 images per
        # direction -> (2*2+1)^3 = 125 images
        geom = Atoms("W2", positions=[[0, 0, 0], [2, 2, 2]],
                     cell=np.eye(3) * 4, pbc=True)
        supercell = geometry.get_supercell(geom, r_cut=6.0)
        assert len(supercell) == 2 * 125

    def test_first_image_is_unit_cell(self):
        geom = bulk("W", "bcc", a=3.16)
        supercell = geometry.get_supercell(geom, r_cut=5.0)
        assert np.allclose(supercell.positions[:len(geom)],
                           geom.positions)
        assert np.all(supercell.get_atomic_numbers()[:len(geom)]
                      == geom.get_atomic_numbers())

    def test_low_dimensional(self):
        geom = Atoms("W", positions=[[0, 0, 0]], cell=np.eye(3) * 4,
                     pbc=[True, True, False])
        supercell = geometry.get_supercell(geom, r_cut=4.0)
        # only a and b replicated: 3 x 3 x 1 images
        assert len(supercell) == 9

    def test_mask_supercell_with_radius(self):
        geom = bulk("W", "bcc", a=3.16)
        supercell = geometry.get_supercell(geom, r_cut=5.0)
        masked = geometry.mask_supercell_with_radius(geom, supercell,
                                                     5.0)
        assert len(masked) < len(supercell)
        matrix = geometry.get_distance_matrix(geom, masked)
        assert np.all(np.min(matrix, axis=0) <= 5.0)


class TestDistances:
    def test_dimer_distances(self):
        geom = Atoms("W2", positions=[[0, 0, 0], [2.5, 0, 0]])
        cs = ChemicalSystem(["W"])
        out = fnp.distances_by_interaction(
            geom, cs.interactions_map[2],
            {("W", "W"): 1.0}, {("W", "W"): 6.0})
        # each bond appears twice (both orientations)
        assert np.allclose(sorted(out[("W", "W")]), [2.5, 2.5])

    def test_binary_species_masks(self):
        geom = Atoms("NeXe", positions=[[0, 0, 0], [3.0, 0, 0]])
        cs = ChemicalSystem(["Ne", "Xe"])
        r_min = {pair: 0.5 for pair in cs.interactions_map[2]}
        r_max = {pair: 6.0 for pair in cs.interactions_map[2]}
        out = fnp.distances_by_interaction(
            geom, cs.interactions_map[2], r_min, r_max)
        assert len(out[("Ne", "Ne")]) == 0
        assert len(out[("Xe", "Xe")]) == 0
        assert np.allclose(sorted(out[("Ne", "Xe")]), [3.0, 3.0])

    def test_periodic_bcc_first_shell(self):
        geom = bulk("W", "bcc", a=3.16)
        supercell = geometry.get_supercell(geom, r_cut=3.0)
        out = fnp.distances_by_interaction(
            geom, [("W", "W")], {("W", "W"): 1.0}, {("W", "W"): 3.0},
            supercell=supercell)
        # 8 nearest neighbors at sqrt(3)/2 * a per atom
        nn = 3.16 * np.sqrt(3) / 2
        distances = out[("W", "W")]
        assert len(distances) == 2 * 8
        assert np.allclose(distances, nn)

    def test_derivatives_force_consistency(self):
        geom = Atoms("W3", positions=[[0, 0, 0], [2.2, 0, 0],
                                      [0.5, 2.4, 0]])
        dist_map, deriv_map = fnp.derivatives_by_interaction(
            geom, [("W", "W")], 6.0, {("W", "W"): 1.0},
            {("W", "W"): 6.0})
        i_idx, j_idx, unit = deriv_map[("W", "W")]
        assert np.allclose(np.linalg.norm(unit, axis=1), 1.0)
        # ordered pairs: both (i,j) and (j,i) present
        pairs = set(zip(i_idx.tolist(), j_idx.tolist()))
        assert (0, 1) in pairs and (1, 0) in pairs


class TestBatchUtilities:
    def test_batched_energy_and_relax(self, data_dir):
        import os
        from uf3_tpu.forcefield.batch import (batch_relax,
                                              batched_energy_and_forces)
        from uf3_tpu.forcefield.calculator import UFCalculator
        from uf3_tpu.regression import least_squares as ls
        model = ls.WeightedLinearModel.from_json(
            os.path.join(data_dir, "model_unary.json"))
        calc = UFCalculator(model)
        geoms = [Atoms("W2", positions=[[0, 0, 0], [2.2 + 0.2 * i, 0,
                                                    0]])
                 for i in range(3)]
        energies, forces = batched_energy_and_forces(geoms, calc)
        assert len(energies) == 3
        assert all(np.isfinite(e) for e in energies)
        relaxed, energies, forces = batch_relax(geoms, calc, fmax=0.1,
                                                max_steps=100)
        assert len(relaxed) == 3

    def test_md_checkpoint_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        from uf3_tpu.data.atoms import bulk
        from uf3_tpu.forcefield.batch import (load_md_checkpoint,
                                              save_md_checkpoint)
        from uf3_tpu.forcefield.md import MDSystem
        from uf3_tpu.regression import least_squares as ls
        model = ls.WeightedLinearModel.from_json(
            "benchmarks_data/model_2and3.json")
        geom = bulk("W", "bcc", a=3.1652) * 3
        system = MDSystem(model, geom, dtype=jnp.float64)
        state = system.init_state(temperature=300.0, seed=4)
        state = system.run(state, n_steps=5, dt_fs=1.0)
        path = str(tmp_path / "ckpt.npz")
        save_md_checkpoint(path, state)
        restored = load_md_checkpoint(path, system)
        assert np.allclose(np.asarray(restored.positions),
                           np.asarray(state.positions))
        assert np.isclose(float(restored.energy), float(state.energy))
        # continue running from the checkpoint
        restored = system.run(restored, n_steps=5, dt_fs=1.0)
        assert np.isfinite(float(restored.energy))
