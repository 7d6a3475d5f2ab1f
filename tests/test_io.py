"""
Parser and DataCoordinator tests against the reference test artifacts
(extended xyz, vasprun.xml, LAMMPS log+dump; reference tests/test_io.py).
"""

import os

import numpy as np
import pandas as pd
import pytest

from uf3_tpu.data import io
from uf3_tpu.data.atoms import Atoms

REF_DATA = "/root/reference/tests/data"

needs_ref = pytest.mark.skipif(not os.path.isdir(REF_DATA),
                               reason="reference test data unavailable")


@needs_ref
class TestXYZ:
    def test_read_extended_xyz(self):
        geometries = io.read_xyz(os.path.join(REF_DATA, "extended_xyz",
                                              "test.xyz"))
        assert len(geometries) > 0
        geom = geometries[0]
        assert len(geom) == 128
        assert np.isclose(geom.info["energy"], -1431.629494590219)
        assert geom.get_chemical_symbols()[0] == "W"
        assert np.all(geom.get_pbc())
        assert np.isclose(geom.get_cell()[0, 0], 12.72199597962937)
        assert "fx" in geom.arrays
        assert np.isclose(geom.arrays["fx"][0], -0.4742581516823975)

    def test_roundtrip(self, tmp_path):
        geometries = io.read_xyz(os.path.join(REF_DATA, "extended_xyz",
                                              "test.xyz"))[:2]
        path = str(tmp_path / "out.xyz")
        io.write_xyz(path, geometries)
        back = io.read_xyz(path)
        assert len(back) == 2
        assert np.allclose(back[0].positions, geometries[0].positions)
        assert np.isclose(back[0].info["energy"],
                          geometries[0].info["energy"])
        assert np.allclose(back[0].arrays["fx"],
                           geometries[0].arrays["fx"])

    def test_parse_trajectory_dataframe(self):
        df = io.parse_trajectory(os.path.join(REF_DATA, "extended_xyz",
                                              "test.xyz"), prefix="test")
        assert df.index[0] == "test_0"
        assert "energy" in df.columns and "size" in df.columns
        assert df["size"].iloc[0] == 128
        assert isinstance(df["fx"].iloc[0], np.ndarray)


@needs_ref
class TestVasprun:
    def test_read_vasp_md(self):
        geometries = io.read_vasprun(os.path.join(REF_DATA, "vasp_md",
                                                  "vasprun.xml"))
        assert len(geometries) > 1
        geom = geometries[0]
        assert "energy" in geom.info
        assert "fx" in geom.arrays
        assert np.all(geom.get_pbc())

    def test_read_vasp_relax_changing_cell(self):
        geometries = io.read_vasprun(os.path.join(REF_DATA, "vasp_relax",
                                                  "vasprun.xml"))
        assert len(geometries) >= 1
        assert np.isfinite(geometries[0].info["energy"])


@needs_ref
class TestLammps:
    def test_parse_log(self):
        df = io.parse_lammps_log(os.path.join(REF_DATA, "lammps",
                                              "log.lammps"))
        assert "Step" in df.columns
        assert len(df) > 0

    def test_parse_outputs(self):
        df = io.parse_lammps_outputs(
            os.path.join(REF_DATA, "lammps"), {1: "W"},
            dump_fname="test.lammpstrj", prefix="lmp")
        assert len(df) > 0
        geom = df["geometry"].iloc[0]
        assert geom.get_chemical_symbols()[0] == "W"
        assert "energy" in df.columns


class TestDataCoordinator:
    def _make_df(self, n=3, seed=0):
        rng = np.random.RandomState(seed)
        geometries = []
        for _ in range(n):
            geom = Atoms("W2", positions=rng.rand(2, 3) * 3 + 1)
            geometries.append(geom)
        energies = rng.rand(n).tolist()
        forces = [rng.rand(2, 3) for _ in range(n)]
        return geometries, energies, forces

    def test_from_lists_and_consolidate(self):
        coordinator = io.DataCoordinator()
        geometries, energies, forces = self._make_df()
        coordinator.dataframe_from_lists(geometries, prefix="a",
                                         energies=energies, forces=forces)
        geometries, energies, forces = self._make_df(seed=1)
        coordinator.dataframe_from_lists(geometries, prefix="b",
                                         energies=energies, forces=forces)
        df = coordinator.consolidate()
        assert len(df) == 6
        assert df.index[0] == "a_0"
        assert df["size"].iloc[0] == 2

    def test_prefix_conflict_skips(self, capsys):
        coordinator = io.DataCoordinator()
        geometries, energies, forces = self._make_df()
        coordinator.dataframe_from_lists(geometries, prefix="a",
                                         energies=energies, forces=forces)
        coordinator.dataframe_from_lists(geometries, prefix="a",
                                         energies=energies, forces=forces)
        assert len(coordinator.keys) == 1

    def test_subsampling_parse(self, tmp_path):
        geometries, energies, forces = self._make_df(n=10)
        path = str(tmp_path / "traj.xyz")
        for geom, energy, force in zip(geometries, energies, forces):
            geom.info["energy"] = energy
            geom.arrays["fx"] = force[:, 0]
            geom.arrays["fy"] = force[:, 1]
            geom.arrays["fz"] = force[:, 2]
        io.write_xyz(path, geometries)
        coordinator = io.DataCoordinator()
        io.parse_with_subsampling([path], coordinator, max_samples=5,
                                  min_diff=1e-6)
        df = coordinator.consolidate()
        assert 1 <= len(df) <= 5


def test_filter_max_forces():
    df = pd.DataFrame({
        "fx": [np.array([0.1, 0.2]), np.array([100.0, 0.0])],
        "fy": [np.array([0.0, 0.0]), np.array([0.0, 0.0])],
        "fz": [np.array([0.0, 0.0]), np.array([0.0, 0.0])]},
        index=["ok", "bad"])
    matches = io.filter_max_forces(df, cutoff=10)
    assert list(matches) == ["ok"]


class TestAseDbCache:
    def test_cache_and_read_roundtrip(self, tmp_path, data_dir):
        """cache_data -> read_database round-trips geometries, energy,
        forces, and scalar info (reference io.py:383/:906 semantics,
        ase.db SQLite schema)."""
        ref_xyz = "/root/reference/tests/data/extended_xyz/test.xyz"
        if not os.path.isfile(ref_xyz):
            pytest.skip("reference dataset unavailable")
        coordinator = io.DataCoordinator()
        coordinator.dataframe_from_trajectory(ref_xyz, prefix="dft")
        df = coordinator.consolidate()
        db_path = str(tmp_path / "cache.db")
        io.cache_data(df, db_path)
        geometries = io.read_database(db_path)
        assert len(geometries) == len(df)
        for (name, row), geom in zip(df.iterrows(), geometries):
            ref = row["geometry"]
            assert np.allclose(geom.positions, ref.positions)
            assert np.array_equal(geom.get_atomic_numbers(),
                                  ref.get_atomic_numbers())
            assert np.allclose(np.asarray(geom.get_cell()),
                               np.asarray(ref.get_cell()))
            assert geom.info["row_name"] == str(name)
            assert np.isclose(geom.info["energy"],
                              ref.info["energy"])
            for c in ("fx", "fy", "fz"):
                assert np.allclose(geom.arrays[c], ref.arrays[c])
        # the .db file loads back through the standard pipeline
        df_db = io.parse_trajectory(db_path, prefix="db")
        assert len(df_db) == len(df)
        assert np.allclose(df_db["energy"].values.astype(float),
                           df["energy"].values.astype(float))

    def test_read_database_slicing(self, tmp_path):
        geoms = []
        for i in range(4):
            g = Atoms("W2", positions=np.random.RandomState(i).rand(2, 3),
                      cell=np.eye(3) * 4.0, pbc=True)
            g.info["energy"] = float(i)
            g.arrays["fx"] = np.zeros(2)
            g.arrays["fy"] = np.zeros(2)
            g.arrays["fz"] = np.zeros(2)
            geoms.append(g)
        df = io.prepare_dataframe_from_lists(
            geoms, energies=[g.info["energy"] for g in geoms])
        db_path = str(tmp_path / "slice.db")
        io.cache_data(df, db_path)
        subset = io.read_database(db_path, index=slice(1, 3))
        assert len(subset) == 2
        assert subset[0].info["energy"] == 1.0
