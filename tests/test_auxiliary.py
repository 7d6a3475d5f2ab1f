"""
Auxiliary-subsystem tests: cutoff optimization by column dropping,
LAMMPS export formats, YAML config + handler factory, FPS subsampling,
distance analysis, native runtime, and geometry utilities.
"""

import os

import numpy as np
import pytest

from uf3_tpu.data import analyze, geometry, io
from uf3_tpu.data.atoms import Atoms, bulk
from uf3_tpu.data.composition import ChemicalSystem
from uf3_tpu.forcefield import lammps
from uf3_tpu.regression import least_squares as ls
from uf3_tpu.regression import optimize
from uf3_tpu.representation.basis import BSplineBasis
from uf3_tpu.representation.process import BasisFeaturizer
from uf3_tpu.util import subsample, user_config


class TestOptimize:
    def test_cutoff_consistency(self):
        """Dropping columns from a big-cutoff featurization must equal
        featurizing at the small cutoff (reference tests/
        test_optimize.py:88-165)."""
        chemistry = ChemicalSystem(["W"], degree=3)
        config = optimize.get_bspline_config(
            chemistry, rmin_2b=1.0, rmin_3b=1.0, rmax_2b=6.0,
            rmax_3b=4.0, knot_spacing_2b=0.5, knot_spacing_3b=0.5,
            leading_trim=0, trailing_trim=3)
        featurizer = BasisFeaturizer(config)
        geom = bulk("W", "bcc", a=3.16)
        geom.rattle(0.03, seed=0)
        big = np.concatenate([featurizer.featurize_energy_2B(
            geom, geometry.get_supercell(geom, r_cut=config.r_cut)),
            featurizer.featurize_energy_3B(
                geom, geometry.get_supercell(geom, r_cut=config.r_cut))])
        names = config.get_column_names()[1 + 1:]  # drop y and n_W
        cutoffs = optimize.get_lower_cutoffs(config)
        for r2 in cutoffs["lower_rmax_2b"][-2:]:
            drop2 = optimize.get_columns_to_drop_2b(config, r2, 0.5)
            small_config = optimize.get_bspline_config(
                chemistry, rmin_2b=1.0, rmin_3b=1.0, rmax_2b=float(r2),
                rmax_3b=4.0, knot_spacing_2b=0.5, knot_spacing_3b=0.5,
                leading_trim=0, trailing_trim=3)
            small_feat = BasisFeaturizer(small_config)
            supercell = geometry.get_supercell(
                geom, r_cut=small_config.r_cut)
            small = np.concatenate([
                small_feat.featurize_energy_2B(geom, supercell),
                small_feat.featurize_energy_3B(geom, supercell)])
            keep = [i for i, name in enumerate(names)
                    if name not in set(drop2)]
            assert np.allclose(big[keep], small, atol=1e-10)

    def test_columns_to_drop_3b(self):
        chemistry = ChemicalSystem(["W"], degree=3)
        config = optimize.get_bspline_config(
            chemistry, rmin_2b=1.0, rmin_3b=1.0, rmax_2b=6.0,
            rmax_3b=4.0, knot_spacing_2b=0.5, knot_spacing_3b=0.5,
            leading_trim=0, trailing_trim=3)
        drop3 = optimize.get_columns_to_drop_3b(config, 3.5, 0.5)
        assert len(drop3) > 0
        names = set(config.get_column_names())
        assert all(name in names for name in drop3)


class TestLammpsExport:
    def _model(self):
        return ls.WeightedLinearModel.from_json(
            os.path.join("benchmarks_data", "model_2and3.json"))

    def test_tabulated_export(self, tmp_path):
        model = self._model()
        pair = model.bspline_config.interactions_map[2][0]
        knots = model.bspline_config.knots_map[pair]
        sizes, offsets = \
            model.bspline_config.get_interaction_partitions()
        coeff = model.coefficients[offsets[pair]:offsets[pair]
                                   + sizes[pair]]
        text = lammps.export_tabulated_potential(
            knots, coeff, pair, grid=50)
        lines = text.splitlines()
        assert lines[3] == "UF_W-W"
        assert lines[4] == "N 50"
        body = [ln.split() for ln in lines[6:]]
        assert len(body) == 50
        # factor-of-2 convention: table energy = 2 * spline value
        from uf3_tpu.representation import splines as sp
        r = float(body[10][1])
        expected = 2 * sp.evaluate_spline(np.array([r]), knots, coeff)[0]
        assert np.isclose(float(body[10][2]), expected, atol=1e-5)

    def test_uf3_pot_file(self, tmp_path):
        model = self._model()
        path = lammps.write_uf3_lammps_pot_files(
            model=model, pot_dir=str(tmp_path), author="test")
        text = open(path).read()
        assert "2B W W" in text
        assert "3B W W W" in text
        blocks = text.split("#UF3 POT")
        assert len(blocks) == 3  # leading empty + 2B + 3B
        # 3B block ends with the full L x M x N grid
        config = model.bspline_config
        trio = config.interactions_map[3][0]
        shape = tuple(len(s) - 4 for s in config.knots_map[trio])
        assert f"{shape[0]} {shape[1]} {shape[2]}" in text
        # header trims are the C++-parseable per-degree integers, not
        # python dict reprs (caught by the round-trip parser)
        assert "{" not in text

    def test_uf3_pot_round_trip(self, tmp_path):
        """export -> parse -> evaluate through the framework's own
        kernels: the written .uf3 file must carry exactly the model
        the C++ pair_style uf3 would consume (reference has no reader:
        generate_uf3_lammps_pots.py:60-165 is write-only)."""
        from uf3_tpu.forcefield.calculator import UFCalculator
        model = self._model()
        path = lammps.write_uf3_lammps_pot_files(
            model=model, pot_dir=str(tmp_path))
        model2 = lammps.model_from_uf3_pot_file(path)
        geom = bulk("W", "bcc", a=3.1652) * 2
        geom.rattle(0.05, seed=3)
        f1 = UFCalculator(model).get_forces(geom)
        f2 = UFCalculator(model2).get_forces(geom)
        assert np.abs(f1 - f2).max() < 1e-8
        # 1-body offsets are not part of the file format; everything
        # else must round-trip bit-exactly
        n1 = len(model.bspline_config.element_list)
        assert np.array_equal(model.coefficients[n1:],
                              model2.coefficients[n1:])

    def test_uf3_pot_round_trip_binary(self, tmp_path):
        model = ls.WeightedLinearModel.from_json(
            os.path.join("tests", "data", "model_binary.json"))
        path = lammps.write_uf3_lammps_pot_files(
            model=model, pot_dir=str(tmp_path))
        model2 = lammps.model_from_uf3_pot_file(path)
        n1 = len(model.bspline_config.element_list)
        assert np.array_equal(model.coefficients[n1:],
                              model2.coefficients[n1:])
        assert (model2.bspline_config.chemical_system.element_list
                == model.bspline_config.chemical_system.element_list)

    def test_tabulated_round_trip(self, tmp_path):
        """Table file -> parse -> values match the source spline with
        the x2 bond convention."""
        from uf3_tpu.representation import splines as sp
        model = self._model()
        pair = model.bspline_config.interactions_map[2][0]
        knots = model.bspline_config.knots_map[pair]
        sizes, offsets = \
            model.bspline_config.get_interaction_partitions()
        coeff = model.coefficients[offsets[pair]:offsets[pair]
                                   + sizes[pair]]
        path = str(tmp_path / "W_W.table")
        lammps.export_tabulated_potential(knots, coeff, pair, grid=64,
                                          filename=path, rounding=10)
        parsed = lammps.read_tabulated_potential(path)
        assert parsed["keyword"] == "UF_W-W"
        r = np.clip(parsed["r"], knots[0], knots[-1] - 1e-12)
        expected = 2 * sp.evaluate_spline(r, knots, coeff)
        assert np.allclose(parsed["energy"], expected, atol=1e-8)
        expected_f = -2 * sp.evaluate_spline(r, knots, coeff, nu=1)
        assert np.allclose(parsed["force"], expected_f, atol=1e-8)

    def test_write_lammps_data(self, tmp_path):
        geom = bulk("W", "bcc", a=3.16) * 2
        path = str(tmp_path / "data.lammps")
        lammps.write_lammps_data(path, geom, ["W"])
        text = open(path).read()
        assert "16 atoms" in text
        assert "1 atom types" in text

    def test_uflammps_native_backend(self):
        """UFLammps (reference uf3/forcefield/lammps.py:27-133)
        evaluates and box-relaxes through the native engine when no
        LAMMPS library is linked (backend='auto' fallback)."""
        model = self._model()
        calc = lammps.UFLammps(model, backend="native")
        geom = bulk("W", "bcc", a=3.1652) * 2
        geom.rattle(0.02, seed=4)
        results = calc.evaluate(geom)
        from uf3_tpu.forcefield.calculator import UFCalculator
        oracle = UFCalculator(model)
        assert np.isclose(results["energy"],
                          oracle.get_potential_energy(geom))
        assert np.allclose(results["forces"],
                           oracle.get_forces(geom))
        assert results["stress"].shape == (6,)
        f0 = float(np.abs(results["forces"]).max())
        relaxed = calc.relax(geom, ftol=0.02)
        assert float(np.abs(relaxed["forces"]).max()) < min(0.02, f0)
        # setup_commands works on the native backend too (lazily
        # exports the potential file)
        cmds = calc.setup_commands("dummy.data")
        assert any("pair_style" in c for c in cmds)
        assert calc.pot_path is not None

    def test_read_tabulated_potential_rejects_empty(self):
        with pytest.raises(ValueError, match="no 4-column"):
            lammps.read_tabulated_potential("UF3_W\nN 25\n")

    def test_uflammps_lammps_backend_guard(self, tmp_path):
        """backend='lammps' raises a clear ImportError when the
        in-process library is absent, and the generated command
        sequence matches the pair_style uf3 contract."""
        model = self._model()
        try:
            import lammps as lammps_lib  # noqa: F401
            pytest.skip("lammps present; guard not exercised")
        except ImportError:
            pass
        calc = lammps.UFLammps(model, backend="native")
        with pytest.raises(ImportError, match="backend='native'"):
            calc._get_lammps()
        # command generation is backend-independent given a pot path
        calc.pot_path = str(tmp_path / "W.uf3")
        cmds = calc.setup_commands("structure.data")
        assert cmds[0] == "units metal"
        assert any(c.startswith("pair_style\tuf3 3") for c in cmds)
        assert any("pair_coeff" in c and "W" in c for c in cmds)


class TestAseAdapter:
    """Optional ase interop (reference's calculator subclasses
    ase.Calculator directly, uf3/forcefield/calculator.py:40; here ase
    is optional and the adapter wraps UFCalculator)."""

    def test_import_without_ase(self):
        from uf3_tpu.forcefield import ase_adapter
        # module import never requires ase
        assert hasattr(ase_adapter, "UFAseCalculator")
        if not ase_adapter.HAVE_ASE:
            model = ls.WeightedLinearModel.from_json(
                os.path.join("benchmarks_data", "model_2and3.json"))
            with pytest.raises(ImportError):
                ase_adapter.UFAseCalculator(model)

    def test_from_ase_duck_typed(self):
        """from_ase accepts anything with the ase accessor quartet --
        including this framework's own Atoms."""
        from uf3_tpu.forcefield import ase_adapter
        geom = bulk("W", "bcc", a=3.16)
        converted = ase_adapter.from_ase(geom)
        assert np.allclose(converted.get_positions(),
                           geom.get_positions())
        assert np.array_equal(converted.get_atomic_numbers(),
                              geom.get_atomic_numbers())

    @pytest.mark.skipif(
        not __import__("importlib").util.find_spec("ase"),
        reason="ase not installed")
    def test_ase_calculator(self):
        import ase
        from uf3_tpu.forcefield.ase_adapter import UFAseCalculator
        from uf3_tpu.forcefield.calculator import UFCalculator
        model = ls.WeightedLinearModel.from_json(
            os.path.join("benchmarks_data", "model_2and3.json"))
        geom = bulk("W", "bcc", a=3.1652) * 2
        geom.rattle(0.03, seed=1)
        ase_atoms = ase.Atoms(numbers=geom.get_atomic_numbers(),
                              positions=geom.get_positions(),
                              cell=geom.get_cell(), pbc=True)
        ase_atoms.calc = UFAseCalculator(model)
        oracle = UFCalculator(model)
        assert np.isclose(ase_atoms.get_potential_energy(),
                          oracle.get_potential_energy(geom))
        assert np.allclose(ase_atoms.get_forces(),
                           oracle.get_forces(geom))


class TestUserConfig:
    def test_read_config_and_handlers(self, tmp_path):
        settings_file = tmp_path / "settings.yaml"
        settings_file.write_text(
            "elements: ['W']\ndegree: 2\n"
            "basis:\n    r_min: {}\n    r_max: {}\n"
            "features:\n    fit_forces: yes\n"
            "learning:\n    regularizer:\n        ridge_2b: 1.0e-8\n")
        settings = user_config.read_config(str(settings_file))
        assert settings["degree"] == 2
        handlers = user_config.generate_handlers(settings)
        assert "chemical_system" in handlers
        assert "basis" in handlers
        assert "features" in handlers
        assert "learning" in handlers
        assert handlers["basis"].r_max_map[("W", "W")] == 8.0

    def test_element_tuple(self):
        assert user_config.get_element_tuple("NeXe") == ("Ne", "Xe")


class TestSubsample:
    def test_farthest_point(self):
        data = np.arange(100, dtype=float)
        idx = subsample.farthest_point_sampling(data, max_samples=5)
        assert len(idx) == 5
        assert idx[0] == 0  # starts at minimum
        assert 99 in idx  # farthest point comes next

    def test_min_diff_stopping(self):
        data = np.zeros(50)
        idx = subsample.farthest_point_sampling(data, max_samples=10,
                                                min_diff=0.1)
        assert len(idx) == 1


class TestAnalyze:
    def test_rdf_and_bounds(self):
        chemistry = ChemicalSystem(["W"])
        geom = bulk("W", "bcc", a=3.16)
        histogram, edges, bounds = analyze.summarize_distances(
            [geom], chemistry, r_cut=6.0, n_bins=60, print_stats=False)
        pair = ("W", "W")
        # nearest-neighbor distance in bcc: sqrt(3)/2 * a = 2.737
        assert 2.5 < bounds[pair] < 2.85
        assert np.any(histogram[pair] > 0)

    def test_atomic_volumes(self):
        chemistry = ChemicalSystem(["W"])
        analyzer = analyze.DataAnalyzer(chemistry)
        geoms = [bulk("W", "bcc", a=a) for a in (3.1, 3.16, 3.2)]
        volumes = analyzer.atomic_volumes(geoms)
        expected = 3.16 ** 3 / 2
        assert abs(volumes["W"] - expected) < 2.0


class TestNative:
    def test_cell_list_matches_device_list(self):
        from uf3_tpu import native
        if not native.available():
            pytest.skip("native library unavailable")
        import jax.numpy as jnp
        from uf3_tpu.ops import neighbors as nb
        geom = bulk("W", "bcc", a=3.16) * 4
        geom.rattle(0.03, seed=2)
        r_cut = 4.0
        out = native.cell_list_neighbors(geom.positions, geom.cell,
                                         geom.pbc, r_cut, 64)
        idx, shift, mask, max_count = out
        dev = nb.build_neighbor_list(jnp.asarray(geom.positions),
                                     jnp.asarray(geom.cell), geom.pbc,
                                     r_cut, 64)
        counts_native = np.sort(mask.sum(axis=1))
        counts_device = np.sort(np.asarray(dev.mask.sum(axis=1)))
        assert np.array_equal(counts_native, counts_device)


class TestGeometryAux:
    def test_displacement_augmentation(self):
        geom = bulk("W", "bcc", a=3.16)
        forces = np.random.RandomState(0).rand(2, 3)
        snapshots, energies = \
            geometry.generate_displacements_from_forces(
                geom, -10.0, forces, d=0.01, n=4)
        assert len(snapshots) == 4
        assert len(energies) == 4
        assert not np.allclose(snapshots[0].positions, geom.positions)
