"""
TPU device-numerics tier: pins the f32 accelerator path against the
f64 host oracle ON REAL HARDWARE -- the one class of regression the
CPU-forced main suite cannot see (round-4 verdict weak #7: dropping
``MATMUL_PRECISION`` from "high" to the backend's bf16 default would
have passed all 210 CPU tests while costing ~100x in force error).

Run:  UF3_TPU_TESTS=1 python -m pytest tests/test_tpu_numerics.py -m tpu -q

Every test skips unless the default jax backend is a non-CPU device
(the main suite forces CPU, so these collect as skipped there).

Tolerances and their provenance:

  * fused f32 forces vs f64 oracle: max |df| <= 2e-4 eV/A.  The
    documented "high" (bf16_3x) trio-contraction precision measures
    5.5e-5 max on the bench model (uf3_tpu/ops/pallas_trio.py:40-45);
    2e-4 gives ~4x headroom while staying ~50x below the bf16
    failure mode (8.8e-3).  The reference package's own oracle is
    f64-only (uf3/forcefield/calculator.py), so 1e-6 eV/A -- the f64
    cross-implementation target pinned by tests/test_calculator.py --
    is not reachable in f32; this tier pins the f32 contract instead.
  * deliberate precision regression must FAIL: the same comparison
    with the trio contraction forced to the TPU bf16 matmul default
    must exceed the tolerance, proving the assertion has teeth.
  * NVE drift: |dE|/atom <= 2e-4 eV over 216 steps -- the MD
    engine's documented drift criterion (docs/md_engine.md).
  * pack cell-list vs O(N^2) builder: identical pair sets on device.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uf3_tpu.data.atoms import bulk
from uf3_tpu.forcefield.calculator import UFCalculator
from uf3_tpu.forcefield.md import MDSystem
from uf3_tpu.ops import neighbors as nb
from uf3_tpu.regression import least_squares as ls

requires_tpu = pytest.mark.skipif(
    os.environ.get("UF3_TPU_TESTS") != "1"
    or jax.devices()[0].platform == "cpu",
    reason="device tier: set UF3_TPU_TESTS=1 with an accelerator")

MODEL = os.path.join(os.path.dirname(__file__), "..",
                     "benchmarks_data", "model_2and3.json")
FORCE_TOL = 2e-4   # eV/A, see module docstring


@pytest.fixture(scope="module")
def model():
    return ls.WeightedLinearModel.from_json(MODEL)


@pytest.fixture(scope="module")
def geom():
    g = bulk("W", "bcc", a=3.1652) * (6, 6, 6)
    g.rattle(0.05, seed=3)
    return g


def _device_forces(model, geom, **kw):
    system = MDSystem(model, geom, dtype=jnp.float32, **kw)
    state = system.init_state()
    _, forces, _ = system.energy_forces(
        state.positions, state.nbr2, state.nbr3)
    return np.asarray(jax.block_until_ready(forces))


@pytest.mark.tpu
@requires_tpu
class TestDeviceNumerics:
    def test_f32_forces_vs_f64_oracle(self, model, geom):
        """Fused f32 device forces within 2e-4 eV/A of the host f64
        calculator on a 432-atom rattled bcc cell."""
        calc = UFCalculator(model)
        f_ref = np.asarray(calc.get_forces(geom))
        f_dev = _device_forces(model, geom)
        err = np.max(np.abs(f_dev - f_ref))
        assert err <= FORCE_TOL, f"max force error {err:.3e} eV/A"
        # representative magnitudes, not a degenerate configuration
        assert np.max(np.abs(f_ref)) > 0.1

    def test_precision_regression_fails(self, model, geom):
        """Forcing the trio grid contraction to the TPU bf16 matmul
        default must EXCEED the tolerance -- the guard that makes
        test_f32_forces_vs_f64_oracle able to catch a dropped
        MATMUL_PRECISION."""
        from uf3_tpu.ops import pallas_trio as pt
        calc = UFCalculator(model)
        f_ref = np.asarray(calc.get_forces(geom))
        saved = pt.MATMUL_PRECISION
        try:
            pt.MATMUL_PRECISION = None   # backend default: bf16 inputs
            jax.clear_caches()
            f_low = _device_forces(model, geom)
        finally:
            pt.MATMUL_PRECISION = saved
            jax.clear_caches()
        err_low = np.max(np.abs(f_low - f_ref))
        assert err_low > FORCE_TOL, (
            f"bf16 regression not detectable: {err_low:.3e} <= "
            f"{FORCE_TOL}; the force tolerance has lost its teeth")

    def test_nve_drift(self, model):
        """216 NVE steps at the bench r-RESPA configuration drift
        less than 2e-4 eV/atom on device."""
        g = bulk("W", "bcc", a=3.1652) * (8, 8, 8)
        system = MDSystem(model, g, dtype=jnp.float32,
                          rebuild_every=27, skin=0.5, skin_2b=1.2,
                          capacity_2b=72, capacity_3b=16,
                          n_respa=9, respa_mid=3)
        state = system.init_state(temperature=300.0, seed=0)
        # equilibrate off the perfect-lattice transient first (the
        # documented drift criterion is for equilibrated dynamics,
        # validate_respa_mid.json protocol); then measure NVE
        state = system.run(state, n_steps=108, dt_fs=2.0,
                           thermostat="langevin", temperature=300.0)
        e0 = (float(state.energy) + system.kinetic_energy(state))
        state = system.run(state, n_steps=216, dt_fs=2.0)
        assert not system.overflowed(state)
        e1 = (float(state.energy) + system.kinetic_energy(state))
        drift = abs(e1 - e0) / len(g)
        assert drift <= 2e-4, f"NVE drift {drift:.2e} eV/atom"

    def test_pack_cell_list_matches_dense(self, model):
        """The prefix-sum pack cell-list builder and the O(N^2)
        builder select identical pair sets on device."""
        g = bulk("W", "bcc", a=3.1652) * (7, 7, 7)
        g.rattle(0.03, seed=1)
        pos = jnp.asarray(g.get_positions(), dtype=jnp.float32)
        cell = jnp.asarray(g.get_cell(), dtype=jnp.float32)
        pbc = (True, True, True)
        r_cut, cap = 6.7, 88
        grid_shape = nb.grid_shape_for(g.get_cell(), r_cut, pbc)
        topology = nb.bin_topology(grid_shape, pbc)
        # bin capacity from measured occupancy (as MDSystem sizes it):
        # a 7x7x7 supercell at this cutoff gives only 3x3x3 bins of
        # ~25 atoms each
        frac = (g.get_positions()
                @ np.linalg.inv(np.asarray(g.get_cell())))
        frac -= np.floor(frac)
        coord = np.clip((frac * grid_shape).astype(int), 0,
                        np.asarray(grid_shape) - 1)
        bid = ((coord[:, 0] * grid_shape[1] + coord[:, 1])
               * grid_shape[2] + coord[:, 2])
        bin_cap = int(np.bincount(bid).max() * 1.3) + 2
        dense = jax.block_until_ready(nb.build_neighbor_list(
            pos, cell, pbc, r_cut, cap, with_rev=False))
        cells = jax.block_until_ready(nb.build_neighbor_list_cells(
            pos, cell, pbc, r_cut, cap, grid_shape, bin_cap, topology,
            with_rev=False, assume_wrapped=True))
        assert not bool(dense.overflow) and not bool(cells.overflow)

        def pair_set(nbr):
            idx = np.asarray(nbr.idx)
            shift = np.asarray(nbr.shift).astype(int)
            mask = np.asarray(nbr.mask)
            rows = np.repeat(np.arange(idx.shape[0]), idx.shape[1])
            flat = np.stack([rows, idx.reshape(-1)]
                            + [shift[..., c].reshape(-1)
                               for c in range(3)], axis=1)
            return set(map(tuple, flat[mask.reshape(-1)]))

        assert pair_set(dense) == pair_set(cells)
