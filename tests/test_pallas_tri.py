"""Fused Mosaic inner-step kernel (ops/pallas_tri.py) equivalence:
interpret-mode execution against the XLA trio_short_forces path on a
small thermalized tungsten cell, covering all role/reduce kernel
variants.  (The kernel's on-hardware timing lives in
benchmarks/probe_tri_kernel.py; this pins correctness in CI.)"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uf3_tpu.data.atoms import bulk
from uf3_tpu.forcefield.md import MDSystem
from uf3_tpu.ops import pallas_tri as ptk
from uf3_tpu.ops import pallas_trio as pt
from uf3_tpu.regression import least_squares as ls


@pytest.fixture(scope="module")
def fused_setup():
    model = ls.WeightedLinearModel.from_json(
        os.path.join("benchmarks_data", "model_2and3.json"))
    geom = bulk("W", "bcc", a=3.1652) * (3, 3, 3)
    geom.rattle(0.06, seed=4)
    system = MDSystem(model, geom, dtype=jnp.float32, skin=0.5,
                      skin_2b=1.2, capacity_2b=72, capacity_3b=16,
                      n_respa=6)
    state = system.init_state(temperature=300.0, seed=0)
    st = ptk.build_tri_statics(model, system.respa_switch)
    return system, state, st


def _xla_reference(system, state):
    spec_pair, pair_coeff = system.pair_fast
    tb = system.trio_bundle
    r_lo, r_hi = system.respa_switch
    return pt.trio_short_forces(
        pair_coeff, tb.grid, state.positions, state.cell, state.nbr3,
        spec_pair=spec_pair, n_basis_pair=spec_pair.n_basis,
        spec_l=tb.spec_l, spec_n=tb.spec_n, l_basis=tb.l_basis,
        n_basis=tb.n_basis, with_energy=True, active_bc=tb.active_bc,
        window=tb.window, r_lo=r_lo, r_hi=r_hi)


def test_fused_kernel_matches_xla_interpret(fused_setup):
    system, state, st = fused_setup
    e2_ref, e3_ref, f_ref = _xla_reference(system, state)
    e2, e3, f = ptk.trio_short_forces_fused(
        st, state.positions, state.cell, state.nbr3,
        with_energy=True, interpret=True)
    f_scale = float(jnp.max(jnp.abs(f_ref)))
    assert f_scale > 0.1          # thermalized: real forces
    assert np.allclose(float(e2), float(e2_ref), rtol=1e-4, atol=1e-3)
    assert np.allclose(np.asarray(e3), np.asarray(e3_ref), atol=1e-4)
    assert float(jnp.max(jnp.abs(f - f_ref))) < 1e-4 * f_scale


@pytest.mark.parametrize("role,red", [("gather", "slices"),
                                      ("concat", "matmul"),
                                      ("concat", "slices")])
def test_kernel_variants_match_default(fused_setup, role, red):
    system, state, st = fused_setup
    cache3 = pt.build_trio_cache(state.nbr3, state.cell, jnp.float32)
    pj = pt.gather_rows_blocks(state.positions, cache3.idx_flats,
                               state.positions.shape[0])
    comps = tuple(pj[..., c] + cache3.sd[c]
                  - state.positions[:, c][:, None] for c in range(3))
    h0, p0 = ptk.tri_inner_map(comps, cache3.valid, st,
                               block_atoms=64, interpret=True)
    h, p = ptk.tri_inner_map(comps, cache3.valid, st, block_atoms=64,
                             role_impl=role, reduce_impl=red,
                             interpret=True)
    assert np.allclose(np.asarray(h), np.asarray(h0), atol=2e-4)
    assert np.allclose(np.asarray(p), np.asarray(p0), atol=2e-4)
