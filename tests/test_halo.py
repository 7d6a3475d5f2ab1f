"""
Halo-exchange (slab domain decomposition) MD on the virtual 8-device
CPU mesh: the decomposition round-trips, the halo trajectory matches
the single-device fused path exactly, and the compiled step's
collectives carry O(halo) bytes -- not O(N) -- pinned at the HLO level.

Reference scope: the upstream package has no distributed MD at all
(uf3/forcefield/lammps.py delegates to LAMMPS); SURVEY §5 specifies
"atom-sharded MD state ... neighbor halos via collective permutes".
"""

import os
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uf3_tpu.data.atoms import bulk
from uf3_tpu.forcefield import units
from uf3_tpu.forcefield.md import MDSystem
from uf3_tpu.parallel import halo
from uf3_tpu.parallel import mesh as pmesh
from uf3_tpu.regression import least_squares as ls

N_SHARDS = 4


@pytest.fixture(scope="module")
def mesh4():
    if len(jax.devices()) < N_SHARDS:
        pytest.skip("needs virtual devices")
    return pmesh.make_mesh(N_SHARDS)


@pytest.fixture(scope="module")
def setup():
    model = ls.WeightedLinearModel.from_json(
        os.path.join("benchmarks_data", "model_2and3.json"))
    # slab width (25.3 / 4 = 6.3 A) must exceed the halo width
    # (r_cut + skin = 6.0 A); the 12.7 A cross-section satisfies the
    # minimum-image requirement at the 5.5 A 2-body cutoff
    geom = bulk("W", "bcc", a=3.1652) * (4, 4, 8)   # 256 atoms
    geom.rattle(0.05, seed=3)
    system = MDSystem(model, geom, dtype=jnp.float64,
                      capacity_2b=64, capacity_3b=16)
    dec = halo.decompose(
        geom.get_positions(), geom.get_cell(), N_SHARDS,
        r_cut_2b=float(system.r_cut_2b),
        r_cut_3b=float(system.r_cut_3b),
        skin=float(system.skin), capacity_2b=64, capacity_3b=16,
        masses=np.asarray(system.masses))
    return model, geom, system, dec


def test_decompose_roundtrip(setup):
    _, geom, system, dec = setup
    n = len(geom)
    # every atom owned exactly once
    gids = dec.own_gid[dec.own_mask]
    assert sorted(gids.tolist()) == list(range(n))
    x = halo.gather_positions(dec, dec.x_own, n)
    # decompose wraps positions into the cell
    frac = geom.get_positions() @ np.linalg.inv(geom.get_cell())
    x_ref = (frac - np.floor(frac)) @ geom.get_cell()
    assert np.allclose(x, x_ref, atol=1e-12)


def test_halo_forces_and_energy_match_single_device(setup, mesh4):
    _, geom, system, dec = setup
    n = len(geom)
    x_glob = jnp.asarray(halo.gather_positions(dec, dec.x_own, n))
    nbr2, nbr3 = system.build_lists(x_glob, wrapped=True)
    e_ref, f_ref, _ = system.energy_forces(x_glob, nbr2, nbr3)

    chunk, shard = halo.halo_md_step_factory(system, mesh4, n_steps=0)
    dec_dev = shard(dec)
    v0 = shard(np.zeros(dec.x_own.shape))
    x_own, v, f_own, energy, stale = chunk(
        dec_dev, shard(dec.x_own), v0,
        jnp.asarray(0.0, dtype=jnp.float64))
    assert np.isclose(float(energy), float(e_ref), rtol=1e-10)
    assert not bool(stale)
    f = halo.gather_positions(dec, f_own, n)
    assert np.max(np.abs(f - np.asarray(f_ref))) < 1e-9


def test_halo_virial_matches_single_device(setup, mesh4):
    """Sharded stress through the fused path: per-center virial terms
    are owner-weighted in the kernels and psummed, so the halo chunk's
    Voigt virial equals the single-device fused virial exactly (the
    input sharded NPT needs; no oracle fallback)."""
    from uf3_tpu.ops import pallas_trio as pt
    _, geom, system, dec = setup
    n = len(geom)
    x_glob = jnp.asarray(halo.gather_positions(dec, dec.x_own, n))
    nbr2, nbr3 = system.build_lists(x_glob, wrapped=True)
    e_ref, f_ref, v_ref = system.energy_forces(x_glob, nbr2, nbr3,
                                               with_virial=True)
    v_ref6 = np.array([np.asarray(v_ref)[a, b] for a, b in
                       pt.VOIGT_AB])

    chunk, shard = halo.halo_md_step_factory(system, mesh4, n_steps=0,
                                             with_virial=True)
    _, _, _, energy, virial, stale = chunk(
        shard(dec), shard(dec.x_own), shard(np.zeros(dec.x_own.shape)),
        jnp.asarray(0.0, dtype=jnp.float64))
    assert not bool(stale)
    assert np.isclose(float(energy), float(e_ref), rtol=1e-10)
    assert np.allclose(np.asarray(virial), v_ref6, atol=1e-9)


def test_halo_trajectory_matches_single_device(setup, mesh4):
    _, geom, system, dec = setup
    n = len(geom)
    n_steps = 5
    dt = jnp.asarray(1.0 * units.fs, dtype=jnp.float64)
    x = jnp.asarray(halo.gather_positions(dec, dec.x_own, n))
    rng = np.random.RandomState(11)
    v0 = rng.normal(scale=5e-4, size=(n, 3))
    nbr2, nbr3 = system.build_lists(x, wrapped=True)
    m = system.masses[:, None]
    v = jnp.asarray(v0)
    _, f, _ = system.energy_forces(x, nbr2, nbr3, with_energy=False)
    for _ in range(n_steps):
        v = v + 0.5 * dt * f / m
        x = x + dt * v
        _, f, _ = system.energy_forces(x, nbr2, nbr3,
                                       with_energy=False)
        v = v + 0.5 * dt * f / m

    chunk, shard = halo.halo_md_step_factory(system, mesh4,
                                             n_steps=n_steps)
    x_own, v_own, _, _, stale = chunk(
        shard(dec), shard(dec.x_own),
        shard(halo.scatter_velocities(dec, v0)), dt)
    assert not bool(stale)
    x_h = halo.gather_positions(dec, x_own, n)
    v_h = halo.gather_positions(dec, v_own, n)
    assert np.max(np.abs(x_h - np.asarray(x))) < 1e-9
    assert np.max(np.abs(v_h - np.asarray(v))) < 1e-11


def test_halo_respa_trajectory_matches_single_device(setup, mesh4):
    """3-level r-RESPA halo chunk vs the same split integrated on the
    global lists single-device: identical trajectories (validates the
    per-level halo exchanges and owner weighting, the halo-specific
    machinery)."""
    from uf3_tpu.ops import pallas_trio as pt
    _, geom, system, dec = setup
    n = len(geom)
    n_steps, n_respa, respa_mid = 6, 3, 3
    dt = jnp.asarray(1.0 * units.fs, dtype=jnp.float64)
    r_hi = float(system.r_cut_3b)
    r_lo = r_hi - 0.5
    x = jnp.asarray(halo.gather_positions(dec, dec.x_own, n))
    rng = np.random.RandomState(12)
    v0 = rng.normal(scale=5e-4, size=(n, 3))
    nbr2, nbr3 = system.build_lists(x, wrapped=True)
    m = system.masses[:, None]
    spec_pair, pair_coeff = system.pair_fast
    tb = system.trio_bundle

    def f_short(x):
        _, f = pt.pair_forces_unrolled(
            pair_coeff, x, system.cell, nbr3.idx, nbr3.shift,
            nbr3.mask, spec=spec_pair, n_basis=spec_pair.n_basis,
            with_energy=False, switch=("short", r_lo, r_hi))
        return f

    def f_trio(x):
        _, f = pt.trio_forces_unrolled(
            tb.grid, x, system.cell, nbr3.idx, nbr3.shift, nbr3.mask,
            nbr3.rev, spec_l=tb.spec_l, spec_n=tb.spec_n,
            l_basis=tb.l_basis, n_basis=tb.n_basis,
            with_energy=False, active_bc=tb.active_bc,
            window=tb.window, triangle=tb.symmetric)
        return f

    def f_tail_fn(x):
        _, f = pt.pair_forces_unrolled(
            pair_coeff, x, system.cell, nbr2.idx, nbr2.shift,
            nbr2.mask, spec=spec_pair, n_basis=spec_pair.n_basis,
            with_energy=False, switch=("tail", r_lo, r_hi))
        return f

    v = jnp.asarray(v0)
    fp, fm, ft = f_short(x), f_trio(x), f_tail_fn(x)
    dt_mid, dt_out = dt * respa_mid, dt * n_respa
    for _ in range(n_steps // n_respa):
        v = v + 0.5 * dt_out * ft / m
        for _ in range(n_respa // respa_mid):
            v = v + 0.5 * dt_mid * fm / m
            for _ in range(respa_mid):
                v = v + 0.5 * dt * fp / m
                x = x + dt * v
                fp = f_short(x)
                v = v + 0.5 * dt * fp / m
            fm = f_trio(x)
            v = v + 0.5 * dt_mid * fm / m
        ft = f_tail_fn(x)
        v = v + 0.5 * dt_out * ft / m

    chunk, shard = halo.halo_md_step_factory(
        system, mesh4, n_steps=n_steps, n_respa=n_respa,
        respa_mid=respa_mid)
    x_own, v_own, _, _, stale = chunk(
        shard(dec), shard(dec.x_own),
        shard(halo.scatter_velocities(dec, v0)), dt)
    assert not bool(stale)
    x_h = halo.gather_positions(dec, x_own, n)
    v_h = halo.gather_positions(dec, v_own, n)
    assert np.max(np.abs(x_h - np.asarray(x))) < 1e-9
    assert np.max(np.abs(v_h - np.asarray(v))) < 1e-11


def test_halo_respa_collectives_stay_halo_sized(setup, mesh4):
    """The r-RESPA halo chunk also never all-gathers and keeps every
    collective-permute at (C_halo, 3)."""
    _, geom, system, dec = setup
    c_halo = dec.send_left.shape[1]
    chunk, shard = halo.halo_md_step_factory(
        system, mesh4, n_steps=6, n_respa=3, respa_mid=3)
    args = (shard(dec), shard(dec.x_own),
            shard(np.zeros(dec.x_own.shape)),
            jnp.asarray(1.0 * units.fs, dtype=jnp.float64))
    hlo = jax.jit(chunk).lower(*args).compile().as_text()
    assert "all-gather" not in hlo
    perm_sizes = _collective_shapes(hlo, "collective-permute")
    assert perm_sizes
    for size in perm_sizes:
        assert size <= c_halo * 3


def _collective_shapes(hlo_text, op):
    """All result shapes of a collective op in HLO text, as element
    counts."""
    counts = []
    for m in re.finditer(rf"(\S+)\s*=\s*\S+\s+{op}\(", hlo_text):
        line = hlo_text[m.start():hlo_text.index("\n", m.start())]
        shapes = re.findall(r"f\d+\[([\d,]*)\]", line.split("=")[1]
                            .split(op)[0])
        for s in shapes:
            dims = [int(d) for d in s.split(",") if d]
            counts.append(int(np.prod(dims)) if dims else 1)
    return counts


def test_halo_collectives_scale_with_halo_not_n(setup, mesh4):
    """HLO audit: the compiled halo step contains no all-gather, and
    every collective-permute moves (C_halo, 3) rows -- independent of
    the total atom count."""
    _, geom, system, dec = setup
    n = len(geom)
    c_halo = dec.send_left.shape[1]
    chunk, shard = halo.halo_md_step_factory(system, mesh4, n_steps=2)
    args = (shard(dec), shard(dec.x_own),
            shard(np.zeros(dec.x_own.shape)),
            jnp.asarray(1.0 * units.fs, dtype=jnp.float64))
    hlo = jax.jit(chunk).lower(*args).compile().as_text()
    assert "all-gather" not in hlo, "halo step must not all-gather"
    perm_sizes = _collective_shapes(hlo, "collective-permute")
    assert perm_sizes, "expected collective-permutes in the halo step"
    for size in perm_sizes:
        assert size <= c_halo * 3, (
            f"collective-permute moves {size} elements; "
            f"halo bound is {c_halo * 3} (N would be {n * 3})")
    # the only all-reduce is the scalar energy psum
    ar_sizes = _collective_shapes(hlo, "all-reduce")
    assert all(size == 1 for size in ar_sizes), ar_sizes


def test_halo_stale_flags_skin_violation(setup, mesh4):
    """Drifting any owned atom past half the Verlet skin must raise
    the replicated stale flag (the signal to re-decompose)."""
    _, geom, system, dec = setup
    chunk, shard = halo.halo_md_step_factory(system, mesh4, n_steps=0)
    x0 = np.array(dec.x_own)
    s0 = np.argmax(dec.own_mask.sum(axis=1))
    slot = int(np.argmax(dec.own_mask[s0]))
    x0[s0, slot, 0] += 0.51 * float(system.skin)
    _, _, _, _, stale = chunk(
        shard(dec), shard(x0), shard(np.zeros(x0.shape)),
        jnp.asarray(0.0, dtype=jnp.float64))
    assert bool(stale)
