"""
Per-phase MD step profile on the real accelerator: times the pair
kernel, trio kernel, raw gathers, and candidate variants in isolation
to direct optimization work (round-2 throughput push).

Usage: python benchmarks/profile_step.py [reps]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from uf3_tpu.data.atoms import bulk  # noqa: E402
from uf3_tpu.forcefield.md import MDSystem  # noqa: E402
from uf3_tpu.ops import pallas_trio as pt  # noqa: E402
from uf3_tpu.regression import least_squares as ls  # noqa: E402


def timeit(fn, *args, iters=50, warmup=2, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    model = ls.WeightedLinearModel.from_json(
        os.path.join(REPO, "benchmarks_data", "model_2and3.json"))
    geom = bulk("W", "bcc", a=3.1652) * (reps, reps, reps)
    n = len(geom)
    print(f"n_atoms = {n}, platform = {jax.devices()[0].platform}")
    dtype = jnp.float32
    system = MDSystem(model, geom, dtype=dtype, rebuild_every=18,
                      skin=0.5, skin_2b=1.2, capacity_2b=72,
                      capacity_3b=16)
    state = system.init_state(temperature=300.0, seed=0)
    state = system.run(state, n_steps=54, dt_fs=2.0,
                       thermostat="langevin", temperature=300.0)
    x = state.positions
    nbr2, nbr3 = state.nbr2, state.nbr3
    cell = state.cell

    cache2 = pt.build_pair_cache(nbr2.idx, nbr2.shift, nbr2.mask, cell,
                                 dtype)
    cache3 = pt.build_trio_cache(nbr3, cell, dtype)

    # full fused force step (as in the scan)
    @jax.jit
    def force_step(x):
        _, f, _ = system.energy_forces(x, nbr2, nbr3,
                                       with_energy=False,
                                       cache2=cache2, cache3=cache3)
        return f

    print(f"force step (pair+trio):    {timeit(force_step, x):7.3f} ms")

    # pair kernel alone
    spec, coeff = system.pair_fast

    @jax.jit
    def pair_only(x):
        _, f = pt.pair_forces_unrolled(
            coeff, x, cell, nbr2.idx, nbr2.shift, nbr2.mask,
            spec=spec, n_basis=spec.n_basis, with_energy=False,
            cache=cache2)
        return f

    print(f"pair kernel alone:         {timeit(pair_only, x):7.3f} ms")

    # pair poly variant
    if system.pair_poly is not None:
        pspec, ptable = system.pair_poly

        @jax.jit
        def pair_poly(x):
            _, f = pt.pair_forces_poly(
                ptable, x, cell, nbr2.idx, nbr2.shift, nbr2.mask,
                spec=pspec, with_energy=False)
            return f

        print(f"pair poly (no cache):      {timeit(pair_poly, x):7.3f} ms")

    # trio kernel alone
    tb = system.trio_bundle

    @jax.jit
    def trio_only(x):
        _, f = pt.trio_forces_unrolled(
            tb.grid, x, cell, nbr3.idx, nbr3.shift, nbr3.mask,
            nbr3.rev, spec_l=tb.spec_l, spec_n=tb.spec_n,
            l_basis=tb.l_basis, n_basis=tb.n_basis, with_energy=False,
            active_bc=tb.active_bc, window=tb.window, cache=cache3)
        return f

    print(f"trio kernel alone:         {timeit(trio_only, x):7.3f} ms")

    # raw gathers
    @jax.jit
    def gather2(x):
        return pt.gather_rows_blocks(x, cache2.idx_flats, n)

    @jax.jit
    def gather3(x):
        return pt.gather_rows_blocks(x, cache3.idx_flats, n)

    @jax.jit
    def gather_rev(packed):
        return pt.gather_rows_blocks(packed.reshape(-1, 8),
                                     cache3.rev_flats, n)

    k3 = nbr3.idx.shape[1]
    packed = jnp.zeros((n, k3 * 8), dtype)
    print(f"gather pair rows (N,{nbr2.idx.shape[1]}):   "
          f"{timeit(gather2, x):7.3f} ms")
    print(f"gather trio rows (N,{k3}):   {timeit(gather3, x):7.3f} ms")
    print(f"gather rev rows  (N,{k3},8): "
          f"{timeit(gather_rev, packed):7.3f} ms")

    # trio compute without the assembly gather: block compute only
    comps_full = None

    @jax.jit
    def trio_compute(x):
        pj = pt.gather_rows_blocks(x, cache3.idx_flats, n)
        comps = tuple(pj[..., c] + cache3.sd[c]
                      - x[:, c][:, None] for c in range(3))
        pad = (-n) % 512
        blocks = lambda a: jnp.pad(a, ((0, pad), (0, 0))).reshape(
            -1, 512, a.shape[1])
        c_blocks = tuple(blocks(dc) for dc in comps)
        m_blocks = blocks(cache3.valid)
        p_blocks = blocks(cache3.pair_pre)

        def block_fn(args):
            cx, cy, cz, m_b, p_b = args
            energy, f_center, s1, s3, v3 = pt._trio_block_compute(
                (cx, cy, cz), m_b, tb.grid, tb.spec_l, tb.spec_n,
                tb.l_basis, tb.n_basis, with_energy=False,
                active_bc=tb.active_bc, window=tb.window, pair_pre=p_b)
            return (energy, jnp.stack(f_center, axis=-1),
                    pt._pack_partials(s1, s3, v3))

        return jax.lax.map(block_fn, c_blocks + (m_blocks, p_blocks))

    print(f"trio compute (no assembly):{timeit(trio_compute, x):7.3f} ms")

    # shared-gather fused step + pieces
    if nbr3.sel is not None:
        @jax.jit
        def shared(x):
            e2, e3, f, _ = pt.pair_trio_forces_shared(
                coeff, tb.grid, x, cell, nbr2, nbr3,
                spec_pair=spec, n_basis_pair=spec.n_basis,
                spec_l=tb.spec_l, spec_n=tb.spec_n,
                l_basis=tb.l_basis, n_basis=tb.n_basis,
                with_energy=False, active_bc=tb.active_bc,
                window=tb.window, cache2=cache2, cache3=cache3)
            return f

        print(f"shared fused step:         {timeit(shared, x):7.3f} ms")

        k2 = nbr2.idx.shape[1]
        selj = nbr3.sel.astype(jnp.int32)

        @jax.jit
        def select_only(x):
            pj = pt.gather_rows_blocks(x, cache2.idx_flats, n)
            comps2 = tuple(pj[..., c] + cache2.sd[c]
                           - x[:, c][:, None] for c in range(3))
            return pt.select_minor(comps2, selj, k2)

        t_sel = timeit(select_only, x)
        print(f"gather72 + select16:       {t_sel:7.3f} ms")

    if system.n_respa > 1 or True:
        r_hi = float(system.r_cut_3b)
        r_lo = r_hi - 0.5

        @jax.jit
        def short(x):
            _, _, f = pt.trio_short_forces(
                coeff, tb.grid, x, cell, nbr3,
                spec_pair=spec, n_basis_pair=spec.n_basis,
                spec_l=tb.spec_l, spec_n=tb.spec_n,
                l_basis=tb.l_basis, n_basis=tb.n_basis,
                with_energy=False, active_bc=tb.active_bc,
                window=tb.window, r_lo=r_lo, r_hi=r_hi,
                cache3=cache3)
            return f

        @jax.jit
        def tail(x):
            _, f = pt.pair_tail_forces(
                coeff, x, cell, nbr2, spec_pair=spec,
                n_basis_pair=spec.n_basis, with_energy=False,
                r_lo=r_lo, r_hi=r_hi, cache2=cache2)
            return f

        print(f"respa inner (short):       {timeit(short, x):7.3f} ms")
        print(f"respa outer (tail):        {timeit(tail, x):7.3f} ms")


if __name__ == "__main__":
    main()
