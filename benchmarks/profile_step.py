"""
Per-phase MD step profiler (TPU): decomposes the fused 2+3-body step
into gather / spline-math / selection / assembly phases and times each
on the real chip, plus microbenchmarks of candidate gather strategies.
Drives the VERDICT-r2 item-3 work: find where the 3.4 ms step goes and
what the speed-of-light for each phase is.

Usage: python benchmarks/profile_step.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        REPO, ".jax_cache")
    os.environ.setdefault(
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    os.execv(sys.executable, [sys.executable] + sys.argv)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, REPO)

from uf3_tpu.data.atoms import bulk  # noqa: E402
from uf3_tpu.forcefield.md import MDSystem  # noqa: E402
from uf3_tpu.ops import pallas_trio as pt  # noqa: E402
from uf3_tpu.regression import least_squares as ls  # noqa: E402


def timeit_ms(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    model = ls.WeightedLinearModel.from_json(
        os.path.join(REPO, "benchmarks_data", "model_2and3.json"))
    geom = bulk("W", "bcc", a=3.1652) * (17, 17, 17)
    n = len(geom)
    dtype = jnp.float32
    system = MDSystem(model, geom, dtype=dtype, rebuild_every=18,
                      skin=0.5, skin_2b=1.2, capacity_2b=72,
                      capacity_3b=16, n_respa=1)
    state = system.init_state(temperature=300.0, seed=0)
    state = system.run(state, n_steps=90, dt_fs=2.0,
                       thermostat="langevin", temperature=300.0)
    jax.block_until_ready(state.positions)

    x, nbr2, nbr3, cell = (state.positions, state.nbr2, state.nbr3,
                           state.cell)
    cache2 = pt.build_pair_cache(nbr2.idx, nbr2.shift, nbr2.mask,
                                 cell, dtype)
    cache3 = pt.build_trio_cache(nbr3, cell, dtype)
    spec, coeff = system.pair_fast
    tb = system.trio_bundle
    k2 = nbr2.idx.shape[1]
    k3 = nbr3.idx.shape[1]

    out = {}

    # ---- neighbor-index locality stats (host) ------------------------
    idx2 = np.asarray(nbr2.idx)
    mask2 = np.asarray(nbr2.mask)
    delta = np.abs(idx2 - np.arange(n)[:, None])
    delta = np.where(mask2, delta, 0)
    # wrapped distance on the ring of N indices
    delta = np.minimum(delta, n - delta)
    out["idx_delta_p50"] = int(np.percentile(delta[mask2], 50))
    out["idx_delta_p99"] = int(np.percentile(delta[mask2], 99))
    out["idx_delta_max"] = int(delta.max())

    # ---- phase: the (N, K2) gather + displacements -------------------
    @jax.jit
    def gather2(x):
        pj = pt.gather_rows_blocks(x, cache2.idx_flats, n)
        return tuple(pj[..., c] + cache2.sd[c] - x[:, c][:, None]
                     for c in range(3))

    comps2 = jax.block_until_ready(gather2(x))
    out["gather2_ms"] = timeit_ms(gather2, x)

    # ---- phase: pair spline math given comps -------------------------
    @jax.jit
    def pair_math(comps2):
        r2sq = comps2[0]**2 + comps2[1]**2 + comps2[2]**2
        r = jnp.sqrt(jnp.where(r2sq > 0, r2sq, 1.0))
        valid = (cache2.valid
                 * (r > spec.t_min).astype(dtype)
                 * (r < spec.t_max).astype(dtype))
        _, dv = pt._pair_chain(r, spec, coeff, spec.n_basis, False)
        w = 2.0 * dv * valid / r
        return jnp.stack([jnp.sum(w * dc, axis=1) for dc in comps2],
                         axis=-1)

    out["pair_math_ms"] = timeit_ms(pair_math, comps2)

    # ---- phase: trio select from pair rows ---------------------------
    sel = nbr3.sel.astype(jnp.int32)

    @jax.jit
    def select3(comps2):
        return pt.select_minor(comps2, sel, k2)

    comps3 = jax.block_until_ready(select3(comps2))
    out["select3_ms"] = timeit_ms(select3, comps2)

    # ---- phase: direct (N, K3) gather (respa-inner style) ------------
    @jax.jit
    def gather3(x):
        pj = pt.gather_rows_blocks(x, cache3.idx_flats, n)
        return tuple(pj[..., c] + cache3.sd[c] - x[:, c][:, None]
                     for c in range(3))

    out["gather3_ms"] = timeit_ms(gather3, x)

    # ---- phase: trio block math given comps3 -------------------------
    @jax.jit
    def trio_math(comps3):
        block_atoms = 512
        pad = (-n) % block_atoms

        def blocks(a):
            return jnp.pad(a, ((0, pad), (0, 0))).reshape(
                -1, block_atoms, a.shape[1])

        c_blocks = tuple(blocks(dc) for dc in comps3)
        m_blocks = blocks(cache3.valid)
        p_blocks = blocks(cache3.pair_pre)

        def block_fn(args):
            cx, cy, cz, m_b, p_b = args
            energy, fc, s1, s3, v3 = pt._trio_block_compute(
                (cx, cy, cz), m_b, tb.grid, tb.spec_l, tb.spec_n,
                tb.l_basis, tb.n_basis, with_energy=False,
                active_bc=tb.active_bc, window=tb.window,
                pair_pre=p_b)
            return (energy, jnp.stack(fc, axis=-1),
                    pt._pack_partials(s1, s3, v3))

        return jax.lax.map(block_fn,
                           c_blocks + (m_blocks, p_blocks))

    trio_out = jax.block_until_ready(trio_math(comps3))
    out["trio_math_ms"] = timeit_ms(trio_math, comps3)

    # ---- phase: assembly (rev gather + reduce) ------------------------
    @jax.jit
    def assemble(trio_out, comps3):
        energy, f_center, packed = trio_out
        r3sq = comps3[0]**2 + comps3[1]**2 + comps3[2]**2
        r3 = jnp.sqrt(jnp.where(r3sq > 0, r3sq, 1.0))
        energy = energy.reshape(-1)[:n]
        f_center = f_center.reshape(-1, 3)[:n]
        packed = packed.reshape(-1, k3 * 8)[:n]
        return pt._assemble_forces(energy, f_center, packed, comps3,
                                   r3, cache3)

    out["assemble_ms"] = timeit_ms(assemble, trio_out, comps3)

    # ---- full fused step for reference --------------------------------
    @jax.jit
    def fused(x):
        _, f, _ = system.energy_forces(x, nbr2, nbr3,
                                       with_energy=False,
                                       cache2=cache2, cache3=cache3)
        return f

    out["fused_ms"] = timeit_ms(fused, x)

    # ---- gather variants ----------------------------------------------
    @jax.jit
    def gather2_2d(x):
        return x.at[nbr2.idx].get(mode="promise_in_bounds")

    out["gather2_one2d_ms"] = timeit_ms(gather2_2d, x)

    # per-component flat takes, one take per component over all K at once
    flat_all = nbr2.idx.T.reshape(-1)

    @jax.jit
    def gather2_flat(x):
        cols = [x[:, c].at[flat_all].get(mode="promise_in_bounds")
                for c in range(3)]
        return cols

    out["gather2_flatcomp_ms"] = timeit_ms(gather2_flat, x)

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
