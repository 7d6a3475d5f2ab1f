"""
Round-4 step anatomy at the bench state: net per-call cost of every
candidate inner-loop component (scan-null subtracted), to budget the
3-level r-RESPA split (short pair / trio map / pair tail) and the
gather walls.
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

SCAN_LEN = 30


def chain_ms(fn, x0, repeats=3):
    @jax.jit
    def loop(x):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, x, None, length=SCAN_LEN)
        return out

    jax.block_until_ready(loop(x0))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x0))
        best = min(best, time.perf_counter() - t0)
    return best / SCAN_LEN * 1e3


def main():
    model = ls.WeightedLinearModel.from_json(
        os.path.join(REPO, "benchmarks_data", "model_2and3.json"))
    geom = bulk("W", "bcc", a=3.1652) * (17, 17, 17)
    system = MDSystem(model, geom, dtype=jnp.float32,
                      rebuild_every=24, skin=0.5, skin_2b=1.2,
                      capacity_2b=72, capacity_3b=16, n_respa=6)
    state = system.init_state(temperature=300.0, seed=0)
    state = system.run(state, n_steps=48, dt_fs=2.0,
                       thermostat="langevin", temperature=300.0)
    x0 = state.positions
    n = x0.shape[0]
    cell = state.cell
    nbr2, nbr3 = state.nbr2, state.nbr3
    cache2 = pt.build_pair_cache(nbr2.idx, nbr2.shift, nbr2.mask,
                                 cell, jnp.float32)
    cache3 = pt.build_trio_cache(nbr3, cell, jnp.float32)
    spec, coeff = system.pair_fast
    tb = system.trio_bundle
    r_lo, r_hi = system.respa_switch
    eps = jnp.float32(1e-30)
    results = {"n_atoms": n, "k2": int(nbr2.idx.shape[1]),
               "k3": int(nbr3.idx.shape[1])}
    res = {}

    null = chain_ms(lambda x: x * (1 + eps), x0)
    results["scan_null_ms"] = round(null, 4)

    def add(name, fn, x0=x0):
        try:
            ms = chain_ms(fn, x0)
            res[name] = round(ms - null, 4)
            print(name, res[name], flush=True)
        except Exception as e:  # noqa: BLE001
            res[name] = repr(e)[:160]
            print(name, "ERROR", flush=True)

    # 1. (N, K3) position gather
    def pos_gather3(x):
        pj = pt.gather_rows_blocks(x, cache3.idx_flats, n)
        return x + eps * pj[:, 0, :]
    add("pos_gather_k3", pos_gather3)

    # 2. (N, K2) position gather
    def pos_gather2(x):
        pj = pt.gather_rows_blocks(x, cache2.idx_flats, n)
        return x + eps * pj[:, 0, :]
    add("pos_gather_k2", pos_gather2)

    # 3. gather + comps (the shared front of every force eval)
    def comps3(x):
        pj = pt.gather_rows_blocks(x, cache3.idx_flats, n)
        cc = tuple(pj[..., c] + cache3.sd[c] - x[:, c][:, None]
                   for c in range(3))
        return x + eps * jnp.stack([c[:, 0] for c in cc], axis=-1)
    add("comps_k3", comps3)

    # 4. L0 candidate: switched short pair forces on the K3 rows
    #    (row-local: NO assembly gather)
    def short_pair(x):
        pj = pt.gather_rows_blocks(x, cache3.idx_flats, n)
        cc = tuple(pj[..., c] + cache3.sd[c] - x[:, c][:, None]
                   for c in range(3))
        r2 = cc[0] ** 2 + cc[1] ** 2 + cc[2] ** 2
        r = jnp.sqrt(jnp.where(r2 > 0, r2, 1.0))
        valid = (cache3.valid
                 * (r > spec.t_min).astype(r.dtype)
                 * (r < spec.t_max).astype(r.dtype))
        v2, dv2 = pt._pair_chain(r, spec, coeff, spec.n_basis, False)
        s, ds = pt._switch_poly(r, r_lo, r_hi)
        w = 2.0 * (dv2 * s + v2 * ds) * valid / r
        f = jnp.stack([jnp.sum(w * dc, axis=1) for dc in cc], axis=-1)
        return x + eps * f
    add("L0_short_pair_forces", short_pair)

    # 5. full current inner force (trio + switched pair + assembly)
    def inner_full(x):
        _, _, f = pt.trio_short_forces(
            coeff, tb.grid, x, cell, nbr3, spec_pair=spec,
            n_basis_pair=spec.n_basis, spec_l=tb.spec_l,
            spec_n=tb.spec_n, l_basis=tb.l_basis, n_basis=tb.n_basis,
            with_energy=False, active_bc=tb.active_bc,
            window=tb.window, r_lo=r_lo, r_hi=r_hi, cache3=cache3)
        return x + eps * f
    add("inner_trio_plus_pair", inner_full)

    # 5b. same with triangle lanes
    def inner_tri(x):
        _, _, f = pt.trio_short_forces(
            coeff, tb.grid, x, cell, nbr3, spec_pair=spec,
            n_basis_pair=spec.n_basis, spec_l=tb.spec_l,
            spec_n=tb.spec_n, l_basis=tb.l_basis, n_basis=tb.n_basis,
            with_energy=False, active_bc=tb.active_bc,
            window=tb.window, r_lo=r_lo, r_hi=r_hi, triangle=True,
            cache3=cache3)
        return x + eps * f
    add("inner_trio_triangle", inner_tri)

    # 6. trio map only (no gathers, no assembly): block compute on
    #    precomputed comps
    pj0 = pt.gather_rows_blocks(x0, cache3.idx_flats, n)
    comps0 = tuple(pj0[..., c] + cache3.sd[c] - x0[:, c][:, None]
                   for c in range(3))
    k3 = nbr3.idx.shape[1]
    pad = (-n) % 512

    def blocks(a):
        return jnp.pad(a, ((0, pad), (0, 0))).reshape(
            -1, 512, a.shape[1])
    m_blocks = blocks(cache3.valid)
    p_blocks = blocks(cache3.pair_pre)

    def map_only(c0, triangle):
        c_blocks = tuple(blocks(dc) for dc in (c0, comps0[1],
                                               comps0[2]))

        def block_fn(args):
            cx, cy, cz, m_b, p_b = args
            if triangle:
                out = pt._trio_block_compute_tri(
                    (cx, cy, cz), m_b, tb.grid, tb.spec_l, tb.spec_n,
                    tb.l_basis, tb.n_basis, with_energy=False,
                    active_bc=tb.active_bc, window=tb.window)
            else:
                out = pt._trio_block_compute(
                    (cx, cy, cz), m_b, tb.grid, tb.spec_l, tb.spec_n,
                    tb.l_basis, tb.n_basis, with_energy=False,
                    active_bc=tb.active_bc, window=tb.window,
                    pair_pre=p_b)
            _, f_center, s1, s3, v3 = out[:5]
            return (jnp.stack(f_center, axis=-1),
                    pt._pack_partials(s1, s3, v3))
        fc, packed = jax.lax.map(block_fn, c_blocks + (m_blocks,
                                                       p_blocks))
        return c0 + eps * (packed.reshape(-1, k3 * 8)[:n, :1]
                           + fc.reshape(-1, 3)[:n, :1])
    add("trio_map_only_pairlane", lambda c: map_only(c, False),
        x0=comps0[0])
    add("trio_map_only_triangle", lambda c: map_only(c, True),
        x0=comps0[0])

    # 7. assembly gather + reduce alone (packed rows fixed)
    packed0 = jnp.zeros((n, k3 * 8), jnp.float32)
    r3 = jnp.sqrt(jnp.maximum(
        comps0[0] ** 2 + comps0[1] ** 2 + comps0[2] ** 2, 1e-12))

    def assembly(p):
        e, f = pt._assemble_forces(
            jnp.zeros((n,), jnp.float32),
            (jnp.zeros((n,), jnp.float32),) * 3, p, comps0, r3,
            cache3)
        return p * (1 + eps) + eps * f[:, :1]
    add("assembly_gather_reduce", assembly, x0=packed0)

    # 8. tail on (N, K2): current chain vs poly table
    def tail_cur(x):
        _, f = pt.pair_tail_forces(
            coeff, x, cell, nbr2, spec_pair=spec,
            n_basis_pair=spec.n_basis, with_energy=False,
            r_lo=r_lo, r_hi=r_hi, cache2=cache2)
        return x + eps * f
    add("tail_forces_k2", tail_cur)

    # 9. bare integration glue: kick-drift-kick + langevin noise on
    #    (N, 3) state, no force eval
    m = system.masses[:, None]
    key0 = jax.random.key(0, impl="rbg")
    f0 = state.forces
    dt = jnp.float32(0.001)

    def glue(x):
        v = x * 0.0 + 0.01
        v = v + 0.5 * dt * f0 / m
        xx = x + dt * v
        c1 = jnp.exp(-dt)
        cn = jnp.sqrt((1 - c1 ** 2) * 0.02 / m)
        v = c1 * v + cn * jax.random.normal(key0, v.shape,
                                            dtype=v.dtype)
        from uf3_tpu.ops import neighbors as nb
        stale = nb.needs_rebuild(nbr3, xx, 0.5)
        return xx + eps * (v + stale.astype(xx.dtype))
    add("integration_glue", glue)

    results["net_ms"] = res
    print(json.dumps(results, indent=1))
    out_dir = os.path.join(REPO, "benchmarks_data", "artifacts")
    with open(os.path.join(out_dir, "probe_anatomy4.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
