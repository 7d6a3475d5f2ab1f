"""
Anatomy of the MD inner step: where each microsecond goes.

The RESPA inner step (trio_short_forces + velocity-Verlet + Langevin)
is the throughput floor of the MD engine -- the tail/rebuild costs
amortize, the inner step does not.  This script measures cumulative
prefixes of the step on the real device, each chained through a
lax.scan so remote-dispatch latency cancels:

    P_null  carry arithmetic only (scan baseline)
    P0      neighbor-position gather + displacements + r
    P1      P0 + switched short-range pair chain
    P2      P0 + trio block map (no cross-atom assembly)
    P3      P0 + trio map + packed rev-gather assembly  (= force eval)
    P4      P3 + pair chain + integration + Langevin    (= inner step)

plus a block_atoms sweep for the trio map, a VPU FMA speed-of-light
probe (to put the trio map's op count in context), and a feature
probe for in-kernel Pallas gathers.

Writes benchmarks_data/artifacts/anatomy_<commit>.json.
"""

import json
import os
import subprocess
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
from uf3_tpu.forcefield import units  # noqa: E402
from uf3_tpu.forcefield.md import MDSystem  # noqa: E402
from uf3_tpu.ops import pallas_trio as pt  # noqa: E402
from uf3_tpu.regression import least_squares as ls  # noqa: E402

SCAN_LEN = 30


def chain_ms(make_body, x0, repeats=3):
    """Time one scan-chained body: make_body() -> fn(x)->x'; returns
    ms per iteration, dispatch amortized over SCAN_LEN iterations."""
    fn = make_body()

    @jax.jit
    def loop(x):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, x, None, length=SCAN_LEN)
        return out

    jax.block_until_ready(loop(x0))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x0))
        best = min(best, time.perf_counter() - t0)
    return best / SCAN_LEN * 1e3


def main():
    platform = jax.devices()[0].platform
    model = ls.WeightedLinearModel.from_json(
        os.path.join(REPO, "benchmarks_data", "model_2and3.json"))
    geom = bulk("W", "bcc", a=3.1652) * (17, 17, 17)
    n = len(geom)
    dtype = jnp.float32 if platform != "cpu" else jnp.float64
    system = MDSystem(model, geom, dtype=dtype, rebuild_every=18,
                      skin=0.5, skin_2b=1.2, capacity_2b=72,
                      capacity_3b=16, n_respa=3)
    state = system.init_state(temperature=300.0, seed=0)
    state = system.run(state, n_steps=36, dt_fs=2.0,
                       thermostat="langevin", temperature=300.0)
    jax.block_until_ready(state.positions)
    assert not system.overflowed(state)

    x0 = state.positions
    nbr3, cell = state.nbr3, state.cell
    cache3 = pt.build_trio_cache(nbr3, cell, dtype)
    spec, coeff = system.pair_fast
    tb = system.trio_bundle
    r_lo, r_hi = system.respa_switch
    k3 = nbr3.idx.shape[1]
    masses = system.masses[:, None]
    dt = jnp.asarray(2.0 * units.fs, dtype=dtype)
    friction = 2.0 / units.ps

    def gather_comps(x):
        pj = pt.gather_rows_blocks(x, cache3.idx_flats, n)
        comps = tuple(pj[..., c] + cache3.sd[c] - x[:, c][:, None]
                      for c in range(3))
        r2 = comps[0] ** 2 + comps[1] ** 2 + comps[2] ** 2
        r = jnp.sqrt(jnp.where(r2 > 0, r2, 1.0))
        return comps, r

    def pair_short(comps, r):
        valid2 = (cache3.valid
                  * (r > spec.t_min).astype(dtype)
                  * (r < spec.t_max).astype(dtype))
        v2, dv2 = pt._pair_chain(r, spec, coeff, spec.n_basis, True)
        s, ds = pt._switch_poly(r, r_lo, r_hi)
        w_pair = 2.0 * (dv2 * s + v2 * ds) * valid2 / r
        return tuple(jnp.sum(w_pair * dc, axis=1) for dc in comps)

    def trio_map(comps, block_atoms):
        pad = (-n) % block_atoms

        def blocks(a):
            return jnp.pad(a, ((0, pad), (0, 0))).reshape(
                -1, block_atoms, a.shape[1])

        c_blocks = tuple(blocks(dc) for dc in comps)
        m_blocks = blocks(cache3.valid)
        p_blocks = blocks(cache3.pair_pre)

        def block_fn(args):
            cx, cy, cz, m_b, p_b = args
            energy, f_center, s1, s3, v3 = pt._trio_block_compute(
                (cx, cy, cz), m_b, tb.grid, tb.spec_l, tb.spec_n,
                tb.l_basis, tb.n_basis, with_energy=False,
                active_bc=tb.active_bc, window=tb.window,
                pair_pre=p_b)
            return (energy, jnp.stack(f_center, axis=-1),
                    pt._pack_partials(s1, s3, v3))

        energy, f_center, packed = jax.lax.map(
            block_fn, c_blocks + (m_blocks, p_blocks))
        return (energy.reshape(-1)[:n],
                f_center.reshape(-1, 3)[:n],
                packed.reshape(-1, k3 * 8)[:n])

    eps = jnp.asarray(1e-30, dtype)

    def p_null():
        return lambda x: x * (1.0 + eps)

    def p0():
        def fn(x):
            comps, r = gather_comps(x)
            return x + eps * jnp.stack(
                [jnp.sum(c, axis=1) for c in comps], -1) * r[:, :1]
        return fn

    def p1():
        def fn(x):
            comps, r = gather_comps(x)
            f2 = pair_short(comps, r)
            return x + eps * jnp.stack(f2, -1)
        return fn

    def p2(block_atoms=512):
        def fn(x):
            comps, r = gather_comps(x)
            _, f_center, packed = trio_map(comps, block_atoms)
            return x + eps * (f_center + packed[:, :3]
                              + r[:, :3])
        return fn

    def p3():
        def fn(x):
            comps, r = gather_comps(x)
            energy, f_center, packed = trio_map(comps, 512)
            _, f3 = pt._assemble_forces(energy, f_center, packed,
                                        comps, r, cache3)
            return x + eps * f3
        return fn

    def p4():
        key0 = jax.random.PRNGKey(0)

        def fn(x):
            _, _, f = pt.trio_short_forces(
                coeff, tb.grid, x, cell, nbr3, spec_pair=spec,
                n_basis_pair=spec.n_basis, spec_l=tb.spec_l,
                spec_n=tb.spec_n, l_basis=tb.l_basis,
                n_basis=tb.n_basis, with_energy=False,
                active_bc=tb.active_bc, window=tb.window,
                r_lo=r_lo, r_hi=r_hi, cache3=cache3)
            v = eps * x + 0.5 * dt * f / masses
            xn = x + dt * v
            c1 = jnp.exp(-friction * dt)
            cn = jnp.sqrt((1 - c1 ** 2) * units.kB * 300.0 / masses)
            v = c1 * v + cn * jax.random.normal(key0, v.shape,
                                                dtype=dtype)
            return xn + eps * v
        return fn

    def langevin_only():
        key0 = jax.random.PRNGKey(0)

        def fn(x):
            c1 = jnp.exp(-friction * dt)
            cn = jnp.sqrt((1 - c1 ** 2) * units.kB * 300.0 / masses)
            return c1 * x + eps * cn * jax.random.normal(
                key0, x.shape, dtype=dtype)
        return fn

    results = {}
    results["scan_null"] = chain_ms(p_null, x0)
    results["p0_gather_comps"] = chain_ms(p0, x0)
    results["p1_plus_pair_chain"] = chain_ms(p1, x0)
    for ba in (256, 512, 1024):
        results[f"p2_plus_trio_map_b{ba}"] = chain_ms(
            lambda ba=ba: p2(ba), x0)
    results["p3_force_eval"] = chain_ms(p3, x0)
    results["p4_full_inner_step"] = chain_ms(p4, x0)
    results["langevin_only"] = chain_ms(langevin_only, x0)

    # VPU speed-of-light probe: pure FMA chain on the trio lane shape
    lanes = jnp.ones((n, k3 * k3), dtype=dtype)
    fma_depth = 64

    def fma_chain():
        a = jnp.asarray(1.0000001, dtype)
        b = jnp.asarray(1e-9, dtype)

        def fn(y):
            for _ in range(fma_depth):
                y = y * a + b
            return y
        return fn

    ms = chain_ms(fma_chain, lanes)
    results["vpu_fma_chain_ms"] = ms
    results["vpu_achieved_gflops"] = (
        n * k3 * k3 * fma_depth * 2 / (ms * 1e-3) / 1e9)

    # Pallas in-kernel gather probe: can Mosaic lower a row gather
    # from a VMEM-resident table, and at what per-row cost?
    gather_support = {}
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        idx = jnp.asarray(np.asarray(nbr3.idx, np.int32))

        def gk(x_ref, idx_ref, o_ref):
            o_ref[:] = jnp.take(x_ref[:], idx_ref[:].reshape(-1),
                                axis=0).reshape(idx_ref.shape + (3,))

        gfn = pl.pallas_call(
            gk,
            out_shape=jax.ShapeDtypeStruct((n, k3, 3), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(lambda x: gfn(x, idx))(x0)
        ref = np.asarray(x0)[np.asarray(idx).reshape(-1)].reshape(
            n, k3, 3)
        ok = np.allclose(np.asarray(out), ref)
        gather_support["compiles"] = True
        gather_support["correct"] = bool(ok)

        def g_chain():
            def fn(x):
                return x + eps * jnp.sum(gfn(x, idx), axis=1)
            return fn
        gather_support["ms"] = chain_ms(g_chain, x0)
        gather_support["ns_per_row"] = (
            gather_support["ms"] * 1e6 / (n * k3))
    except Exception as e:  # noqa: BLE001 - feature probe
        gather_support["compiles"] = False
        gather_support["error"] = repr(e)[:300]
    results["pallas_gather"] = gather_support

    # XLA gather reference cost on the same index set
    def xla_gather():
        def fn(x):
            pj = pt.gather_rows_blocks(x, cache3.idx_flats, n)
            return x + eps * jnp.sum(pj, axis=1)
        return fn
    results["xla_gather_ms"] = chain_ms(xla_gather, x0)
    results["xla_gather_ns_per_row"] = (
        results["xla_gather_ms"] * 1e6 / (n * k3))

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True).stdout.strip() or "unknown"
    artifact = {
        "platform": platform,
        "commit": commit,
        "n_atoms": n,
        "k3": k3,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "ms": {k: (round(v, 4) if isinstance(v, float) else v)
               for k, v in results.items()},
    }
    out_dir = os.path.join(REPO, "benchmarks_data", "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"anatomy_{commit}.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact, indent=1))


if __name__ == "__main__":
    main()
