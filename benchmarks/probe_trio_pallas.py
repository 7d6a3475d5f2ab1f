"""
Probe: the fused trio block compute as ONE Pallas kernel vs the
lax.map XLA path, timed by the slope method (two scan lengths, so the
~1 ms tunneled-dispatch round-trip cancels instead of polluting every
number -- the round-3 anatomy divided a single launch by its scan
length, which baked a fake ~0.96 ms/step floor into every figure).

The trio map is blockwise (no arbitrary gathers inside), so Mosaic
only needs iota/compare/FMA/matmul -- unlike the axis-0 dynamic
gather probes, which are genuine Mosaic lowering failures.
"""

import functools
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

sys.path.insert(0, REPO)

from uf3_tpu.data.atoms import bulk  # noqa: E402
from uf3_tpu.forcefield.md import MDSystem  # noqa: E402
from uf3_tpu.ops import pallas_trio as pt  # noqa: E402
from uf3_tpu.regression import least_squares as ls  # noqa: E402

LEN_A, LEN_B = 10, 40


def slope_ms(fn, x0, repeats=5):
    """Per-iteration ms from the slope between two scan lengths:
    (t_B - t_A) / (B - A), dispatch latency cancels exactly."""
    def loop(length):
        @jax.jit
        def run(x):
            def body(c, _):
                return fn(c), None
            out, _ = jax.lax.scan(body, x, None, length=length)
            return out
        return run

    la, lb = loop(LEN_A), loop(LEN_B)
    jax.block_until_ready(la(x0))
    jax.block_until_ready(lb(x0))
    best_a = best_b = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(la(x0))
        best_a = min(best_a, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(lb(x0))
        best_b = min(best_b, time.perf_counter() - t0)
    return (best_b - best_a) / (LEN_B - LEN_A) * 1e3


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

    x0 = state.positions
    nbr3, cell = state.nbr3, state.cell
    cache3 = pt.build_trio_cache(nbr3, cell, dtype)
    tb = system.trio_bundle
    k3 = nbr3.idx.shape[1]
    eps = jnp.asarray(1e-30, dtype)
    results = {"n": n, "k3": k3, "platform": platform}

    def gather_comps(x):
        pj = pt.gather_rows_blocks(x, cache3.idx_flats, n)
        comps = tuple(pj[..., c] + cache3.sd[c] - x[:, c][:, None]
                      for c in range(3))
        return comps

    # --- XLA trio map (current production path) ----------------------
    def xla_map(block_atoms):
        pad = (-n) % block_atoms

        def blocks(a):
            return jnp.pad(a, ((0, pad), (0, 0))).reshape(
                -1, block_atoms, a.shape[1])

        def fn(x):
            comps = gather_comps(x)
            c_blocks = tuple(blocks(dc) for dc in comps)
            m_blocks = blocks(cache3.valid)
            p_blocks = blocks(cache3.pair_pre)

            def block_fn(args):
                cx, cy, cz, m_b, p_b = args
                energy, fc, s1, s3, v3 = pt._trio_block_compute(
                    (cx, cy, cz), m_b, tb.grid, tb.spec_l, tb.spec_n,
                    tb.l_basis, tb.n_basis, with_energy=False,
                    active_bc=tb.active_bc, window=tb.window,
                    pair_pre=p_b)
                return (jnp.stack(fc, axis=-1),
                        pt._pack_partials(s1, s3, v3))

            fc, packed = jax.lax.map(
                block_fn, c_blocks + (m_blocks, p_blocks))
            return (x + eps * fc.reshape(-1, 3)[:n]
                    + eps * packed.reshape(-1, k3 * 8)[:n, :3])
        return fn

    def note(key, value):
        results[key] = value
        print(f"{key}: {value}", flush=True)

    for ba in (1024,):
        note(f"xla_map_b{ba}_ms", round(slope_ms(xla_map(ba), x0), 4))

    # --- Pallas trio kernel -------------------------------------------
    def make_kernel(block_atoms):
        def kernel(cx_ref, cy_ref, cz_ref, valid_ref, pp_ref, grid_ref,
                   force_ref, packed_ref):
            comps = (cx_ref[:], cy_ref[:], cz_ref[:])
            energy, fc, s1, s3, v3 = pt._trio_block_compute(
                comps, valid_ref[:] > 0, grid_ref[:], tb.spec_l,
                tb.spec_n, tb.l_basis, tb.n_basis, with_energy=False,
                active_bc=tb.active_bc, window=tb.window,
                pair_pre=pp_ref[:], precision="highest")
            force_ref[:] = jnp.stack(fc, axis=-1)
            packed_ref[:] = pt._pack_partials(s1, s3, v3)
        return kernel

    def pallas_map(block_atoms, vmem_mb=None):
        pad = (-n) % block_atoms
        n_pad = n + pad
        n_blocks = n_pad // block_atoms
        kernel = make_kernel(block_atoms)
        blockspec = lambda w: pl.BlockSpec(
            (block_atoms, w), lambda i: (i, 0),
            memory_space=pltpu.VMEM)
        params = {}
        if vmem_mb:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024)
        call = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[blockspec(k3), blockspec(k3), blockspec(k3),
                      blockspec(k3), blockspec(k3 * k3),
                      pl.BlockSpec((tb.l_basis, tb.l_basis,
                                    tb.n_basis), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(blockspec(3), blockspec(k3 * 8)),
            out_shape=(
                jax.ShapeDtypeStruct((n_pad, 3), dtype),
                jax.ShapeDtypeStruct((n_pad, k3 * 8), dtype)),
            **params,
        )

        def padded(a):
            return jnp.pad(a, ((0, pad), (0, 0)))

        def fn(x):
            comps = gather_comps(x)
            fc, packed = call(*(padded(c) for c in comps),
                              padded(cache3.valid),
                              padded(cache3.pair_pre), tb.grid)
            return (x + eps * fc[:n] + eps * packed[:n, :3])
        return fn

    for ba in (256, 512):
        key = f"pallas_b{ba}"
        try:
            fn = pallas_map(ba)
            ms = slope_ms(fn, x0)
            note(key, {"compiles": True, "ms": round(ms, 4)})
        except Exception as e:  # noqa: BLE001 - feature probe
            note(key, {"compiles": False, "error": repr(e)[:300]})

    # numeric check: pallas vs xla on the same inputs
    try:
        comps = gather_comps(x0)
        pad = (-n) % 512

        def blocks(a):
            return jnp.pad(a, ((0, pad), (0, 0))).reshape(
                -1, 512, a.shape[1])
        c_blocks = tuple(blocks(dc) for dc in comps)

        def block_fn(args):
            cx, cy, cz, m_b, p_b = args
            energy, fc, s1, s3, v3 = pt._trio_block_compute(
                (cx, cy, cz), m_b, tb.grid, tb.spec_l, tb.spec_n,
                tb.l_basis, tb.n_basis, with_energy=False,
                active_bc=tb.active_bc, window=tb.window,
                pair_pre=p_b)
            return (jnp.stack(fc, axis=-1),
                    pt._pack_partials(s1, s3, v3))
        fc_x, packed_x = jax.lax.map(
            block_fn, c_blocks + (blocks(cache3.valid),
                                  blocks(cache3.pair_pre)))
        fc_x = fc_x.reshape(-1, 3)[:n]
        packed_x = packed_x.reshape(-1, 16 * 8)[:n]

        kernel = make_kernel(512)
        n_pad = n + pad
        blockspec = lambda w: pl.BlockSpec(
            (512, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel, grid=(n_pad // 512,),
            in_specs=[blockspec(16)] * 4 + [
                blockspec(256),
                pl.BlockSpec((tb.l_basis, tb.l_basis, tb.n_basis),
                             lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=(blockspec(3), blockspec(16 * 8)),
            out_shape=(jax.ShapeDtypeStruct((n_pad, 3), dtype),
                       jax.ShapeDtypeStruct((n_pad, 16 * 8), dtype)))

        def padded(a):
            return jnp.pad(a, ((0, pad), (0, 0)))
        fc_p, packed_p = call(*(padded(c) for c in comps),
                              padded(cache3.valid),
                              padded(cache3.pair_pre), tb.grid)
        err_fc = float(jnp.max(jnp.abs(fc_p[:n] - fc_x)))
        err_pk = float(jnp.max(jnp.abs(packed_p[:n] - packed_x)))
        results["pallas_vs_xla_max_err"] = {
            "force_center": err_fc, "packed": err_pk}
    except Exception as e:  # noqa: BLE001
        results["pallas_vs_xla_max_err"] = {"error": repr(e)[:300]}

    print(json.dumps(results, indent=1))
    out_dir = os.path.join(REPO, "benchmarks_data", "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "probe_trio_pallas.json"),
              "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
