"""
Probe: the fused Pallas triangle inner-step kernel (pallas_tri)
against the XLA reference path (trio_short_forces internals) --
correctness on realistic MD displacements, then timing at the bench
shape.  Pass "cpu" to run the correctness check in interpreter mode
on the CPU backend.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
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
from uf3_tpu.ops import pallas_tri as ptk  # noqa: E402
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
    interpret = len(sys.argv) > 1 and sys.argv[1] == "cpu"
    model = ls.WeightedLinearModel.from_json(
        os.path.join(REPO, "benchmarks_data", "model_2and3.json"))
    reps = (5, 5, 5) if interpret else (17, 17, 17)
    geom = bulk("W", "bcc", a=3.1652) * reps
    system = MDSystem(model, geom, dtype=jnp.float32,
                      rebuild_every=18, skin=0.5, skin_2b=1.2,
                      capacity_2b=72, capacity_3b=16, n_respa=3)
    state = system.init_state(temperature=600.0, seed=0)
    # thermalize so the check runs on O(eV/A) forces, not the ~zero
    # forces of the perfect lattice
    state = system.run(state, n_steps=36, dt_fs=2.0,
                       thermostat="langevin", temperature=600.0)
    nbr3 = state.nbr3
    cache3 = pt.build_trio_cache(nbr3, state.cell, jnp.float32)
    pj = pt.gather_rows_blocks(state.positions, cache3.idx_flats,
                               state.positions.shape[0])
    comps = tuple(pj[..., c] + cache3.sd[c]
                  - state.positions[:, c][:, None] for c in range(3))
    valid_f = cache3.valid
    st = ptk.build_tri_statics(model, system.respa_switch)
    assert st is not None
    results = {"n_atoms": len(geom), "interpret": interpret,
               "platform": jax.devices()[0].platform}

    # ---- reference via the existing XLA path ------------------------
    e2_ref, e3_ref, f_ref = pt.trio_short_forces(
        system.pair_fast[1], system.trio_bundle.grid,
        state.positions, state.cell, nbr3,
        spec_pair=system.pair_fast[0],
        n_basis_pair=system.pair_fast[0].n_basis,
        spec_l=system.trio_bundle.spec_l,
        spec_n=system.trio_bundle.spec_n,
        l_basis=system.trio_bundle.l_basis,
        n_basis=system.trio_bundle.n_basis,
        with_energy=True, active_bc=system.trio_bundle.active_bc,
        window=system.trio_bundle.window,
        r_lo=system.respa_switch[0], r_hi=system.respa_switch[1],
        triangle=False, cache3=cache3)

    # ---- fused kernel ------------------------------------------------
    try:
        head, part = ptk.tri_inner_map(comps, valid_f, st,
                                       with_energy=True,
                                       interpret=interpret)
        r3sq = comps[0] ** 2 + comps[1] ** 2 + comps[2] ** 2
        r3 = jnp.sqrt(jnp.where(r3sq > 0, r3sq, 1.0))
        e3_k, f3_k = pt._assemble_forces(
            head[:, 0], (head[:, 2], head[:, 3], head[:, 4]),
            part, comps, r3, cache3)
        e2_k = jnp.sum(head[:, 1])
        f_k = f3_k  # kernel folds the short pair into f_center
        de2 = float(abs(e2_k - e2_ref))
        de3 = float(jnp.max(jnp.abs(e3_k - e3_ref)))
        df = float(jnp.max(jnp.abs(f_k - f_ref)))
        results["errors"] = {"e2_abs": de2, "e3_max": de3,
                             "f_max": df}
        scale = float(jnp.max(jnp.abs(f_ref)))
        results["f_scale"] = scale
        results["correct"] = bool(df < 1e-3 * max(scale, 1.0)
                                  and de3 < 1e-3)
    except Exception as e:  # noqa: BLE001 - feature probe
        results["kernel"] = {"error": repr(e)[:500]}

    # ---- timing (TPU only) -------------------------------------------
    if not interpret and "errors" in results:
        eps = jnp.float32(1e-30)

        def fused(c0):
            h, p = ptk.tri_inner_map((c0, comps[1], comps[2]),
                                     valid_f, st)
            return c0 + eps * (jnp.sum(h) + jnp.sum(p))

        results["null_ms"] = round(chain_ms(
            lambda x: x * (1 + eps), comps[0]), 4)
        results["fused_ms"] = round(chain_ms(fused, comps[0]), 4)

        def xla_map(c0):
            _, _, f = pt.trio_short_forces(
                system.pair_fast[1], system.trio_bundle.grid,
                state.positions, state.cell, nbr3,
                spec_pair=system.pair_fast[0],
                n_basis_pair=system.pair_fast[0].n_basis,
                spec_l=system.trio_bundle.spec_l,
                spec_n=system.trio_bundle.spec_n,
                l_basis=system.trio_bundle.l_basis,
                n_basis=system.trio_bundle.n_basis,
                with_energy=False,
                active_bc=system.trio_bundle.active_bc,
                window=system.trio_bundle.window,
                r_lo=system.respa_switch[0],
                r_hi=system.respa_switch[1],
                triangle=False, cache3=cache3)
            return c0 * (1 + eps) + eps * jnp.sum(f)

        results["xla_full_inner_ms"] = round(
            chain_ms(xla_map, comps[0]), 4)

    print(json.dumps(results, indent=1))
    out_dir = os.path.join(REPO, "benchmarks_data", "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "probe_tri_kernel.json"),
              "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
