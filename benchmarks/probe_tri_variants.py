"""
Probe: fused-kernel implementation variants (role expansion x slot
reduction x block size), timed in one TPU session at the bench shape.
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
    model = ls.WeightedLinearModel.from_json(
        os.path.join(REPO, "benchmarks_data", "model_2and3.json"))
    geom = bulk("W", "bcc", a=3.1652) * (17, 17, 17)
    system = MDSystem(model, geom, dtype=jnp.float32,
                      rebuild_every=24, skin=0.5, skin_2b=1.2,
                      capacity_2b=72, capacity_3b=16, n_respa=6)
    state = system.init_state(temperature=600.0, seed=0)
    state = system.run(state, n_steps=48, dt_fs=2.0,
                       thermostat="langevin", temperature=600.0)
    nbr3 = state.nbr3
    cache3 = pt.build_trio_cache(nbr3, state.cell, jnp.float32)
    pj = pt.gather_rows_blocks(state.positions, cache3.idx_flats,
                               state.positions.shape[0])
    comps = tuple(pj[..., c] + cache3.sd[c]
                  - state.positions[:, c][:, None] for c in range(3))
    valid_f = cache3.valid
    st = ptk.build_tri_statics(model, system.respa_switch)
    eps = jnp.float32(1e-30)
    results = {"n_atoms": len(geom)}
    results["null_ms"] = round(chain_ms(
        lambda x: x * (1 + eps), comps[0]), 4)

    ref = None
    for role in ("gather", "concat"):
        for red in ("matmul", "slices"):
            for ba in (256,):  # ba=1024 compiles >40 min; skipped
                name = f"{role}_{red}_ba{ba}"
                try:
                    def fused(c0, role=role, red=red, ba=ba):
                        h, p = ptk.tri_inner_map(
                            (c0, comps[1], comps[2]), valid_f, st,
                            block_atoms=ba, role_impl=role,
                            reduce_impl=red)
                        return c0 + eps * (jnp.sum(h) + jnp.sum(p))

                    h, p = ptk.tri_inner_map(comps, valid_f, st,
                                             block_atoms=ba,
                                             role_impl=role,
                                             reduce_impl=red)
                    jax.block_until_ready(p)
                    if ref is None:
                        ref = (np.asarray(h), np.asarray(p))
                        ok = True
                    else:
                        ok = (np.allclose(np.asarray(h), ref[0],
                                          atol=1e-4)
                              and np.allclose(np.asarray(p), ref[1],
                                              atol=1e-4))
                    ms = chain_ms(fused, comps[0])
                    results[name] = {"ms": round(ms, 4),
                                     "net_ms": round(
                                         ms - results["null_ms"], 4),
                                     "match": bool(ok)}
                    print(name, results[name], flush=True)
                except Exception as e:  # noqa: BLE001
                    results[name] = {"error": repr(e)[:200]}
                    print(name, "ERROR", flush=True)

    print(json.dumps(results, indent=1))
    out_dir = os.path.join(REPO, "benchmarks_data", "artifacts")
    with open(os.path.join(out_dir, "probe_tri_variants.json"),
              "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
