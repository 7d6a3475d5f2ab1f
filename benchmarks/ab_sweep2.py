"""
Round-4 batched A/B sweep (one TPU session): triangle-lane trio map
on/off x r-RESPA depth x rebuild cadence, under bench.py conditions
(launch_chunks=10, 540-step windows, median of 3).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from uf3_tpu.data.atoms import bulk  # noqa: E402
from uf3_tpu.forcefield.md import MDSystem  # noqa: E402
from uf3_tpu.regression import least_squares as ls  # noqa: E402


def measure(model, geom, n_respa, rebuild_every, triangle,
            window_steps=540, reps=3):
    system = MDSystem(model, geom, dtype=jnp.float32,
                      rebuild_every=rebuild_every, skin=0.5,
                      skin_2b=1.2, capacity_2b=72, capacity_3b=16,
                      n_respa=n_respa, trio_triangle=triangle)
    state = system.init_state(temperature=300.0, seed=0)
    state = system.run(state, n_steps=126, dt_fs=2.0,
                       thermostat="langevin", temperature=300.0)
    jax.block_until_ready(state.positions)
    assert not system.overflowed(state)
    state = system.run(state, n_steps=window_steps, dt_fs=2.0,
                       thermostat="langevin", temperature=300.0,
                       launch_chunks=10, sync=False)
    jax.block_until_ready(state.positions)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state = system.run(state, n_steps=window_steps, dt_fs=2.0,
                           thermostat="langevin", temperature=300.0,
                           launch_chunks=10, sync=False)
        jax.block_until_ready(state.positions)
        times.append(time.perf_counter() - t0)
    elapsed = sorted(times)[len(times) // 2]
    return len(geom) * window_steps / elapsed


def main():
    model = ls.WeightedLinearModel.from_json(
        os.path.join(REPO, "benchmarks_data", "model_2and3.json"))
    geom = bulk("W", "bcc", a=3.1652) * (17, 17, 17)
    print(f"n_atoms = {len(geom)}, "
          f"platform = {jax.devices()[0].platform}", flush=True)
    results = {}

    def run_case(name, **kw):
        try:
            rate = measure(model, geom, **kw)
        except Exception as e:  # noqa: BLE001 - sweep must finish
            results[name] = {"error": repr(e)[:200]}
            print(f"{name}: ERROR {e!r}", flush=True)
            return 0.0
        results[name] = round(rate, 1)
        print(f"{name}: {rate:.3e} atom-steps/s", flush=True)
        return rate

    run_case("base_respa3_rb18", n_respa=3, rebuild_every=18,
             triangle=False)
    tri = run_case("tri_respa3_rb18", n_respa=3, rebuild_every=18,
                   triangle=True)
    best_tri = tri > results["base_respa3_rb18"]
    for n_respa in (4, 6):
        run_case(f"tri{int(best_tri)}_respa{n_respa}_rb18",
                 n_respa=n_respa, rebuild_every=18,
                 triangle=best_tri)
    best = max((k for k, v in results.items()
                if isinstance(v, float)), key=lambda k: results[k])
    n_respa_best = int(best.split("respa")[1].split("_")[0])
    for rb in (24, 36):
        run_case(f"best_respa{n_respa_best}_rb{rb}",
                 n_respa=n_respa_best, rebuild_every=rb,
                 triangle=best_tri)
    out_dir = os.path.join(REPO, "benchmarks_data", "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "ab_sweep2.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
