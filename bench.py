"""
Benchmark harness: 2+3-body tungsten MD throughput on the available
accelerator (BASELINE.json headline metric).

Loads the fitted 2+3-body tungsten model (benchmarks_data/
model_2and3.json, the reference demo potential), builds a ~10k-atom
bcc slab, runs jit-compiled NVT MD, and prints one JSON line with
atom-steps/s.  vs_baseline compares against the reference CPU cost of
~1.15 us/atom/step (manuscript supplement Fig. 1; BASELINE.md), i.e.
8.7e5 atom-steps/s -- for the cheaper 2-body-only potential.
"""

import json
import os
import sys
import time

# the axon sitecustomize imports jax at interpreter startup, BEFORE
# this module runs -- setting the cache env vars here is inert unless
# the process re-execs with them in the environment
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.environ.setdefault(
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    os.execv(sys.executable, [sys.executable] + sys.argv)

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from uf3_tpu.data.atoms import bulk  # noqa: E402
from uf3_tpu.forcefield.md import MDSystem  # noqa: E402
from uf3_tpu.regression import least_squares as ls  # noqa: E402

BASELINE_ATOM_STEPS = 8.7e5  # reference CPU, 2-body (BASELINE.md)


def main():
    model = ls.WeightedLinearModel.from_json(
        os.path.join(REPO, "benchmarks_data", "model_2and3.json"))
    geom = bulk("W", "bcc", a=3.1652) * (17, 17, 17)  # 9826 atoms
    n_atoms = len(geom)
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    # two-tier skins: tight 3-body skin (cutoff 4.0 A -> 16 neighbor
    # slots = one 256-lane pair block in the trio kernel) refiltered
    # eagerly (every chunk boundary) from the wide-skin 2-body list,
    # whose full rebuild is rare; capacities validated by the
    # overflow check below.
    # 3-level r-RESPA 12/6/36 with the 1.0-A-wide C^2 switch
    # (2.5, 3.5): the smooth 2-body tail advances on a 12x outer step
    # (24 fs), the 3-body force (map + assembly) on a 6x mid step
    # (12 fs), and the innermost 2 fs step touches only the row-local
    # switched short pair force on the (N, 16) rows.  Long-horizon
    # NVE validated: 5,184 steps drift 7.2e-5 eV/atom, bounded shadow
    # amplitude 9.1e-5, secular heating 4.0e-6 (validate_final_
    # 12_6_36_lo25.json) -- outer steps of 32/36 fs and the narrow
    # (3.0, 3.5) switch both measurably resonate (r5_sweep.json,
    # validate_final_*.json); this cadence is the deepest clean one.
    system = MDSystem(model, geom, dtype=dtype, rebuild_every=36,
                      skin=0.5, skin_2b=1.2, capacity_2b=72,
                      capacity_3b=16, n_respa=12, respa_mid=6,
                      respa_switch=(2.5, 3.5))
    state = system.init_state(temperature=300.0, seed=0)
    # warm up: compile + equilibrate past the thermalization transient
    # (rebuild cadence during the first ~100 steps is atypical; the
    # steady-state cadence is what sustained MD pays)
    state = system.run(state, n_steps=144, dt_fs=2.0,
                       thermostat="langevin", temperature=300.0)
    jax.block_until_ready(state.positions)
    assert not system.overflowed(state), "neighbor capacity overflow"
    # one jit launch scans 10 rebuild cycles (180 steps): the host
    # round-trip (~25 ms tunneled) amortizes over the launch instead
    # of every 18-step chunk.  Warm the launch executable first.
    state = system.run(state, n_steps=720, dt_fs=2.0,
                       thermostat="langevin", temperature=300.0,
                       launch_chunks=10, sync=False)
    jax.block_until_ready(state.positions)
    # timed section: median of 3 windows of 540 steps each -- long
    # enough that launch-to-launch variance on a tunneled TPU cannot
    # move the headline by the ~12% seen between round-3 runs
    window_steps = 720
    times = []
    stale = False
    for _ in range(3):
        t0 = time.time()
        state = system.run(state, n_steps=window_steps, dt_fs=2.0,
                           thermostat="langevin", temperature=300.0,
                           launch_chunks=10, sync=False)
        jax.block_until_ready(state.positions)
        times.append(time.time() - t0)
        # a stale window means the 3-body skin margin was crossed
        # mid-cycle (possible missed neighbors): surface it with the
        # number (throughput_gate.py FAILS on it; probe_stale.json
        # bounds the force error of one stale launch)
        stale = stale or bool(state.stale)
    elapsed = sorted(times)[1]
    # the timed windows run sync=False (queued overflow flags):
    # resolve them before publishing -- a capacity bust mid-timing
    # would otherwise print a number from truncated neighbor lists
    assert not system.overflowed(state), \
        "neighbor capacity overflow during the timed section"
    atom_steps = n_atoms * window_steps / elapsed
    result = {
        "metric": "atom-steps/s (2+3-body W MD, "
                  f"{n_atoms} atoms, {jax.devices()[0].platform})",
        "value": round(atom_steps, 1),
        "unit": "atom-steps/s",
        "vs_baseline": round(atom_steps / BASELINE_ATOM_STEPS, 3),
        "stale": stale,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
