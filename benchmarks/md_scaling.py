"""
MD throughput vs system size on the current accelerator (single chip).

Runs the flagship 2+3-body tungsten potential (benchmarks_data/
model_2and3.json) at three bcc supercell sizes through the production
cell-list path and prints atom-steps/s per size.  Companion to the
headline bench.py (fixed ~10k-atom configuration).

Usage: python benchmarks/md_scaling.py [reps ...]   (default 17 25 34)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from uf3_tpu.data.atoms import bulk  # noqa: E402
from uf3_tpu.forcefield.md import MDSystem  # noqa: E402
from uf3_tpu.regression import least_squares as ls  # noqa: E402


def main(reps_list):
    model = ls.WeightedLinearModel.from_json(
        os.path.join(REPO, "benchmarks_data", "model_2and3.json"))
    for reps in reps_list:
        geom = bulk("W", "bcc", a=3.1652) * (reps, reps, reps)
        n = len(geom)
        system = MDSystem(model, geom, dtype=jnp.float32,
                          rebuild_every=18, skin=0.5, skin_2b=1.2,
                          capacity_2b=72, capacity_3b=16)
        state = system.init_state(temperature=300.0, seed=0)
        state = system.run(state, n_steps=126, dt_fs=2.0,
                           thermostat="langevin", temperature=300.0)
        jax.block_until_ready(state.positions)
        assert not system.overflowed(state)
        t0 = time.time()
        n_steps = 108
        state = system.run(state, n_steps=n_steps, dt_fs=2.0,
                           thermostat="langevin", temperature=300.0)
        jax.block_until_ready(state.positions)
        dt = time.time() - t0
        print(f"N={n:6d}: {n * n_steps / dt:.3e} atom-steps/s "
              f"({dt / n_steps * 1e3:.2f} ms/step)")


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [17, 25, 34])
