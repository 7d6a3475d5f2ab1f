"""
Two-phase coexistence melting-point bracket for the flagship tungsten
2+3-body potential, following the reference's LAMMPS protocol
(/root/reference/supplement/melting_point/melting_uf.in: equilibrate
at trial T, melt one half with the other half unintegrated, re-cool
the molten half to trial T, release under pressure coupling and watch
which phase grows), re-designed for the TPU MD engine:

  * the frozen half is realized by effectively-infinite masses (the
    reference leaves the `left` group out of `fix npt right`);
  * the release stage is stochastic-cell-rescaling NPT (samples the
    same ensemble as the reference's Nose-Hoover NPT);
  * the phase diagnostic is a z-binned Bragg amplitude at the three
    {110} supercell harmonics computed from FRACTIONAL coordinates
    (invariant under the barostat's cell rescaling): solid bins show
    |S| ~ exp(-W) >> 1/sqrt(n_bin), liquid bins ~ 1/sqrt(n_bin).

Usage:
  python benchmarks/melting_run.py [T ...] [--reps X Y Z]
        [--obs N_STEPS]

Writes benchmarks_data/artifacts/melting_point.json with the
per-trial solid-fraction trajectory and the bracketed melting
temperature.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if __name__ == "__main__" \
        and "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    # re-exec so the persistent compile cache engages before the
    # sitecustomize jax import; only as a script (importing this
    # module, e.g. from tests, must not exec over the host process)
    os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        REPO, ".jax_cache")
    os.environ.setdefault(
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    os.execv(sys.executable, [sys.executable] + sys.argv)

import jax  # noqa: E402

if "--cpu" in sys.argv:  # smoke-testing the protocol off-TPU
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, REPO)

from uf3_tpu.data.atoms import bulk  # noqa: E402
from uf3_tpu.forcefield.md import MDSystem  # noqa: E402
from uf3_tpu.regression import least_squares as ls  # noqa: E402

OUT = os.path.join(REPO, "benchmarks_data", "artifacts",
                   "melting_point.json")
A0 = 3.1652  # bcc W lattice constant of the fitted model


def order_profile(positions, cell, n_bins, reps=None):
    """Per-x-bin Bragg amplitude |S| averaged over the three {110}
    harmonics of the supercell, from fractional coordinates.

    ``reps`` is the number of conventional cells per axis.  Pass the
    CONSTRUCTION-time value for NPT trajectories: the lattice period
    count is fixed by construction, and re-deriving it from a
    thermally-expanded cell flips to the wrong harmonic once linear
    expansion exceeds half a cell (~1% at 48 reps), collapsing the
    solid signal."""
    pos = np.asarray(positions, dtype=np.float64)
    cell = np.asarray(cell, dtype=np.float64)
    frac = pos @ np.linalg.inv(cell)
    frac -= np.floor(frac)
    if reps is None:
        reps = np.rint(np.linalg.norm(cell, axis=1) / A0).astype(int)
    hs = [(0, reps[1], reps[2]), (reps[0], 0, reps[2]),
          (reps[0], reps[1], 0)]
    bins = np.clip((frac[:, 0] * n_bins).astype(int), 0, n_bins - 1)
    prof = np.zeros(n_bins)
    for b in range(n_bins):
        sel = frac[bins == b]
        if len(sel) == 0:
            continue
        amps = [np.abs(np.exp(2j * np.pi * (sel @ np.asarray(h)))
                       .mean()) for h in hs]
        prof[b] = float(np.mean(amps))
    return prof


def solid_fraction(prof, threshold=0.25):
    return float(np.mean(prof > threshold))


def run_trial(model, trial_t, reps, n_obs, seed=0, prep_scale=1.0):
    atoms = bulk("W", "bcc", a=A0) * tuple(reps)
    n = len(atoms)
    # 2b radius 5.5 + 1.2 = 6.7 A holds 64 bcc neighbors at the 0 K
    # lattice (88 leaves liquid-density headroom); 3b radius
    # 3.5 + 0.6 = 4.1 A holds 14 (20 ditto)
    kw = dict(dtype=jnp.float32, rebuild_every=16, skin=0.6,
              skin_2b=1.2, capacity_2b=88, capacity_3b=20)
    n_bins = 2 * reps[0]
    log = {"T": trial_t, "n_atoms": n}

    # stage 1: equilibrate the whole box at trial T, then relax the
    # volume under NPT (melting verdicts are meaningless at the
    # zero-K lattice density)
    sysf = MDSystem(model, atoms, **kw)
    state = sysf.init_state(temperature=trial_t, seed=seed)
    state = sysf.run(state, n_steps=max(24, int(2000 * prep_scale)), dt_fs=2.0,
                     thermostat="langevin", temperature=trial_t,
                     on_overflow="regrow", launch_chunks=8)
    state, _ = sysf.npt_run(state, n_steps=max(32, int(3000 * prep_scale)), dt_fs=2.0,
                            temperature=trial_t, pressure=0.0,
                            launch_chunks=8)
    log["cell_x_after_equil"] = float(state.cell[0, 0])

    # stage 2: freeze the left half (frac_x < 0.5) via effectively
    # infinite masses, melt the right half at 1.5x trial T (floored
    # at 8000 K -- see the melt_t comment below), then re-cool it to
    # trial T.  Both melt and re-cool
    # run under the SCR barostat: the reference melts under x-coupled
    # NPT (melting_uf.in `fix npt right ... x 0 0`), and melting at
    # FIXED volume compresses the nascent liquid until the frozen
    # template re-seeds the solid (the round-4 prep_failed artifact:
    # solid fraction ~0.93 everywhere after a 5500 K NVT melt).
    # Under isotropic scaling the pinned half deforms affinely, which
    # leaves its fractional coordinates -- and hence the Bragg
    # diagnostic -- untouched.
    frac_x = (np.asarray(state.positions)
              @ np.linalg.inv(np.asarray(state.cell)))[:, 0] % 1.0
    frozen = frac_x < 0.5
    masses = np.asarray(sysf.masses, dtype=np.float64).copy()
    masses[frozen] = 1e12
    sysz = MDSystem(model, atoms, masses=masses, **kw)
    sysz.capacity_2b = sysf.capacity_2b   # inherit any regrow
    sysz.capacity_3b = sysf.capacity_3b
    sysz._cells_2b = sysf._cells_2b
    sysz._cells_3b = sysf._cells_3b
    sysz.cell = state.cell
    v = state.velocities.at[jnp.asarray(frozen)].set(0.0)
    state = state._replace(velocities=v)
    # hot enough to actually liquefy the unpinned half within ~20 ps
    # regardless of how low the trial temperature is.  8000 K floor:
    # at 5500 K this potential's mobile half stays a superheated
    # crystal against the coherent pinned template for 20+ ps (the
    # hot Bragg profile ~0.85-0.88 matches a SOLID's Debye-Waller
    # factor at that temperature), so the homogeneous-melting
    # threshold of the fitted model sits well above the experimental
    # 1.5 T_m rule of thumb
    melt_t = max(1.5 * trial_t, 8000.0)
    for attempt in range(3):
        state, _ = sysz.npt_run(
            state, n_steps=max(32, int(10000 * prep_scale)),
            dt_fs=2.0, temperature=melt_t, pressure=0.0,
            friction_ps=10.0, launch_chunks=8)
        prof_hot = order_profile(state.positions, state.cell, n_bins,
                                 reps=reps)
        log["profile_hot"] = [round(p, 3) for p in prof_hot]
        log["melt_t"] = melt_t
        log["t_mobile_hot"] = round(sysz.temperature(state), 1)
        state, _ = sysz.npt_run(
            state, n_steps=max(32, int(8000 * prep_scale)),
            dt_fs=2.0, temperature=trial_t, pressure=0.0,
            friction_ps=10.0, launch_chunks=8)
        prof0 = order_profile(state.positions, state.cell, n_bins,
                              reps=reps)
        log["profile_after_melt"] = [round(p, 3) for p in prof0]
        sf0 = solid_fraction(prof0)
        log["solid_fraction_start"] = sf0
        # accept up to 0.82: near/below T_m the re-cool stage regrows
        # part of the molten half from the template no matter how hot
        # the melt stage ran (measured sf0 = 0.76 after 8000, 10500
        # and 13000 K melts at trial T 3500), and the verdict is
        # DELTA-based, so a 0.76 start still resolves grew vs shrank
        if sf0 <= 0.82:
            break
        # superheated crystal survived: escalate and re-melt
        melt_t += 2500.0
        print(f"  T={trial_t:.0f}: melt survived at "
              f"{melt_t - 2500:.0f} K (sf {sf0:.2f}), escalating to "
              f"{melt_t:.0f} K", flush=True)
    if not 0.25 <= sf0 <= 0.82:
        log["verdict"] = "prep_failed"
        return log

    # stage 3: release everything under NPT at trial T and watch the
    # interface move
    sysf.capacity_2b = sysz.capacity_2b
    sysf.capacity_3b = sysz.capacity_3b
    sysf._cells_2b = sysz._cells_2b
    sysf._cells_3b = sysz._cells_3b
    sf_series = [sf0]
    obs_chunk = max(32, min(2000, n_obs))
    t0 = time.perf_counter()
    done = 0
    from uf3_tpu.data.atoms import Atoms
    cell_ref = float(state.cell[0, 0])
    while done < n_obs:
        state, _ = sysf.npt_run(state, n_steps=obs_chunk, dt_fs=2.0,
                                temperature=trial_t, pressure=0.0,
                                launch_chunks=8)
        done += obs_chunk
        # static cell-list bin geometry was sized at construction; it
        # stays valid under expansion but not meaningful shrink --
        # when the box densifies (e.g. the solid grows), REBUILD the
        # system at the current cell instead of trusting shrunken
        # bins (a bin below r_cut silently misses neighbors)
        if float(state.cell[0, 0]) < 0.99 * cell_ref:
            atoms_now = Atoms(
                numbers=np.asarray(sysf.atomic_numbers),
                positions=np.asarray(state.positions),
                cell=np.asarray(state.cell), pbc=True)
            # carry the CURRENT (possibly regrown) capacities: the
            # base kw capacities overflow on the densified liquid
            kw2 = dict(kw, capacity_2b=sysf.capacity_2b,
                       capacity_3b=sysf.capacity_3b)
            vel_now = np.asarray(state.velocities)
            for _ in range(4):
                sysf = MDSystem(model, atoms_now, **kw2)
                try:
                    state = sysf.init_state(velocities=vel_now)
                    break
                except ValueError:
                    kw2["capacity_2b"] = int(
                        kw2["capacity_2b"] * 1.3) + 1
                    kw2["capacity_3b"] = int(
                        kw2["capacity_3b"] * 1.3) + 1
            cell_ref = float(state.cell[0, 0])
            print(f"  T={trial_t:.0f}: rebuilt bin geometry at "
                  f"cell_x {cell_ref:.2f} A", flush=True)
        prof = order_profile(state.positions, state.cell, n_bins,
                             reps=reps)
        sf_series.append(solid_fraction(prof))
        print(f"  T={trial_t:.0f}: {done} steps, solid fraction "
              f"{sf_series[-1]:.2f}", flush=True)
        if abs(sf_series[-1] - sf0) > 0.15:
            # verdict determined (threshold 0.1 with margin): stop
            break
    log["obs_steps"] = n_obs
    log["obs_atom_steps_per_s"] = round(
        n * n_obs / (time.perf_counter() - t0), 1)
    log["solid_fraction_series"] = [round(s, 3) for s in sf_series]
    delta = sf_series[-1] - sf0
    log["verdict"] = ("grew" if delta > 0.1 else
                      "shrank" if delta < -0.1 else "flat")
    return log


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("temps", nargs="*", type=float,
                    default=[2500.0, 3500.0])
    ap.add_argument("--reps", nargs=3, type=int, default=[48, 18, 18])
    ap.add_argument("--obs", type=int, default=48000)
    ap.add_argument("--prep-scale", type=float, default=1.0)
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()
    model = ls.WeightedLinearModel.from_json(
        os.path.join(REPO, "benchmarks_data", "model_2and3.json"))
    results = {"protocol": "two-phase coexistence "
               "(melting_uf.in analogue)",
               "platform": jax.devices()[0].platform,
               "trials": []}
    if os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
            results["trials"] = prev.get("trials", [])
    for t in args.temps:
        print(f"=== trial T = {t:.0f} K ===", flush=True)
        results["trials"].append(
            run_trial(model, t, args.reps, args.obs,
                      prep_scale=args.prep_scale))
        grew = [tr["T"] for tr in results["trials"]
                if tr["verdict"] == "grew"]
        shrank = [tr["T"] for tr in results["trials"]
                  if tr["verdict"] == "shrank"]
        if grew and shrank:
            results["melting_point_bracket_K"] = [max(grew),
                                                  min(shrank)]
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items()
                      if k != "trials"}))


if __name__ == "__main__":
    main()
