"""
Per-phase anatomy of the SHIPPED 3-level r-RESPA step (bench.py
defaults: n_respa=9, respa_mid=3, rebuild_every=27) -- the measured
input to the refreshed flops/bytes budget (budget_step.json).

Phases are timed SCAN-CHAINED (30 iterations inside one jit launch
with a data dependency, minus a null scan): standalone jitted
launches pay the ~0.6-0.8 ms tunneled dispatch round-trip, which
dwarfs every phase kernel at 10k atoms.

  * inner   : pair_short_forces, fresh (N, K3) gather     x27 / cycle
  * trio    : trio_forces_unrolled with comps reuse        x9 / cycle
  * tail    : pair_tail_forces on the (N, K2) list         x3 / cycle
  * rebuild : full build / 3B refilter (cadence-weighted)  ~1 / cycle

plus micro-phases inside the inner step: the position gather alone,
the pair math alone, staleness checks, the Langevin update.

Writes benchmarks_data/artifacts/anatomy_3l.json.
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

sys.path.insert(0, REPO)

from uf3_tpu.data.atoms import bulk  # noqa: E402
from uf3_tpu.forcefield import units  # noqa: E402
from uf3_tpu.forcefield.md import MDSystem  # noqa: E402
from uf3_tpu.ops import neighbors as nb  # noqa: E402
from uf3_tpu.ops import pallas_trio as pt  # noqa: E402
from uf3_tpu.regression import least_squares as ls  # noqa: E402

OUT = os.path.join(REPO, "benchmarks_data", "artifacts",
                   "anatomy_3l.json")
SCAN_LEN = 30


def chain_ms(step_fn, x0, repeats=3):
    """Per-iteration ms of ``step_fn`` (positions -> positions) inside
    a jitted lax.scan -- measures the steady-state kernel cost without
    the per-launch dispatch round-trip."""
    @jax.jit
    def loop(x):
        def body(c, _):
            return step_fn(c), None
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
    n = len(geom)
    dtype = (jnp.float32 if jax.devices()[0].platform != "cpu"
             else jnp.float64)
    system = MDSystem(model, geom, dtype=dtype, rebuild_every=27,
                      skin=0.5, skin_2b=1.2, capacity_2b=72,
                      capacity_3b=16, n_respa=9, respa_mid=3)
    state = system.init_state(temperature=300.0, seed=0)
    state = system.run(state, n_steps=135, dt_fs=2.0,
                       thermostat="langevin", temperature=300.0)
    jax.block_until_ready(state.positions)

    x, nbr2, nbr3, cell = (state.positions, state.nbr2, state.nbr3,
                           state.cell)
    cache2 = pt.build_pair_cache(nbr2.idx, nbr2.shift, nbr2.mask,
                                 cell, dtype)
    cache3 = pt.build_trio_cache(nbr3, cell, dtype)
    spec, coeff = system.pair_fast
    tb = system.trio_bundle
    r_lo, r_hi = system.respa_switch
    eps = jnp.asarray(1e-30, dtype)

    def wiggle(x, f):
        # data dependency without moving the atoms
        return x + eps * f

    phases = {}
    phases["null_scan"] = chain_ms(lambda x: x * (1.0 + eps), x)

    def inner_force(x):
        _, f, _ = pt.pair_short_forces(
            coeff, x, cell, nbr3, spec_pair=spec,
            n_basis_pair=spec.n_basis, with_energy=False,
            r_lo=r_lo, r_hi=r_hi, cache3=cache3)
        return wiggle(x, f)

    def gather_only(x):
        pj = pt.gather_rows_blocks(x, cache3.idx_flats, n)
        comps = tuple(pj[..., c] + cache3.sd[c]
                      - x[:, c][:, None] for c in range(3))
        return x + eps * jnp.stack([jnp.sum(c, axis=1)
                                    for c in comps], axis=-1)

    comps0 = tuple(
        jnp.asarray(c) for c in jax.jit(
            lambda x: pt.pair_short_forces(
                coeff, x, cell, nbr3, spec_pair=spec,
                n_basis_pair=spec.n_basis, with_energy=False,
                r_lo=r_lo, r_hi=r_hi, cache3=cache3)[2])(x))

    def inner_math(x):
        _, f, _ = pt.pair_short_forces(
            coeff, x, cell, nbr3, spec_pair=spec,
            n_basis_pair=spec.n_basis, with_energy=False,
            r_lo=r_lo, r_hi=r_hi, cache3=cache3,
            comps=tuple(c + eps * x[0, 0] for c in comps0))
        return wiggle(x, f)

    def trio_reuse(x):
        _, f = pt.trio_forces_unrolled(
            tb.grid, x, cell, nbr3.idx, nbr3.shift, nbr3.mask,
            nbr3.rev, spec_l=tb.spec_l, spec_n=tb.spec_n,
            l_basis=tb.l_basis, n_basis=tb.n_basis,
            with_energy=False, active_bc=tb.active_bc,
            window=tb.window, cache=cache3,
            comps=tuple(c + eps * x[0, 0] for c in comps0))
        return wiggle(x, f)

    def trio_tri(x):
        _, f = pt.trio_forces_unrolled(
            tb.grid, x, cell, nbr3.idx, nbr3.shift, nbr3.mask,
            nbr3.rev, spec_l=tb.spec_l, spec_n=tb.spec_n,
            l_basis=tb.l_basis, n_basis=tb.n_basis,
            with_energy=False, active_bc=tb.active_bc,
            window=tb.window, triangle=True, cache=cache3,
            comps=tuple(c + eps * x[0, 0] for c in comps0))
        return wiggle(x, f)

    def tail_force(x):
        _, f = pt.pair_tail_forces(
            coeff, x, cell, nbr2, spec_pair=spec,
            n_basis_pair=spec.n_basis, with_energy=False,
            r_lo=r_lo, r_hi=r_hi, cache2=cache2)
        return wiggle(x, f)

    def stale_check(x):
        s = (nb.needs_rebuild(nbr2, x, system.skin_2b)
             | nb.needs_rebuild(nbr3, x, system.skin))
        return x * (1.0 + eps * s.astype(dtype))

    key0 = jax.random.key(0, impl="rbg")

    def langevin(x):
        # fold the key from x so the scan carries a dependency
        key = jax.random.fold_in(key0, (x[0, 0] * 0).astype(jnp.int32))
        c1 = jnp.exp(-jnp.asarray(2.0 / units.ps * 2.0 * units.fs,
                                  dtype))
        cn = jnp.sqrt((1 - c1 ** 2) * units.kB * 300.0
                      / system.masses)[:, None]
        noise = jax.random.normal(key, x.shape, dtype=dtype)
        return x * (1.0 + eps) + eps * (c1 * cn * noise)

    def refilter(x):
        n3 = nb.filter_neighbor_list(
            nbr2, x, cell, system.r_cut_3b + system.skin,
            system.capacity_3b)
        return x + eps * n3.shift[:, :3, 0]

    for name, fn in [("inner_force_fresh_gather", inner_force),
                     ("gather_only", gather_only),
                     ("inner_math_only", inner_math),
                     ("trio_map_comps_reuse", trio_reuse),
                     ("trio_map_triangle", trio_tri),
                     ("tail_force", tail_force),
                     ("stale_check_both", stale_check),
                     ("langevin_rbg", langevin),
                     ("rebuild_3b_filter", refilter)]:
        phases[name] = chain_ms(fn, x)

    # full rebuild is once-per-cycle; standalone timing is fine at
    # its ~25 ms scale
    @jax.jit
    def rebuild_full(x):
        return system.build_lists(x, cell, wrapped=True)

    jax.block_until_ready(rebuild_full(x))
    t0 = time.perf_counter()
    for _ in range(5):
        out = rebuild_full(x)
    jax.block_until_ready(out)
    phases["rebuild_full_standalone"] = (time.perf_counter()
                                         - t0) / 5 * 1e3

    null = phases["null_scan"]
    net = {k: round(v - null, 4) for k, v in phases.items()
           if k not in ("null_scan", "rebuild_full_standalone")}

    # end-to-end per-step from the production launch (median of 3)
    state = system.run(state, n_steps=540, dt_fs=2.0,
                       thermostat="langevin", temperature=300.0,
                       launch_chunks=10, sync=False)
    jax.block_until_ready(state.positions)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state = system.run(state, n_steps=540, dt_fs=2.0,
                           thermostat="langevin", temperature=300.0,
                           launch_chunks=10, sync=False)
        jax.block_until_ready(state.positions)
        times.append(time.perf_counter() - t0)
    assert not system.overflowed(state)
    e2e_ms = sorted(times)[1] / 540 * 1e3

    # cycle model at the shipped cadence: 27 inner + 9 trio + 3 tail
    # + ~0.6 refilters per 27-step cycle (refilter fires when 3B
    # drift crosses 0.4x skin at a chunk boundary) + per-step
    # bookkeeping (stale checks + langevin ride the inner scan)
    model_ms = (27 * net["inner_force_fresh_gather"]
                + 9 * net["trio_map_comps_reuse"]
                + 3 * net["tail_force"]
                + 27 * (net["stale_check_both"]
                        + net["langevin_rbg"])
                + 0.6 * net["rebuild_3b_filter"]) / 27
    out = {
        "config": {"n_atoms": n, "n_respa": 9, "respa_mid": 3,
                   "rebuild_every": 27, "capacity_2b": 72,
                   "capacity_3b": 16,
                   "platform": jax.devices()[0].platform},
        "scan_chained_ms": {k: round(v, 4) for k, v in phases.items()},
        "net_of_null_ms": net,
        "e2e_ms_per_step": round(e2e_ms, 4),
        "cycle_model_ms_per_step": round(model_ms, 4),
        "unmodeled_ms_per_step": round(e2e_ms - model_ms, 4),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
