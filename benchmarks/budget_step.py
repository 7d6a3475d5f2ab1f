"""
Speed-of-light budget for one MD step at the SHIPPED bench config:
3-level r-RESPA, n_respa=9 / respa_mid=3 / rebuild_every=27 (the
round-4 budget described the obsolete 2-level formulation; VERDICT r4
item 1).  Per 27-step rebuild cycle the engine runs 27 row-local
switched-pair inner steps on the (N, K3) rows, 9 trio maps (one per
mid step, reusing the inner gather), 3 pair tails on the (N, K2)
rows, and ~0.6 eager 3B refilters.

Round-3 verdict asked for the arithmetic that turns "how far is 5e7
atom-steps/s?" into a checkable table: flops and HBM bytes per step,
the implied speed-of-light step time for (a) the current VPU/gather
formulation and (b) an MXU-dense reformulation, and the measured MFU.

Op counts are derived from the *static* kernel structure (the live
(b, c) block list, basis windows, capacities) -- the same quantities
the kernels specialize on -- so the table tracks the code.  Measured
times come from the newest anatomy artifact
(benchmarks_data/artifacts/anatomy_*.json) plus the throughput gate.

Reference analogue: the upstream production inner loop is the C++
LAMMPS `pair_style uf3` (lammps_plugin/README.rst:58-74); its CPU
2-body table path costs ~1.15 us/atom/step (BASELINE.md).

Chip model (TPU v5e, single chip):
  MXU peak        197 TFLOP/s bf16 (f32-class via bf16_3x ~= /3)
  VPU             8x128 lanes; measured sustained ~1.6 Tops/s f32
                  (anatomy vpu probes; latency chains measure less)
  HBM             819 GB/s
  gather engine   measured 2.4-7.7 ns/row (XLA row gathers; width-
                  independent below ~32 B/row)

Writes benchmarks_data/artifacts/budget_step.json.
"""

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VPU_SOL_TOPS = 1.9e12      # 1024 lanes * 0.94 GHz * 2 (FMA)
VPU_MEASURED = 1.6e12      # sustained on the trio-map op mix
MXU_BF16 = 197e12
HBM_BPS = 819e9
GATHER_NS_PER_ROW = 1.02   # measured r5: anatomy_3l gather_only
                           # minus inner_math = 0.160 ms / 157k rows

N_ATOMS = 9826
K3 = 16                    # trio capacity (bench config)
K2 = 72                    # pair capacity
# shipped cadence (bench.py defaults; overridable: budget_step.py
# [n_respa respa_mid rebuild_every])
N_RESPA = int(sys.argv[1]) if len(sys.argv) > 1 else 12
RESPA_MID = int(sys.argv[2]) if len(sys.argv) > 2 else 6
REBUILD_EVERY = int(sys.argv[3]) if len(sys.argv) > 3 else 36


def trio_map_ops(n_atoms, k, n_active_bc, n_b, c_window,
                 triangle=False):
    """Approximate op count (1 op = 1 VPU lane-op; FMA = 2) of the
    fused pair-lane trio map (_trio_block_compute), per step.  The
    (N, K*K) pair-lane stage dominates; (N, K) stages are counted
    coarsely.  Numbers for the bench model: n_active_bc=27, n_b=3,
    c_window=9."""
    lanes_kk = n_atoms * (k * k if not triangle
                          else ((k * (k - 1) // 2 + 127) // 128) * 128)
    lanes_k = n_atoms * k
    per_kk = (
        11                      # r_mn: 3 comps diff+square, sqrt
        + 3                     # pair mask
        + 136                   # third-leg de Boor window (8 knots,
                                # degree recursion w/ guarded divides)
        + 12 + 16 * c_window    # one-hot ext + 4-tap FMA x (val+der)
        + n_active_bc * 4       # d1b/d3b FMA chains
        + n_active_bc * 2       # h_bc lane repeats (data movement)
        + n_b * 4 + n_b         # t1/t3 accumulate + b_col tiles
        + 10                    # g3p divide, v3 partial products
    )
    per_k = (
        14                      # displacement assembly + r
        + 100                   # A-leg de Boor + window scatter
        + 40                    # short-range pair chain + switch
        + 20                    # reduces, center-force FMA
    )
    return per_kk * lanes_kk + per_k * lanes_k


def pair_tail_ops(n_atoms, k2, n_basis):
    """Cardinal 4-tap chain + per-tap coefficient selection on the
    (N, K2) pair lanes."""
    per_lane = (14              # displacements + r
                + 30            # cardinal blends (values + derivs)
                + 4 * n_basis   # per-tap coefficient one-hot select
                + 12)           # switch poly + force FMA
    return per_lane * n_atoms * k2


def pair_short_inner_ops(n_atoms, k3, n_basis_short):
    """The 3-level INNER step: switched short-range pair force on the
    (N, K3) rows -- cardinal 4-tap chain, per-tap coefficient select
    over the r_hi-trimmed basis window, quintic switch, force FMA.
    Row-local (no assembly)."""
    per_lane = (14              # displacements + r
                + 30            # cardinal blends (values + derivs)
                + 4 * n_basis_short   # per-tap coefficient select
                + 18)           # switch poly + V dS terms + force FMA
    return per_lane * n_atoms * k3


def useful_flops_per_step(n_atoms, coord_3b=14, coord_2b=65,
                          c_window=9, n_b=3):
    """Physics floor: ops that touch only REAL pairs/triangles with
    the minimal 4-tap spline algebra (no padding, no dense windows).
    Per triangle: 3 legs x 4-tap eval+deriv (~30 FMA) + 4x4x4
    tensor-product contraction against the grid (~64 FMA) + force
    product rule (~20).  Per pair: 4-tap eval+deriv + force (~20)."""
    triangles = n_atoms * coord_3b * (coord_3b - 1) // 2
    pairs = n_atoms * coord_2b
    return triangles * 2 * (30 + 64 + 20) + pairs * 2 * 20


def hbm_bytes_per_step(n_atoms, k2, k3, respa_inner=True):
    """HBM traffic of one inner step in the current formulation: the
    (N, K3) neighbor structures are re-read from HBM by the gathers
    each step (they do not persist in VMEM across scan iterations),
    positions/velocities/forces are read+written, and the packed
    partials (N, K3*8) make a round trip for the assembly gather."""
    f32 = 4
    state = 3 * (n_atoms * 3 * f32) * 2          # x, v, f r+w
    k = k3 if respa_inner else k2
    lists = n_atoms * k * f32 * 3                # idx + sd-ish + mask
    gathered = n_atoms * k * 3 * f32             # neighbor positions
    packed = n_atoms * k * 8 * f32 * 2           # partials out + back
    return state + lists + gathered + packed


def main():
    # live-block structure of the bench model (matches
    # build_trio_pallas on benchmarks_data/model_2and3.json: trims
    # zero 3 leading + 3 trailing basis fns per leg)
    n_active_bc, n_b, c_window = 27, 3, 9

    map_ops = trio_map_ops(N_ATOMS, K3, n_active_bc, n_b, c_window)
    map_ops_tri = trio_map_ops(N_ATOMS, K3, n_active_bc, n_b,
                               c_window, triangle=True)
    tail_ops = pair_tail_ops(N_ATOMS, K2, n_basis=18)
    inner_ops = pair_short_inner_ops(N_ATOMS, K3, n_basis_short=13)
    useful = useful_flops_per_step(N_ATOMS)

    inner_bytes = hbm_bytes_per_step(N_ATOMS, K2, K3)
    inner_gather_rows = N_ATOMS * K3        # positions per inner step
    assembly_rows = N_ATOMS * K3            # packed partials per MID
    gather_s = lambda rows: rows * GATHER_NS_PER_ROW * 1e-9

    budget = {
        "config": {"n_atoms": N_ATOMS, "capacity_2b": K2,
                   "capacity_3b": K3, "n_respa": N_RESPA,
                   "respa_mid": RESPA_MID,
                   "rebuild_every": REBUILD_EVERY,
                   "active_bc": n_active_bc, "c_window": c_window,
                   "n_basis_short": 13},
        "per_inner_step": {
            "pair_short_vpu_ops": inner_ops,
            "position_gather_rows": inner_gather_rows,
            "hbm_bytes": inner_bytes,
        },
        "per_mid_step_extra": {
            "trio_map_vpu_ops": map_ops,
            "trio_map_vpu_ops_triangle": map_ops_tri,
            "assembly_gather_rows": assembly_rows,
        },
        "per_outer_cycle_extra": {
            "pair_tail_vpu_ops": tail_ops,
            "tail_gather_rows": N_ATOMS * K2,
        },
        "useful_physics_flops_per_step": useful,
        "speed_of_light_ms": {
            # per-phase floors at measured sustained rates
            "inner_vpu": inner_ops / VPU_MEASURED * 1e3,
            "inner_gather": gather_s(inner_gather_rows) * 1e3,
            "trio_map_vpu": map_ops / VPU_MEASURED * 1e3,
            "trio_map_triangle_vpu": map_ops_tri / VPU_MEASURED * 1e3,
            "assembly_gather": gather_s(assembly_rows) * 1e3,
            "tail_vpu": tail_ops / VPU_MEASURED * 1e3,
            "tail_gather": gather_s(N_ATOMS * K2) * 1e3,
            "hbm_traffic_per_inner": inner_bytes / HBM_BPS * 1e3,
            # MXU-dense reformulation: tiny-matmul rate-limited
            "mxu_dense_tiny_matmul":
                (N_ATOMS * 256 * c_window * n_b * 2) / 0.13e12 * 1e3,
            # useful-flops floor at VPU / MXU peaks (any formulation)
            "useful_at_vpu_peak": useful / VPU_SOL_TOPS * 1e3,
            "useful_at_mxu_bf16": useful / MXU_BF16 * 1e3,
        },
    }

    # cycle-weighted speed-of-light per STEP for this formulation:
    # inner every step; trio map + assembly every RESPA_MID steps;
    # tail every N_RESPA steps.  FULL 256-lane map: the triangle
    # layout measured slower end-to-end (r5_sweep.json) and is not
    # shipped, so its halved op count is quoted but not budgeted.
    sol = budget["speed_of_light_ms"]
    per_step_floor = (
        sol["inner_vpu"] + sol["inner_gather"]
        + (sol["trio_map_vpu"] + sol["assembly_gather"])
        / RESPA_MID
        + (sol["tail_vpu"] + sol["tail_gather"]) / N_RESPA)

    # measured numbers: scan-chained anatomy + newest gate artifact
    measured = {}
    anat = os.path.join(REPO, "benchmarks_data", "artifacts",
                        "anatomy_3l.json")
    if os.path.exists(anat):
        with open(anat) as f:
            an = json.load(f)
        measured["anatomy_artifact"] = "anatomy_3l.json"
        measured["phase_ms_net_of_null"] = an.get("net_of_null_ms")
        measured["e2e_ms_per_step"] = an.get("e2e_ms_per_step")
        measured["cycle_model_ms_per_step"] = an.get(
            "cycle_model_ms_per_step")
    gates = sorted(glob.glob(os.path.join(
        REPO, "benchmarks_data", "artifacts", "bench_*.json")),
        key=os.path.getmtime)
    if gates:
        with open(gates[-1]) as f:
            gate = json.load(f)
        measured["gate_artifact"] = os.path.basename(gates[-1])
        measured["gate_atom_steps_per_s"] = gate.get("value")
        measured["gate_breakdown_ms"] = gate.get("breakdown_ms")
    if measured.get("e2e_ms_per_step"):
        t = measured["e2e_ms_per_step"] * 1e-3
        # cycle-weighted delivered op rate vs VPU peak
        ops_per_step = (inner_ops + map_ops_tri / RESPA_MID
                        + tail_ops / N_RESPA)
        measured["mfu_vs_vpu_peak"] = round(
            (ops_per_step / VPU_SOL_TOPS) / t, 4)
        measured["useful_mfu_vs_vpu_peak"] = round(
            (useful / VPU_SOL_TOPS) / t, 4)
        measured["useful_mfu_vs_mxu_bf16"] = round(
            (useful / MXU_BF16) / t, 6)
    budget["measured"] = measured

    ceiling = N_ATOMS / (per_step_floor * 1e-3)
    budget["conclusions"] = {
        "per_step_floor_ms_this_formulation": round(per_step_floor, 4),
        "single_chip_ceiling_atom_steps_per_s": round(ceiling, 0),
        "gap_to_north_star": (
            "BASELINE.json's 5e7 atom-steps/s names a v5e-8 SLICE: "
            "at 8-way halo decomposition the per-chip requirement is "
            "6.25e6 atom-steps/s (multichip_model.json quantifies "
            "the halo comm + redundancy tax).  Single-chip floor "
            f"above gives ceiling {ceiling:.3}; the distance between "
            "the measured e2e step and this floor is scan/switch "
            "overhead + the refilter amortization, not kernel time."),
        "what_limits_us": (
            "The step is now split-limited: the inner pair step is "
            "gather+select bound on (N, 16) rows, the trio map is "
            "VPU-bound (~1.6 Tops/s sustained) at 1/3 cadence, the "
            "tail is gather-bound on (N, 72) rows at 1/9 cadence.  "
            "Remaining levers: in-VMEM windowed gathers (blocked "
            "on Mosaic sublane dynamic-gather support), further "
            "cadence stretching (bounded by r-RESPA outer-step "
            "resonances, validate_final_*.json: 32 fs resonant, "
            "24 fs clean with the 1.0-A-wide switch), and the "
            "triangle layout IF its role data movement can be "
            "hidden (currently loses end-to-end)."),
    }

    out_path = os.path.join(REPO, "benchmarks_data", "artifacts",
                            "budget_step.json")
    with open(out_path, "w") as f:
        json.dump(budget, f, indent=1)
    print(json.dumps(budget, indent=1))


if __name__ == "__main__":
    main()
