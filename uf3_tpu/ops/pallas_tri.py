"""
Fused Pallas TPU kernel for the r-RESPA inner force step: triangle-
lane 3-body map + switched short-range 2-body on the compact (N, K3)
displacement rows, in ONE VMEM-resident kernel per atom block.

This is the production Mosaic twin of `pallas_trio.trio_short_forces`
(itself the TPU-native re-design of the reference's production inner
loop, the LAMMPS ``pair_style uf3`` C++/Kokkos kernel --
/root/reference/lammps_plugin/README.rst:58-74; the Python evaluation
semantics it reproduces live in /root/reference/uf3/forcefield/
calculator.py:213-343).  Differences from the XLA pair-lane map:

  * strict-upper-triangle lanes (m < n): 120 live lanes in one
    128-lane tile at K = 16 -- HALF the ordered K*K pair work.  The
    XLA twin of this layout loses 2.4x because the m/n role
    expansions materialize through HBM (measured, ab_sweep2.json);
    here they are single in-register lane shuffles:
    ``take_along_axis`` with a CONSTANT index vector on a lane-tiled
    operand, which Mosaic lowers to tpu.dynamic_gather in VMEM.
  * the model's coefficient grid, pair coefficients, and knot
    windows are baked into the kernel as immediates (they are fixed
    for the lifetime of an MDSystem; rebaking = retracing, which the
    jit cache already keys on).
  * triangle-lane -> slot reductions run as one constant 0/1 matmul
    on the MXU per reduced quantity.

Outputs per atom block: a header row (e3, e2_short, center force) and
the slot-aligned packed partials in exactly the layout
`pallas_trio._assemble_forces` consumes, so the cross-atom term stays
the one XLA row gather outside the kernel.
"""

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uf3_tpu.ops.pallas_trio import LegSpec, LINEAR, _tri_layout

HEAD_E3, HEAD_E2, HEAD_FX, HEAD_FY, HEAD_FZ = range(5)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class TriKernelStatics(NamedTuple):
    """Everything the kernel closes over (host-side constants)."""
    spec_l: LegSpec
    spec_n: LegSpec
    grid: Tuple            # nested tuple grid[l][b][c] floats (window)
    window: Tuple          # (w_lo, w_hi, c_lo, c_hi)
    active_bc: Tuple
    pair_coeff: Tuple      # pair coefficients (floats)
    spec_pair: LegSpec
    r_lo: float
    r_hi: float


def _deboor4_const(r, idx, spec: LegSpec):
    """Values and d/dr of the 4 active cubic basis functions with
    CLOSED-FORM LINEAR knots (t_k = u0 + k h, index pre-clipped):
    the de Boor triangle with knot values as immediates where the
    clip is inactive.  Mirrors pallas_trio._deboor4 for kind=LINEAR.
    """
    assert spec.kind == LINEAR
    idx_f = idx.astype(r.dtype)
    tk = [spec.u0 + jnp.clip(idx_f + (j - 3), 0, spec.n_int) * spec.h
          for j in range(8)]

    def safe_div(num, den):
        return jnp.where(den != 0, num / jnp.where(den == 0, 1.0, den),
                         jnp.zeros_like(num))

    zero = jnp.zeros_like(r)
    b = [zero, zero, zero, jnp.ones_like(r)]
    for k in range(1, 3):
        new = [zero, zero, zero, zero]
        for p in range(3 - k, 4):
            term = safe_div(r - tk[p], tk[p + k] - tk[p]) * b[p]
            if p + 1 <= 3:
                term = term + safe_div(tk[p + k + 1] - r,
                                       tk[p + k + 1] - tk[p + 1]) \
                    * b[p + 1]
            new[p] = term
        b = new
    values = [zero, zero, zero, zero]
    derivs = [zero, zero, zero, zero]
    for p in range(0, 4):
        term = safe_div(r - tk[p], tk[p + 3] - tk[p]) * b[p]
        dterm = 3.0 * safe_div(b[p], tk[p + 3] - tk[p])
        if p + 1 <= 3:
            term = term + safe_div(tk[p + 4] - r,
                                   tk[p + 4] - tk[p + 1]) * b[p + 1]
            dterm = dterm - 3.0 * safe_div(b[p + 1],
                                           tk[p + 4] - tk[p + 1])
        values[p] = term
        derivs[p] = dterm
    return values, derivs


def _basis_lists(r, valid_f, spec: LegSpec, lo: int, hi: int):
    """Per-basis-index 2D value/derivative arrays over the static
    window [lo, hi): the list-of-(rows, lanes) twin of
    pallas_trio._dense_basis (Mosaic dislikes >2D temporaries).
    Returns (values[lo..hi), derivs[lo..hi), each a python list)."""
    inv_h = 1.0 / spec.h
    tt = (r - spec.u0) * inv_h
    idx = jnp.clip(jnp.floor(tt).astype(jnp.int32), 0,
                   spec.n_int - 1)
    taps_v, taps_d = _deboor4_const(r, idx, spec)
    gate = (valid_f * (r >= spec.t_min).astype(r.dtype)
            * (r <= spec.t_max).astype(r.dtype))
    taps_v = [v * gate for v in taps_v]
    taps_d = [d * gate for d in taps_d]
    values, derivs = [], []
    for b in range(lo, hi):
        v = jnp.zeros_like(r)
        d = jnp.zeros_like(r)
        for tap in range(4):
            sel = (idx == b - tap)
            v = jnp.where(sel, taps_v[tap], v)
            d = jnp.where(sel, taps_d[tap], d)
        values.append(v)
        derivs.append(d)
    return values, derivs


def _pair_chain_const(r, spec: LegSpec, coeff: Tuple):
    """V(r), dV/dr of the pair spline with constant coefficients
    (cardinal blends for uniform knots, else closed-form de Boor)."""
    if spec.cardinal:
        inv_h = 1.0 / spec.h
        tt = (r - spec.u0) * inv_h
        idx = jnp.clip(jnp.floor(tt).astype(jnp.int32), 0,
                       spec.n_int - 1)
        f = tt - idx.astype(r.dtype)
        f2 = f * f
        f3 = f2 * f
        sixth = 1.0 / 6.0
        values = [(1.0 - 3.0 * f + 3.0 * f2 - f3) * sixth,
                  (4.0 - 6.0 * f2 + 3.0 * f3) * sixth,
                  (1.0 + 3.0 * f + 3.0 * f2 - 3.0 * f3) * sixth,
                  f3 * sixth]
        half_h = 0.5 * inv_h
        derivs = [-(1.0 - 2.0 * f + f2) * half_h,
                  (3.0 * f2 - 4.0 * f) * half_h,
                  (1.0 + 2.0 * f - 3.0 * f2) * half_h,
                  f2 * half_h]
    else:
        inv_h = 1.0 / spec.h
        tt = (r - spec.u0) * inv_h
        idx = jnp.clip(jnp.floor(tt).astype(jnp.int32), 0,
                       spec.n_int - 1)
        values, derivs = _deboor4_const(r, idx, spec)
    v_sum = jnp.zeros_like(r)
    dv_sum = jnp.zeros_like(r)
    n_basis = len(coeff)
    for tap in range(4):
        c_tap = jnp.zeros_like(r)
        for w in range(n_basis):
            if coeff[w] != 0.0:
                c_tap = jnp.where(idx + tap == w, coeff[w], c_tap)
        v_sum = v_sum + values[tap] * c_tap
        dv_sum = dv_sum + derivs[tap] * c_tap
    return v_sum, dv_sum


def _role_maps(k: int):
    """Constant lane-index vectors and reduce matrices for the
    triangle layout: m_map/n_map expand (., K)-slot arrays onto the
    triangle lanes via take_along_axis; red_m/red_n (lanes, K) 0/1
    matrices reduce back per slot role."""
    n_lanes, lanes, m_idx, n_idx = _tri_layout(k)
    m_map = np.zeros(lanes, dtype=np.int32)
    n_map = np.zeros(lanes, dtype=np.int32)
    m_map[:n_lanes] = m_idx
    n_map[:n_lanes] = n_idx
    red_m = np.zeros((lanes, k), dtype=np.float32)
    red_n = np.zeros((lanes, k), dtype=np.float32)
    red_m[np.arange(n_lanes), m_idx] = 1.0
    red_n[np.arange(n_lanes), n_idx] = 1.0
    live = np.zeros((1, lanes), dtype=np.float32)
    live[0, :n_lanes] = 1.0
    return lanes, m_map, n_map, red_m, red_n, live


def make_tri_kernel(st: TriKernelStatics, k: int, ba: int,
                    with_energy: bool, dtype=jnp.float32,
                    role_impl: str = "gather",
                    reduce_impl: str = "matmul"):
    """Build the fused kernel body.  Inputs: cx, cy, cz, valid
    (ba, K).  Outputs: head (ba, 8) and partials (ba, K*8) in
    _pack_partials layout.

    role_impl: how K-slot arrays expand onto the triangle lanes --
    "gather" (constant-index tpu.dynamic_gather) or "concat" (static
    lane-slice broadcasts + one concatenate).
    reduce_impl: lane->slot reduction -- "matmul" (one 0/1 MXU pass)
    or "slices" (contiguous m-run slice sums; n-reduce stays matmul).
    """
    lanes, m_map, n_map, red_m, red_n, _live = _role_maps(k)
    n_lanes = k * (k - 1) // 2
    tiles = -(-lanes // k)
    w_lo, w_hi, c_lo, c_hi = st.window
    grid = st.grid

    def kernel(cx_ref, cy_ref, cz_ref, valid_ref,
               mn_map_ref, red_ref, perm_ref,
               head_ref, part_ref):
        # constant index maps / reduce matrix arrive as inputs
        # (pallas kernels cannot capture array constants)
        m_map_j = mn_map_ref[:, :lanes]
        n_map_j = mn_map_ref[:, lanes:]
        red_mn = red_ref[:]
        perm_j = perm_ref[:]
        live_j = (jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
                  < n_lanes).astype(dtype)

        if role_impl == "gather":
            def role(x, idx_map):
                t = jnp.tile(x, (1, tiles))[:, :lanes]
                return jnp.take_along_axis(t, idx_map, axis=1)
        else:
            def role(x, idx_map):
                if idx_map is m_map_j:
                    parts = [jnp.broadcast_to(x[:, m:m + 1],
                                              (ba, k - 1 - m))
                             for m in range(k - 1)]
                else:
                    parts = [x[:, m + 1:] for m in range(k - 1)]
                out = jnp.concatenate(parts, axis=1)
                pad = lanes - out.shape[1]
                return jnp.pad(out, ((0, 0), (0, pad))) if pad \
                    else out

        def matmul_red(t):
            return jnp.dot(t, red_mn,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=t.dtype)

        if reduce_impl == "matmul":
            def red_parts(t):
                out = matmul_red(t)
                return out[:, :k], out[:, k:]
        else:
            def red_parts(t):
                cols = []
                start = 0
                for m in range(k - 1):
                    run = k - 1 - m
                    cols.append(jnp.sum(t[:, start:start + run],
                                        axis=1, keepdims=True))
                    start += run
                cols.append(jnp.zeros((ba, 1), t.dtype))
                m_part = jnp.concatenate(cols, axis=1)
                return m_part, matmul_red(t)[:, k:]

        def reduce_mn(t):
            a, b = red_parts(t)
            return a + b

        comps = (cx_ref[:], cy_ref[:], cz_ref[:])
        valid_f = valid_ref[:]
        cx, cy, cz = comps
        r2 = cx * cx + cy * cy + cz * cz
        r = jnp.sqrt(jnp.where(r2 > 0, r2, 1.0))
        # leg basis over the live window (values + derivatives)
        a_v, a_d = _basis_lists(r, valid_f, st.spec_l, w_lo, w_hi)
        # triangle-lane displacements
        dm = [role(c, m_map_j) for c in comps]
        dn = [role(c, n_map_j) for c in comps]
        diffs = [b - a for a, b in zip(dm, dn)]
        r_mn2 = (diffs[0] * diffs[0] + diffs[1] * diffs[1]
                 + diffs[2] * diffs[2])
        r_mn = jnp.sqrt(jnp.where(r_mn2 > 0, r_mn2, 1.0))
        pair_valid = (role(valid_f, m_map_j) * role(valid_f, n_map_j)
                      * (r_mn2 > 1e-10).astype(dtype) * live_j)
        c_v, c_d = _basis_lists(r_mn, pair_valid, st.spec_n,
                                c_lo, c_hi)
        # h[b][c] = sum_l a_l * G[l, b, c] as constant FMA chains
        h_v = {}
        h_d = {}
        for b_idx, c_list in st.active_bc:
            for c_idx in c_list:
                hv = None
                hd = None
                for li in range(w_lo, w_hi):
                    g = grid[li][b_idx][c_idx]
                    if g == 0.0:
                        continue
                    hv = a_v[li - w_lo] * g if hv is None \
                        else hv + a_v[li - w_lo] * g
                    hd = a_d[li - w_lo] * g if hd is None \
                        else hd + a_d[li - w_lo] * g
                zero = jnp.zeros_like(r)
                h_v[(b_idx, c_idx)] = zero if hv is None else hv
                h_d[(b_idx, c_idx)] = zero if hd is None else hd
        value = None
        t1 = None
        t2 = None
        t3 = None
        for b_idx, c_list in st.active_bc:
            db = None
            d1b = None
            d3b = None
            for c_idx in c_list:
                hm = role(h_v[(b_idx, c_idx)], m_map_j)
                h1m = role(h_d[(b_idx, c_idx)], m_map_j)
                cp = c_v[c_idx - c_lo]
                dcp = c_d[c_idx - c_lo]
                db = cp * hm if db is None else db + cp * hm
                d1b = cp * h1m if d1b is None else d1b + cp * h1m
                d3b = dcp * hm if d3b is None else d3b + dcp * hm
            b_val = role(a_v[b_idx - w_lo], n_map_j)
            b_der = role(a_d[b_idx - w_lo], n_map_j)
            if with_energy:
                value = b_val * db if value is None \
                    else value + b_val * db
            t1 = b_val * d1b if t1 is None else t1 + b_val * d1b
            t2 = b_der * db if t2 is None else t2 + b_der * db
            t3 = b_val * d3b if t3 is None else t3 + b_val * d3b
        # slot reductions (one MXU matmul or slice sums per quantity)
        w_m = red_parts(t1)[0] + red_parts(t2)[1]
        wr = w_m / r
        g3p = t3 / r_mn
        s3 = reduce_mn(g3p)
        v3 = [red_parts(g3p * dn[c])[0] + red_parts(g3p * dm[c])[1]
              for c in range(3)]
        # switched short-range pair on the same rows
        valid2 = (valid_f
                  * (r > st.spec_pair.t_min).astype(dtype)
                  * (r < st.spec_pair.t_max).astype(dtype))
        v2, dv2 = _pair_chain_const(r, st.spec_pair, st.pair_coeff)
        width = st.r_hi - st.r_lo
        u = jnp.clip((r - st.r_lo) / width, 0.0, 1.0)
        u2 = u * u
        u3 = u2 * u
        s = 1.0 - (10.0 * u3 - 15.0 * u3 * u + 6.0 * u3 * u2)
        ds = -(30.0 * u2 - 60.0 * u3 + 30.0 * u2 * u2) / width
        w_pair = 2.0 * (dv2 * s + v2 * ds) * valid2 / r
        fc = [jnp.sum(wr * dc + w_pair * dc, axis=1, keepdims=True)
              for dc in comps]
        if with_energy:
            e3 = jnp.sum(value, axis=1, keepdims=True)
            e2s = jnp.sum(v2 * s * valid2, axis=1, keepdims=True)
        else:
            e3 = jnp.zeros((ba, 1), dtype)
            e2s = jnp.zeros((ba, 1), dtype)
        zero_col = jnp.zeros((ba, 1), dtype)
        head_ref[:] = jnp.concatenate(
            [e3, e2s, fc[0], fc[1], fc[2], zero_col, zero_col,
             zero_col], axis=1)
        # packed partials, interleaved to the _pack_partials layout
        # (k*8 lanes: [s1, s3, v3x, v3y, v3z, 0, 0, 0] per slot) with
        # one constant-index lane shuffle
        flat = jnp.concatenate(
            [w_m, s3, v3[0], v3[1], v3[2],
             jnp.zeros((ba, 3 * k), dtype)], axis=1)   # (ba, 8k)
        part_ref[:] = jnp.take_along_axis(flat, perm_j, axis=1)

    return kernel


def build_tri_statics(model, n_respa_switch, dtype=jnp.float32):
    """TriKernelStatics from a fitted unary 2+3B model, or None when
    the model shape is not eligible (mirrors build_trio_pallas +
    build_pair_fast eligibility, LINEAR trio knots only)."""
    from uf3_tpu.ops.pallas_trio import (build_pair_fast,
                                         build_trio_pallas)
    bundle = build_trio_pallas(model, dtype=dtype)
    pair = build_pair_fast(model, dtype=dtype)
    if bundle is None or pair is None:
        return None
    if not bundle.symmetric:
        return None
    if bundle.spec_l.kind != LINEAR or bundle.spec_n.kind != LINEAR:
        return None
    spec_pair, pair_coeff = pair
    r_lo, r_hi = n_respa_switch
    grid_np = np.asarray(bundle.grid, dtype=np.float64)
    grid_t = tuple(tuple(tuple(float(x) for x in row)
                         for row in plane) for plane in grid_np)
    return TriKernelStatics(
        spec_l=bundle.spec_l, spec_n=bundle.spec_n, grid=grid_t,
        window=bundle.window, active_bc=bundle.active_bc,
        pair_coeff=tuple(float(c) for c in np.asarray(pair_coeff)),
        spec_pair=spec_pair, r_lo=float(r_lo), r_hi=float(r_hi))


def trio_short_forces_fused(st: TriKernelStatics, positions, cell,
                            nbr3, cache3=None,
                            with_energy: bool = False,
                            block_atoms: int = 256,
                            interpret: bool = False):
    """Drop-in twin of pallas_trio.trio_short_forces on the fused
    Pallas kernel: same (e_short2, e3_atoms, forces) contract, same
    XLA gather/assembly on either side of the map."""
    from uf3_tpu.ops.pallas_trio import (_assemble_forces,
                                         build_trio_cache,
                                         gather_rows_blocks)
    dtype = positions.dtype
    n_atoms = positions.shape[0]
    if cache3 is None:
        cache3 = build_trio_cache(nbr3, cell, dtype)
    pj = gather_rows_blocks(positions, cache3.idx_flats, n_atoms)
    comps = tuple(pj[..., c] + cache3.sd[c]
                  - positions[:, c][:, None] for c in range(3))
    head, part = tri_inner_map(comps, cache3.valid, st,
                               block_atoms=block_atoms,
                               with_energy=with_energy,
                               interpret=interpret)
    r2 = comps[0] ** 2 + comps[1] ** 2 + comps[2] ** 2
    r = jnp.sqrt(jnp.where(r2 > 0, r2, 1.0))
    e3, forces = _assemble_forces(
        head[:, 0], (head[:, 2], head[:, 3], head[:, 4]), part,
        comps, r, cache3)
    e_short = jnp.sum(head[:, 1])
    return e_short, e3, forces


@functools.partial(jax.jit, static_argnames=("st", "block_atoms",
                                             "with_energy",
                                             "role_impl",
                                             "reduce_impl",
                                             "interpret"))
def tri_inner_map(comps, valid_f, st: TriKernelStatics,
                  block_atoms: int = 256,
                  with_energy: bool = False,
                  role_impl: str = "gather",
                  reduce_impl: str = "matmul",
                  interpret: bool = False):
    """Run the fused triangle kernel over all atom blocks.

    comps: 3-tuple of (N, K) displacement arrays; valid_f: (N, K)
    float mask.  Returns (head (N, 8), partials (N, K*8))."""
    n_atoms, k = comps[0].shape
    ba = block_atoms
    pad = (-n_atoms) % ba
    dtype = comps[0].dtype
    padded = [jnp.pad(c, ((0, pad), (0, 0))) for c in comps]
    valid_p = jnp.pad(valid_f, ((0, pad), (0, 0)))
    n_blocks = (n_atoms + pad) // ba
    kernel = make_tri_kernel(st, k, ba, with_energy, dtype=dtype,
                             role_impl=role_impl,
                             reduce_impl=reduce_impl)
    # constant operands (index maps, reduce matrix), shared per block
    lanes, m_map, n_map, red_m, red_n, _ = _role_maps(k)
    mn_map = jnp.asarray(np.broadcast_to(
        np.concatenate([m_map, n_map]), (ba, 2 * lanes)))
    red_mn = jnp.asarray(np.concatenate([red_m, red_n], axis=1),
                         dtype=dtype)
    perm = np.zeros(8 * k, dtype=np.int32)
    for slot in range(k):
        for ch in range(8):
            perm[slot * 8 + ch] = ch * k + slot
    perm_b = jnp.asarray(np.broadcast_to(perm, (ba, 8 * k)))
    blk = lambda d: pl.BlockSpec((ba, d), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    fixed = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    head, part = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[blk(k)] * 4 + [fixed(mn_map), fixed(red_mn),
                                 fixed(perm_b)],
        out_specs=(blk(8), blk(8 * k)),
        out_shape=(
            jax.ShapeDtypeStruct((n_atoms + pad, 8), dtype),
            jax.ShapeDtypeStruct((n_atoms + pad, 8 * k), dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*padded, valid_p, mn_map, red_mn, perm_b)
    return head[:n_atoms], part[:n_atoms]
