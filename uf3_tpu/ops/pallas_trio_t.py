"""
Mosaic-native transposed 3-body kernel: the atom axis rides the vector
lanes (128 atoms per program) and all pair/basis axes live on sublanes
or major dimensions, so every array is naturally tiled with no minor-dim
reshapes, no 1-bit minor inserts, and no padding waste -- the three
constraints Mosaic rejected in the atom-major formulation
(uf3_tpu/ops/pallas_trio.py, which remains the XLA fallback).

Math identical to _trio_block_compute: dense leg bases from closed-form
knot windows, H = G^T A on the MXU, and the L x NC static loop nest
accumulating T / T1 / T3 with in-register broadcasts.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uf3_tpu.ops.neighbors import cell_transform
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uf3_tpu.ops.pallas_trio import (LegSpec, _knot_value,
                                     _leg_interval)


def _deboor4_t(r, idx, spec: LegSpec):
    """Branchless de Boor (values + derivatives) on arbitrary-shape
    arrays; identical math to pallas_trio._deboor4."""
    tk = [_knot_value(spec, jnp.clip(idx + j - 3, 0, spec.n_int))
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
    values = []
    derivs = []
    for p in range(4):
        term = safe_div(r - tk[p], tk[p + 3] - tk[p]) * b[p]
        dterm = 3.0 * safe_div(b[p], tk[p + 3] - tk[p])
        if p + 1 <= 3:
            term = term + safe_div(tk[p + 4] - r,
                                   tk[p + 4] - tk[p + 1]) * b[p + 1]
            dterm = dterm - 3.0 * safe_div(b[p + 1],
                                           tk[p + 4] - tk[p + 1])
        values.append(term)
        derivs.append(dterm)
    return values, derivs


def _basis_taps(r, valid_f, spec: LegSpec):
    """De Boor tap values/derivatives + interval index + range mask:
    the compact precursor of a dense basis matrix (6 arrays shaped
    like r instead of 2 * n_basis slices -- keeps the Pallas kernel's
    VMEM footprint bounded)."""
    idx = _leg_interval(spec, r)
    values, derivs = _deboor4_t(r, idx, spec)
    in_range = (valid_f
                * (r >= spec.t_min).astype(r.dtype)
                * (r <= spec.t_max).astype(r.dtype))
    return values, derivs, idx, in_range


def _basis_slice(taps, s):
    """Value/derivative of basis function ``s`` from _basis_taps."""
    values, derivs, idx, in_range = taps
    rel = s - idx
    val = jnp.zeros_like(in_range)
    der = jnp.zeros_like(in_range)
    for tap in range(4):
        hit = (rel == tap)
        val = jnp.where(hit, values[tap], val)
        der = jnp.where(hit, derivs[tap], der)
    return val * in_range, der * in_range


def _basis_slices(r, valid_f, spec: LegSpec):
    """Per-basis-function value/derivative slices (python lists of
    arrays shaped like r) -- a dense basis matrix without a trailing
    basis axis, Mosaic-friendly."""
    taps = _basis_taps(r, valid_f, spec)
    value_slices = []
    deriv_slices = []
    for s in range(spec.n_basis):
        val, der = _basis_slice(taps, s)
        value_slices.append(val)
        deriv_slices.append(der)
    return value_slices, deriv_slices


def make_trio_kernel_t(spec_l: LegSpec, spec_n: LegSpec,
                       block_atoms: int, capacity: int,
                       l_basis: int, n_basis: int):
    """Atom-minor fused kernel: inputs d_t (K, 3, BA), valid_t (K, BA),
    grid g (L, M*NC); outputs energy (1, BA), f_center (3, BA),
    s1/s3 (K, BA), v3 (K, 3, BA)."""
    k, l_dim, nc = capacity, l_basis, n_basis

    def kernel(d_ref, valid_ref, grid_ref,
               energy_ref, force_ref, s1_ref, s3_ref, v3_ref):
        d = d_ref[:]                        # (K, 3, BA)
        valid_f = valid_ref[:]              # (K, BA) float
        r2 = d[:, 0, :] ** 2 + d[:, 1, :] ** 2 + d[:, 2, :] ** 2
        r = jnp.sqrt(jnp.where(r2 > 0, r2, 1.0))
        a_vals, a_ders = _basis_slices(r, valid_f, spec_l)
        # pair distances: r_mn (K_m, K_n, BA)
        d_mn = d[None, :, :, :] - d[:, None, :, :]   # (K, K, 3, BA)
        r_mn2 = (d_mn[:, :, 0, :] ** 2 + d_mn[:, :, 1, :] ** 2
                 + d_mn[:, :, 2, :] ** 2)
        r_mn = jnp.sqrt(jnp.where(r_mn2 > 0, r_mn2, 1.0))
        pair_f = (valid_f[None, :, :] * valid_f[:, None, :]
                  * (r_mn2 > 1e-10).astype(d.dtype))
        # pair-leg basis slices are produced lazily per c inside the
        # loop nest: keeping all 2 * NC dense (K, K, BA) slices live
        # blows the 16M VMEM budget
        c_taps = _basis_taps(r_mn, pair_f, spec_n)
        # H[m, (b, c), atom] = sum_a G[a, (b, c)] A[m, a, atom]:
        # one MXU matmul (L, M*NC)^T @ (L, K*BA)
        ba = d.shape[-1]
        a_mat = jnp.concatenate(
            [v[None] for v in a_vals], axis=0)       # (L, K, BA)
        da_mat = jnp.concatenate(
            [v[None] for v in a_ders], axis=0)
        g = grid_ref[:]                              # (L, M*NC)
        # contract L directly against the 3D basis stack: the result
        # is (M*NC, K, BA) with no 1D intermediates (Mosaic rejects
        # vector<n> -> vector<a x b x c> reshapes)
        h = jax.lax.dot_general(
            g, a_mat, (((0,), (0,)), ((), ())),
            preferred_element_type=d.dtype)          # (M*NC, K, BA)
        h1 = jax.lax.dot_general(
            g, da_mat, (((0,), (0,)), ((), ())),
            preferred_element_type=d.dtype)
        # static loop nest, c-major: each pair-leg basis slice is
        # built once, then the b-contraction accumulates outer-product
        # broadcasts on (K_m, K_n, BA); sums over (b, c) commute with
        # the b-major form
        value = jnp.zeros((k, k, ba), dtype=d.dtype)
        t1 = jnp.zeros((k, k, ba), dtype=d.dtype)
        t3 = jnp.zeros((k, k, ba), dtype=d.dtype)
        for c_idx in range(nc):
            c_val, c_der = _basis_slice(c_taps, c_idx)  # (K, K, BA)
            acc_h = jnp.zeros((k, k, ba), dtype=d.dtype)
            acc_h1 = jnp.zeros((k, k, ba), dtype=d.dtype)
            for b_idx in range(l_dim):
                b_col = a_mat[b_idx][None, :, :]        # n: (1, K, BA)
                row = b_idx * nc + c_idx
                acc_h = acc_h + b_col * h[row][:, None, :]
                acc_h1 = acc_h1 + b_col * h1[row][:, None, :]
            value = value + c_val * acc_h
            t1 = t1 + c_val * acc_h1
            t3 = t3 + c_der * acc_h
        energy_ref[:] = 0.5 * jnp.sum(value, axis=(0, 1),
                                      keepdims=False)[None, :]
        w_m = jnp.sum(t1, axis=1)                    # (K, BA)
        unit = d / r[:, None, :]
        force_ref[:] = jnp.sum(w_m[:, None, :] * unit, axis=0)
        s1_ref[:] = w_m
        g3p = t3 / r_mn
        s3_ref[:] = jnp.sum(g3p, axis=1)
        # V3'[m, xyz, atom] = sum_n g3p[m, n, :] d[n, xyz, :]
        # (concat instead of .at[].set: 3D scatter lowers to an
        # unsupported gather in Mosaic)
        v3_ref[:] = jnp.concatenate(
            [jnp.sum(g3p * d[:, x, :][None, :, :], axis=1)[:, None, :]
             for x in range(3)], axis=1)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("spec_l", "spec_n", "l_basis",
                                    "n_basis", "block_atoms",
                                    "interpret"))
def trio_forces_pallas_t(grid,
                         positions, cell, nbr_idx, nbr_shift, nbr_mask,
                         nbr_rev,
                         spec_l: LegSpec = None,
                         spec_n: LegSpec = None,
                         l_basis: int = 0,
                         n_basis: int = 0,
                         block_atoms: int = 128,
                         interpret: bool = False):
    """Fused 3-body energy + forces via the atom-minor Pallas kernel."""
    from uf3_tpu.ops.pallas_trio import (_assemble_forces,
                                         _pack_partials)
    from uf3_tpu.ops import pallas_trio as pt
    n_atoms, capacity = nbr_idx.shape
    d = (positions[nbr_idx] + cell_transform(nbr_shift, cell)
         - positions[:, None, :])
    r2 = jnp.sum(d * d, axis=-1)
    r = jnp.sqrt(jnp.where(r2 > 0, r2, 1.0))
    pad = (-n_atoms) % block_atoms
    n_padded = n_atoms + pad
    d_t = jnp.pad(d, ((0, pad), (0, 0), (0, 0))).transpose(1, 2, 0)
    valid_t = jnp.pad(nbr_mask.astype(d.dtype), ((0, pad), (0, 0))).T
    n_blocks = n_padded // block_atoms
    kernel = make_trio_kernel_t(spec_l, spec_n, block_atoms, capacity,
                                l_basis, n_basis)
    out_shapes = (
        jax.ShapeDtypeStruct((1, n_padded), d.dtype),
        jax.ShapeDtypeStruct((3, n_padded), d.dtype),
        jax.ShapeDtypeStruct((capacity, n_padded), d.dtype),
        jax.ShapeDtypeStruct((capacity, n_padded), d.dtype),
        jax.ShapeDtypeStruct((capacity, 3, n_padded), d.dtype),
    )

    def block(*lead):
        return pl.BlockSpec(lead + (block_atoms,),
                            lambda i: (0,) * len(lead) + (i,),
                            memory_space=pltpu.VMEM)

    energy, f_center, s1, s3, v3 = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[block(capacity, 3), block(capacity),
                  pl.BlockSpec((l_basis, l_basis * n_basis),
                               lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(block(1), block(3), block(capacity),
                   block(capacity), block(capacity, 3)),
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the unrolled L x NC loop nest peaks ~28M of stack values;
            # v5e has 128M physical VMEM, the 16M default is just a
            # conservative scoping heuristic
            vmem_limit_bytes=100 * 1024 * 1024),
    )(d_t, valid_t, grid.reshape(l_basis, l_basis * n_basis))
    energy = energy[0, :n_atoms]
    f_center = f_center[:, :n_atoms].T
    s1 = s1[:, :n_atoms].T
    s3 = s3[:, :n_atoms].T
    v3 = v3[:, :, :n_atoms].transpose(2, 0, 1)
    packed = _pack_partials(s1, s3, tuple(v3[..., c] for c in range(3)))
    capacity = nbr_idx.shape[1]
    cache = pt.ForceCache(
        idx_flats=None, sd=None, valid=None,
        rev_flats=pt.blockify_columns(
            (nbr_idx.astype(jnp.int32) * capacity
             + nbr_rev.astype(jnp.int32)).T),
        valid_b=nbr_mask)
    comps = (d[..., 0], d[..., 1], d[..., 2])
    return _assemble_forces(energy, f_center, packed, comps, r, cache)
