"""
Device featurization (JAX): energy and force feature vectors for
training, computed with the same scatter-free algebra as the MD force
kernel but resolved per basis function.

For every center c and neighbor slot m, the partial tensors

    P0[c, m, g]      = sum_n  A[c, m] (x) B[c, n] (x) C[c, m, n]   [g]
    P1[c, m, g]      = sum_n dA[c, m] (x) B[c, n] (x) C[c, m, n]   [g]
    P3[c, m, g]      = sum_n  A[c, m] (x) B[c, n] (x) (dC/r)[c,m,n][g]
    PV[c, m, g, xyz] = sum_n  A (x) B (x) (dC/r) * d[c, n, xyz]    [g]

(g runs over the flattened L*M*NC coefficient grid) give

    energy grid      Phi[g]        = 1/2 sum_cm P0[c, m, g]
    force features   X[a, xyz, g]  = -( sum_m P1[a, m, g] u_am
                                      + sum_s gathered neighbor terms )

exactly mirroring uf3_tpu/ops/potential.py's force identities with the
coefficient contraction removed.  The host oracle
(uf3_tpu/representation/featurize_np.py) pins the numbers; this path is
the fast (device) twin for large training sets.  Single-trio-type
(unary) fast path; multi-species falls back to the host featurizer.
"""

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uf3_tpu.ops.neighbors import cell_transform

from uf3_tpu.ops.pallas_trio import LegSpec, _dense_basis

# einsum with full-precision accumulation: the TPU backend
# silently rounds f32 matmul inputs to bf16 (~0.4% relative),
# which is fatal for forces/features computed from cell-scale
# values.  These paths are not throughput-critical.
import functools as _functools
_einsum = _functools.partial(jnp.einsum, precision="highest")



class FeaturizeSpec(NamedTuple):
    """Static description for the single-pair/single-trio device path."""
    pair: LegSpec            # 2-body leg (full knot sequence)
    pair_lead: int
    pair_trail: int
    trio_l: LegSpec          # 3-body center legs (shared)
    trio_n: LegSpec          # 3-body third leg
    trio_lead: int
    trio_trail: int
    l_basis: int
    n_basis: int


def _trimmed_basis(r, valid, spec: LegSpec, lead: int, trail: int):
    mat, dmat = _dense_basis(r, valid, spec)
    n_basis = spec.n_basis
    if lead > 0 or trail > 0:
        keep = jnp.zeros((n_basis,), dtype=bool).at[
            lead:n_basis - trail].set(True)
        mat = jnp.where(keep, mat, 0.0)
        dmat = jnp.where(keep, dmat, 0.0)
    return mat, dmat


@functools.partial(jax.jit, static_argnames=("spec",))
def featurize_device(spec: FeaturizeSpec,
                     positions, cell,
                     nbr_idx, nbr_shift, nbr_mask, nbr_rev,
                     nbr3_idx, nbr3_shift, nbr3_mask, nbr3_rev):
    """
    Energy + force features for one configuration (unary system).

    Returns:
        e2: (n_pair_basis,) 2-body energy features
        f2: (N, 3, n_pair_basis) 2-body force features
        e3: (L, L, NC) 3-body energy grid (uncompressed)
        f3: (N, 3, L, L, NC) 3-body force grids (uncompressed,
            reference sign convention)
    """
    n_atoms = positions.shape[0]
    # ---- 2-body -----------------------------------------------------------
    d2v = (positions[nbr_idx] + cell_transform(nbr_shift, cell)
           - positions[:, None, :])
    r2sq = jnp.sum(d2v * d2v, axis=-1)
    r2 = jnp.sqrt(jnp.where(r2sq > 0, r2sq, 1.0))
    # strict bounds (reference distances.py:66: r_min < r < r_max)
    valid2 = (nbr_mask & (r2 > spec.pair.t_min) & (r2 < spec.pair.t_max))
    a2, da2 = _trimmed_basis(r2, valid2, spec.pair, spec.pair_lead,
                             spec.pair_trail)
    e2 = jnp.sum(a2, axis=(0, 1))
    unit2 = d2v / r2[..., None]
    # x[a, xyz, s] = 2 sum_k B'_s(r_ak) u_ak  (both bond orientations)
    f2 = 2.0 * _einsum("nks,nkc->ncs", da2, unit2)

    # ---- 3-body -----------------------------------------------------------
    k3 = nbr3_idx.shape[1]
    d = (positions[nbr3_idx] + cell_transform(nbr3_shift, cell)
         - positions[:, None, :])
    rsq = jnp.sum(d * d, axis=-1)
    r = jnp.sqrt(jnp.where(rsq > 0, rsq, 1.0))
    a_mat, da_mat = _trimmed_basis(r, nbr3_mask, spec.trio_l,
                                   spec.trio_lead, spec.trio_trail)
    d_mn = d[:, None, :, :] - d[:, :, None, :]
    r_mn2 = jnp.sum(d_mn * d_mn, axis=-1)
    r_mn = jnp.sqrt(jnp.where(r_mn2 > 0, r_mn2, 1.0))
    pair_ok = (nbr3_mask[:, :, None] & nbr3_mask[:, None, :]
               & (r_mn2 > 1e-10))
    c_mat, dc_mat = _trimmed_basis(r_mn, pair_ok, spec.trio_n,
                                   spec.trio_lead, spec.trio_trail)
    dc_over_r = dc_mat / r_mn[..., None]
    l_dim, nc = spec.l_basis, spec.n_basis
    # BC[c, m, n, (b, w)] contracted over n first:
    #   Q [c, m, b, w] = sum_n B[c, n, b] C[c, m, n, w]
    #   Q3[c, m, b, w] = sum_n B[c, n, b] (dC/r)[c, m, n, w]
    #   QV[c, m, b, w, xyz] = sum_n B (dC/r) d[c, n, xyz]
    q0 = _einsum("cnb,cmnw->cmbw", a_mat, c_mat)
    q3 = _einsum("cnb,cmnw->cmbw", a_mat, dc_over_r)
    qv = _einsum("cnb,cmnw,cnx->cmbwx", a_mat, dc_over_r, d)
    # per-(center, slot) grid partials (N, K, L, M, NC)
    p0 = _einsum("cma,cmbw->cmabw", a_mat, q0)
    p1 = _einsum("cma,cmbw->cmabw", da_mat, q0)
    p3 = _einsum("cma,cmbw->cmabw", a_mat, q3)
    pv = _einsum("cma,cmbwx->cmabwx", a_mat, qv)
    # energy grid: ordered pairs double-count -> 1/2
    e3 = 0.5 * jnp.sum(p0, axis=(0, 1))
    # center term: sum_m P1[a, m, g] * u_am
    unit = d / r[..., None]
    grid_center = _einsum("cmabw,cmx->cxabw", p1, unit)
    # neighbor term: gather partials through the inverse slots
    flat = (nbr3_idx.astype(jnp.int32) * k3
            + nbr3_rev.astype(jnp.int32)).reshape(-1)
    grid_size = l_dim * l_dim * nc
    p1_rows = p1.reshape(-1, grid_size).at[flat].get(
        mode="promise_in_bounds").reshape(n_atoms, k3, grid_size)
    p3_rows = p3.reshape(-1, grid_size).at[flat].get(
        mode="promise_in_bounds").reshape(n_atoms, k3, grid_size)
    pv_rows = pv.reshape(-1, grid_size, 3).at[flat].get(
        mode="promise_in_bounds").reshape(n_atoms, k3, grid_size, 3)
    mask_f = nbr3_mask.astype(positions.dtype)
    nbr_term = (_einsum("akg,akx,ak->axg", p1_rows, unit, mask_f)
                + _einsum("akg,akx,ak->axg", p3_rows, d, mask_f)
                + _einsum("akgx,ak->axg", pv_rows, mask_f))
    # reference sign convention (angles.py:229-231 applies the minus to
    # the raw accumulation; the derivative identities here already
    # carry it)
    grid_forces = (grid_center.reshape(n_atoms, 3, grid_size)
                   + nbr_term)
    f3 = grid_forces.reshape(n_atoms, 3, l_dim, l_dim, nc)
    return e2, f2, e3, f3


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------
def build_featurize_spec(bspline_config):
    """Static device-featurization spec; None when the model shape is
    outside the fast path (multi-species or non-closed-form knots)."""
    from uf3_tpu.ops.pallas_trio import leg_spec_from_knots
    if bspline_config.degree != 3:
        return None
    if len(bspline_config.chemical_system.element_list) != 1:
        return None
    pair = bspline_config.interactions_map[2][0]
    trio = bspline_config.interactions_map[3][0]
    ok_p, spec_p = leg_spec_from_knots(
        bspline_config.knots_map[pair], exact=True)
    seqs = [np.asarray(s) for s in bspline_config.knots_map[trio]]
    if not np.array_equal(seqs[0], seqs[1]):
        return None
    ok_l, spec_l = leg_spec_from_knots(seqs[0], exact=True)
    ok_n, spec_n = leg_spec_from_knots(seqs[2], exact=True)
    if not (ok_p and ok_l and ok_n):
        return None
    return FeaturizeSpec(
        pair=spec_p,
        pair_lead=bspline_config.leading_trim[2],
        pair_trail=bspline_config.trailing_trim[2],
        trio_l=spec_l, trio_n=spec_n,
        trio_lead=bspline_config.leading_trim[3],
        trio_trail=bspline_config.trailing_trim[3],
        l_basis=len(seqs[0]) - 4,
        n_basis=len(seqs[2]) - 4)


def host_neighbor_arrays(geom, r_cut: float, capacity: int):
    """
    Exact (N, K) neighbor arrays (idx, shift, mask, rev) from the
    ghost-atom supercell -- works for arbitrarily small periodic
    cells (multiple images of the same neighbor appear as separate
    slots with distinct shifts).
    """
    from uf3_tpu.data import geometry as geo
    n_atoms = len(geom)
    if np.any(geom.get_pbc()):
        supercell = geo.get_supercell(geom, r_cut=r_cut)
    else:
        supercell = geom
    matrix = geo.get_distance_matrix(geom, supercell)
    n_images = len(supercell) // n_atoms
    cell = geom.get_cell()
    # image offset of each supercell atom (integer lattice coordinates)
    image_positions = supercell.get_positions().reshape(n_images,
                                                        n_atoms, 3)
    offsets = image_positions - geom.get_positions()[None, :, :]
    image_shift = np.round(offsets[:, 0, :] @ np.linalg.pinv(cell)) \
        if np.any(geom.get_pbc()) else np.zeros((1, 3))
    within = (matrix > 1e-10) & (matrix < r_cut)
    counts = within.sum(axis=1)
    if counts.max() > capacity:
        raise ValueError(f"neighbor capacity {capacity} exceeded "
                         f"({counts.max()})")
    # vectorized pack: stable-sort valid columns to the front
    order = np.argsort(~within, axis=1, kind="stable")
    take = min(capacity, order.shape[1])
    order = order[:, :take]
    mask = np.take_along_axis(within, order, axis=1)
    if take < capacity:   # fewer candidate columns than capacity
        order = np.pad(order, ((0, 0), (0, capacity - take)))
        mask = np.pad(mask, ((0, 0), (0, capacity - take)))
    self_col = np.arange(n_atoms, dtype=np.int64)[:, None]
    idx = np.where(mask, order % n_atoms, self_col).astype(np.int32)
    shift = np.where(mask[:, :, None],
                     image_shift[order // n_atoms], 0.0)
    # reverse slots, vectorized: match (index, opposite image); work
    # on count-trimmed views -- at the generous capacities used for
    # shape bucketing the (N, K, K, 3) candidate tensor dominates
    kmax = max(1, int(counts.max()))
    idx_t = idx[:, :kmax]
    shift_t = shift[:, :kmax]
    mask_t = mask[:, :kmax]
    cand_idx = idx_t[idx_t]                   # (N, k, k)
    cand_shift = shift_t[idx_t]               # (N, k, k, 3)
    cand_mask = mask_t[idx_t]
    match = (cand_mask
             & (cand_idx == self_col[:, :, None])
             & np.all(cand_shift == -shift_t[:, :, None, :], axis=-1))
    rev = np.zeros((n_atoms, capacity), dtype=np.int32)
    rev[:, :kmax] = np.where(mask_t, np.argmax(match, axis=-1), 0)
    return idx, shift, mask, rev


def featurize_configuration_device(bspline_config, geom,
                                   spec: FeaturizeSpec = None,
                                   dtype=None):
    """
    Device-path equivalent of BasisFeaturizer.evaluate_configuration
    for unary 2+3-body systems: returns (energy feature vector without
    the target column, force feature array (N, 3, n_feats)).
    """
    import jax.numpy as jnp
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 \
            else jnp.float32
    if spec is None:
        spec = build_featurize_spec(bspline_config)
    if spec is None:
        raise ValueError("configuration outside the device fast path")
    n_atoms = len(geom)
    cap2 = 96
    cap3 = 48
    idx2, shift2, mask2, rev2 = host_neighbor_arrays(
        geom, spec.pair.t_max, cap2)
    idx3, shift3, mask3, rev3 = host_neighbor_arrays(
        geom, spec.trio_l.t_max, cap3)
    e2, f2, e3, f3 = featurize_device(
        spec,
        jnp.asarray(geom.get_positions(), dtype=dtype),
        jnp.asarray(geom.get_cell(), dtype=dtype),
        jnp.asarray(idx2), jnp.asarray(shift2, dtype=dtype),
        jnp.asarray(mask2), jnp.asarray(rev2),
        jnp.asarray(idx3), jnp.asarray(shift3, dtype=dtype),
        jnp.asarray(mask3), jnp.asarray(rev3))
    trio = bspline_config.interactions_map[3][0]
    e3_compressed = bspline_config.compress_3B(np.asarray(e3), trio)
    f3_compressed = bspline_config.compress_3B_batch(np.asarray(f3),
                                                     trio)
    counts = np.array([n_atoms], dtype=float)
    e_vector = np.concatenate([counts, np.asarray(e2), e3_compressed])
    f2_np = np.asarray(f2)
    f_vectors = np.concatenate([
        np.zeros((n_atoms, 3, 1)), f2_np, f3_compressed], axis=2)
    return e_vector, f_vectors


def featurize_dataset_device(bspline_config,
                             geometries,
                             energies,
                             forces,
                             dtype=None,
                             progress=None,
                             batch_size: int = 16):
    """
    Device featurization of a dataset into fitting arrays
    (x_e, y_e, x_f, y_f) with per-atom energy normalization, matching
    regression.least_squares.dataframe_to_tuples semantics.

    One device dispatch per configuration: batched dispatch (vmap or
    lax.map over stacked configs) re-lowers the HIGHEST-precision
    einsums into much slower batched contractions on TPU (measured),
    and per-call overhead is small against the ~0.1 s compute.  The
    host-side neighbor construction and 3B compression are the
    vectorized paths (host_neighbor_arrays / compress_3B_batch).
    Force rows are ordered fx_0..fx_{N-1}, fy..., fz... per
    configuration, matching the host featurizer row order.
    """
    spec = build_featurize_spec(bspline_config)
    if spec is None:
        raise ValueError("dataset outside the device fast path")
    x_e, y_e, x_f, y_f = [], [], [], []
    for i, (geom, energy, force) in enumerate(
            zip(geometries, energies, forces)):
        e_vec, f_vec = featurize_configuration_device(
            bspline_config, geom, spec, dtype=dtype)
        n_atoms = len(geom)
        x_e.append(e_vec / n_atoms)
        y_e.append(energy / n_atoms)
        force = np.asarray(force)
        if force.shape[0] != 3:
            force = force.T
        # rows: component-major (fx_0..fx_N, fy..., fz...)
        x_f.append(f_vec.transpose(1, 0, 2).reshape(3 * n_atoms, -1))
        y_f.append(force.reshape(-1))
        if progress is not None:
            progress(i + 1, len(geometries))
    return (np.stack(x_e), np.asarray(y_e),
            np.concatenate(x_f, axis=0), np.concatenate(y_f))
