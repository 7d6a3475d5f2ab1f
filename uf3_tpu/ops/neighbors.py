"""
Fixed-capacity padded neighbor lists on device (JAX).

Minimum-image convention with integer image shifts; valid for cells whose
perpendicular widths exceed twice the cutoff (the MD regime).  Small
periodic cells -- training configurations -- go through the host
ghost-atom path (uf3_tpu/data/geometry.py) instead.  Replaces the
reference's dense scipy cdist + ragged masking (uf3/representation/
distances.py) with fixed shapes: (N, K) neighbor indices + shifts + mask,
plus an inverse-slot map used by the scatter-free 3-body force kernel.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class NeighborList(NamedTuple):
    idx: jnp.ndarray        # (N, K) int32 neighbor indices (self-padded)
    shift: jnp.ndarray      # (N, K, 3) image shifts (float, integer-valued)
    mask: jnp.ndarray       # (N, K) bool
    rev: jnp.ndarray        # (N, K) int32: slot of atom i in neighbor's list
    overflow: jnp.ndarray   # () bool: capacity exceeded
    reference_positions: jnp.ndarray  # (N, 3) positions at build time


def displacements(positions, cell, idx, shift):
    """d[i, k] = R_idx[i,k] + shift[i,k] @ cell - R_i."""
    return positions[idx] + shift @ cell - positions[:, None, :]


def build_neighbor_list(positions: jnp.ndarray,
                        cell: jnp.ndarray,
                        pbc,
                        r_cut: float,
                        capacity: int,
                        block_size: int = 512) -> NeighborList:
    """
    O(N^2) minimum-image neighbor search with per-row top-k selection,
    processed in row blocks to bound memory.  jit-compatible.
    """
    n_atoms = positions.shape[0]
    capacity = min(capacity, n_atoms)
    pbc_vec = jnp.asarray(pbc, dtype=positions.dtype).reshape(3)
    # callers pass an invertible cell (use a bounding box for molecules)
    frac = positions @ jnp.linalg.inv(cell)
    r_cut2 = jnp.asarray(r_cut * r_cut, dtype=positions.dtype)

    n_blocks = -(-n_atoms // block_size)
    pad = n_blocks * block_size - n_atoms
    frac_padded = jnp.pad(frac, ((0, pad), (0, 0)))

    def process_block(block_frac):
        # block_frac: (B, 3)
        diff = frac[None, :, :] - block_frac[:, None, :]  # (B, N, 3)
        img = -jnp.round(diff) * pbc_vec
        disp = (diff + img) @ cell
        d2 = jnp.sum(disp * disp, axis=-1)
        within = (d2 < r_cut2) & (d2 > 1e-12)
        count = jnp.sum(within, axis=1)
        key = jnp.where(within, -d2, jnp.inf)
        neg, idx = jax.lax.top_k(-key, capacity)  # (B, K)
        mask = neg > -jnp.inf
        shift = jnp.take_along_axis(img, idx[:, :, None], axis=1)
        return idx, shift, mask, count

    blocks = frac_padded.reshape(n_blocks, block_size, 3)
    idx_b, shift_b, mask_b, count_b = jax.lax.map(process_block, blocks)
    idx = idx_b.reshape(-1, capacity)[:n_atoms].astype(jnp.int32)
    shift = shift_b.reshape(-1, capacity, 3)[:n_atoms]
    mask = mask_b.reshape(-1, capacity)[:n_atoms]
    count = count_b.reshape(-1)[:n_atoms]
    overflow = jnp.any(count > capacity)
    # self-pad invalid slots (zero displacement, masked out)
    self_idx = jnp.arange(n_atoms, dtype=jnp.int32)[:, None]
    idx = jnp.where(mask, idx, self_idx)
    shift = jnp.where(mask[:, :, None], shift, 0.0)
    rev = _reverse_slots(idx, shift, mask)
    return NeighborList(idx=idx, shift=shift, mask=mask, rev=rev,
                        overflow=overflow,
                        reference_positions=positions)


def _reverse_slots(idx, shift, mask):
    """
    rev[a, s] = slot s' such that idx[c, s'] == a with the opposite
    image shift, where c = idx[a, s].  Every true neighbor pair appears
    in both lists (the search is symmetric), so a match always exists
    for valid slots; invalid slots map to 0.
    """
    n_atoms, capacity = idx.shape
    c = idx  # (N, K)
    cand_idx = idx[c]      # (N, K, K): neighbor lists of neighbors
    cand_shift = shift[c]  # (N, K, K, 3)
    a = jnp.arange(n_atoms, dtype=idx.dtype)[:, None, None]
    match = (cand_idx == a) & jnp.all(
        cand_shift == -shift[:, :, None, :], axis=-1)
    rev = jnp.argmax(match, axis=-1).astype(jnp.int32)
    return jnp.where(mask, rev, 0)


def needs_rebuild(nbr: NeighborList, positions, skin: float) -> jnp.ndarray:
    """True when any atom moved more than skin/2 since the last build."""
    delta = positions - nbr.reference_positions
    return jnp.any(jnp.sum(delta * delta, axis=-1)
                   > (0.5 * skin) ** 2)


def estimate_capacity(n_atoms: int, volume: float, r_cut: float,
                      factor: float = 1.35, minimum: int = 8) -> int:
    """Padded capacity from mean density with a safety factor."""
    density = n_atoms / volume
    expected = density * 4.0 / 3.0 * np.pi * r_cut ** 3
    return max(minimum, int(np.ceil(expected * factor)))
