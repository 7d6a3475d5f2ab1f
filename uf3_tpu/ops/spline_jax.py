"""
Device-side cubic B-spline evaluation (JAX) and host-side
piecewise-polynomial table builders.

Two evaluation strategies:
  * ``deboor_values_jax``: branchless 4-tap Cox-de Boor, the device twin
    of uf3_tpu/representation/splines.py (used by featurization).
  * piecewise-polynomial tables: on each knot interval, the spline
    combination sum_i c_i B_i(r) is a single cubic in the local
    coordinate u = (r - t_i)/h_i; the MD hot path evaluates it with one
    table row gather and a Horner step (same idea as LAMMPS
    ``pair_style table`` and the upstream C++ ``pair_style uf3``, but
    vectorized over padded neighbor arrays).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uf3_tpu.representation import splines as sp


def find_interval(r, knot_sequence, n_splines):
    """First non-zero basis index (clipped), device-side searchsorted."""
    idx = jnp.searchsorted(knot_sequence, r, side="left") - 4
    return jnp.clip(idx, 0, n_splines - 4)


def deboor_values_jax(r, knot_sequence, idx=None, nu: int = 0):
    """
    Values (nu-th derivatives) of the 4 non-zero cubic basis functions.

    Vectorized over any leading batch shape of r; returns (values, idx)
    with values[..., t] = B_{idx+t}^(nu)(r).
    """
    t = jnp.asarray(knot_sequence)
    n_splines = t.shape[0] - 4
    r = jnp.asarray(r)
    if idx is None:
        idx = find_interval(r, t, n_splines)
    tk = t[idx[..., None] + jnp.arange(8)]  # (..., 8)

    def safe_div(num, den):
        return jnp.where(den != 0, num / jnp.where(den == 0, 1.0, den), 0.0)

    b = [jnp.zeros_like(r), jnp.zeros_like(r), jnp.zeros_like(r),
         jnp.ones_like(r)]
    max_degree = 3 - nu if nu > 0 else 3
    for k in range(1, max_degree + 1):
        new = [jnp.zeros_like(r) for _ in range(4)]
        for p in range(3 - k, 4):
            term = safe_div(r - tk[..., p],
                            tk[..., p + k] - tk[..., p]) * b[p]
            if p + 1 <= 3:
                term = term + safe_div(tk[..., p + k + 1] - r,
                                       tk[..., p + k + 1]
                                       - tk[..., p + 1]) * b[p + 1]
            new[p] = term
        b = new
    for k in range(max_degree + 1, 4):
        new = [jnp.zeros_like(r) for _ in range(4)]
        for p in range(3 - k, 4):
            term = k * safe_div(b[p], tk[..., p + k] - tk[..., p])
            if p + 1 <= 3:
                term = term - k * safe_div(b[p + 1],
                                           tk[..., p + k + 1]
                                           - tk[..., p + 1])
            new[p] = term
        b = new
    return jnp.stack(b, axis=-1), idx


# ---------------------------------------------------------------------------
# host-side piecewise-polynomial table construction (float64, numpy)
# ---------------------------------------------------------------------------
def basis_monomial_table(knot_sequence: np.ndarray) -> np.ndarray:
    """
    beta[i, tap, p]: monomial coefficient of u^p for basis function
    B_{i + tap} restricted to knot interval i, in the local coordinate
    u = (r - t_{i+3}) / (t_{i+4} - t_{i+3}).

    Intervals are indexed by their first-nonzero-basis index i
    (i.e. interval i spans [t_{i+3}, t_{i+4})); empty (zero-width)
    intervals get zero rows.
    """
    knot_sequence = np.asarray(knot_sequence, dtype=np.float64)
    n_splines = len(knot_sequence) - 4
    n_intervals = n_splines - 3  # interval index range [0, n_splines-4+1)
    beta = np.zeros((n_intervals, 4, 4))
    # sample at 4 points and invert the Vandermonde (exact for cubics)
    u_samples = np.array([0.0, 1.0 / 3.0, 2.0 / 3.0, 1.0])
    vander = np.vander(u_samples, 4, increasing=True)  # (4, 4)
    vander_inv = np.linalg.inv(vander)
    for i in range(n_intervals):
        t_lo = knot_sequence[i + 3]
        t_hi = knot_sequence[i + 4]
        if t_hi <= t_lo:
            continue
        r_samples = t_lo + u_samples * (t_hi - t_lo)
        # evaluate the 4 non-zero basis functions at the sample points
        values, idx = sp.deboor_values(r_samples, knot_sequence,
                                       idx=np.full(4, i, dtype=np.int64))
        beta[i] = (vander_inv @ values).T  # (tap, power)
    return beta


def build_pair_tables(knot_sequence: np.ndarray,
                      coefficients: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """
    Per-interval cubic polynomials for a fitted pair potential.

    Returns:
        poly_e: (n_intervals, 4) energy polynomial in u (Horner-ready).
        poly_f: (n_intervals, 4) with poly_f[..., :] the derivative
            polynomial dV/dr = (dV/du)/h  (degree 2, stored padded).
        breaks: interval lower edges t_3 .. t_{n-4} plus widths, packed
            as (n_intervals, 2) [t_lo, 1/h].
    """
    knot_sequence = np.asarray(knot_sequence, dtype=np.float64)
    coefficients = np.asarray(coefficients, dtype=np.float64)
    beta = basis_monomial_table(knot_sequence)
    n_intervals = beta.shape[0]
    poly_e = np.zeros((n_intervals, 4))
    poly_f = np.zeros((n_intervals, 4))
    breaks = np.zeros((n_intervals, 2))
    for i in range(n_intervals):
        c_taps = coefficients[i:i + 4]
        p = c_taps @ beta[i]  # (4,) monomial coefficients in u
        poly_e[i] = p
        t_lo = knot_sequence[i + 3]
        t_hi = knot_sequence[i + 4]
        h = t_hi - t_lo
        inv_h = 1.0 / h if h > 0 else 0.0
        # dV/dr = (p1 + 2 p2 u + 3 p3 u^2) / h
        poly_f[i, :3] = np.array([p[1], 2 * p[2], 3 * p[3]]) * inv_h
        breaks[i] = [t_lo, inv_h]
    return poly_e, poly_f, breaks


def build_trio_tables(knot_sequences, grid: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """
    Per-cell tricubic polynomials for a (decompressed) 3-body
    coefficient grid.

    Returns:
        poly: (nl, nm, nn, 64) monomial coefficients; entry
            [ci, cj, ck, p*16 + q*4 + r] multiplies u^p v^q w^r.
        breaks: per-dimension (n_intervals, 2) [t_lo, 1/h] arrays,
            stacked into a tuple of three.
    """
    grid = np.asarray(grid, dtype=np.float64)
    betas = []
    breaks = []
    for dim, seq in enumerate(knot_sequences):
        seq = np.asarray(seq, dtype=np.float64)
        beta = basis_monomial_table(seq)
        betas.append(beta)
        n_int = beta.shape[0]
        br = np.zeros((n_int, 2))
        for i in range(n_int):
            t_lo, t_hi = seq[i + 3], seq[i + 4]
            br[i] = [t_lo, 1.0 / (t_hi - t_lo) if t_hi > t_lo else 0.0]
        breaks.append(br)
    nl, nm, nn = (b.shape[0] for b in betas)
    # sliding windows of the coefficient grid: W[ci,cj,ck,tl,tm,tn]
    windows = np.lib.stride_tricks.sliding_window_view(grid, (4, 4, 4))
    poly = np.einsum("ijkabc,iap,jbq,kcr->ijkpqr",
                     windows[:nl, :nm, :nn], betas[0], betas[1], betas[2])
    return poly.reshape(nl, nm, nn, 64), tuple(breaks)


# ---------------------------------------------------------------------------
# device-side piecewise-polynomial evaluation
# ---------------------------------------------------------------------------
def ppoly_interval(r, knots_interior, n_intervals):
    """
    Interval index for piecewise-poly tables: knots_interior are the
    unique break points t_3..t_{n_splines}; returns clipped index.
    """
    idx = jnp.searchsorted(knots_interior, r, side="left") - 1
    return jnp.clip(idx, 0, n_intervals - 1)


def horner_cubic(p, u):
    """p: (..., 4) monomial coefficients; evaluate at u."""
    return ((p[..., 3] * u + p[..., 2]) * u + p[..., 1]) * u + p[..., 0]


def eval_pair_tables(r, poly_e, poly_f, breaks, knots_interior):
    """Energy and dV/dr at distances r via one gather + Horner."""
    idx = ppoly_interval(r, knots_interior, poly_e.shape[0])
    t_lo = breaks[idx, 0]
    inv_h = breaks[idx, 1]
    u = (r - t_lo) * inv_h
    energy = horner_cubic(poly_e[idx], u)
    dvdr = horner_cubic(poly_f[idx], u)
    return energy, dvdr


def tricubic_eval(poly_cell, u, v, w):
    """
    Evaluate a batch of tricubic polynomials and their three partial
    derivatives (w.r.t. the underlying distances requires an external
    1/h factor).

    Args:
        poly_cell: (..., 64) per-point polynomial coefficients.
        u, v, w: (...,) local coordinates in [0, 1].

    Returns:
        value, d/du, d/dv, d/dw (each (...,)).
    """
    p = poly_cell.reshape(poly_cell.shape[:-1] + (4, 4, 4))
    # collapse w axis: s[p_idx][q_idx] = sum_r p[...,p_idx,q_idx,r] w^r
    wp = jnp.stack([jnp.ones_like(w), w, w * w, w * w * w], axis=-1)
    dwp = jnp.stack([jnp.zeros_like(w), jnp.ones_like(w), 2 * w,
                     3 * w * w], axis=-1)
    s = jnp.einsum("...pqr,...r->...pq", p, wp)
    s_dw = jnp.einsum("...pqr,...r->...pq", p, dwp)
    vp = jnp.stack([jnp.ones_like(v), v, v * v, v * v * v], axis=-1)
    dvp = jnp.stack([jnp.zeros_like(v), jnp.ones_like(v), 2 * v,
                     3 * v * v], axis=-1)
    q = jnp.einsum("...pq,...q->...p", s, vp)
    q_dv = jnp.einsum("...pq,...q->...p", s, dvp)
    q_dw = jnp.einsum("...pq,...q->...p", s_dw, vp)
    up = jnp.stack([jnp.ones_like(u), u, u * u, u * u * u], axis=-1)
    dup = jnp.stack([jnp.zeros_like(u), jnp.ones_like(u), 2 * u,
                     3 * u * u], axis=-1)
    value = jnp.einsum("...p,...p->...", q, up)
    d_du = jnp.einsum("...p,...p->...", q, dup)
    d_dv = jnp.einsum("...p,...p->...", q_dv, up)
    d_dw = jnp.einsum("...p,...p->...", q_dw, up)
    return value, d_du, d_dv, d_dw
