"""
Phonon spectra via the finite-displacement (frozen-phonon) method.

Standalone equivalent of the reference's phonopy wrapper
(uf3/forcefield/properties/phonon.py:25-167): build a supercell,
displace each symmetry-independent atom, collect forces, assemble the
force-constant matrix, and diagonalize the dynamical matrix along a
q-path.
"""

from typing import Dict, List, Tuple

import numpy as np

from uf3_tpu.data.atoms import Atoms


def force_constants(atoms: Atoms,
                    calc,
                    n_super: int = 3,
                    disp: float = 0.01) -> Tuple[np.ndarray, Atoms]:
    """
    Second-order force constants Phi[i, a, j, b] from +/- displacements
    of every atom of the primitive cell within an n_super^3 supercell.
    """
    supercell = atoms.repeat(n_super)
    n_prim = len(atoms)
    n_total = len(supercell)
    phi = np.zeros((n_prim, 3, n_total, 3))
    for i in range(n_prim):
        for a in range(3):
            plus = supercell.copy()
            plus.positions[i, a] += disp
            minus = supercell.copy()
            minus.positions[i, a] -= disp
            f_plus = calc.get_forces(plus)
            f_minus = calc.get_forces(minus)
            phi[i, a] = -(f_plus - f_minus) / (2 * disp)
    return phi, supercell


def dynamical_matrix(q: np.ndarray,
                     phi: np.ndarray,
                     atoms: Atoms,
                     supercell: Atoms) -> np.ndarray:
    """Mass-weighted Fourier transform of the force constants at q
    (fractional coordinates of the primitive reciprocal cell)."""
    n_prim = len(atoms)
    masses = atoms.get_masses()
    prim_cell = atoms.get_cell()
    recip = 2 * np.pi * np.linalg.inv(prim_cell).T
    q_cart = q @ recip
    # map supercell atoms to primitive index + lattice vector
    offsets = supercell.get_positions() - np.tile(
        atoms.get_positions(), (len(supercell) // n_prim, 1))
    prim_index = np.tile(np.arange(n_prim), len(supercell) // n_prim)
    dyn = np.zeros((3 * n_prim, 3 * n_prim), dtype=complex)
    phases = np.exp(1j * offsets @ q_cart)
    for i in range(n_prim):
        for j_sup in range(len(supercell)):
            j = prim_index[j_sup]
            weight = phases[j_sup] / np.sqrt(masses[i] * masses[j])
            dyn[3 * i:3 * i + 3, 3 * j:3 * j + 3] += \
                phi[i, :, j_sup, :] * weight
    return 0.5 * (dyn + dyn.conj().T)


# default q-path for cubic systems (fractional coordinates)
CUBIC_PATH = {
    "G": np.array([0.0, 0.0, 0.0]),
    "H": np.array([0.5, -0.5, 0.5]),
    "N": np.array([0.0, 0.0, 0.5]),
    "P": np.array([0.25, 0.25, 0.25]),
}


def compute_phonon_data(atoms: Atoms,
                        calc,
                        n_super: int = 3,
                        disp: float = 0.01,
                        path: List[str] = ("G", "H", "N", "G", "P"),
                        n_points: int = 20) -> Dict:
    """
    Phonon band structure along a high-symmetry path.

    Returns dict with 'distances', 'frequencies' (THz), and 'labels'.
    """
    phi, supercell = force_constants(atoms, calc, n_super=n_super,
                                     disp=disp)
    # acoustic sum rule: each row block balances its self term
    n_prim = len(atoms)
    for i in range(n_prim):
        for a in range(3):
            for b in range(3):
                total = np.sum(phi[i, a, :, b])
                phi[i, a, i, b] -= total
    qs = []
    distances = []
    labels = []
    total_distance = 0.0
    for seg in range(len(path) - 1):
        q0 = CUBIC_PATH[path[seg]]
        q1 = CUBIC_PATH[path[seg + 1]]
        labels.append((total_distance, path[seg]))
        for t in np.linspace(0, 1, n_points, endpoint=(
                seg == len(path) - 2)):
            q = q0 + t * (q1 - q0)
            qs.append(q)
            distances.append(total_distance
                             + t * np.linalg.norm(q1 - q0))
        total_distance += np.linalg.norm(q1 - q0)
    labels.append((total_distance, path[-1]))
    frequencies = []
    # internal frequency unit -> THz: sqrt(eV / (amu A^2)) / (2 pi)
    conv = np.sqrt(1.602176634e-19 / 1.66053906660e-27) * 1e10 \
        / (2 * np.pi) / 1e12
    for q in qs:
        dyn = dynamical_matrix(np.asarray(q), phi, atoms, supercell)
        eigenvalues = np.linalg.eigvalsh(dyn)
        freq = np.sign(eigenvalues) * np.sqrt(np.abs(eigenvalues)) * conv
        frequencies.append(freq)
    return dict(distances=np.array(distances),
                frequencies=np.array(frequencies),
                labels=labels,
                force_constants=phi)


def plot_phonon_spectrum(data: Dict, ax=None):
    """Plot the band structure returned by compute_phonon_data."""
    import matplotlib.pyplot as plt
    if ax is None:
        _, ax = plt.subplots()
    ax.plot(data["distances"], data["frequencies"], color="C0", lw=1)
    for x, label in data["labels"]:
        ax.axvline(x, color="gray", lw=0.5)
    ax.set_xticks([x for x, _ in data["labels"]])
    ax.set_xticklabels([label for _, label in data["labels"]])
    ax.set_ylabel("Frequency (THz)")
    return ax
