"""
ctypes loader for the native host runtime (libuf3native.so).

Builds on first import with g++ if the shared library is missing;
every consumer falls back to the pure-Python path when unavailable.
"""

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "uf3_native.cpp")
_LIB = os.path.join(_DIR, "libuf3native.so")

_lib = None


class _XyzResult(ctypes.Structure):
    _fields_ = [
        ("n_frames", ctypes.c_int64),
        ("n_atoms_total", ctypes.c_int64),
        ("frame_sizes", ctypes.POINTER(ctypes.c_int64)),
        ("positions", ctypes.POINTER(ctypes.c_double)),
        ("forces", ctypes.POINTER(ctypes.c_double)),
        ("numbers", ctypes.POINTER(ctypes.c_int64)),
        ("energies", ctypes.POINTER(ctypes.c_double)),
        ("cells", ctypes.POINTER(ctypes.c_double)),
        ("has_forces", ctypes.c_uint8),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.parse_extxyz.restype = ctypes.POINTER(_XyzResult)
    lib.parse_extxyz.argtypes = [ctypes.c_char_p]
    lib.free_xyz_result.argtypes = [ctypes.POINTER(_XyzResult)]
    lib.cell_list_neighbors.restype = ctypes.c_int64
    lib.cell_list_neighbors.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_double, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def parse_extxyz_fast(filename: str):
    """
    Parse an extended-xyz trajectory with the native tokenizer.

    Returns a list of Atoms, or None if the library is unavailable.
    """
    lib = load()
    if lib is None:
        return None
    from uf3_tpu.data.atoms import Atoms
    result_ptr = lib.parse_extxyz(filename.encode())
    if not result_ptr:
        raise IOError(f"Failed to parse {filename}")
    result = result_ptr.contents
    n_frames = result.n_frames
    n_total = result.n_atoms_total
    sizes = np.ctypeslib.as_array(result.frame_sizes,
                                  (n_frames,)).copy()
    positions = np.ctypeslib.as_array(result.positions,
                                      (n_total, 3)).copy()
    forces = np.ctypeslib.as_array(result.forces, (n_total, 3)).copy()
    numbers = np.ctypeslib.as_array(result.numbers, (n_total,)).copy()
    energies = np.ctypeslib.as_array(result.energies,
                                     (n_frames,)).copy()
    cells = np.ctypeslib.as_array(result.cells, (n_frames, 9)).copy()
    has_forces = bool(result.has_forces)
    lib.free_xyz_result(result_ptr)
    geometries = []
    offset = 0
    for frame in range(n_frames):
        n = int(sizes[frame])
        cell = cells[frame].reshape(3, 3)
        pbc = bool(np.any(cell != 0))
        geom = Atoms(numbers=numbers[offset:offset + n],
                     positions=positions[offset:offset + n],
                     cell=cell if pbc else None, pbc=pbc)
        if np.isfinite(energies[frame]):
            geom.info["energy"] = float(energies[frame])
        if has_forces:
            block = forces[offset:offset + n]
            geom.arrays["fx"] = block[:, 0].copy()
            geom.arrays["fy"] = block[:, 1].copy()
            geom.arrays["fz"] = block[:, 2].copy()
        geometries.append(geom)
        offset += n
    return geometries


def cell_list_neighbors(positions: np.ndarray,
                        cell: np.ndarray,
                        pbc,
                        r_cut: float,
                        capacity: int
                        ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                            np.ndarray, int]]:
    """O(N) host neighbor list; returns (idx, shift, mask, max_count)
    or None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, dtype=np.float64)
    cell = np.ascontiguousarray(cell, dtype=np.float64)
    pbc_arr = np.ascontiguousarray(
        np.asarray(pbc, dtype=bool).astype(np.uint8))
    n = len(positions)
    idx = np.zeros((n, capacity), dtype=np.int32)
    shift = np.zeros((n, capacity, 3), dtype=np.float64)
    mask = np.zeros((n, capacity), dtype=np.uint8)
    max_count = lib.cell_list_neighbors(
        positions.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        cell.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        pbc_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        float(r_cut), capacity,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        shift.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return idx, shift, mask.astype(bool), int(max_count)
