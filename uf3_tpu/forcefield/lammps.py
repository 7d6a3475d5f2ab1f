"""
LAMMPS interop: tabulated pair-potential export (pair_style table) and
native ``.uf3`` potential-file generation (pair_style uf3), plus a
LAMMPS data-file writer.

Format parity with uf3/forcefield/lammps.py:218-271 and
lammps_plugin/scripts/generate_uf3_lammps_pots.py:60-165 (the factor-2
bond convention, knot-spacing flags, and block layout), so potentials
fitted here drop into the upstream C++ ``pair_style uf3``.
"""

import os
from datetime import datetime
from typing import Dict, List, Tuple

import numpy as np

from uf3_tpu.data import elements
from uf3_tpu.data.atoms import Atoms
from uf3_tpu.representation import splines as sp


def export_tabulated_potential(knot_sequence: np.ndarray,
                               coefficients: np.ndarray,
                               interaction: Tuple[str, str],
                               grid: int = None,
                               filename: str = None,
                               contributor: str = None,
                               rounding: int = 6) -> str:
    """Write a pair_style-table file; energies/forces carry the factor
    of 2 because LAMMPS does not double-count bonds."""
    date = datetime.now().strftime("%m/%d/%Y")
    contributor = contributor or ""
    if not isinstance(interaction[0], str):
        interaction = [elements.chemical_symbols[int(z)]
                       for z in interaction]
    tag = "-".join(interaction)
    if grid is None:
        grid = 100
    if isinstance(grid, int):
        x_table = np.linspace(knot_sequence[0], knot_sequence[-1], grid)
    else:
        x_table = np.asarray(grid)
    lines = [
        f"# DATE: {date}  UNITS: metal  CONTRIBUTOR: {contributor}",
        f"# Ultra-Fast Force Field for {tag}\n",
        f"UF_{tag}",
        f"N {len(x_table)}\n",
    ]
    # clamp samples inside the knot span for exact boundary evaluation
    x_eval = np.clip(x_table, knot_sequence[0],
                     knot_sequence[-1] - 1e-12)
    e_values = sp.evaluate_spline(x_eval, knot_sequence, coefficients) * 2
    f_values = -sp.evaluate_spline(x_eval, knot_sequence, coefficients,
                                   nu=1) * 2
    fmt = f"{{0}} {{1:.{rounding}f}} {{2:.{rounding}f}} {{3:.{rounding}f}}"
    for i, (r, e, f) in enumerate(zip(x_table, e_values, f_values)):
        lines.append(fmt.format(i + 1, r, e, f))
    text = "\n".join(lines)
    if filename is not None:
        with open(filename, "w") as f:
            f.write(text)
    return text


def write_lammps_data(filename: str,
                      geom: Atoms,
                      element_list: List[str],
                      masses: bool = True) -> None:
    """Minimal LAMMPS data-file writer (atomic style, triclinic-safe
    for upper-triangular cells)."""
    cell = geom.get_cell()
    if not np.allclose(cell, np.triu(cell) * 0 + np.tril(cell)):
        # general cells require rotation to LAMMPS lower-triangular form
        q, r = np.linalg.qr(cell.T)
        rotation = q
        cell = (cell @ rotation)
        positions = geom.get_positions() @ rotation
    else:
        positions = geom.get_positions()
    type_map = {el: i + 1 for i, el in enumerate(element_list)}
    symbols = geom.get_chemical_symbols()
    lines = ["# LAMMPS data file written by uf3_tpu", "",
             f"{len(geom)} atoms", f"{len(element_list)} atom types", "",
             f"0.0 {cell[0, 0]:.10f} xlo xhi",
             f"0.0 {cell[1, 1]:.10f} ylo yhi",
             f"0.0 {cell[2, 2]:.10f} zlo zhi"]
    if abs(cell[1, 0]) + abs(cell[2, 0]) + abs(cell[2, 1]) > 1e-12:
        lines.append(f"{cell[1, 0]:.10f} {cell[2, 0]:.10f} "
                     f"{cell[2, 1]:.10f} xy xz yz")
    if masses:
        lines += ["", "Masses", ""]
        for el, t in type_map.items():
            lines.append(
                f"{t} {elements.atomic_masses[elements.atomic_numbers[el]]}")
    lines += ["", "Atoms", ""]
    for i in range(len(geom)):
        x, y, z = positions[i]
        lines.append(f"{i + 1} {type_map[symbols[i]]} "
                     f"{x:.10f} {y:.10f} {z:.10f}")
    with open(filename, "w") as f:
        f.write("\n".join(lines) + "\n")


def _format_vector(values, fmt="{:.17g}") -> str:
    return " ".join(fmt.format(float(v)) for v in values)


def write_uf3_lammps_pot_files(chemical_sys=None,
                               model=None,
                               knots_spacing_type: str = "nk",
                               pot_dir: str = ".",
                               uf3_lammps_pot_name: str = None,
                               author: str = "uf3_tpu",
                               lammps_units: str = "metal") -> str:
    """
    Write the combined native ``pair_style uf3`` potential file.

    Block layout matches lammps_plugin/scripts/
    generate_uf3_lammps_pots.py:58-165: per-interaction blocks with a
    header line (2B/3B + element symbols + trims + spacing flag),
    cutoffs and knot counts (3B in reversed jk/ik/ij order), knot
    vectors, coefficient counts, and coefficients (3B as the full
    decompressed L x M x N grid, one M-row per line).
    """
    from uf3_tpu.regression.least_squares import arrange_coefficients
    config = model.bspline_config
    chemical_sys = chemical_sys or config.chemical_system
    if knots_spacing_type not in ("uk", "nk"):
        raise ValueError(f"Invalid knot spacing type {knots_spacing_type}; "
                         "use 'uk' or 'nk'.")
    if uf3_lammps_pot_name is None:
        uf3_lammps_pot_name = "".join(chemical_sys.element_list) + ".uf3"
    os.makedirs(pot_dir, exist_ok=True)
    now = datetime.now().strftime("%Y-%m-%d %H:%M:%S")
    sizes, offsets = config.get_interaction_partitions()
    blocks = {}
    for interaction in chemical_sys.interactions_map[2]:
        key = "_".join(interaction)
        text = (f"#UF3 POT UNITS: {lammps_units} DATE: {now} "
                f"AUTHOR: {author} CITATION:\n")
        text += (f"2B {interaction[0]} {interaction[1]} "
                 f"{config.leading_trim} {config.trailing_trim} "
                 f"{knots_spacing_type}\n")
        knots = config.knots_map[interaction]
        text += f"{config.r_max_map[interaction]} {len(knots)}\n"
        text += _format_vector(knots) + "\n"
        text += f"{sizes[interaction]}\n"
        start = offsets[interaction]
        text += _format_vector(
            model.coefficients[start:start + sizes[interaction]]) + "\n"
        text += "#\n"
        blocks[key] = text
    solutions = arrange_coefficients(model.coefficients, config)
    for interaction in config.interactions_map.get(3, []):
        key = "_".join(interaction)
        text = (f"#UF3 POT UNITS: {lammps_units} DATE: {now} "
                f"AUTHOR: {author} CITATION:\n")
        text += (f"3B {interaction[0]} {interaction[1]} {interaction[2]} "
                 f"{config.leading_trim} {config.trailing_trim} "
                 f"{knots_spacing_type}\n")
        r_max = config.r_max_map[interaction]
        seqs = config.knots_map[interaction]
        text += (f"{r_max[2]} {r_max[1]} {r_max[0]} "
                 f"{len(seqs[2])} {len(seqs[1])} {len(seqs[0])}\n")
        text += _format_vector(seqs[2]) + "\n"
        text += _format_vector(seqs[1]) + "\n"
        text += _format_vector(seqs[0]) + "\n"
        grid = config.decompress_3B(solutions[interaction], interaction)
        text += f"{grid.shape[0]} {grid.shape[1]} {grid.shape[2]}\n"
        for i in range(grid.shape[0]):
            for j in range(grid.shape[1]):
                text += " ".join(map(str, grid[i, j])) + "\n"
        text += "#\n"
        blocks[key] = text
    path = os.path.join(pot_dir, uf3_lammps_pot_name)
    with open(path, "w") as f:
        for text in blocks.values():
            f.write(text)
    return path


def generate_lammps_input(model, pot_path: str) -> str:
    """pair_style/pair_coeff lines for a generated .uf3 file."""
    chemical_sys = model.bspline_config.chemical_system
    lines = [f"pair_style\tuf3 {model.bspline_config.degree} "
             f"{len(chemical_sys.element_list)}",
             f"pair_coeff\t* * {pot_path} "
             + " ".join(chemical_sys.element_list)]
    return "\n".join(lines)
