"""
Data ingestion: extended-xyz / VASP vasprun.xml / LAMMPS log+dump parsers
and the DataCoordinator that arranges configurations into standard
DataFrames [geometry, energy, fx, fy, fz, size].

Standalone implementations of the formats the reference reads through
ase (uf3/data/io.py:24-1016); column layout, prefix-indexed keys,
duplicate handling, farthest-point subsampling, and the VASP PSTRESS
PV-correction semantics are preserved.
"""

import fnmatch
import os
import re
from io import StringIO
from typing import Dict, List, Optional, Tuple, Union

import numpy as np
import pandas as pd

from uf3_tpu.data import elements
from uf3_tpu.data.atoms import Atoms
from uf3_tpu.util import subsample


# ---------------------------------------------------------------------------
# extended xyz
# ---------------------------------------------------------------------------
_KV_RE = re.compile(r'(\S+?)=(?:"([^"]*)"|(\S+))')


def _parse_xyz_comment(line: str) -> Dict[str, str]:
    return {m.group(1): m.group(2) if m.group(2) is not None else m.group(3)
            for m in _KV_RE.finditer(line)}


def _parse_properties(spec: str) -> List[Tuple[str, str, int]]:
    parts = spec.split(":")
    out = []
    for i in range(0, len(parts), 3):
        out.append((parts[i], parts[i + 1], int(parts[i + 2])))
    return out


def read_xyz(filename: Union[str, StringIO],
             index: slice = None) -> List[Atoms]:
    """Read extended-xyz trajectory (energy in the comment line; forces
    from a 'force'/'forces' property column)."""
    if isinstance(filename, str):
        with open(filename) as f:
            lines = f.read().splitlines()
    else:
        lines = filename.read().splitlines()
    geometries = []
    pos = 0
    while pos < len(lines):
        if not lines[pos].strip():
            pos += 1
            continue
        n_atoms = int(lines[pos].strip())
        comment = _parse_xyz_comment(lines[pos + 1])
        props = _parse_properties(
            comment.get("Properties", "species:S:1:pos:R:3"))
        body = lines[pos + 2:pos + 2 + n_atoms]
        columns = [ln.split() for ln in body]
        col = 0
        species = None
        positions = None
        arrays = {}
        for name, kind, width in props:
            values = [row[col:col + width] for row in columns]
            if name == "species":
                species = [v[0] for v in values]
            elif name == "pos":
                positions = np.array(values, dtype=float)
            else:
                if kind == "S":
                    arr = np.array([v[0] if width == 1 else v
                                    for v in values])
                else:
                    dtype = float if kind == "R" else int
                    arr = np.array(values, dtype=dtype)
                    if width == 1:
                        arr = arr[:, 0]
                arrays[name] = arr
            col += width
        cell = None
        pbc = False
        if "Lattice" in comment:
            cell = np.array(comment["Lattice"].split(),
                            dtype=float).reshape(3, 3)
            pbc = True
        if "pbc" in comment:
            pbc = [p.strip().upper() in ("T", "TRUE", "1")
                   for p in comment["pbc"].split()]
        geom = Atoms(symbols=species, positions=positions, cell=cell,
                     pbc=pbc)
        for key in ("energy", "Energy"):
            if key in comment:
                geom.info["energy"] = float(comment[key])
                break
        for key, value in comment.items():
            if key not in ("Lattice", "Properties", "pbc", "energy",
                           "Energy"):
                try:
                    geom.info[key] = float(value)
                except ValueError:
                    geom.info[key] = value
        for key in ("force", "forces"):
            if key in arrays:
                forces = arrays.pop(key)
                geom.arrays["fx"] = forces[:, 0]
                geom.arrays["fy"] = forces[:, 1]
                geom.arrays["fz"] = forces[:, 2]
                break
        geom.arrays.update({k: v for k, v in arrays.items()
                            if k not in ("Z",)})
        geometries.append(geom)
        pos += 2 + n_atoms
    if index is not None:
        geometries = geometries[index]
    return geometries


def write_xyz(filename: str, geometries: List[Atoms],
              append: bool = False) -> None:
    """Write extended-xyz with energy/forces when present."""
    mode = "a" if append else "w"
    with open(filename, mode) as f:
        for geom in geometries:
            has_forces = all(k in geom.arrays for k in ("fx", "fy", "fz"))
            props = "species:S:1:pos:R:3"
            if has_forces:
                props += ":forces:R:3"
            fields = [f"Properties={props}"]
            if np.any(geom.get_pbc()):
                lattice = " ".join(f"{x:.10f}"
                                   for x in geom.get_cell().ravel())
                fields.append(f'Lattice="{lattice}"')
            if "energy" in geom.info:
                fields.append(f'energy={geom.info["energy"]:.10f}')
            f.write(f"{len(geom)}\n{' '.join(fields)}\n")
            symbols = geom.get_chemical_symbols()
            for i in range(len(geom)):
                row = [f"{symbols[i]:<3}"] + [
                    f"{x:.10f}" for x in geom.positions[i]]
                if has_forces:
                    row += [f"{geom.arrays[c][i]:.10f}"
                            for c in ("fx", "fy", "fz")]
                f.write(" ".join(row) + "\n")


# ---------------------------------------------------------------------------
# VASP vasprun.xml
# ---------------------------------------------------------------------------
def read_vasprun(filename: str) -> List[Atoms]:
    """Parse ionic steps (structure, free energy, forces) from
    vasprun.xml using the standard library XML parser."""
    import xml.etree.ElementTree as ET
    tree = ET.parse(filename)
    root = tree.getroot()
    # species from atominfo
    species = []
    atominfo = root.find("atominfo")
    for array in atominfo.iter("array"):
        if array.get("name") == "atoms":
            for rc in array.find("set").iter("rc"):
                species.append(rc.find("c").text.strip())
    geometries = []
    for calc in root.iter("calculation"):
        structure = calc.find("structure")
        cell = None
        positions_frac = None
        for varray in structure.iter("varray"):
            if varray.get("name") == "positions":
                positions_frac = np.array(
                    [[float(x) for x in v.text.split()]
                     for v in varray.findall("v")])
        crystal = structure.find("crystal")
        for varray in crystal.iter("varray"):
            if varray.get("name") == "basis":
                cell = np.array([[float(x) for x in v.text.split()]
                                 for v in varray.findall("v")])
        forces = None
        for varray in calc.findall("varray"):
            if varray.get("name") == "forces":
                forces = np.array([[float(x) for x in v.text.split()]
                                   for v in varray.findall("v")])
        energy = None
        energy_block = calc.find("energy")
        if energy_block is not None:
            for entry in energy_block.findall("i"):
                if entry.get("name") == "e_fr_energy":
                    energy = float(entry.text)
        geom = Atoms(symbols=species,
                     positions=positions_frac @ cell,
                     cell=cell, pbc=True)
        if energy is not None:
            geom.info["energy"] = energy
        if forces is not None:
            geom.arrays["fx"] = forces[:, 0]
            geom.arrays["fy"] = forces[:, 1]
            geom.arrays["fz"] = forces[:, 2]
        geometries.append(geom)
    return geometries


# ---------------------------------------------------------------------------
# LAMMPS log + dump
# ---------------------------------------------------------------------------
def df_from_tsv_text(text: str) -> pd.DataFrame:
    df = pd.read_csv(StringIO(text), sep=r"\s+")
    return df.set_index("id").sort_index()


def parse_lammps_log(fname: str, log_regex: str = None) -> pd.DataFrame:
    """Thermo blocks (Step ... until 'Loop time') into one DataFrame."""
    log_regex = log_regex or r"\n(Step[^\n]+\n[^A-Z]+)(?:Loop time)"
    blocks = []
    with open(fname) as f:
        text = f.read()
    for block in re.compile(log_regex).findall(text):
        blocks.append(pd.read_csv(StringIO(block), sep=r"\s+"))
    df_log = pd.concat(blocks, ignore_index=True)
    return df_log[~df_log.duplicated()]


def _construct_cell(bounds: np.ndarray,
                    off_diag: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """LAMMPS box bounds (+tilt) -> cell matrix and displacement."""
    xlo, xhi, ylo, yhi, zlo, zhi = bounds
    xy, xz, yz = off_diag
    xlo -= min(0.0, xy, xz, xy + xz)
    xhi -= max(0.0, xy, xz, xy + xz)
    ylo -= min(0.0, yz)
    yhi -= max(0.0, yz)
    cell = np.array([[xhi - xlo, 0.0, 0.0],
                     [xy, yhi - ylo, 0.0],
                     [xz, yz, zhi - zlo]])
    displacement = np.array([xlo, ylo, zlo])
    return cell, displacement


def atoms_from_df(df: pd.DataFrame,
                  element_key: str = "element",
                  lammps_aliases: Dict = None,
                  info: Dict = None,
                  **atom_kwargs) -> Atoms:
    """Build Atoms from a per-atom DataFrame with x/y/z + species."""
    lammps_aliases = lammps_aliases or {}
    positions = df[["x", "y", "z"]].to_numpy()
    species = [lammps_aliases.get(el, el) for el in df[element_key]]
    numbers = []
    for item in species:
        if isinstance(item, str) and item in elements.atomic_numbers:
            numbers.append(elements.atomic_numbers[item])
        else:
            numbers.append(int(item))
    atoms = Atoms(numbers=numbers, positions=positions, **atom_kwargs)
    for key in set(df.columns) - {"x", "y", "z", element_key}:
        atoms.set_array(key, df[key].to_numpy())
    atoms.info = dict(info or {})
    return atoms


def parse_lammps_dump(fname: str,
                      lammps_aliases: Dict,
                      timesteps: List[int] = None) -> pd.Series:
    """Stream a LAMMPS text dump into per-timestep Atoms; optionally
    match a chronological subset of timesteps (duplicates allowed,
    accommodating reset_timestep runs)."""
    parse_subset = timesteps is not None
    remaining = np.array(timesteps) if parse_subset else None
    snapshot_index = []
    snapshot_contents = []
    atom_lines: List[str] = []
    timestep = None
    cell = None
    pbc = None
    celldisp = None
    with open(fname) as f:
        while True:
            line = f.readline()
            if "ITEM: TIMESTEP" in line or not line:
                if timestep is not None and atom_lines:
                    df = df_from_tsv_text("\n".join(atom_lines))
                    atoms = atoms_from_df(df, element_key="type",
                                          lammps_aliases=lammps_aliases,
                                          cell=cell, pbc=pbc)
                    atoms.info["celldisp"] = celldisp
                    if not parse_subset:
                        snapshot_index.append(timestep)
                        snapshot_contents.append(atoms)
                    elif timestep in remaining:
                        snapshot_index.append(timestep)
                        snapshot_contents.append(atoms)
                        first = np.flatnonzero(remaining == timestep)[0]
                        remaining = np.delete(remaining, first)
                        if len(remaining) == 0:
                            break
                if not line:
                    break
                timestep = int(f.readline())
                atom_lines = []
            elif "ITEM: NUMBER OF ATOMS" in line:
                f.readline()
            elif "ITEM: BOX BOUNDS" in line:
                conditions = line.replace("ITEM: BOX BOUNDS ", "").split()
                rows = np.array([f.readline().split() for _ in range(3)],
                                dtype=float)
                bounds = rows[:, :2].reshape(6)
                if len(conditions) < 3:
                    pbc = (False, False, False)
                    off_diag = np.zeros(3)
                elif len(conditions) == 3:
                    pbc = ["p" in c.lower() for c in conditions]
                    off_diag = np.zeros(3)
                else:
                    pbc = ["p" in c.lower() for c in conditions[3:]]
                    off_diag = rows[:, 2]
                cell, celldisp = _construct_cell(bounds, off_diag)
            elif "ITEM: ATOMS" in line:
                atom_lines.append(line.replace("ITEM: ATOMS ", ""))
            else:
                atom_lines.append(line)
    return pd.Series(index=snapshot_index, data=snapshot_contents)


def parse_lammps_outputs(path: str,
                         lammps_aliases: Dict,
                         prefix: str = None,
                         column_subs: Dict = {"PotEng": "energy"},
                         log_fname: str = "log.lammps",
                         dump_fname: str = "dump.lammpstrj",
                         atoms_key: str = "geometry",
                         size_key: str = "size",
                         log_regex: str = None) -> pd.DataFrame:
    """Join a LAMMPS thermo log with its dump into a standard dataframe."""
    df_log = parse_lammps_log(os.path.join(path, log_fname),
                              log_regex=log_regex)
    df = df_log.rename(columns=column_subs)
    log_timesteps = df["Step"].values.copy()
    snapshots = parse_lammps_dump(os.path.join(path, dump_fname),
                                  lammps_aliases,
                                  timesteps=log_timesteps)
    log_idxs = np.arange(len(df))
    matched = []
    remaining_steps = log_timesteps.copy()
    remaining_idx = log_idxs.copy()
    for timestep in snapshots.index:
        i = np.flatnonzero(remaining_steps == timestep)[0]
        matched.append(remaining_idx[i])
        remaining_steps = np.delete(remaining_steps, i)
        remaining_idx = np.delete(remaining_idx, i)
    geometries = list(snapshots.values)
    df = df.iloc[matched].copy()
    df[atoms_key] = geometries
    for i, geom in enumerate(geometries):
        info = df.iloc[i].drop(atoms_key).to_dict()
        geom.info.update(info)
    if prefix is not None:
        df = df.rename(index=lambda i: f"{prefix}_{i}")
    df = update_dataframe_from_geometries(
        df, atoms_key=atoms_key, size_key=size_key,
        scalar_keys=["energy"], array_keys=["fx", "fy", "fz"])
    return df


# ---------------------------------------------------------------------------
# dataframe assembly
# ---------------------------------------------------------------------------
def update_dataframe_from_geometries(df: pd.DataFrame,
                                     scalar_keys=(),
                                     array_keys=(),
                                     atoms_key: str = "geometry",
                                     size_key: str = "size",
                                     inplace: bool = True) -> pd.DataFrame:
    if not inplace:
        df = df.copy()
    for scalar in list(scalar_keys) + [size_key]:
        if scalar not in df.columns:
            df[scalar] = pd.Series(dtype=float if scalar != size_key
                                   else int)
    for array in array_keys:
        if array not in df.columns:
            df[array] = pd.Series(dtype=object)
    for idx, geom in enumerate(df[atoms_key]):
        df.iat[idx, df.columns.get_loc(size_key)] = len(geom)
        for scalar in scalar_keys:
            if scalar in geom.info:
                df.iat[idx, df.columns.get_loc(scalar)] = geom.info[scalar]
        for array in array_keys:
            if array in geom.arrays:
                df.iat[idx, df.columns.get_loc(array)] = geom.arrays[array]
    return df


def _read_xyz_native(fname: str):
    """Parse extxyz with the native C++ tokenizer (uf3_tpu/native) when
    the file uses the standard energy + Lattice + pos/forces layout;
    returns None to fall back to the Python parser (library missing,
    or the file carries per-axis pbc flags the fast path skips)."""
    try:
        with open(fname) as fh:
            fh.readline()
            if "pbc=" in fh.readline():
                return None
        from uf3_tpu import native
        if not native.available():
            return None
        return native.parse_extxyz_fast(fname)
    except Exception:
        return None


def parse_trajectory(fname: str,
                     scalar_keys=(),
                     array_keys=(),
                     prefix: str = None,
                     atoms_key: str = "geometry",
                     energy_key: str = "energy",
                     force_key: str = "force",
                     size_key: str = "size") -> pd.DataFrame:
    """Read a trajectory file (extxyz or vasprun.xml) into the standard
    dataframe layout.  Extxyz files with the standard layout go through
    the native C++ tokenizer (~20x the Python parser)."""
    basename = os.path.basename(fname)
    if basename.endswith(".xml") or "vasprun" in basename:
        geometries = read_vasprun(fname)
    elif basename.endswith(".db"):
        geometries = read_database(fname)
    else:
        geometries = None
        # the C++ tokenizer only recognizes the literal 'energy'/
        # 'Energy' comment key and the standard force columns; any
        # other key request must take the general Python parser or the
        # requested values would silently read as the 0.0 placeholder
        if (not scalar_keys and not array_keys
                and energy_key.lower() == "energy"
                and force_key.lower() in ("force", "forces")):
            geometries = _read_xyz_native(fname)
        if geometries is None:
            geometries = read_xyz(fname)
    default_columns = [atoms_key, energy_key, "fx", "fy", "fz"]
    scalar_keys = [k for k in scalar_keys if k not in default_columns]
    array_keys = [k for k in array_keys if k not in default_columns]
    df = pd.DataFrame(columns=default_columns + scalar_keys + array_keys)
    df[atoms_key] = geometries
    df[energy_key] = 0.0
    df = update_dataframe_from_geometries(
        df, atoms_key=atoms_key, size_key=size_key,
        scalar_keys=list(scalar_keys) + [energy_key],
        array_keys=list(array_keys) + ["fx", "fy", "fz"])
    if prefix is not None:
        df = df.rename(index=lambda i: f"{prefix}_{i}")
    return df


def prepare_dataframe_from_lists(geometries: List[Atoms],
                                 prefix: str = None,
                                 energies=None,
                                 forces=None,
                                 atoms_key: str = "geometry",
                                 energy_key: str = "energy",
                                 force_key: str = "force",
                                 size_key: str = "size",
                                 copy: bool = True) -> pd.DataFrame:
    if copy:
        geometries = [geom.copy() for geom in geometries]
    df = pd.DataFrame(columns=[atoms_key, energy_key, "fx", "fy", "fz"])
    df[atoms_key] = geometries
    if energies is not None:
        df[energy_key] = np.asarray(energies, dtype=float)
        for geom, energy in zip(geometries, energies):
            geom.info[energy_key] = energy
    if forces is not None:
        df["fx"] = [np.asarray(f)[:, 0] for f in forces]
        df["fy"] = [np.asarray(f)[:, 1] for f in forces]
        df["fz"] = [np.asarray(f)[:, 2] for f in forces]
        for geom, force in zip(geometries, forces):
            force = np.asarray(force)
            geom.arrays["fx"] = force[:, 0]
            geom.arrays["fy"] = force[:, 1]
            geom.arrays["fz"] = force[:, 2]
    scalar_keys = [energy_key] if energies is None else []
    array_keys = ["fx", "fy", "fz"] if forces is None else []
    df = update_dataframe_from_geometries(
        df, atoms_key=atoms_key, size_key=size_key,
        scalar_keys=scalar_keys, array_keys=array_keys)
    if prefix is not None:
        df = df.rename(index=lambda i: f"{prefix}_{i}")
    return df


def concat_dataframes(dataframes: List[pd.DataFrame],
                      remove_duplicates: bool = True,
                      keep: str = "first") -> pd.DataFrame:
    df = pd.concat(dataframes)
    duplicates = df.index.duplicated(keep=keep)
    if np.any(duplicates):
        print("Duplicates keys found:", int(np.sum(duplicates)))
        if remove_duplicates:
            df = df[~duplicates]
    return df


class DataCoordinator:
    """Load trajectories from multiple sources with prefix-indexed keys."""

    def __init__(self,
                 atoms_key: str = "geometry",
                 energy_key: str = "energy",
                 force_key: str = "force",
                 size_key: str = "size",
                 overwrite: bool = False):
        self.atoms_key = atoms_key
        self.energy_key = energy_key
        self.force_key = force_key
        self.size_key = size_key
        self.overwrite = overwrite
        self.data: Dict = {}
        self.keys: List = []

    @staticmethod
    def from_config(config: Dict) -> "DataCoordinator":
        keys = ["atoms_key", "energy_key", "force_key", "size_key",
                "overwrite"]
        return DataCoordinator(**{k: v for k, v in config.items()
                                  if k in keys})

    def __repr__(self):
        if not self.keys:
            return "DataCoordinator:\n    Datasets: None"
        return (f"DataCoordinator:\n    Datasets: {len(self.keys)} "
                f"({self.keys})")

    def consolidate(self, remove_duplicates: bool = True,
                    keep: str = "first") -> pd.DataFrame:
        return concat_dataframes([self.data[k] for k in self.keys],
                                 remove_duplicates=remove_duplicates,
                                 keep=keep)

    def load_dataframe(self, dataframe: pd.DataFrame,
                       prefix: str = None) -> None:
        for key in (self.atoms_key, self.energy_key, self.size_key):
            if key not in dataframe.columns:
                raise RuntimeError(f'Missing "{key}" column.')
        name_0 = dataframe.index[0]
        if isinstance(name_0, str) and "_" in name_0:
            prefix = "_".join(name_0.split("_")[:-1])
        if prefix is None:
            prefix = len(self.data)
            dataframe = dataframe.rename(index=lambda i: f"{prefix}_{i}")
        if prefix in self.data:
            print(f'Data already exists with prefix "{prefix}".', end=" ")
            if self.overwrite:
                print("Overwriting...")
                self.data[prefix] = dataframe
            else:
                print("Skipping...")
            return
        self.data[prefix] = dataframe
        self.keys.append(prefix)

    def dataframe_from_lists(self, geometries, prefix=None, energies=None,
                             forces=None, load: bool = True, **kwargs):
        if prefix is None:
            prefix = len(self.data)
        df = prepare_dataframe_from_lists(
            geometries, prefix, energies=energies, forces=forces,
            atoms_key=self.atoms_key, energy_key=self.energy_key,
            force_key=self.force_key, size_key=self.size_key, **kwargs)
        if load:
            self.load_dataframe(df, prefix=prefix)
        else:
            return df

    def dataframe_from_trajectory(self, filename, prefix=None,
                                  load: bool = True, energy_key=None,
                                  force_key=None, **kwargs):
        if prefix is None:
            prefix = len(self.data)
        energy_key = energy_key or self.energy_key
        force_key = force_key or self.force_key
        df = parse_trajectory(filename, prefix=prefix,
                              atoms_key=self.atoms_key,
                              energy_key=energy_key,
                              force_key=force_key,
                              size_key=self.size_key, **kwargs)
        if energy_key != self.energy_key:
            df = df.rename(columns={energy_key: self.energy_key})
        if load:
            self.load_dataframe(df, prefix=prefix)
        else:
            return df

    dataframe_from_xyz = dataframe_from_trajectory
    dataframe_from_vasprun = dataframe_from_trajectory

    def dataframe_from_lammps_run(self, path, lammps_aliases, prefix=None,
                                  column_subs={"PotEng": "energy"},
                                  log_fname="log.lammps",
                                  dump_fname="dump.lammpstrj",
                                  load: bool = True, **kwargs):
        if prefix is None:
            prefix = len(self.data)
        df = parse_lammps_outputs(path, lammps_aliases, prefix=prefix,
                                  column_subs=column_subs,
                                  log_fname=log_fname,
                                  dump_fname=dump_fname,
                                  atoms_key=self.atoms_key,
                                  size_key=self.size_key, **kwargs)
        if load:
            self.load_dataframe(df, prefix=prefix)
        else:
            return df


# ---------------------------------------------------------------------------
# auxiliary utilities
# ---------------------------------------------------------------------------
def read_vasp_pressure(path: str) -> float:
    """PSTRESS (kbar) from INCAR/OUTCAR/vasprun for the H = E + PV
    enthalpy correction."""
    pstress = None
    for fname in ("INCAR", "OUTCAR", "vasprun.xml"):
        full = os.path.join(path, fname)
        if os.path.isfile(full):
            with open(full) as f:
                for line in f:
                    if "PSTRESS" in line:
                        pstress = float(re.sub(r"[^0-9.]", "", line))
                        break
        if pstress is not None:
            break
    if pstress is None:
        return 0.0
    return pstress * 1e-22 / 1.602176634e-19  # kbar -> eV / A^3


def identify_paths(experiment_path: str = ".",
                   filename: str = None,
                   filename_pattern: str = None) -> List[str]:
    data_paths = []
    if filename is not None:
        if os.path.isfile(filename):
            data_paths.append(filename)
        elif os.path.isfile(os.path.join(experiment_path, filename)):
            data_paths.append(filename)
    if filename_pattern is not None:
        for directory, _, files in os.walk(experiment_path):
            for name in files:
                if fnmatch.fnmatch(name, filename_pattern):
                    data_paths.append(os.path.join(directory, name))
    return data_paths


def parse_with_subsampling(data_paths: List[str],
                           data_coordinator: DataCoordinator,
                           max_samples: int = 100,
                           min_diff: float = 1e-3,
                           vasp_pressure: bool = False,
                           lammps_log: str = None,
                           lammps_aliases: Dict = None,
                           verbose: bool = False) -> None:
    """Parse many files with per-file farthest-point subsampling on
    per-atom energies (and optional VASP PV correction)."""
    common_path = os.path.dirname(os.path.commonprefix(data_paths))
    energy_key = data_coordinator.energy_key
    size_key = data_coordinator.size_key
    for data_path in data_paths:
        prefix = data_path[len(common_path):].replace("/", "-").lstrip("-")
        try:
            if lammps_log is not None:
                lammps_path, dump_fname = os.path.split(data_path)
                df = data_coordinator.dataframe_from_lammps_run(
                    lammps_path, lammps_aliases, prefix=prefix,
                    load=False, log_fname=lammps_log,
                    dump_fname=dump_fname,
                    column_subs={"TotEng": "energy"})
            else:
                df = data_coordinator.dataframe_from_trajectory(
                    data_path, prefix=prefix, load=False)
        except (ValueError, FileNotFoundError):
            continue
        if df is None or len(df) == 0:
            continue
        energy_list = (df[energy_key].values
                       / df[size_key].values).astype(float)
        if max_samples > 0 and min_diff > 0:
            samples = subsample.farthest_point_sampling(
                energy_list, max_samples=max_samples, min_diff=min_diff)
        else:
            samples = np.arange(len(energy_list))
        if verbose:
            print(f"{len(samples)}/{len(energy_list)} samples from "
                  f"{prefix}.")
        df = df.iloc[np.sort(samples)]
        if vasp_pressure and lammps_log is None:
            pressure = read_vasp_pressure(os.path.dirname(data_path))
            if pressure != 0:
                volumes = [g.get_volume() for g in df["geometry"].values]
                df[energy_key] = df[energy_key] - np.multiply(volumes,
                                                              pressure)
        data_coordinator.load_dataframe(df, prefix=prefix)


def get_max_forces(*component_views):
    forces = np.vstack([np.asarray(v) for v in component_views]).T
    return np.max(np.linalg.norm(forces, 2, axis=1))


def filter_max_forces(df_data: pd.DataFrame,
                      cutoff: float = 10,
                      force_keys=("fx", "fy", "fz"),
                      return_values: bool = False):
    max_forces = df_data[list(force_keys)].apply(
        lambda row: get_max_forces(*row), axis=1)
    matches = df_data.index[max_forces <= cutoff]
    if return_values:
        return matches, max_forces
    return matches


# ---------------------------------------------------------------------------
# ase.db (SQLite) interop -- dataset caching without an ase dependency
# ---------------------------------------------------------------------------
# Schema-compatible with ase.db's SQLite3 backend (reference
# uf3/data/io.py:383 read_database, :906 cache_data): numbers as int32
# blobs, positions/cell/forces as float64 blobs, pbc bit-encoded, user
# metadata in the key_value_pairs JSON column.
_ASE_DB_SCHEMA = [
    """CREATE TABLE IF NOT EXISTS systems (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    unique_id TEXT UNIQUE,
    ctime REAL, mtime REAL, username TEXT,
    numbers BLOB, positions BLOB, cell BLOB, pbc INTEGER,
    initial_magmoms BLOB, initial_charges BLOB, masses BLOB,
    tags BLOB, momenta BLOB, constraints TEXT,
    calculator TEXT, calculator_parameters TEXT,
    energy REAL, free_energy REAL, forces BLOB, stress BLOB,
    dipole BLOB, magmoms BLOB, magmom REAL, charges BLOB,
    key_value_pairs TEXT, data TEXT,
    natoms INTEGER, fmax REAL, smax REAL,
    volume REAL, mass REAL, charge REAL)""",
    """CREATE TABLE IF NOT EXISTS information (
    name TEXT, value TEXT)""",
]


def cache_data(df_data: pd.DataFrame,
               filename: str,
               energy_key: str = "energy",
               serial: bool = False) -> None:
    """Cache a DataCoordinator dataframe as an ase.db-style SQLite
    database (geometry + energy + forces + scalar info per row)."""
    import json
    import sqlite3
    import time as _time
    import uuid

    append = os.path.isfile(filename)
    con = sqlite3.connect(filename)
    try:
        cur = con.cursor()
        for stmt in _ASE_DB_SCHEMA:
            cur.execute(stmt)
        if not append:
            cur.execute("INSERT INTO information VALUES (?, ?)",
                        ("version", "9"))
        now = _time.time()
        for name, geom in df_data["geometry"].items():
            energy = float(geom.info.get(energy_key, np.nan))
            forces = None
            if all(k in geom.arrays for k in ("fx", "fy", "fz")):
                forces = np.vstack([geom.arrays["fx"],
                                    geom.arrays["fy"],
                                    geom.arrays["fz"]]).T
            info = {k: v for k, v in geom.info.items()
                    if isinstance(v, (int, float, str, np.floating))
                    and k != energy_key}
            info["row_name"] = str(name)
            numbers = np.ascontiguousarray(
                geom.get_atomic_numbers(), dtype=np.int32)
            positions = np.ascontiguousarray(
                geom.get_positions(), dtype=np.float64)
            cell = np.ascontiguousarray(np.asarray(geom.get_cell()),
                                        dtype=np.float64)
            pbc_bits = int(np.dot(np.asarray(geom.get_pbc(),
                                             dtype=int), [1, 2, 4]))
            cur.execute(
                """INSERT INTO systems
                   (unique_id, ctime, mtime, username, numbers,
                    positions, cell, pbc, energy, forces,
                    key_value_pairs, natoms)
                   VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)""",
                (uuid.uuid4().hex, now, now, "uf3_tpu",
                 numbers.tobytes(), positions.tobytes(),
                 cell.tobytes(), pbc_bits,
                 None if np.isnan(energy) else energy,
                 None if forces is None
                 else np.ascontiguousarray(forces,
                                           np.float64).tobytes(),
                 json.dumps(info), len(geom)))
        con.commit()
    finally:
        con.close()


def read_database(filename: str, index: slice = None) -> List[Atoms]:
    """Read an ase.db-style SQLite database into Atoms objects (energy
    into info, forces into fx/fy/fz arrays, key-value pairs merged
    into info)."""
    import json
    import sqlite3

    con = sqlite3.connect(filename)
    try:
        cur = con.cursor()
        count = cur.execute("SELECT COUNT(*) FROM systems"
                            ).fetchone()[0]
        if index is None:
            index = slice(None, None)
        start, stop, _ = index.indices(count)
        if start == stop:
            return []
        rows = cur.execute(
            """SELECT numbers, positions, cell, pbc, energy, forces,
                      key_value_pairs
               FROM systems ORDER BY id LIMIT ? OFFSET ?""",
            (stop - start, start)).fetchall()
    finally:
        con.close()
    geometries = []
    for (numbers, positions, cell, pbc_bits, energy, forces,
         kv_json) in rows:
        numbers = np.frombuffer(numbers, dtype=np.int32)
        positions = np.frombuffer(positions,
                                  dtype=np.float64).reshape(-1, 3)
        cell = (np.frombuffer(cell, dtype=np.float64).reshape(3, 3)
                if cell is not None else None)
        pbc = [bool(pbc_bits & b) for b in (1, 2, 4)]
        geom = Atoms(numbers=numbers, positions=positions,
                     cell=cell if cell is not None
                     and np.any(cell != 0) else None, pbc=pbc)
        if energy is not None:
            geom.info["energy"] = float(energy)
        if forces is not None:
            block = np.frombuffer(forces,
                                  dtype=np.float64).reshape(-1, 3)
            geom.arrays["fx"] = block[:, 0].copy()
            geom.arrays["fy"] = block[:, 1].copy()
            geom.arrays["fz"] = block[:, 2].copy()
        if kv_json:
            for k, v in json.loads(kv_json).items():
                geom.info[k] = v
        geometries.append(geom)
    return geometries
