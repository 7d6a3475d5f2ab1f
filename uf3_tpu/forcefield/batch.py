"""
Batched convenience drivers: evaluate or relax many configurations with
one calculator (capability parity with uf3/forcefield/lammps.py:134-193,
which drives a linked LAMMPS library; here the framework's own engine
does the work, recreating nothing between entries and surviving
per-entry failures).
"""

from typing import List, Tuple

import numpy as np

from uf3_tpu.data.atoms import Atoms


def batched_energy_and_forces(geometries: List[Atoms],
                              calc) -> Tuple[List[float], List]:
    """Energies and forces for a list of configurations."""
    energies = []
    forces = []
    for geom in geometries:
        energies.append(calc.get_potential_energy(geom))
        forces.append(calc.get_forces(geom))
    return energies, forces


def batch_relax(geometries: List[Atoms],
                calc,
                fmax: float = 0.05,
                max_steps: int = 300,
                names: List[str] = None):
    """
    Relax a batch of configurations; entries that fail are skipped and
    the batch continues (cf. reference lammps.py:183-188).
    """
    relaxed = []
    energies = []
    forces = []
    kept_names = []
    for i, geom in enumerate(geometries):
        try:
            out = calc.relax_fmax(geom, fmax=fmax, steps=max_steps)
            relaxed.append(out)
            energies.append(calc.get_potential_energy(out))
            forces.append(calc.get_forces(out))
            if names is not None:
                kept_names.append(names[i])
        except (ValueError, FloatingPointError, RuntimeError):
            continue
    if names is not None:
        return relaxed, energies, forces, kept_names
    return relaxed, energies, forces


def save_md_checkpoint(filename: str, state, system=None) -> None:
    """Write an MD state checkpoint (positions, velocities, forces,
    PRNG key, thermostat momentum, cell) as a compressed npz."""
    import jax
    key = state.key
    if jnp_is_typed_key(key):
        key_impl = _canonical_key_impl(key)
        key_data = np.asarray(jax.random.key_data(key))
    else:
        key_impl = ""
        key_data = np.asarray(key)
    np.savez_compressed(
        filename,
        positions=np.asarray(state.positions),
        velocities=np.asarray(state.velocities),
        forces=np.asarray(state.forces),
        energy=np.asarray(state.energy),
        key=key_data,
        key_impl=np.asarray(key_impl),
        xi=np.asarray(state.xi),
        cell=np.asarray(state.cell))


def jnp_is_typed_key(key) -> bool:
    import jax
    try:
        return jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key)
    except Exception:
        return False


def _canonical_key_impl(key) -> str:
    """Canonical PRNG impl name for a typed key.  str(key_impl(key))
    is not a documented stable format across jax versions, so match
    the key's dtype against freshly-made keys of the known impls and
    store the plain name; unknown impls fall back to raw key data."""
    import jax
    for name in ("threefry2x32", "rbg", "unsafe_rbg"):
        try:
            if key.dtype == jax.random.key(0, impl=name).dtype:
                return name
        except Exception:
            continue
    return ""


def load_md_checkpoint(filename: str, system):
    """Restore an MDState from a checkpoint; neighbor lists are
    rebuilt from the stored positions."""
    import jax
    import jax.numpy as jnp
    from uf3_tpu.forcefield.md import MDState
    data = np.load(filename)
    positions = jnp.asarray(data["positions"], dtype=system.dtype)
    cell = jnp.asarray(data["cell"], dtype=system.dtype)
    nbr2, nbr3 = system.build_lists(positions, cell)
    key_impl = str(data["key_impl"]) if "key_impl" in data else ""
    key_data = jnp.asarray(data["key"])
    key = None
    if key_impl:
        try:
            key = jax.random.wrap_key_data(key_data, impl=key_impl)
        except Exception:
            key = None
    if key is None:
        # legacy checkpoint or unknown impl string: match the stored
        # key-data shape against the known impls before giving up
        for name in ("threefry2x32", "rbg", "unsafe_rbg"):
            try:
                probe = jax.random.key_data(
                    jax.random.key(0, impl=name))
                if probe.shape == key_data.shape:
                    key = jax.random.wrap_key_data(key_data, impl=name)
                    break
            except Exception:
                continue
    if key is None:
        key = key_data
    return MDState(
        positions=positions,
        velocities=jnp.asarray(data["velocities"],
                               dtype=system.dtype),
        forces=jnp.asarray(data["forces"], dtype=system.dtype),
        energy=jnp.asarray(data["energy"], dtype=system.dtype),
        nbr2=nbr2, nbr3=nbr3,
        key=key,
        xi=jnp.asarray(data["xi"], dtype=system.dtype),
        stale=jnp.zeros((), dtype=bool),
        cell=cell)


class TrajectoryWriter:
    """
    Chunk-cadence extended-xyz trajectory writer for MDSystem.run /
    npt_run (``callback=TrajectoryWriter(...)``) -- the counterpart of
    the LAMMPS ``dump`` command in the reference's MD workflow
    (supplement/melting_point/melting_uf.in).

    Writes one frame per fired callback (i.e. per jit chunk, every
    ``rebuild_every`` steps) or per ``every`` MD steps if given.
    Frames carry the cell, per-atom positions and forces, the potential
    energy, and the step count in the comment line.
    """

    def __init__(self, filename: str, system, every: int = None,
                 append: bool = False):
        self.filename = filename
        self.system = system
        self.every = every
        self._next = 0 if every else None
        if not append:
            open(filename, "w").close()
        self.frames_written = 0

    def __call__(self, state, steps_done: int) -> None:
        from uf3_tpu.data import io
        if self.every is not None:
            if steps_done < self._next:
                return
            self._next = steps_done + self.every
        geom = Atoms(
            numbers=np.asarray(self.system.atomic_numbers),
            positions=np.asarray(state.positions),
            cell=np.asarray(state.cell),
            pbc=True)
        f = np.asarray(state.forces)
        geom.arrays["fx"], geom.arrays["fy"], geom.arrays["fz"] = \
            f[:, 0], f[:, 1], f[:, 2]
        geom.info["energy"] = float(state.energy)
        geom.info["step"] = int(steps_done)
        io.write_xyz(self.filename, [geom], append=True)
        self.frames_written += 1
