"""
Multi-element Ne-Xe 2-body fit + LAMMPS pair-table export (BASELINE
config 3; reference examples/NeXe_lammps): parse a LAMMPS run
(log + dump), featurize the binary pair basis, fit, and export
pair_style-table files for all three interactions.

Usage: python examples/nexe_pair_fit.py <lammps_run_dir>
(e.g. the reference's examples/NeXe_lammps/dataset directory)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


import numpy as np

from uf3_tpu.data import io
from uf3_tpu.data.composition import ChemicalSystem
from uf3_tpu.forcefield import lammps
from uf3_tpu.regression.least_squares import WeightedLinearModel
from uf3_tpu.representation.basis import BSplineBasis
from uf3_tpu.representation.process import BasisFeaturizer


def main():
    run_dir = sys.argv[1]
    coordinator = io.DataCoordinator()
    coordinator.dataframe_from_lammps_run(
        run_dir, {1: "Ne", 2: "Xe"}, prefix="md",
        column_subs={"TotEng": "energy"})
    df_data = coordinator.consolidate()
    print(f"{len(df_data)} snapshots loaded")

    chemistry = ChemicalSystem(["Ne", "Xe"], degree=2)
    basis = BSplineBasis(chemistry,
                         r_min_map={p: 1.0 for p in
                                    chemistry.interactions_map[2]},
                         r_max_map={p: 8.0 for p in
                                    chemistry.interactions_map[2]},
                         resolution_map={p: 20 for p in
                                         chemistry.interactions_map[2]})
    featurizer = BasisFeaturizer(basis)
    df_features = featurizer.evaluate(df_data)

    from uf3_tpu.regression.least_squares import dataframe_to_tuples
    x_e, y_e, x_f, y_f = dataframe_to_tuples(
        df_features, n_elements=len(chemistry.element_list))
    model = WeightedLinearModel(basis, c2=1e-8)
    model.fit(x_e, y_e, x_f, y_f, weight=0.5)
    model.to_json("model_nexe.json")

    sizes, offsets = basis.get_interaction_partitions()
    for pair in chemistry.interactions_map[2]:
        coeff = model.coefficients[offsets[pair]:offsets[pair]
                                   + sizes[pair]]
        fname = f"table_{'_'.join(pair)}.dat"
        lammps.export_tabulated_potential(basis.knots_map[pair], coeff,
                                          pair, grid=200,
                                          filename=fname)
        print(f"wrote {fname}")


if __name__ == "__main__":
    main()
