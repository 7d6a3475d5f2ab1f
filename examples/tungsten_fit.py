"""
End-to-end 2+3-body tungsten fit (BASELINE configs 1-2): parse an
extxyz dataset, featurize with the manuscript demo settings
(r_max (W,W)=5.5, (W,W,W)=[3.5,3.5,7.0], resolutions [15]/[6,6,12],
trims lead {2:0,3:3} trail {2:3,3:3}; reference
examples/tungsten_extxyz/uf23_potential_demo.ipynb), fit with
curvature regularization, and report energy/force RMSE.

Usage: python examples/tungsten_fit.py <dataset.xyz> [features.h5]
The w-14.xyz dataset is available at qmml.org (not bundled).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import time

import numpy as np

from uf3_tpu.data import io
from uf3_tpu.data.composition import ChemicalSystem
from uf3_tpu.regression.least_squares import WeightedLinearModel
from uf3_tpu.representation.basis import BSplineBasis
from uf3_tpu.representation.process import BasisFeaturizer


def main():
    dataset = sys.argv[1]
    features_path = sys.argv[2] if len(sys.argv) > 2 else "features.h5"

    coordinator = io.DataCoordinator()
    coordinator.dataframe_from_trajectory(dataset, prefix="dft")
    df_data = coordinator.consolidate()
    print(f"{len(df_data)} configurations loaded")

    chemistry = ChemicalSystem(["W"], degree=3)
    basis = BSplineBasis(
        chemistry,
        r_min_map={("W", "W"): 1.5, ("W", "W", "W"): [1.5, 1.5, 1.5]},
        r_max_map={("W", "W"): 5.5, ("W", "W", "W"): [3.5, 3.5, 7.0]},
        resolution_map={("W", "W"): 15, ("W", "W", "W"): [6, 6, 12]})
    featurizer = BasisFeaturizer(basis)

    import os
    from uf3_tpu.util import parallel as par
    n_cores = os.cpu_count() or 4
    t0 = time.time()
    with par.get_executor(n_cores) as executor:
        featurizer.batched_to_hdf(features_path, df_data,
                                  client=executor, n_jobs=n_cores,
                                  batch_size=50)
    t_feat = time.time() - t0
    print(f"featurization: {t_feat:.1f} s ({n_cores} workers)")

    model = WeightedLinearModel(basis, c2=1e-8, c3=1e-8)
    subset = list(df_data.index)
    split = int(0.8 * len(subset))
    t0 = time.time()
    model.fit_from_file(features_path, subset=subset[:split],
                        weight=0.5)
    t_fit = time.time() - t0
    print(f"gram + solve: {t_fit:.1f} s")

    y_e, p_e, y_f, p_f, rmse_e, rmse_f = model.batched_predict(
        features_path, keys=subset[split:])
    sizes = df_data.loc[subset[split:], "size"].to_numpy(dtype=float)
    print(f"holdout energy RMSE: {rmse_e * 1000:.2f} meV/atom "
          f"(per-atom basis), force RMSE: {rmse_f:.4f} eV/A")
    model.to_json("model_2and3_refit.json")
    print("model written to model_2and3_refit.json")

    # multi-panel 3B slice grid (r_ij x r_ik panels over r_jk)
    try:
        import matplotlib
        matplotlib.use("Agg")
        from uf3_tpu.util.plotting import ThreeBodyPlotter
        fig, _ = ThreeBodyPlotter(model).plot_slices(n_panels=5)
        fig.savefig("slices_3b.png", dpi=140)
        print("3B slice grid written to slices_3b.png")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
