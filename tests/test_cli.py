"""
CLI pipeline end to end via subprocess (python -m uf3_tpu ...):
featurize -> fit -> export on the reference's real 128-atom W data.
This is the YAML-driven workflow the reference documents as WIP
(readme.rst:57-58); here it must actually work from a shell.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REF_XYZ = "/root/reference/tests/data/extended_xyz/test.xyz"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

needs_data = pytest.mark.skipif(not os.path.isfile(REF_XYZ),
                                reason="reference dataset unavailable")


def run_cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    result = subprocess.run(
        [sys.executable, "-m", "uf3_tpu", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=900)
    assert result.returncode == 0, result.stderr[-2000:]
    return result.stdout


@needs_data
def test_cli_featurize_fit_export(tmp_path):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    shutil.copy(REF_XYZ, data_dir / "test.xyz")
    settings = tmp_path / "settings.yaml"
    settings.write_text(f"""
elements: [W]
degree: 3
data:
    sources:
        path: {data_dir}
        pattern: "*.xyz"
basis:
    r_min: 1.5
    r_max: 5.5
    resolution: 15
features:
    features_path: {tmp_path}/features.h5
    n_cores: 1
model:
    model_path: {tmp_path}/model.json
learning:
    features_path: {tmp_path}/features.h5
""")
    out = run_cli(["featurize", str(settings)], cwd=tmp_path)
    assert "5 configurations" in out
    assert os.path.isfile(tmp_path / "features.h5")

    out = run_cli(["fit", str(settings)], cwd=tmp_path)
    assert os.path.isfile(tmp_path / "model.json")

    # the fitted model loads and reproduces training energies
    from uf3_tpu.data import io
    from uf3_tpu.forcefield.calculator import UFCalculator
    from uf3_tpu.regression import least_squares as ls
    model = ls.WeightedLinearModel.from_json(str(tmp_path / "model.json"))
    coord = io.DataCoordinator()
    coord.dataframe_from_trajectory(REF_XYZ, prefix="dft")
    df = coord.consolidate()
    calc = UFCalculator(model)
    geom = df["geometry"].iloc[0]
    e = calc.get_potential_energy(geom)
    assert abs(e - df["energy"].iloc[0]) / len(geom) < 0.02

    out = run_cli(["export", str(tmp_path / "model.json"),
                   "--out", str(tmp_path / "pot")], cwd=tmp_path)
    pot_files = os.listdir(tmp_path / "pot")
    assert any(f.endswith(".uf3") for f in pot_files), pot_files
