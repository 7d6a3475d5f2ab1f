"""
Visualization tests: spline/RDF plots stay importable and the 3-body
volume tools (cubehelix generator, marching-tetrahedra isosurface
extraction, volume plotter) are numerically correct.  Covers the
reference's plotting3d.py/cubehelix.py surface (plotly-free here).
"""

import os

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from uf3_tpu.regression import least_squares as ls
from uf3_tpu.util import plotting3d as p3


@pytest.fixture(scope="module")
def w_model():
    return ls.WeightedLinearModel.from_json(
        os.path.join("benchmarks_data", "model_2and3.json"))


class TestCubehelix:
    def test_monotonic_luminance(self):
        """The defining cubehelix property: greyscale-ordered."""
        rgb = p3.cubehelix(256)
        assert rgb.shape == (256, 3)
        assert rgb.min() >= 0.0 and rgb.max() <= 1.0
        lum = rgb @ np.array([0.299, 0.587, 0.114])
        assert np.all(np.diff(lum) > -1e-6)

    def test_cmap_objects(self):
        cmap = p3.cubehelix_cmap()
        rain = p3.perceptual_rainbow_cmap()
        assert cmap(0.5) != rain(0.5)
        # colourful, not greyscale: channels differ mid-map
        r, g, b, _ = rain(0.5)
        assert max(r, g, b) - min(r, g, b) > 0.05


class TestMarchingTetrahedra:
    def test_sphere(self):
        """Isosurface of |x| at level 1 is the unit sphere."""
        ax = np.linspace(-1.5, 1.5, 40)
        x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
        values = np.sqrt(x ** 2 + y ** 2 + z ** 2)
        verts, tris = p3.marching_tetrahedra(values, 1.0,
                                             coords=(ax, ax, ax))
        assert len(tris) > 1000
        radii = np.linalg.norm(verts, axis=1)
        assert np.abs(radii - 1.0).max() < 0.01
        # closed surface: total area ~ 4 pi
        tri_pts = verts[tris]
        cross = np.cross(tri_pts[:, 1] - tri_pts[:, 0],
                         tri_pts[:, 2] - tri_pts[:, 0])
        area = 0.5 * np.linalg.norm(cross, axis=1).sum()
        assert abs(area - 4 * np.pi) / (4 * np.pi) < 0.05

    def test_empty_level(self):
        values = np.zeros((5, 5, 5))
        verts, tris = p3.marching_tetrahedra(values, 1.0)
        assert len(verts) == 0 and len(tris) == 0


class TestVolumePlotter:
    def test_sampling_matches_evaluate(self, w_model):
        pl = p3.ThreeBodyVolumePlotter(w_model)
        values = pl.sample_uniformly(10)
        mid = (5, 5, 5)
        expected = pl.evaluate(pl.axes[0][mid[0]], pl.axes[1][mid[1]],
                               pl.axes[2][mid[2]])
        assert np.isclose(values[mid], expected)

    def test_theta_mask(self, w_model):
        """Angle sampling zeroes triangles outside the r_jk span."""
        pl = p3.ThreeBodyVolumePlotter(w_model)
        values = pl.sample_uniformly(12, theta=True)
        # tiny angles at max leg lengths give r_jk < r_min -> masked
        assert values[-1, -1, -1] == 0.0 or np.isfinite(values).all()
        assert values.shape == (12, 12, 12)

    def test_render(self, w_model):
        pl = p3.ThreeBodyVolumePlotter(w_model)
        ax = pl.plot_isosurface(n_samples=14)
        assert ax is not None
        ax2 = pl.plot_volume(n_samples=10, theta=True)
        assert ax2 is not None


@pytest.mark.smoke
class TestSliceGrid:
    def test_panel_grid(self, w_model):
        """Multi-panel r_jk slice grid renders with a shared scale
        and one panel per requested third-leg distance (parity with
        the reference's plot_slices_3b panel grid)."""
        from uf3_tpu.util.plotting import ThreeBodyPlotter
        tbp = ThreeBodyPlotter(w_model)
        fig, axes = tbp.plot_slices(n_panels=4, n=24)
        assert len(axes) == 4
        # panel values match direct surface evaluation at the center
        lo, hi = tbp.knots[2][0], tbp.knots[2][-1]
        pad = 0.08 * (hi - lo)
        r_jk = np.linspace(lo + pad, hi - pad, 4)[1]
        mesh = axes[1].collections[0]
        n = 24
        r1 = np.linspace(tbp.knots[0][0], tbp.knots[0][-1] - 1e-9, n)
        r2 = np.linspace(tbp.knots[1][0], tbp.knots[1][-1] - 1e-9, n)
        g1, g2 = np.meshgrid(r1, r2, indexing="ij")
        expected = tbp.evaluate(g1.ravel(), g2.ravel(),
                                np.full(n * n, r_jk)).reshape(n, n)
        assert np.allclose(np.asarray(mesh.get_array()).reshape(n, n),
                           expected)
        import matplotlib.pyplot as plt
        plt.close(fig)
