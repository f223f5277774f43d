"""Plotting surface: every class exposes the shared plot helpers.

Smoke-level (figures render without error and have sensible content);
numerical behavior is covered elsewhere.
"""

import math

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from pychebyshev_tpu import (  # noqa: E402
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
    ChebyshevTT,
)


@pytest.fixture(autouse=True)
def _close_figures():
    yield
    plt.close("all")


@pytest.fixture(scope="module")
def cheb2d():
    c = ChebyshevApproximation(
        lambda x, _: math.sin(x[0]) + 0.5 * x[1], 2,
        [[-1, 1], [-1, 1]], [9, 9])
    c.build(verbose=False)
    return c


class TestApproxPlots:
    def test_plot_1d(self, cheb2d):
        ax = cheb2d.plot_1d(fixed={1: 0.3})
        assert len(ax.lines) >= 1
        xs, ys = ax.lines[0].get_data()
        assert np.isfinite(ys).all()

    def test_plot_2d_surface(self, cheb2d):
        ax = cheb2d.plot_2d_surface()
        assert ax.has_data()

    def test_plot_2d_contour(self, cheb2d):
        ax = cheb2d.plot_2d_contour()
        assert ax.has_data()

    def test_plot_convergence(self):
        c = ChebyshevApproximation(
            lambda x, _: math.exp(x[0]), 1, [[-1, 1]], None,
            error_threshold=1e-10)
        c.build(verbose=False)
        ax = c.plot_convergence()
        assert ax is not None


class TestOtherClassesPlots:
    def test_spline_plot_1d(self):
        sp = ChebyshevSpline(lambda x, _: abs(x[0]), 1, [[-1, 1]],
                             [9], [[0.0]])
        sp.build(verbose=False)
        ax = sp.plot_1d()
        assert np.isfinite(ax.lines[0].get_data()[1]).all()

    def test_tt_plot_1d(self):
        tt = ChebyshevTT(lambda x, _: math.sin(x[0]) + x[1], 2,
                         [[-1, 1]] * 2, [9, 9], max_rank=4)
        tt.build(verbose=False, seed=0)
        ax = tt.plot_1d(fixed={1: 0.2})
        assert np.isfinite(ax.lines[0].get_data()[1]).all()

    def test_slider_plot_2d(self):
        sl = ChebyshevSlider(lambda x, _: math.sin(x[0]) + x[1], 2,
                             [[-1, 1]] * 2, [9, 9], [[0], [1]],
                             [0.0, 0.0])
        sl.build(verbose=False)
        ax = sl.plot_2d_contour()
        assert ax.has_data()
