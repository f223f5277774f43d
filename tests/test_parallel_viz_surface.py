"""Host-pool build plumbing, progress wrappers, and the plotting matrix.

Native coverage of the reference's build-diagnostics suite (reference
tests/test_v019_build_diagnostics.py): ``n_workers`` validation and
propagation, verbose=2 progress bars across all four families, and the
plot helpers' branch matrix (fixed dims, free-dim arity errors, kwargs,
plots after algebra/clone).  Counter semantics live in
tests/test_build_diagnostics.py; render smoke in tests/test_viz.py.
"""

import math
import pickle

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
from pychebyshev_tpu.utils.progress import progress_iter  # noqa: E402


@pytest.fixture(autouse=True)
def _close_figures():
    yield
    plt.close("all")


def bowl(x, _):
    return x[0] ** 2 + math.cos(x[1])


def vee(x, _):
    return abs(x[0])


def scaled_by_gain(x, data):
    return data["gain"] * x[0]


DOM2 = [[-1.0, 1.0], [-1.0, 1.0]]


class TestWorkerPoolKwarg:
    def test_ctor_rejects_zero_workers(self):
        with pytest.raises(ValueError, match="n_workers"):
            ChebyshevApproximation(bowl, 2, DOM2, [5, 5], n_workers=0)

    def test_ctor_rejects_bool_workers(self):
        with pytest.raises(ValueError, match="n_workers"):
            ChebyshevApproximation(bowl, 2, DOM2, [5, 5], n_workers=True)

    def test_ctor_rejects_deep_negative_workers(self):
        with pytest.raises(ValueError, match="n_workers"):
            ChebyshevApproximation(bowl, 2, DOM2, [5, 5], n_workers=-2)

    def test_default_is_sequential(self):
        c = ChebyshevApproximation(bowl, 2, DOM2, [5, 5])
        assert c.n_workers is None

    def test_minus_one_resolves_to_cpu_count(self):
        c = ChebyshevApproximation(bowl, 2, DOM2, [5, 5], n_workers=-1)
        assert isinstance(c.n_workers, int) and c.n_workers >= 1

    def test_spline_forwards_workers_to_pieces(self):
        sp = ChebyshevSpline(
            vee, 1, [[-1, 1]], n_nodes=[7],
            knots=[[0.0]], n_workers=2)
        assert sp.n_workers == 2
        sp.build(verbose=False)
        assert all(p.n_workers == 2 for p in sp._pieces)

    def test_special_points_dispatch_forwards_workers(self):
        obj = ChebyshevApproximation(
            lambda x, _: abs(x[0]), 1, [[-1, 1]], n_nodes=[[7, 7]],
            special_points=[[0.0]], n_workers=2)
        assert type(obj) is ChebyshevSpline
        assert obj.n_workers == 2

    def test_pickle_roundtrip_of_a_pool_built_model(self):
        c = ChebyshevApproximation(bowl, 2, DOM2, [5, 5], n_workers=2)
        c.build(verbose=False)
        back = pickle.loads(pickle.dumps(c))
        for x in (-0.4, 0.6):
            assert back.eval([x, 0.2], [0, 0]) == c.eval([x, 0.2], [0, 0])


class TestPoolCorrectness:
    def test_pool_and_sequential_grids_agree(self):
        seq = ChebyshevApproximation(bowl, 2, DOM2, [6, 5])
        par = ChebyshevApproximation(bowl, 2, DOM2, [6, 5], n_workers=2)
        seq.build(verbose=False)
        par.build(verbose=False)
        np.testing.assert_array_equal(
            np.asarray(seq.tensor_values), np.asarray(par.tensor_values))

    def test_pool_threads_additional_data(self):
        c = ChebyshevApproximation(
            scaled_by_gain, 1, [[-1, 1]], [7],
            additional_data={"gain": 3.0}, n_workers=2)
        c.build(verbose=False)
        assert c.eval([0.5], [0]) == pytest.approx(1.5, abs=1e-13)


class TestProgressWrapper:
    def test_disabled_wrapper_returns_the_iterable(self):
        src = [1, 2, 3]
        assert progress_iter(src, enabled=False) is src

    def test_enabled_wrapper_still_yields_everything(self):
        got = list(progress_iter(range(5), total=5, enabled=True))
        assert got == [0, 1, 2, 3, 4]

    def test_verbose2_build_all_four_families(self, capsys):
        ChebyshevApproximation(bowl, 2, DOM2, [5, 5]).build(verbose=2)
        sp = ChebyshevSpline(
            lambda x, _: abs(x[0]), 1, [[-1, 1]], n_nodes=[7],
            knots=[[0.0]])
        sp.build(verbose=2)
        sl = ChebyshevSlider(
            lambda x, _: x[0] ** 2 + x[1], 2, DOM2, [5, 5],
            partition=[[0], [1]], pivot_point=[0.0, 0.0])
        sl.build(verbose=2)
        tt = ChebyshevTT(bowl, 2, DOM2, [5, 5], max_rank=4)
        tt.build(verbose=2)
        # All builds completed; figures of merit exist.
        assert sp.total_build_evals > 0 and tt.total_build_evals > 0

    def test_verbose_false_is_silent(self, capsys):
        ChebyshevApproximation(bowl, 2, DOM2, [5, 5]).build(verbose=False)
        assert capsys.readouterr().out == ""


@pytest.fixture(scope="module")
def built2d():
    c = ChebyshevApproximation(bowl, 2, DOM2, [9, 9])
    c.build(verbose=False)
    return c


@pytest.fixture(scope="module")
def built3d_tt():
    tt = ChebyshevTT(
        lambda x, _: math.sin(x[0]) + x[1] * x[2], 3, [[-1, 1]] * 3,
        [7, 7, 7], max_rank=4)
    tt.build(verbose=False)
    return tt


class TestPlotArityAndKwargs:
    def test_plot_1d_needs_exactly_one_free_dim(self, built2d):
        with pytest.raises(ValueError):
            built2d.plot_1d()  # two free dims

    def test_plot_1d_with_fixed_dim(self, built2d):
        ax = built2d.plot_1d(fixed={1: 0.25})
        assert len(ax.get_lines()) >= 1

    def test_plot_1d_n_points_controls_sampling(self, built2d):
        ax = built2d.plot_1d(fixed={1: 0.0}, n_points=37)
        assert len(ax.get_lines()[0].get_xdata()) == 37

    def test_plot_2d_surface_needs_two_free_dims(self, built3d_tt):
        with pytest.raises(ValueError):
            built3d_tt.plot_2d_surface()

    def test_plot_2d_surface_with_fixed(self, built3d_tt):
        ax = built3d_tt.plot_2d_surface(fixed={0: 0.3})
        assert ax is not None

    def test_plot_2d_contour_n_levels(self, built2d):
        ax = built2d.plot_2d_contour(n_levels=7)
        assert ax is not None

    def test_slider_plot_1d_with_fixed(self):
        sl = ChebyshevSlider(
            lambda x, _: x[0] ** 2 + x[1], 2, DOM2, [7, 7],
            partition=[[0], [1]], pivot_point=[0.0, 0.0])
        sl.build(verbose=False)
        ax = sl.plot_1d(fixed={1: 0.5})
        assert len(ax.get_lines()) >= 1


class TestPlotsAfterTransforms:
    def test_plot_after_algebra(self, built2d):
        doubled = built2d + built2d
        ax = doubled.plot_1d(fixed={1: 0.0})
        assert ax is not None

    def test_plot_after_clone(self, built2d):
        ax = built2d.clone().plot_2d_contour()
        assert ax is not None

    def test_plot_after_tt_extrude(self, built3d_tt):
        fat = built3d_tt.extrude((3, (-2.0, 2.0), 5))
        ax = fat.plot_1d(fixed={1: 0.1, 2: 0.2, 3: 0.0})
        assert ax is not None

    def test_plot_convergence_needs_a_function(self, built2d):
        derived = built2d + built2d  # algebra result has no function
        with pytest.raises((RuntimeError, ValueError)):
            derived.plot_convergence()

    def test_plot_convergence_draws_target_line(self):
        c = ChebyshevApproximation(
            lambda x, _: math.sin(2 * x[0]), 1, [[-1, 1]], [9])
        c.build(verbose=False)
        ax = c.plot_convergence(target_error=1e-9, max_n=20)
        assert any(
            np.allclose(line.get_ydata(), 1e-9)
            for line in ax.get_lines() if len(line.get_ydata()) >= 2)

    def test_plot_convergence_cap_limits_the_sweep(self):
        c = ChebyshevApproximation(
            lambda x, _: math.sin(2 * x[0]), 1, [[-1, 1]], [9])
        c.build(verbose=False)
        ax = c.plot_convergence(max_n=12)
        xs = ax.get_lines()[0].get_xdata()
        assert max(xs) <= 12
