"""The reference README's own quickstart code, verbatim, against this
package — the one-line-migration claim (``import pychebyshev_tpu as
pychebyshev``) tested end to end.

Code blocks mirror reference ``README.md`` (quickstart / TT / slider
sections); only the import line differs.
"""

import math
import sys

import numpy as np
import pytest

import pychebyshev_tpu


@pytest.fixture(autouse=True)
def _alias():
    had = sys.modules.get("pychebyshev")
    sys.modules["pychebyshev"] = pychebyshev_tpu
    yield
    if had is None:
        sys.modules.pop("pychebyshev", None)
    else:
        sys.modules["pychebyshev"] = had


def my_func(x, _):
    return math.sin(x[0]) * math.exp(-x[1])


def test_readme_quickstart_block():
    from pychebyshev import ChebyshevApproximation

    cheb = ChebyshevApproximation(
        my_func,
        num_dimensions=2,
        domain=[[-1, 1], [0, 2]],
        n_nodes=[15, 15],
    )
    cheb.build(verbose=False)
    value = cheb.vectorized_eval([0.5, 1.0], [0, 0])
    dfdx = cheb.vectorized_eval([0.5, 1.0], [1, 0])
    results = cheb.vectorized_eval_multi(
        [0.5, 1.0],
        [[0, 0], [1, 0], [0, 1], [2, 0]],
    )
    assert abs(value - math.sin(0.5) * math.exp(-1.0)) < 1e-12
    assert abs(dfdx - math.cos(0.5) * math.exp(-1.0)) < 1e-10
    assert abs(results[0] - value) < 1e-14
    assert abs(results[2] + value) < 1e-10  # d/dx1 = -f


def test_readme_tt_block():
    from pychebyshev import ChebyshevTT

    def f5(x, _):
        return math.sin(x[0]) * math.exp(-x[1]) + 0.1 * x[2] * x[3] * x[4]

    tt = ChebyshevTT(
        f5, num_dimensions=5,
        domain=[[-1, 1]] * 5,
        n_nodes=[11] * 5,
        max_rank=10,
    )
    tt.build(verbose=False)
    val = tt.eval([0.5] * 5)
    points = np.random.default_rng(0).uniform(-1, 1, (1000, 5))
    vals = tt.eval_batch(points)
    assert abs(val - f5([0.5] * 5, None)) < 1e-6
    assert vals.shape == (1000,)


def test_readme_slider_block():
    from pychebyshev import ChebyshevSlider

    def f10(x, _):
        return sum(math.sin(x[2 * i]) * x[2 * i + 1] for i in range(5))

    slider = ChebyshevSlider(
        f10, num_dimensions=10,
        domain=[[-1, 1]] * 10,
        n_nodes=[11] * 10,
        partition=[[0, 1], [2, 3], [4, 5], [6, 7], [8, 9]],
        pivot_point=[0.0] * 10,
    )
    slider.build(verbose=False)
    val = slider.eval([0.5] * 10, [0] * 10)
    assert abs(val - f10([0.5] * 10, None)) < 1e-9


COMMON_SURFACE = [
    # docs/api/reference.md "Common surface" table — drift guard: every
    # member named there must exist on all four interpolant classes.
    "build", "eval", "vectorized_eval", "eval_batch",
    "vectorized_eval_batch", "eval_multi", "vectorized_eval_multi",
    "eval_batch_multi", "vectorized_eval_batch_multi", "eval_batch_dd",
    "error_estimate", "sobol_indices", "interaction_matrix",
    "suggest_partition", "extrude", "slice", "integrate",
    "integrate_batch", "partial_integrate_batch",
    "roots", "minimize", "maximize",
    "roots_batch", "minimize_batch", "maximize_batch",
    "critical_points", "differentiate", "fit",
    "save", "load", "clone",
    "set_descriptor", "get_descriptor", "get_constructor_type",
    "get_used_ns", "get_max_derivative_order", "is_construction_finished",
    "is_dimensionality_allowed", "get_special_points",
    "get_error_threshold", "get_num_evaluation_points",
    "get_evaluation_points", "get_derivative_id",
    "plot_1d", "plot_2d_surface", "plot_2d_contour",
    "__add__", "__sub__", "__mul__",
    "__iadd__", "__isub__", "__imul__",
]

# Documented exceptions (see the table's cell notes): TT eval takes no
# derivative args, so it has no derivative-id registry — reference
# parity (its tensor_train.py lacks the registry too).
SURFACE_EXCEPTIONS = {("ChebyshevTT", "get_derivative_id")}


def test_common_surface_on_all_families():
    from pychebyshev_tpu import (ChebyshevApproximation, ChebyshevSpline,
                                 ChebyshevTT, ChebyshevSlider)
    missing = [
        (cls.__name__, name)
        for cls in (ChebyshevApproximation, ChebyshevSpline,
                    ChebyshevTT, ChebyshevSlider)
        for name in COMMON_SURFACE
        if not hasattr(cls, name)
        and (cls.__name__, name) not in SURFACE_EXCEPTIONS
    ]
    assert not missing, f"docs/api/reference.md drift: {missing}"
