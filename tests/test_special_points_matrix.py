"""Special-points dispatch: validation matrix + kink accuracy claims.

The reference pins these in its special-points suite (reference
tests/test_special_points.py): every malformed declaration must be
rejected before any build work, and a declared kink must restore
spectral convergence that the kink otherwise destroys.
"""

import math

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevSpline


def abs_kink(x, _):
    return abs(x[0] - 0.3)


DOM2 = [[-1.0, 1.0], [-1.0, 1.0]]


class TestDeclarationValidation:
    """Malformed special_points/n_nodes combinations, each rejected with
    a ValueError naming the offense."""

    @pytest.mark.parametrize("sp,ns,match", [
        # arity: one entry per dimension
        ([[0.0]], [[5, 5], [5]], "entries"),
        # outer arity with all-empty knots still checked
        ([[], [], []], [5, 5], None),
        # sortedness
        ([[0.5, -0.5], []], [[5, 5, 5], [5]], "sorted"),
        # strictly inside the domain
        ([[1.0], []], [[5, 5], [5]], "inside"),
        ([[-2.0], []], [[5, 5], [5]], "inside"),
        # duplicates
        ([[0.2, 0.2], []], [[5, 5, 5], [5]], "Coinciding"),
        # flat n_nodes alongside kinks
        ([[0.0], []], [5, 5], "nested"),
        # nested inner length must be pieces-per-dim
        ([[0.0], []], [[5], [5]], "entries"),
        # mixed nested and flat
        ([[0.0], []], [[5, 5], 5], "nested|mixed"),
    ])
    def test_rejected(self, sp, ns, match):
        ctx = (pytest.raises(ValueError, match=match) if match
               else pytest.raises(ValueError))
        with ctx:
            ChebyshevApproximation(
                lambda x, _: x[0], 2, DOM2, ns, special_points=sp)

    def test_non_sequence_inner_rejected(self):
        with pytest.raises(ValueError, match="list"):
            ChebyshevApproximation(
                lambda x, _: x[0], 2, DOM2, [[5, 5], [5]],
                special_points=[0.0, None])

    def test_optimal_n1_has_no_special_points_channel(self):
        import inspect
        sig = inspect.signature(ChebyshevApproximation.get_optimal_n1)
        assert "special_points" not in sig.parameters
        with pytest.raises(TypeError):
            ChebyshevApproximation.get_optimal_n1(
                lambda x, _: abs(x[0]), (-1, 1), 1e-8,
                special_points=[[0.0]])


class TestKinkAccuracy:
    def test_declared_kink_restores_spectral_accuracy(self):
        probe = np.linspace(-0.99, 0.99, 301)

        smooth_grid = ChebyshevApproximation(abs_kink, 1, [[-1, 1]], [21])
        smooth_grid.build(verbose=False)
        err_plain = max(abs(smooth_grid.vectorized_eval([x], [0])
                            - abs_kink([x], None)) for x in probe)

        split = ChebyshevApproximation(
            abs_kink, 1, [[-1, 1]], [[11, 11]],
            special_points=[[0.3]])
        split.build(verbose=False)
        err_split = max(abs(split.eval([x], [0]) - abs_kink([x], None))
                        for x in probe)

        # |x - .3| on an unsplit grid converges only algebraically:
        # the kink-aware build must win by many orders with half the
        # points per piece.
        assert err_plain > 1e-3
        assert err_split < 1e-13

    def test_multiple_kinks_in_one_dim(self):
        def w(x, _):
            return abs(x[0] + 0.5) + abs(x[0] - 0.5)

        sp = ChebyshevApproximation(
            w, 1, [[-1, 1]], [[9, 9, 9]], special_points=[[-0.5, 0.5]])
        assert isinstance(sp, ChebyshevSpline)
        sp.build(verbose=False)
        for x in (-0.8, -0.5, -0.1, 0.5, 0.77):
            assert sp.eval([x], [0]) == pytest.approx(w([x], None),
                                                      abs=1e-12)

    def test_many_pieces_one_dim(self):
        knots = [-0.6, -0.2, 0.2, 0.6]
        sp = ChebyshevApproximation(
            lambda x, _: np.floor(2.5 * (x[0] + 1)) + x[0] ** 2, 1,
            [[-1, 1]], [[7] * 5], special_points=[knots])
        sp.build(verbose=False)
        assert len(sp._pieces) == 5

    def test_per_piece_node_budgets_are_honored(self):
        sp = ChebyshevApproximation(
            abs_kink, 1, [[-1, 1]], [[5, 13]], special_points=[[0.3]])
        sp.build(verbose=False)
        counts = sorted(p.n_nodes[0] for p in sp._pieces)
        assert counts == [5, 13]

    def test_kink_plus_threshold_auto_n(self):
        sp = ChebyshevApproximation(
            abs_kink, 1, [[-1, 1]], [[None, None]],
            special_points=[[0.3]], error_threshold=1e-9)
        sp.build(verbose=False)
        assert sp.error_estimate() <= 1e-9
        for x in (-0.4, 0.0, 0.31, 0.9):
            assert sp.eval([x], [0]) == pytest.approx(abs_kink([x], None),
                                                      abs=1e-9)

    def test_2d_kink_in_one_dim_only(self):
        def f(x, _):
            return abs(x[0]) * math.cos(x[1])

        sp = ChebyshevApproximation(
            f, 2, DOM2, [[9, 9], [11]], special_points=[[0.0], []])
        sp.build(verbose=False)
        for pt in ([0.4, 0.2], [-0.7, -0.9], [0.0, 0.5]):
            assert sp.eval(pt, [0, 0]) == pytest.approx(f(pt, None),
                                                        abs=1e-11)
