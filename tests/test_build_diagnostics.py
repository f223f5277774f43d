"""Build diagnostics: counters, verbose output, __str__ dumps, and
auto-N accounting across all four families (reference
``test_v019_build_diagnostics.py`` behaviors, repo-native)."""

import math

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
    ChebyshevTT,
)


def f2(x, _):
    return math.sin(x[0]) + x[1] ** 2


class TestDenseCounters:
    def test_eval_count_equals_grid(self):
        c = ChebyshevApproximation(f2, 2, [[-1, 1], [0, 2]], [6, 7])
        c.build(verbose=False)
        assert c.n_evaluations == 42
        assert c.build_time >= 0.0
        assert c.get_num_evaluation_points() == 42

    def test_auto_n_accumulates_evals(self):
        c = ChebyshevApproximation(f2, 2, [[-1, 1], [0, 2]],
                                   error_threshold=1e-8)
        c.build(verbose=False)
        # doubling iterations re-evaluate; the counter must exceed the
        # final grid size
        final = int(np.prod(c.n_nodes))
        assert c.n_evaluations > final
        assert c.get_used_ns() == c.n_nodes

    def test_evaluation_points_shape(self):
        c = ChebyshevApproximation(f2, 2, [[-1, 1], [0, 2]], [4, 5])
        c.build(verbose=False)
        pts = c.get_evaluation_points()
        assert np.asarray(pts).shape == (20, 2)

    def test_verbose_build_prints(self, capsys):
        c = ChebyshevApproximation(f2, 2, [[-1, 1], [0, 2]], [4, 5])
        c.build(verbose=True)
        out = capsys.readouterr().out
        assert "20" in out or "evaluation" in out.lower()

    def test_str_dump_mentions_state(self):
        c = ChebyshevApproximation(f2, 2, [[-1, 1], [0, 2]], [4, 5])
        s_unbuilt = str(c)
        c.build(verbose=False)
        s_built = str(c)
        assert s_unbuilt != s_built
        assert "2" in s_built  # dimensionality surfaces somewhere


class TestSplineCounters:
    def test_counters_sum_pieces(self):
        spl = ChebyshevSpline(lambda x, _: abs(x[0]), 1, [[-1, 1]],
                              [6], [[0.0]])
        spl.build(verbose=False)
        assert spl.total_build_evals == 2 * 6
        assert spl.build_time >= 0.0

    def test_str_mentions_pieces(self):
        spl = ChebyshevSpline(lambda x, _: abs(x[0]), 1, [[-1, 1]],
                              [6], [[0.0]])
        spl.build(verbose=False)
        assert "2" in str(spl)


class TestSliderCounters:
    def test_total_evals_sum_of_slides(self):
        s = ChebyshevSlider(lambda x, _: x[0] + x[1] * x[2], 3,
                            [[-1, 1]] * 3, [5, 6, 7], [[0], [1, 2]],
                            [0.0, 0.0, 0.0])
        s.build(verbose=False)
        # slide grids: 5 and 6*7 = 42 -> 47 total
        assert s.total_build_evals == 5 + 42


class TestTTCounters:
    def test_cross_eval_count_below_dense(self):
        t = ChebyshevTT(lambda x, _: math.sin(x[0]) + x[1] + x[2] ** 2,
                        3, [[-1, 1]] * 3, [9] * 3, max_rank=6)
        t.build(verbose=False, seed=1)
        assert 0 < t.total_build_evals < 9 ** 3

    def test_ranks_and_compression(self):
        t = ChebyshevTT(lambda x, _: math.sin(x[0]) + x[1] + x[2] ** 2,
                        3, [[-1, 1]] * 3, [9] * 3, max_rank=6)
        t.build(verbose=False, seed=1)
        ranks = t.tt_ranks
        assert ranks[0] == ranks[-1] == 1 and len(ranks) == 4
        assert t.compression_ratio > 1.0
        dense_elems = 9 ** 3
        tt_elems = sum(ranks[i] * 9 * ranks[i + 1] for i in range(3))
        assert abs(t.compression_ratio - dense_elems / tt_elems) < 1e-9

    def test_str_mentions_ranks(self):
        t = ChebyshevTT(lambda x, _: x[0] + x[1], 2, [[-1, 1]] * 2,
                        [5, 5], max_rank=3)
        t.build(verbose=False, seed=0)
        assert "rank" in str(t).lower()

    def test_verbose_cross_reports_sweeps(self, capsys):
        t = ChebyshevTT(lambda x, _: math.sin(x[0]) * x[1], 2,
                        [[-1, 1]] * 2, [7, 7], max_rank=4)
        t.build(verbose=True, seed=0)
        out = capsys.readouterr().out
        assert out.strip()


class TestErrorEstimateCaching:
    def test_cached_and_invalidated_by_algebra(self):
        c = ChebyshevApproximation(f2, 2, [[-1, 1], [0, 2]], [8, 8])
        c.build(verbose=False)
        e1 = c.error_estimate()
        assert c.error_estimate() == e1          # cached
        d = c + c
        assert np.isfinite(d.error_estimate())   # fresh object, fresh est
