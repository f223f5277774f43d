"""Property-based invariants (hypothesis) over random grids/domains.

Each property is a mathematical identity the implementation must hold
exactly (or to f64 conditioning), independent of any oracle:

- degree-(n-1) polynomial reproduction (values and derivatives),
- barycentric partition of unity (the root of extrude's correctness),
- algebra vs pointwise arithmetic,
- slice(extrude(c)) identity,
- interval additivity of integration,
- DCT round-trip, .pcb byte round-trip, TT from_values/to_dense.
"""

import io
import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevTT
from pychebyshev_tpu.utils import binary

SETTINGS = dict(max_examples=20, deadline=None)

domains = st.tuples(
    st.floats(-10, 5), st.floats(0.1, 10)).map(
        lambda t: (t[0], t[0] + t[1]))


def build_from_values(rng_seed, n_nodes, domain):
    rng = np.random.default_rng(rng_seed)
    vals = rng.normal(size=tuple(n_nodes))
    return ChebyshevApproximation.from_values(
        vals, len(n_nodes), [list(d) for d in domain], list(n_nodes))


class TestPolynomialReproduction:
    @given(n=st.integers(4, 12), dom=domains, seed=st.integers(0, 2**31),
           order=st.integers(0, 2))
    @settings(**SETTINGS)
    def test_1d_poly_exact(self, n, dom, seed, order):
        rng = np.random.default_rng(seed)
        coeffs = rng.uniform(-1, 1, n - 1)     # degree n-2 < n
        poly = np.polynomial.Polynomial(coeffs, domain=list(dom),
                                        window=list(dom))

        cheb = ChebyshevApproximation(
            lambda x, _: float(poly(x[0])), 1, [list(dom)], [n])
        cheb.build(verbose=False)
        x = dom[0] + 0.37 * (dom[1] - dom[0])
        want = poly.deriv(order)(x) if order else poly(x)
        got = cheb.vectorized_eval([x], [order])
        scale = max(1.0, abs(want))
        assert abs(got - want) / scale < 1e-9

    @given(n=st.integers(3, 7), dom1=domains, dom2=domains,
           seed=st.integers(0, 2**31))
    @settings(**SETTINGS)
    def test_2d_bilinear_exact(self, n, dom1, dom2, seed):
        rng = np.random.default_rng(seed)
        a, b, c, d = rng.uniform(-2, 2, 4)

        def f(x, _):
            return a + b * x[0] + c * x[1] + d * x[0] * x[1]

        cheb = ChebyshevApproximation(f, 2, [list(dom1), list(dom2)],
                                      [n, n])
        cheb.build(verbose=False)
        x = dom1[0] + 0.61 * (dom1[1] - dom1[0])
        y = dom2[0] + 0.23 * (dom2[1] - dom2[0])
        assert abs(cheb.vectorized_eval([x, y], [0, 0])
                   - f([x, y], None)) < 1e-9 * max(
                       1.0, abs(f([x, y], None)))
        # d2/dxdy of a bilinear form is the constant d
        assert abs(cheb.vectorized_eval([x, y], [1, 1]) - d) < 1e-7


class TestPartitionOfUnity:
    @given(n=st.integers(2, 30), dom=domains,
           frac=st.floats(0.001, 0.999))
    @settings(**SETTINGS)
    def test_rows_sum_to_one(self, n, dom, frac):
        import jax.numpy as jnp
        from pychebyshev_tpu.ops.chebyshev import (
            barycentric_weights_np, nodes_for_dim_np)
        from pychebyshev_tpu.ops.eval import barycentric_coefficients
        nodes = nodes_for_dim_np(dom[0], dom[1], n)
        weights = barycentric_weights_np(nodes)
        x = dom[0] + frac * (dom[1] - dom[0])
        row = np.asarray(barycentric_coefficients(
            jnp.asarray([x]), jnp.asarray(nodes), jnp.asarray(weights)))
        assert abs(row.sum() - 1.0) < 1e-11


class TestAlgebraPointwise:
    @given(seed=st.integers(0, 2**31), dom=domains,
           op=st.sampled_from(["add", "sub"]),
           scalar=st.floats(-5, 5).filter(lambda s: abs(s) > 1e-3))
    @settings(**SETTINGS)
    def test_matches_pointwise(self, seed, dom, op, scalar):
        a = build_from_values(seed, [5, 6], [dom, (-1.0, 1.0)])
        b = build_from_values(seed + 1, [5, 6], [dom, (-1.0, 1.0)])
        combined = (a + b) if op == "add" else (a - b)
        x = dom[0] + 0.5 * (dom[1] - dom[0])
        pt = [x, 0.123]
        va = a.vectorized_eval(pt, [0, 0])
        vb = b.vectorized_eval(pt, [0, 0])
        want = va + vb if op == "add" else va - vb
        got = combined.vectorized_eval(pt, [0, 0])
        assert abs(got - want) < 1e-11 * max(1.0, abs(want))
        # scalar algebra is exact pointwise everywhere (linearity)
        scaled = (scalar * a) / scalar
        assert abs(scaled.vectorized_eval(pt, [0, 0]) - va) \
            < 1e-11 * max(1.0, abs(va))


class TestExtrudeSliceRoundTrip:
    @given(seed=st.integers(0, 2**31), dom=domains,
           pos=st.integers(0, 2), frac=st.floats(0.01, 0.99),
           n_new=st.integers(2, 7))
    @settings(**SETTINGS)
    def test_slice_of_extrude_is_identity(self, seed, dom, pos, frac,
                                          n_new):
        c = build_from_values(seed, [5, 4], [(-1.0, 1.0), (0.0, 2.0)])
        ext = c.extrude((pos, tuple(dom), n_new))
        value = dom[0] + frac * (dom[1] - dom[0])
        back = ext.slice((pos, value))
        pt = [0.3, 1.1]
        assert abs(back.vectorized_eval(pt, [0, 0])
                   - c.vectorized_eval(pt, [0, 0])) < 1e-10


class TestIntegrationAdditivity:
    @given(seed=st.integers(0, 2**31), dom=domains,
           split=st.floats(0.05, 0.95))
    @settings(**SETTINGS)
    def test_interval_additivity(self, seed, dom, split):
        c = build_from_values(seed, [9], [dom])
        mid = dom[0] + split * (dom[1] - dom[0])
        whole = c.integrate(dims=[0], bounds=[(dom[0], dom[1])])
        left = c.integrate(dims=[0], bounds=[(dom[0], mid)])
        right = c.integrate(dims=[0], bounds=[(mid, dom[1])])
        scale = max(1.0, abs(whole))
        assert abs((left + right) - whole) / scale < 1e-11


class TestSerializationProperty:
    @given(seed=st.integers(0, 2**31),
           shape=st.lists(st.integers(2, 6), min_size=1, max_size=3))
    @settings(**SETTINGS)
    def test_pcb_bytes_roundtrip_bit_exact(self, seed, shape):
        c = build_from_values(seed, shape,
                              [(-1.0 - i, 1.0 + i)
                               for i in range(len(shape))])
        buf = io.BytesIO()
        binary.write_approx(buf, c)
        buf.seek(0)
        back = binary.read_approx(buf)
        np.testing.assert_array_equal(np.asarray(back.tensor_values),
                                      np.asarray(c.tensor_values))
        # and a second write produces identical bytes (determinism)
        buf2 = io.BytesIO()
        binary.write_approx(buf2, back)
        assert buf.getvalue() == buf2.getvalue()


class TestDctRoundTrip:
    @given(seed=st.integers(0, 2**31), n=st.integers(2, 33),
           axis=st.integers(0, 1))
    @settings(**SETTINGS)
    def test_coeffs_values_inverse(self, seed, n, axis):
        import jax.numpy as jnp
        from pychebyshev_tpu.ops.dct import (coeffs_to_values,
                                             values_to_coeffs)
        rng = np.random.default_rng(seed)
        vals = jnp.asarray(rng.normal(size=(n, 5) if axis == 0
                                      else (5, n)))
        back = coeffs_to_values(values_to_coeffs(vals, axis=axis),
                                axis=axis)
        np.testing.assert_allclose(np.asarray(back), np.asarray(vals),
                                   atol=1e-12)


class TestTTRoundTrip:
    @given(seed=st.integers(0, 2**31))
    @settings(max_examples=8, deadline=None)
    def test_from_values_to_dense(self, seed):
        rng = np.random.default_rng(seed)
        # low-rank 3-D tensor: outer sum of two separable terms
        a, b, c = rng.normal(size=(3, 5))
        d, e, f = rng.normal(size=(3, 5))
        tensor = (np.einsum("i,j,k->ijk", a, b, c)
                  + np.einsum("i,j,k->ijk", d, e, f))
        tt = ChebyshevTT.from_values(
            tensor, 3, [[-1, 1]] * 3, [5, 5, 5], max_rank=4)
        back = np.asarray(tt.to_dense())
        scale = np.abs(tensor).max()
        assert np.abs(back - tensor).max() / scale < 1e-10
        assert max(tt.tt_ranks) <= 2 + 1e-9  # separable sum -> rank 2


class TestSplineProperties:
    @given(knot=st.floats(-0.8, 0.8), seed=st.integers(0, 2**31))
    @settings(**SETTINGS)
    def test_continuity_at_knot(self, knot, seed):
        from pychebyshev_tpu import ChebyshevSpline
        rng = np.random.default_rng(seed)
        a, b = rng.uniform(0.5, 2.0, 2)

        def f(x, _):
            return a * abs(x[0] - knot) + b * x[0] ** 2

        sp = ChebyshevSpline(f, 1, [[-1.0, 1.0]], [9], [[knot]])
        sp.build(verbose=False)
        eps = 1e-9
        left = sp.eval([knot - eps], [0])
        right = sp.eval([knot + eps], [0])
        at = sp.eval([knot], [0])
        assert abs(left - right) < 1e-6
        assert abs(at - f([knot], None)) < 1e-9

    @given(knot=st.floats(-0.5, 0.5), seed=st.integers(0, 2**31))
    @settings(**SETTINGS)
    def test_piecewise_poly_exact(self, knot, seed):
        """A piecewise-linear function is reproduced exactly by a
        spline with its kink as the knot (any n >= 2 per piece)."""
        from pychebyshev_tpu import ChebyshevSpline
        rng = np.random.default_rng(seed)
        sl, sr, c = rng.uniform(-2, 2, 3)

        def f(x, _):
            t = x[0] - knot
            return c + (sl * t if t < 0 else sr * t)

        sp = ChebyshevSpline(f, 1, [[-1.0, 1.0]], [4], [[knot]])
        sp.build(verbose=False)
        pts = np.linspace(-0.99, 0.99, 41)[:, None]
        got = sp.eval_batch(pts, [0])
        want = np.array([f([x], None) for x in pts[:, 0]])
        assert np.abs(got - want).max() < 1e-10


class TestSliderProperties:
    @given(seed=st.integers(0, 2**31),
           pivot=st.floats(-0.5, 0.5))
    @settings(max_examples=10, deadline=None)
    def test_additive_function_exact(self, seed, pivot):
        """For genuinely additive f, the slider is exact regardless of
        pivot location (the decomposition is an identity)."""
        from pychebyshev_tpu import ChebyshevSlider
        rng = np.random.default_rng(seed)
        w = rng.uniform(0.5, 1.5, 3)

        def f(pts, _=None):
            p = np.asarray(pts)
            return (w[0] * np.sin(2 * p[:, 0]) + w[1] * p[:, 1] ** 3
                    + w[2] * np.cos(p[:, 2]))

        sl = ChebyshevSlider(f, 3, [[-1.0, 1.0]] * 3, [11] * 3,
                             [[0], [1], [2]], [pivot] * 3,
                             vectorized=True)
        sl.build(verbose=False)
        pts = rng.uniform(-1, 1, size=(64, 3))
        got = sl.eval_batch(pts)
        want = f(pts)
        # bound = the 11-node interpolation error of sin(2x) (~5e-8);
        # the additive decomposition itself contributes nothing
        assert np.abs(got - want).max() < 1e-6


class TestSobolProperties:
    @given(seed=st.integers(0, 2**31))
    @settings(max_examples=10, deadline=None)
    def test_indices_well_formed(self, seed):
        c = build_from_values(seed, [7, 7], [(-1.0, 1.0), (0.0, 2.0)])
        s = c.sobol_indices()
        first = np.array([s["first_order"][d] for d in range(2)])
        total = np.array([s["total_order"][d] for d in range(2)])
        assert (first >= -1e-10).all()
        assert (total + 1e-10 >= first).all()   # S_i <= S_Ti
        assert first.sum() <= 1.0 + 1e-9        # sum S_i <= 1


class TestDegenerateBatches:
    """Empty and single-point batches work on every class (shape
    contract), and NaN coordinates propagate rather than crash."""

    def test_empty_and_single(self, cheb_sin3d):
        empty = np.zeros((0, 3))
        assert cheb_sin3d.vectorized_eval_batch(empty, [0] * 3).shape \
            == (0,)
        one = cheb_sin3d.vectorized_eval_batch(
            np.array([[0.1, 0.2, 0.3]]), [0] * 3)
        assert one.shape == (1,)
        assert abs(one[0] - cheb_sin3d.vectorized_eval(
            [0.1, 0.2, 0.3], [0] * 3)) < 1e-12

    def test_nan_coordinates_propagate(self, cheb_sin3d):
        out = cheb_sin3d.vectorized_eval_batch(
            np.array([[np.nan, 0.2, 0.3], [0.1, 0.2, 0.3]]), [0] * 3)
        assert np.isnan(out[0]) and np.isfinite(out[1])


class TestWeightRangeRobustness:
    @given(width=st.floats(1e-6, 1e6), n=st.integers(3, 40))
    @settings(**SETTINGS)
    def test_weights_always_order_one(self, width, n):
        """Power-of-two normalization keeps weights device-safe for any
        domain width (raw weights span ~(2/width)^(n-1) — e39 at n=21
        on a width-0.04 domain, which overflows the TPU's f32-range
        emulated f64)."""
        from pychebyshev_tpu.ops.chebyshev import (
            barycentric_weights_np, nodes_for_dim_np)
        w = barycentric_weights_np(nodes_for_dim_np(1.0, 1.0 + width, n))
        assert np.isfinite(w).all()
        assert 0.7 <= np.abs(w).max() <= 1.42


class TestCallerArrayIsolation:
    def test_from_values_does_not_alias_caller_memory(self):
        """Mutating the caller's array after from_values must not change
        ANY eval path (the host cache copies; the device tensor was
        always isolated)."""
        vals = np.arange(20.0).reshape(4, 5)
        c = ChebyshevApproximation.from_values(
            vals, 2, [(-1.0, 1.0), (0.0, 2.0)], [4, 5])
        pt = [0.3, 1.2]
        before_single = c.vectorized_eval(pt, [0, 0])
        before_batch = c.vectorized_eval_batch(np.array([pt]), [0, 0])[0]
        vals[:] = 999.0                       # caller stomps its array
        after_single = c.vectorized_eval(pt, [0, 0])
        after_batch = c.vectorized_eval_batch(np.array([pt]), [0, 0])[0]
        assert after_single == before_single
        assert after_batch == before_batch
        assert abs(after_single - after_batch) < 1e-12


class TestHighDimensionalTT:
    def test_10d_cross_build_and_reorder_invariance(self):
        """A 10-D near-separable function builds from a few hundred
        evaluations (vs 7^10 = 2.8e8 dense), and a full dim reorder
        preserves every query (user-frame discipline)."""
        D = 10

        def f(p, _=None):
            p = np.asarray(p)
            return (np.exp(-np.sum(p ** 2, axis=1) / 4)
                    + 0.1 * np.prod(np.cos(p[:, :3]), axis=1))

        tt = ChebyshevTT(f, D, [[-1, 1]] * D, [7] * D, max_rank=8,
                         tolerance=1e-8, vectorized=True)
        tt.build(verbose=False, seed=3)
        assert tt.total_build_evals < 10_000
        assert tt.compression_ratio > 1e4

        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, (500, D))
        base = tt.eval_batch(pts)
        assert np.abs(base - f(pts)).max() < 1e-4

        ro = tt.reorder(list(reversed(range(D))))
        np.testing.assert_allclose(ro.eval_batch(pts), base,
                                   rtol=1e-10, atol=1e-12)


class TestHostRowBuildConsistency:
    """The vectorized (padded-lane) single-point row build must agree
    with the device batch path everywhere, including knife-edge
    near-node points and ragged dims."""

    @given(seed=st.integers(0, 2**31))
    @settings(**SETTINGS)
    def test_single_matches_batch(self, seed):
        rng = np.random.default_rng(seed)
        c = build_from_values(seed, [5, 9, 4],
                              [(-1.0, 1.0), (0.0, 2.0), (-3.0, -1.0)])
        pts = np.column_stack([rng.uniform(-1, 1, 8),
                               rng.uniform(0, 2, 8),
                               rng.uniform(-3, -1, 8)])
        # splice in exact nodes and near-node offsets on dim 1
        nodes1 = np.asarray(c.nodes[1])
        pts[0, 1] = nodes1[3]
        pts[1, 1] = nodes1[3] + 5e-15   # inside coincidence tol
        pts[2, 1] = nodes1[3] + 1e-12   # just outside
        batch = c.vectorized_eval_batch(pts, [0, 0, 0])
        single = np.array([c.vectorized_eval(list(p), [0, 0, 0])
                           for p in pts])
        np.testing.assert_allclose(single, batch, rtol=0, atol=1e-12)
