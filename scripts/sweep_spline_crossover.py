"""Masked-vs-host-routed spline crossover sweep (VERDICT r2 #3).

For growing piece counts P, times the fused masked path (one dispatch,
P x work) against the host-routed path (P dispatches, 1x work) at the
1M-point batch, in both f64 (class path) and f32 (serving dtype).
Prints JSON; run on the real TPU.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pychebyshev_tpu import ChebyshevSpline  # noqa: E402
from pychebyshev_tpu.ops import spline_eval  # noqa: E402
from pychebyshev_tpu.utils.benchtime import chained_time_fn  # noqa: E402


def build_spline(n_pieces, n_nodes=12):
    knots = list(np.linspace(-1.0, 1.0, n_pieces + 1)[1:-1])
    spl = ChebyshevSpline(lambda x, _: abs(np.sin(3 * x[0])) + x[1] ** 2,
                          2, [[-1, 1], [-1, 1]], [n_nodes, n_nodes],
                          [knots, []])
    spl.build(verbose=False)
    return spl


def main():
    n_batch = 1 << 20
    rng = np.random.default_rng(3)
    pts = rng.uniform(-0.999, 0.999, size=(n_batch, 2))
    results = []

    plist = [int(a) for a in sys.argv[1:]] or [2, 4, 8, 16, 32, 64]
    for n_pieces in plist:
        spl = build_spline(n_pieces)
        stacked = spline_eval.stack_pieces(spl._pieces)
        stacked32 = spline_eval.stack_pieces(spl._pieces,
                                             dtype=jnp.float32)
        strides = spline_eval.piece_strides([len(k) for k in spl.knots])
        flat = spline_eval.route_piece_indices(spl.knots, strides, pts)
        flat_dev = jnp.asarray(flat)

        def masked(p, arrs):
            t, nd, w, df = arrs
            return spline_eval.masked_eval_batch(
                t, nd, w, df, flat_dev, p, (0, 0))

        p64 = jnp.asarray(pts, jnp.float64)
        p32 = jnp.asarray(pts, jnp.float32)
        jax.block_until_ready(masked(p64, stacked))
        t_masked64 = chained_time_fn(lambda p: masked(p, stacked), p64,
                                     iters=6)
        jax.block_until_ready(masked(p32, stacked32))
        t_masked32 = chained_time_fn(lambda p: masked(p, stacked32), p32,
                                     iters=6)

        # Host-routed: group points by piece, one dispatch per occupied
        # piece through the shared-shape executable.
        from pychebyshev_tpu.ops.eval import eval_batch

        piece_arrays = [(p.tensor_values,) + p._grid_tuples()
                        for p in spl._pieces]

        def routed(p):
            p = np.asarray(p)
            fl = spline_eval.route_piece_indices(spl.knots, strides, p)
            out = np.empty(p.shape[0])
            for idx in np.unique(fl):
                selm = fl == idx
                t, nd, w, df = piece_arrays[idx]
                out[selm] = np.asarray(eval_batch(
                    t, nd, w, df, jnp.asarray(p[selm]), (0, 0)))
            return out

        routed(pts[:4096])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            routed(pts)
            best = min(best, time.perf_counter() - t0)

        results.append({
            "pieces": n_pieces,
            "masked_f64_qps": n_batch / t_masked64,
            "masked_f32_qps": n_batch / t_masked32,
            "routed_f64_qps": n_batch / best,
        })
        print(f"P={n_pieces}: masked f64 {n_batch / t_masked64 / 1e6:.2f}M"
              f" / f32 {n_batch / t_masked32 / 1e6:.2f}M"
              f" / routed {n_batch / best / 1e6:.2f}M q/s",
              file=sys.stderr, flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
