"""Serving a pricing proxy: precompiled buckets, Greeks engines,
pickle-free checkpoints.

Demonstrates the production query path: build once, checkpoint with
``.npz``, reload in a serving process, and answer ragged batches
through :class:`BatchedEvaluator` — one engine per Greek, zero
recompiles after warmup.

Run:  python examples/serving_engine.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import tempfile
import time

import numpy as np
import jax.numpy as jnp
from scipy.stats import norm

from pychebyshev_tpu import ChebyshevApproximation
from pychebyshev_tpu.serving import BatchedEvaluator

DOMAIN = [[80.0, 120.0], [90.0, 110.0], [0.25, 2.0],
          [0.1, 0.5], [0.01, 0.05]]


def bs_price(points, _data=None):
    points = np.asarray(points, dtype=np.float64)
    s, k, t, sigma, r = (points[:, i] for i in range(5))
    sqrt_t = np.sqrt(t)
    d1 = (np.log(s / k) + (r + 0.5 * sigma ** 2) * t) / (sigma * sqrt_t)
    d2 = d1 - sigma * sqrt_t
    return s * norm.cdf(d1) - k * np.exp(-r * t) * norm.cdf(d2)


def main():
    # --- "training" process: build + checkpoint -----------------------
    cheb = ChebyshevApproximation(bs_price, 5, DOMAIN, [11] * 5,
                                  vectorized=True)
    cheb.build(verbose=False)
    ckpt = tempfile.mktemp(suffix=".npz")
    cheb.save(ckpt, format="npz")   # no pickle: safe to ship
    print(f"built 11^5 proxy, checkpointed to {ckpt}")

    # --- "serving" process: reload + precompile -----------------------
    model = ChebyshevApproximation.load(ckpt)
    price = BatchedEvaluator(model, dtype=jnp.float32,
                             bucket_sizes=(1 << 10, 1 << 14, 1 << 17))
    delta = BatchedEvaluator(model, dtype=jnp.float32,
                             derivative_order=[1, 0, 0, 0, 0],
                             bucket_sizes=(1 << 10, 1 << 14, 1 << 17))
    t0 = time.time()
    price.warmup()
    delta.warmup()
    print(f"warmup (all buckets compiled): {time.time() - t0:.1f}s")

    # --- ragged production traffic ------------------------------------
    rng = np.random.default_rng(0)
    lo = np.array([b[0] for b in DOMAIN])
    hi = np.array([b[1] for b in DOMAIN])
    for n in (37, 5_000, 100_000):
        pts = lo + (hi - lo) * rng.uniform(0.02, 0.98, size=(n, 5))
        t0 = time.perf_counter()
        p = price(pts)
        d = delta(pts)
        dt = time.perf_counter() - t0
        err = np.max(np.abs(p - bs_price(pts)))
        print(f"batch {n:>7,}: price+delta in {dt * 1e3:7.2f} ms "
              f"(max |err| {err:.2e}, delta[0] {d[0]:.4f})")

    # --- a book of proxies, built in ONE call ---------------------------
    # Eight strike-shifted products over the same market grid: the book
    # oracle returns one column per product, so the whole book evaluates
    # every (grid point, model) pair in a single batched call.
    from pychebyshev_tpu.serving import MultiModelEvaluator, build_book

    shifts = np.linspace(-5.0, 5.0, 8)

    def book_fn(points, _data=None):
        pts = np.asarray(points, dtype=np.float64)
        cols = []
        for ds in shifts:
            shifted = pts.copy()
            shifted[:, 1] += ds
            cols.append(bs_price(shifted))
        return np.column_stack(cols)

    t0 = time.time()
    book = build_book(book_fn, 5, DOMAIN, [11] * 5)
    print(f"\nbuilt an 8-model book in {time.time() - t0:.2f}s "
          f"(one oracle call; models share grid arrays)")
    book_engine = MultiModelEvaluator(book, dtype=jnp.float32,
                                      bucket_sizes=(1 << 10, 1 << 14))
    book_engine.warmup()
    pts = lo + (hi - lo) * rng.uniform(0.02, 0.98, size=(5_000, 5))
    t0 = time.perf_counter()
    surface = book_engine(pts)      # (8, 5000)
    dt = time.perf_counter() - t0
    print(f"book of 8 x 5,000 points in {dt * 1e3:.2f} ms "
          f"-> strike ladder at pts[0]: "
          f"{np.round(surface[:, 0], 3)}")


if __name__ == "__main__":
    main()
