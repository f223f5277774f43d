"""On-chip throughput of integrate_batch vs per-call integrate.

Chained-dependency protocol (utils/benchtime) on the 5-D BS 11^5 dense
benchmark model and its rank-capped TT rebuild: batched box integrals
run as one device contraction; the per-call path is the host-driven
``integrate(bounds=...)`` loop every framework user would otherwise
write.  Prints one summary line per row; diagnostics to stderr.

Usage: python scripts/bench_integrate_batch.py  (real TPU; canary-gated)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    # Canary-gate the relay (CLAUDE.md: degradation episodes).
    t0 = time.time()
    jax.jit(lambda a: a.sum())(jnp.arange(131071.0)).block_until_ready()
    canary = time.time() - t0
    log(f"canary compile {canary:.1f}s")
    if canary > 8.0:
        log("relay degraded — aborting (retry later)")
        return 1

    from pychebyshev_tpu import ChebyshevApproximation, ChebyshevTT
    from pychebyshev_tpu.ops.integrate import (
        integrate_box_batch,
        tt_integrate_box_batch,
    )
    from pychebyshev_tpu.utils.benchtime import chained_time_fn, host_time_fn

    def bs_price_vectorized(points, _data=None):
        from scipy.stats import norm
        points = np.asarray(points, dtype=np.float64)
        s, k, t, sigma, r = (points[:, i] for i in range(5))
        sqrt_t = np.sqrt(t)
        d1 = (np.log(s / k) + (r + 0.5 * sigma ** 2) * t) / (sigma * sqrt_t)
        d2 = d1 - sigma * sqrt_t
        return s * norm.cdf(d1) - k * np.exp(-r * t) * norm.cdf(d2)

    BS_DOMAIN_5D = [[80.0, 120.0], [90.0, 110.0], [0.25, 2.0],
                    [0.1, 0.5], [0.01, 0.05]]

    cheb = ChebyshevApproximation(bs_price_vectorized, 5, BS_DOMAIN_5D,
                                  [11] * 5, vectorized=True)
    cheb.build(verbose=False)

    rng = np.random.default_rng(0)
    B = 1 << 17
    dom = np.asarray(BS_DOMAIN_5D, dtype=np.float64)
    lo = rng.uniform(dom[:, 0], dom[:, 1], (B, 5))
    hi = rng.uniform(lo, dom[None, :, 1], (B, 5))
    boxes = np.stack([lo, hi], axis=-1)

    # Correctness pin before timing.
    got = cheb.integrate_batch(boxes[:8])
    want = np.array([
        cheb.integrate(bounds=[tuple(boxes[b, k]) for k in range(5)])
        for b in range(8)
    ])
    dev = np.abs(got - want).max() / max(1.0, np.abs(want).max())
    log(f"parity vs per-call integrate (8 boxes): {dev:.2e}")

    tensor = cheb.tensor_values
    dev_boxes = jnp.asarray(boxes)

    # f32 tier FIRST (sustained f64 chains degrade later timings).
    f32 = cheb.integrate_batch(boxes[:2048], dtype=jnp.float32)
    f64_ref = cheb.integrate_batch(boxes[:2048])
    dev32 = (np.abs(f32 - f64_ref).max()
             / max(1.0, np.abs(f64_ref).max()))
    boxes32 = jnp.asarray(boxes, dtype=jnp.float32)
    t32 = chained_time_fn(
        lambda b: integrate_box_batch(tensor, dom, b,
                                      dtype=jnp.float32), boxes32)
    log(f"dense f32 integrate_batch: {t32 * 1e3:.2f} ms / {B:,} boxes "
        f"(dev from f64 {dev32:.1e})")
    print(f"dense f32 batched: {B / t32 / 1e6:.2f}M boxes/s")

    # dd tier (near-f64): digit-GEMM ladder over quadrature rows.
    from pychebyshev_tpu.ops.integrate import integrate_box_batch_dd
    dd_small = cheb.integrate_batch(boxes[:2048], dtype="dd")
    devdd = (np.abs(dd_small - f64_ref).max()
             / max(1.0, np.abs(f64_ref).max()))
    tdd = chained_time_fn(
        lambda b: integrate_box_batch_dd(tensor, dom, b), dev_boxes)
    log(f"dense dd integrate_batch: {tdd * 1e3:.2f} ms / {B:,} boxes "
        f"(dev from f64 {devdd:.1e})")
    print(f"dense dd batched: {B / tdd / 1e6:.2f}M boxes/s")

    t = chained_time_fn(
        lambda b: integrate_box_batch(tensor, dom, b), dev_boxes)
    rate = B / t
    log(f"dense integrate_batch: {t * 1e3:.2f} ms / {B:,} boxes")
    print(f"dense batched: {rate / 1e6:.2f}M boxes/s")

    t_one = host_time_fn(
        lambda: cheb.integrate(bounds=[tuple(boxes[0, k])
                                       for k in range(5)]), n=50)
    log(f"dense per-call integrate: {t_one * 1e3:.3f} ms/box")
    print(f"dense per-call: {1.0 / t_one:.0f} boxes/s "
          f"(batched is {rate * t_one:,.0f}x)")

    tt = ChebyshevTT(bs_price_vectorized, 5, BS_DOMAIN_5D, [11] * 5,
                     max_rank=15, vectorized=True)
    tt.build(verbose=False, seed=42)
    cores = tt._cores_on_device(np.float64)
    got_tt = tt.integrate_batch(boxes[:8])
    dev_tt = np.abs(got_tt - want).max() / max(1.0, np.abs(want).max())
    log(f"TT parity vs dense per-call (8 boxes): {dev_tt:.2e}")
    t_tt = chained_time_fn(
        lambda b: tt_integrate_box_batch(cores, dom, b), dev_boxes)
    log(f"TT integrate_batch: {t_tt * 1e3:.2f} ms / {B:,} boxes")
    print(f"tt batched: {B / t_tt / 1e6:.2f}M boxes/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
