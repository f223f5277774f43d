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

    # ---- round-5 dd scenario calculus ------------------------------
    from pychebyshev_tpu.ops.integrate import (
        partial_integrate_eval_batch_dd,
        tt_integrate_box_batch_dd,
        tt_partial_integrate_eval_batch_dd,
    )

    # TT box integration through the grouped dd chain (exact
    # compression model — the 1e-12-class serving route).
    ttc = cheb.to_tt(tolerance=1e-13)
    ccores = ttc._cores_on_device(np.float64)
    ttdd_small = np.asarray(tt_integrate_box_batch_dd(
        ccores, dom, boxes[:2048], groups="auto"))
    ref_small = np.asarray(tt_integrate_box_batch(ccores, dom,
                                                  boxes[:2048]))
    dev_ttdd = (np.abs(ttdd_small - ref_small).max()
                / max(1.0, np.abs(ref_small).max()))
    t_ttdd = chained_time_fn(
        lambda b: tt_integrate_box_batch_dd(ccores, dom, b,
                                            groups="auto"), dev_boxes)
    log(f"TT dd integrate_batch (grouped, compression chain): "
        f"{t_ttdd * 1e3:.2f} ms / {B:,} boxes "
        f"(dev from f64 {dev_ttdd:.1e})")
    print(f"tt dd batched: {B / t_ttdd / 1e6:.2f}M boxes/s")

    # Dense conditional expectations (partial integrate + eval) at the
    # dd tier: integrate (S, T) buckets, evaluate the rest.
    int_dims = (0, 2)
    pib = boxes[:, [0, 2], :]
    pib_pts = rng.uniform(dom[[1, 3, 4], 0], dom[[1, 3, 4], 1], (B, 3))
    packed_b = jnp.asarray(pib)
    packed_p = jnp.asarray(pib_pts)
    pdd_small = np.asarray(partial_integrate_eval_batch_dd(
        tensor, dom, cheb.nodes, cheb.weights, cheb.diff_matrices,
        int_dims, pib[:2048], pib_pts[:2048]))
    from pychebyshev_tpu.ops.integrate import (
        partial_integrate_eval_batch,
    )
    pref = np.asarray(partial_integrate_eval_batch(
        tensor, dom, cheb.nodes, cheb.weights, cheb.diff_matrices,
        int_dims, pib[:2048], pib_pts[:2048]))
    dev_pdd = np.abs(pdd_small - pref).max() / max(1.0,
                                                   np.abs(pref).max())

    def run_pdd(b):
        return partial_integrate_eval_batch_dd(
            tensor, dom, cheb.nodes, cheb.weights, cheb.diff_matrices,
            int_dims, b, packed_p)

    t_pdd = chained_time_fn(run_pdd, packed_b)
    log(f"dense dd partial_integrate_batch (2 int dims): "
        f"{t_pdd * 1e3:.2f} ms / {B:,} scenarios "
        f"(dev from f64 {dev_pdd:.1e})")
    print(f"dense dd conditional: {B / t_pdd / 1e6:.2f}M scenarios/s")

    t_p64 = chained_time_fn(
        lambda b: partial_integrate_eval_batch(
            tensor, dom, cheb.nodes, cheb.weights, cheb.diff_matrices,
            int_dims, b, packed_p), packed_b)
    log(f"dense f64 partial_integrate_batch: {t_p64 * 1e3:.2f} ms")
    print(f"dense f64 conditional: {B / t_p64 / 1e6:.2f}M scenarios/s")

    # TT conditional expectations at the dd tier (compression chain).
    tpdd_small = np.asarray(tt_partial_integrate_eval_batch_dd(
        ccores, dom, int_dims, pib[:2048], pib_pts[:2048],
        groups="auto"))
    from pychebyshev_tpu.ops.integrate import (
        tt_partial_integrate_eval_batch,
    )
    tpref = np.asarray(tt_partial_integrate_eval_batch(
        ccores, dom, int_dims, pib[:2048], pib_pts[:2048]))
    dev_tpdd = (np.abs(tpdd_small - tpref).max()
                / max(1.0, np.abs(tpref).max()))
    t_tpdd = chained_time_fn(
        lambda b: tt_partial_integrate_eval_batch_dd(
            ccores, dom, int_dims, b, packed_p, groups="auto"),
        packed_b)
    log(f"TT dd partial_integrate_batch (grouped): "
        f"{t_tpdd * 1e3:.2f} ms / {B:,} scenarios "
        f"(dev from f64 {dev_tpdd:.1e})")
    print(f"tt dd conditional: {B / t_tpdd / 1e6:.2f}M scenarios/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
