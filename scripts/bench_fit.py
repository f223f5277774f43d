"""Scattered-data fit engine throughput: host vs f32 vs exact-dd tier.

Measures the normal-equation accumulation rate (samples/s) for the
dense scattered-data fit on the accelerator engines vs the host f64
loops (VERDICT r4 item 2's "measured samples/s row").  The device
engines ingest host sample chunks (transfer-bound over THIS relay —
CLAUDE.md; quote as end-to-end rates), so the interesting number is
wall-clock for a realistic fit: N Monte-Carlo samples onto a G-point
grid.

Run on the real TPU:  python scripts/bench_fit.py
"""

import json
import sys
import time

import numpy as np
import jax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pychebyshev_tpu.utils import fitting  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    t0 = time.time()
    import jax.numpy as jnp
    x = jnp.arange(131072.0 + np.random.randint(512))
    jax.jit(lambda a: (a * a).sum())(x).block_until_ready()
    log(f"canary {time.time() - t0:.1f}s on {jax.devices()}")

    d = 3
    counts = [9, 9, 9]           # G = 729
    dom = [[0.0, 2.0], [-1.0, 1.0], [0.0, 1.0]]
    rng = np.random.default_rng(0)

    def f(p):
        return (np.sin(2 * p[:, 0]) * np.cos(p[:, 1])
                + p[:, 2] ** 3)

    rows = []
    for engine, n in (("host", 1 << 15), ("device", 1 << 20),
                      ("device-dd", 1 << 19)):
        pts = np.stack([rng.uniform(a, b, n) for a, b in dom], axis=1)
        y = f(pts) + rng.normal(0, 1e-3, n)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            # Warm (compile) on a small slice, then time the full fit.
            fitting.fit_dense_tensor(pts[:4096], y[:4096], dom, counts,
                                     l2=1e-8, engine=engine)
            t0 = time.time()
            _, diag = fitting.fit_dense_tensor(pts, y, dom, counts,
                                               l2=1e-8, engine=engine)
            dt = time.time() - t0
        rows.append({"engine": engine, "n_samples": n,
                     "grid_points": int(np.prod(counts)),
                     "seconds": dt, "samples_per_sec": n / dt,
                     "rms": diag["rms"]})
        log(f"{engine}: {n:,} samples x G={np.prod(counts)} in "
            f"{dt:.2f}s -> {n / dt:,.0f} samples/s (rms "
            f"{diag['rms']:.2e})")

    print(json.dumps(rows, indent=1), flush=True)


if __name__ == "__main__":
    main()
