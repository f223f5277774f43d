"""Chained-dependency device timing — the ONE trustworthy protocol for
this repo's benchmarks.

The tunneled TPU runtime makes naive timing lie in BOTH directions:
``block_until_ready`` can return before device completion (sub-ms
readings for 300-GFLOP dispatches), repeated identical executions can be
served from a result-cache layer, a per-call host readback costs a
~40 ms relay round trip, and sustained software-f64 chains degrade
subsequent timings.  (Full findings: CLAUDE.md, round-2 commit
``008c624``.)

Protocol: run a chain of ``m`` calls where each call's input depends on
the previous output (forcing device serialization), fence the whole
chain with ONE scalar readback, salt every chain invocation so no two
executions ever see identical inputs, and difference a short chain
against a long one so the fixed RPC/readback cost cancels:

    t_exec = (T(iters) - T(2)) / (iters - 2),  min over reps.

Shared by ``bench.py`` and ``scripts/run_baseline_table.py`` so a
protocol fix lands in both.
"""

from __future__ import annotations

import time

import numpy as np
import jax.numpy as jnp

__all__ = ["chained_time_fn", "host_time_fn"]


def chained_time_fn(fn, pts, iters: int = 10, reps: int = 3) -> float:
    """Per-call execution time of ``fn(points_like)`` on device."""
    salt_rng = np.random.default_rng()

    def chain(m):
        out = fn(pts * pts.dtype.type(1.0 + salt_rng.uniform(0, 1e-9)))
        for _ in range(m - 1):
            bump = (1.0 + jnp.ravel(out)[0] * 1e-12
                    + salt_rng.uniform(0, 1e-9))
            out = fn(pts * bump.astype(pts.dtype))
        return float(jnp.ravel(out)[0])

    chain(2)  # compile both the plain and perturbed-input variants
    best = {}
    for m in (2, iters):
        t_best = float("inf")
        for _ in range(reps):
            start = time.perf_counter()
            chain(m)
            t_best = min(t_best, time.perf_counter() - start)
        best[m] = t_best
    return (best[iters] - best[2]) / (iters - 2)


def host_time_fn(fn, n: int = 200, reps: int = 5) -> float:
    """Min-of-reps per-call time for pure-host paths (no device in the
    loop, so plain wall timing is sound; min filters scheduler noise)."""
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        best = min(best, (time.perf_counter() - t0) / n)
    return best
