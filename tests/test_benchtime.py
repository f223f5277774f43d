"""Chained-dependency timing protocol: contract-level checks on CPU.

The protocol's raison d'être (relay caching / early block_until_ready)
only exists on the tunneled TPU, but its *mechanics* — chaining calls
through data dependencies, salting inputs, differencing out fixed
overhead, min-of-reps — are backend-independent and pinned here.
"""

import numpy as np
import pytest

from pychebyshev_tpu.utils.benchtime import chained_time_fn, host_time_fn


class TestChainedTiming:
    def test_measures_positive_per_call_time(self):
        pts = np.linspace(1.0, 2.0, 512).reshape(-1, 1)

        def work(p):
            import jax.numpy as jnp
            x = jnp.asarray(p)
            for _ in range(4):
                x = x @ x.T @ p if False else jnp.sin(x) + 1.0
            return x

        t = chained_time_fn(work, pts, iters=6, reps=2)
        assert t > 0

    def test_every_call_sees_a_distinct_input(self):
        seen = []

        def spy(p):
            import jax.numpy as jnp
            seen.append(np.asarray(p).copy())
            return jnp.asarray(p)

        pts = np.ones((8, 1))
        chained_time_fn(spy, pts, iters=4, reps=1)
        flat = [s.tobytes() for s in seen]
        assert len(set(flat)) == len(flat), "salting must defeat caching"

    def test_chain_threads_the_previous_output(self):
        inputs = []

        def probe(p):
            import jax.numpy as jnp
            inputs.append(float(np.asarray(p)[0, 0]))
            return jnp.asarray(p) * 2.0  # growing output perturbs input

        chained_time_fn(probe, np.full((4, 1), 1.0), iters=4, reps=1)
        # Calls after the first in each chain depend on prior outputs,
        # so at least one later input differs from the base by more
        # than the 1e-9 salt alone.
        assert any(abs(x - 1.0) > 1e-12 for x in inputs[1:])


class TestHostTiming:
    def test_returns_min_of_reps_scale(self):
        calls = []

        def quick():
            calls.append(1)

        t = host_time_fn(quick, n=50, reps=3)
        assert t >= 0
        assert len(calls) == 50 * 3 + 1  # one warmup + n*reps timed

    def test_scales_with_work(self):
        def light():
            sum(range(10))

        def heavy():
            sum(range(20000))

        tl = host_time_fn(light, n=50, reps=3)
        th = host_time_fn(heavy, n=50, reps=3)
        assert th > tl
