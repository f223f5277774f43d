"""High-d grouped-dd planning, measured (round 5).

The O(d^2) planner DP removed the old enumeration's silent per-dim
fallback past d = 12.  This bench measures what that buys on the
slider->TT conversion tier — exactly the high-d chains the repo
promotes: a 10-D and a 14-D additive basket slider, converted exactly
to TT, served through the dd chain per-dim vs auto-grouped.

Run on the real TPU:  python scripts/bench_highd_grouping.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pychebyshev_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from pychebyshev_tpu import ChebyshevSlider
from pychebyshev_tpu.ops import tt_eval_dd
from pychebyshev_tpu.utils.benchtime import chained_time_fn


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    t0 = time.time()
    x = jnp.arange(131072.0 + np.random.randint(512))
    jax.jit(lambda a: (a * a).sum())(x).block_until_ready()
    log(f"canary {time.time() - t0:.1f}s on {jax.devices()}")

    n = 1 << 20
    for d in (10, 14):
        w = np.linspace(0.5, 1.5, d)

        def basket(p, _=None, w=w):
            p = np.asarray(p, dtype=np.float64)
            return (np.sum(w * np.sin(p), axis=1)
                    + 0.25 * np.sum(p ** 2, axis=1))

        slider = ChebyshevSlider(basket, d, [[-1.0, 1.0]] * d, [9] * d,
                                 [[i] for i in range(d)], [0.0] * d,
                                 vectorized=True)
        slider.build(verbose=False)
        tt = slider.to_tt()
        cores = tt._cores_on_device(np.float64)
        shapes = tuple(tuple(int(x) for x in c.shape) for c in cores)
        auto = tt_eval_dd.tt_dd_auto_groups(shapes)
        log(f"{d}-D slider->TT ranks {tt.tt_ranks}; auto groups {auto}")

        dom = np.asarray([[-1.0, 1.0]] * d)
        rng = np.random.default_rng(11)
        pts = jnp.asarray(rng.uniform(-1, 1, (n, d)))
        probe = pts[:16384]
        ref = np.asarray(tt.eval_batch(np.asarray(probe)))
        scale = np.abs(ref).max()
        for tag, groups in (("per-dim", None), ("auto", "auto")):
            fn = lambda p, g=groups: tt_eval_dd.tt_eval_batch_dd(
                cores, dom, p, groups=g)
            dev = np.abs(np.asarray(fn(probe)) - ref).max() / scale
            dt = chained_time_fn(fn, pts, iters=6, reps=2)
            print(f"{d}-D slider->TT dd {tag:8s} "
                  f"({auto if groups else (1,) * d}): "
                  f"{n / dt / 1e6:6.1f}M q/s  dev {dev:.1e}")

    # A fat-rank high-d chain — the regime the DP planner exists for
    # (K-starved stages whose r_l*r_r recombination width dominates).
    # Random decayed cores: the dd kernel's cost depends only on
    # shapes; accuracy is measured against the f64 chain of the SAME
    # cores.
    d, nn, r = 14, 7, 8
    rng = np.random.default_rng(3)
    raw = []
    for k in range(d):
        r0 = 1 if k == 0 else r
        r1 = 1 if k == d - 1 else r
        c = rng.normal(size=(r0, nn, r1))
        c[:, 2:, :] *= np.exp(-1.2 * np.arange(nn - 2))[None, :, None]
        raw.append(c / (1.1 * np.abs(c).sum(axis=1).max()))
    cores = tuple(jnp.asarray(c) for c in raw)
    shapes = tuple(tuple(int(x) for x in c.shape) for c in cores)
    auto = tt_eval_dd.tt_dd_auto_groups(shapes)
    log(f"{d}-D rank-{r} synthetic chain; auto groups {auto}")
    dom = np.asarray([[-1.0, 1.0]] * d)
    pts = jnp.asarray(rng.uniform(-1, 1, (n, d)))
    probe = pts[:16384]
    from pychebyshev_tpu.ops.tt_eval import tt_eval_batch
    ref = np.asarray(tt_eval_batch(cores, dom, probe))
    scale = np.abs(ref).max()
    for tag, groups in (("per-dim", None), ("auto", "auto")):
        fn = lambda p, g=groups: tt_eval_dd.tt_eval_batch_dd(
            cores, dom, p, groups=g)
        dev = np.abs(np.asarray(fn(probe)) - ref).max() / scale
        dt = chained_time_fn(fn, pts, iters=6, reps=2)
        print(f"{d}-D rank-{r} dd {tag:8s} "
              f"({auto if groups else (1,) * d}): "
              f"{n / dt / 1e6:6.1f}M q/s  dev {dev:.1e}")


if __name__ == "__main__":
    sys.exit(main() or 0)
