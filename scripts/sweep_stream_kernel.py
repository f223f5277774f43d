"""Fused-kernel throughput across the grid-size envelope (one-level vs
two-level stream vs XLA f32).

For each grid shape, times the fused Pallas path against the XLA f32
path at a 512k-point batch with the chained-dependency protocol, and
reports the fused/XLA ratio plus scale-normalized deviation from f64.
The shapes past 13^5 exercise the two-level "stream" kernel (middle-dim
grid axis, tensor slices streamed from HBM); 11^5/13^5 use the one-level
mega-dot.  Prints one JSON line per shape; run on the real TPU.

Canary-gated: a fresh-shape trivial compile must land in <= 8 s or the
relay is in a degradation episode and the run aborts (CLAUDE.md).
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pychebyshev_tpu.ops import eval as eval_ops          # noqa: E402
from pychebyshev_tpu.ops import pallas_eval               # noqa: E402
from pychebyshev_tpu.ops.chebyshev import (               # noqa: E402
    barycentric_weights_np,
    differentiation_matrix_np,
    nodes_for_dim_np,
)
from pychebyshev_tpu.utils.benchtime import chained_time_fn  # noqa: E402


def canary(limit_s: float = 8.0) -> float:
    salt = float(np.random.default_rng().uniform(1, 2))
    t0 = time.perf_counter()
    jax.jit(lambda x: (x * salt + 1.0).sum())(
        jnp.arange(1234, dtype=jnp.float32)).block_until_ready()
    dt = time.perf_counter() - t0
    if dt > limit_s:
        print(json.dumps({"error": "canary compile too slow",
                          "seconds": dt}))
        sys.exit(2)
    return dt


def grid(shape):
    nodes = [nodes_for_dim_np(-1.0, 1.0, n) for n in shape]
    weights = [barycentric_weights_np(nd) for nd in nodes]
    diffs = [differentiation_matrix_np(nd, w)
             for nd, w in zip(nodes, weights)]
    return nodes, weights, diffs


def main():
    shapes = [tuple(int(v) for v in a.split("x")) for a in sys.argv[1:]]
    if not shapes:
        shapes = [(11,) * 5, (13,) * 5, (15,) * 5, (17,) * 5,
                  (19,) * 5, (33,) * 4]
    n_batch = 1 << 19
    rng = np.random.default_rng(7)
    max_d = max(len(s) for s in shapes)
    pts_np = rng.uniform(-1, 1, (n_batch, max_d)).astype(np.float32)

    print(json.dumps({"canary_s": canary()}), flush=True)

    for shape in shapes:
        d = len(shape)
        pts = jnp.asarray(pts_np[:, :d])
        tensor = rng.standard_normal(shape)
        nodes, weights, diffs = grid(shape)
        plan = pallas_eval._pick_plan(shape)
        if plan is None:
            print(json.dumps({"shape": list(shape), "plan": None}),
                  flush=True)
            continue

        t32 = jnp.asarray(tensor, jnp.float32)
        nd32 = tuple(jnp.asarray(a, jnp.float32) for a in nodes)
        w32 = tuple(jnp.asarray(a, jnp.float32) for a in weights)
        df32 = tuple(jnp.asarray(a, jnp.float32) for a in diffs)

        def fused(p):
            return pallas_eval.fused_eval_batch(
                tensor, nodes, weights, diffs, p)

        def xla(p):
            return eval_ops.eval_batch(t32, nd32, w32, df32, p,
                                       (0,) * d)

        # Time the f32 paths FIRST: sustained software-f64 chains
        # degrade subsequent device timings on this platform (see
        # CLAUDE.md), and these ratios calibrate the auto-dispatch
        # margin — the f64 accuracy reference runs after.
        t_fused = chained_time_fn(fused, pts)
        t_xla = chained_time_fn(xla, pts)

        # accuracy vs f64 on a small slice (after all timing)
        ref = np.asarray(eval_ops.eval_batch(
            jnp.asarray(tensor), tuple(map(jnp.asarray, nodes)),
            tuple(map(jnp.asarray, weights)),
            tuple(map(jnp.asarray, diffs)),
            jnp.asarray(pts_np[:2048, :d], jnp.float64), (0,) * d))
        scale = np.abs(ref).max()
        dev_fused = float(np.abs(np.asarray(
            fused(pts[:2048])) - ref).max() / scale)
        dev_xla = float(np.abs(np.asarray(
            xla(pts[:2048])) - ref).max() / scale)
        print(json.dumps({
            "shape": list(shape), "stream": bool(plan[1]),
            "block": int(plan[0]),
            "fused_qps_M": round(n_batch / t_fused / 1e6, 1),
            "xla_qps_M": round(n_batch / t_xla / 1e6, 1),
            "ratio": round(t_xla / t_fused, 2),
            "dev_fused": dev_fused, "dev_xla": dev_xla,
        }), flush=True)


if __name__ == "__main__":
    main()
