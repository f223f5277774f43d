"""Sharded TT build oracle: mechanism + overhead check on the CPU mesh.

One deliberately-expensive oracle (deep elementwise chain) builds the
same seeded TT-Cross under mesh sizes 1 / 2 / 8.  Eval counts and
cores are identical by construction; the wall-clock row documents that
sharding adds NO overhead (measured ~1.0-1.15x on this container).

Honest scaling caveat: real multi-chip hardware is unavailable here
(CLAUDE.md), and the virtual CPU mesh's devices SHARE the host cores —
a single CPU device already multithreads its eval through XLA's
threadpool, so dividing the batch over 8 virtual devices cannot show
the chip-count speedup the mechanism provides when each mesh device is
a separate accelerator.  On real hardware the cross-matrix batches are
the dominant cost of an expensive-oracle build and shard
embarrassingly; this script pins correctness and the no-regression
bound, the dryrun pins multi-device compilation.

Run:  python scripts/bench_sharded_build.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pychebyshev_tpu import ChebyshevTT  # noqa: E402
from pychebyshev_tpu.parallel.sharding import make_mesh  # noqa: E402

DOM = [[0.0, 2.0]] * 5


def expensive_oracle(p, _=None):
    # ~600 transcendental passes per point: stands in for a PDE solve /
    # MC pricer the cross would call.
    x = jnp.sum(jnp.sin(p), axis=1)
    for _i in range(600):
        x = jnp.sin(x) + 0.1 * jnp.cos(x * 0.7)
    return x + jnp.prod(jnp.cos(p * 0.5), axis=1)


def build(mesh):
    tt = ChebyshevTT(expensive_oracle, 5, DOM, [9] * 5, max_rank=7,
                     vectorized=True)
    t0 = time.time()
    tt.build(verbose=False, seed=7, mesh=mesh)
    return time.time() - t0, tt


def main():
    rows = []
    base = None
    for n_dev in (1, 2, 8):
        dt, tt = build(make_mesh(n_dev))
        if base is None:
            base = dt
        rows.append({"mesh_devices": n_dev, "seconds": dt,
                     "speedup": base / dt,
                     "build_evals": tt.total_build_evals,
                     "ranks": list(tt.tt_ranks)})
        print(f"mesh={n_dev}: {dt:.2f}s ({base / dt:.2f}x), "
              f"{tt.total_build_evals:,} evals, ranks {tt.tt_ranks}",
              file=sys.stderr, flush=True)
    print(json.dumps(rows, indent=1), flush=True)


if __name__ == "__main__":
    main()
