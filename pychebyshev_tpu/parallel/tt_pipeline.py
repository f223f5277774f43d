"""Pipeline-parallel TT evaluation over a device mesh axis.

The TT query chain (``ops/tt_eval.py``) is a sequential composition of
per-dimension contractions — exactly the shape pipeline parallelism
wants.  ``tt_eval_batch_pp`` partitions the cores into contiguous
stages, one per device along a ``pp`` mesh axis, and streams query
microbatches through the ring: at every step each device applies its
stage to one microbatch's row state and ``ppermute``s the state to the
next device (ICI neighbor exchange on a physical torus).  After
``M + P - 1`` steps all ``M`` microbatches have traversed all ``P``
stages — the classic pipeline schedule, with the rows (B, r) as the
activations.

When this matters: TT cores at production ranks are small enough to
replicate, so ``dp`` (``parallel.sharding.eval_batch_dp``) is the first
choice.  Pipelining wins when per-device memory cannot hold the whole
chain — very high ranks, very many dims, or giant per-dim node counts —
the same regime where the reference is simply out of scope (it has no
distributed execution at all; SURVEY.md §2.3).

SPMD mechanics: every device runs the same program, so stages are
padded to a common (g_max, r_pad, n_max, r_pad) core block with a 0/1
slot mask; masked slots pass the row state through unchanged.  Stage
metadata (core blocks, masks, dim offsets) is sharded over ``pp``;
points and Chebyshev polynomial rows are replicated (they are O(N·d·n),
tiny next to the cores this mode exists for).
"""

from __future__ import annotations

import math
from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pychebyshev_tpu.ops.chebyshev import chebyshev_polynomial_matrix

__all__ = ["tt_eval_batch_pp"]


def _stage_partition(d: int, n_stages: int) -> List[np.ndarray]:
    """Contiguous, balanced assignment of d cores to n_stages stages."""
    return [np.asarray(g, dtype=np.intp)
            for g in np.array_split(np.arange(d), n_stages)]


def tt_eval_batch_pp(cores: Sequence, domain, points, mesh: Mesh,
                     axis: str = "pp",
                     microbatch: int = None) -> jax.Array:
    """Evaluate a TT at (N, d) points, cores pipelined over ``axis``.

    Matches ``ops.tt_eval.tt_eval_batch`` numerically (same chain, same
    precision policy).  ``microbatch`` defaults to ceil(N / P) so the
    pipeline is exactly filled; smaller values trade bubble overhead for
    lower per-step memory.
    """
    d = len(cores)
    n_stages = mesh.shape[axis]
    dtype = cores[0].dtype
    points = jnp.asarray(points, dtype)
    n_pts = points.shape[0]

    r_pad = max(max(c.shape[0] for c in cores),
                max(c.shape[2] for c in cores))
    n_max = max(c.shape[1] for c in cores)
    groups = _stage_partition(d, n_stages)
    g_max = max(len(g) for g in groups)

    # Stage blocks: (P, g_max, r_pad, n_max, r_pad) + slot masks.
    blocks = np.zeros((n_stages, g_max, r_pad, n_max, r_pad),
                      dtype=np.dtype(dtype))
    mask = np.zeros((n_stages, g_max), dtype=np.dtype(dtype))
    dim_idx = np.zeros((n_stages, g_max), dtype=np.int32)
    for p, group in enumerate(groups):
        for g, dim in enumerate(group):
            c = np.asarray(cores[dim])
            blocks[p, g, :c.shape[0], :c.shape[1], :c.shape[2]] = c
            mask[p, g] = 1.0
            dim_idx[p, g] = dim

    # Replicated Chebyshev polynomial rows for every dim, padded to
    # n_max columns (padding multiplies zero core entries).
    lo = np.asarray([b[0] for b in domain], dtype=np.float64)
    hi = np.asarray([b[1] for b in domain], dtype=np.float64)
    scaled = 2.0 * (points - jnp.asarray(lo, dtype)) / jnp.asarray(
        hi - lo, dtype) - 1.0
    q_all = jnp.stack([
        chebyshev_polynomial_matrix(scaled[:, k], n_max)
        for k in range(d)
    ], axis=1)                                        # (N, d, n_max)

    m_size = microbatch or max(1, math.ceil(n_pts / n_stages))
    n_micro = math.ceil(n_pts / m_size)
    pad_n = n_micro * m_size - n_pts
    q_all = jnp.pad(q_all, ((0, pad_n), (0, 0), (0, 0)))
    q_mb = q_all.reshape(n_micro, m_size, d, n_max)   # (M, B, d, n)

    pp_sharded = NamedSharding(mesh, P(axis))
    blocks_s = jax.device_put(jnp.asarray(blocks), pp_sharded)
    mask_s = jax.device_put(jnp.asarray(mask), pp_sharded)
    dims_s = jax.device_put(jnp.asarray(dim_idx), pp_sharded)

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    fresh = jnp.zeros((m_size, r_pad), dtype).at[:, 0].set(1.0)

    def _stage_apply(state, q_point, block, slot_mask, slot_dims):
        """Apply one device's (masked) core slots to the row state."""
        def body(g, st):
            core = block[g]                           # (r, n, r)
            q = jax.lax.dynamic_index_in_dim(
                q_point, slot_dims[g], axis=1, keepdims=False)  # (B, n)
            a = jnp.matmul(st, core.reshape(r_pad, n_max * r_pad),
                           precision=jax.lax.Precision.HIGHEST)
            a = a.reshape(-1, n_max, r_pad)
            new = jnp.einsum("bn,bnr->br", q, a)
            return slot_mask[g] * new + (1.0 - slot_mask[g]) * st
        return jax.lax.fori_loop(0, g_max, body, state)

    def _pipeline(q_mb_rep, block, slot_mask, slot_dims):
        block = block[0]                              # (g_max, r, n, r)
        slot_mask = slot_mask[0]
        slot_dims = slot_dims[0]
        p = jax.lax.axis_index(axis)
        total_steps = n_micro + n_stages - 1

        def step(t, carry):
            state, out = carry
            m = t - p
            active = (m >= 0) & (m < n_micro)
            mc = jnp.clip(m, 0, n_micro - 1)
            state = jnp.where((p == 0) & active, fresh, state)
            q_point = jax.lax.dynamic_index_in_dim(
                q_mb_rep, mc, axis=0, keepdims=False)  # (B, d, n)
            new_state = _stage_apply(state, q_point, block, slot_mask,
                                     slot_dims)
            new_state = jnp.where(active, new_state, state)
            write = active & (p == n_stages - 1)
            row = jnp.where(write, new_state[:, 0], out[mc])
            out = jax.lax.dynamic_update_index_in_dim(out, row, mc,
                                                      axis=0)
            state = jax.lax.ppermute(new_state, axis, perm)
            return state, out

        out0 = jnp.zeros((n_micro, m_size), dtype)
        _, out = jax.lax.fori_loop(
            0, total_steps, step, (jnp.zeros((m_size, r_pad), dtype),
                                   out0))
        # Only the last stage holds real outputs; psum replicates them.
        return jax.lax.psum(out, axis)

    in_specs = (P(), P(axis), P(axis), P(axis))
    run = shard_map(_pipeline, mesh=mesh, in_specs=in_specs,
                    out_specs=P(), check_vma=False)
    out = run(q_mb, blocks_s, mask_s, dims_s)         # (M, B)
    return out.reshape(-1)[:n_pts]
