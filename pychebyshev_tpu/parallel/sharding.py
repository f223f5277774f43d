"""Device-mesh sharding for builds and giant query batches.

The reference's only parallelism is a host process pool over grid points
(``_parallel.py``).  The TPU-native equivalents here are:

- **Data-parallel build** (``build_tensor_sharded``): the Chebyshev grid
  (N, d) is sharded across the ``dp`` mesh axis, the JAX-traceable target
  function evaluates its shard on every device in one fused call, and
  the value tensor is gathered.  This is the "embarrassingly parallel
  grid evaluation" axis — XLA inserts the all-gather.
- **Data-parallel queries** (``eval_batch_dp``): query points shard over
  ``dp``; the grid tensor is replicated (it is tiny — the largest
  benchmark tensor, 11^5 f64, is ~1.3 MB); outputs stay sharded.
- **Tensor-parallel queries** (``eval_batch_tp``): for tensors too large
  to replicate, the value tensor shards along grid axis 0 over ``tp``;
  each device contracts its slab against the matching slice of the
  dim-0 barycentric rows and a ``psum`` over ``tp`` completes the
  reduction (ICI collective inserted by shard_map).

All entry points accept any ``jax.sharding.Mesh``; collectives ride ICI
when the mesh maps onto a physical torus.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pychebyshev_tpu.config import NODE_COINCIDENCE_TOL
from pychebyshev_tpu.ops.chebyshev import nodes_for_dim
from pychebyshev_tpu.ops import eval as eval_ops

__all__ = [
    "make_mesh",
    "full_grid",
    "build_tensor_sharded",
    "sharded_vectorized",
    "eval_batch_dp",
    "integrate_box_batch_dp",
    "tt_integrate_box_batch_dd_dp",
    "eval_batch_dd_dp",
    "slider_batch_dd_dp",
    "tt_eval_batch_dd_dp",
    "eval_batch_tp",
    "eval_batch_dd_tp",
    "dd_tp_plan",
]


def _dp_points(points, mesh: Mesh, axis_name: str):
    """Pad a batch to the dp axis size and shard it; -> (pts, n, pad)."""
    pts = jnp.asarray(points, jnp.float64)
    n = pts.shape[0]
    pad = -n % mesh.shape[axis_name]
    if pad:
        pts = jnp.concatenate(
            [pts, jnp.broadcast_to(pts[:1], (pad, pts.shape[1]))])
    pts = jax.device_put(pts, NamedSharding(mesh, P(axis_name, None)))
    return pts, n, pad


@functools.lru_cache(maxsize=None)
def _dp_run(run, n_ops: int, mesh: Mesh, axis_name: str):
    """shard_map a jitted ``(op_1..op_n, points) -> (N,)`` runner:
    operands replicate, points shard (explicit, so chunked ``lax.map``
    inside the kernel never induces cross-device resharding).

    Memoized: the serving hot path calls a dp wrapper once per bucket,
    and re-wrapping would re-trace the shard_map closure every call
    (``run`` comes from an lru_cache, so its identity is stable).
    """
    from jax import shard_map
    return shard_map(
        lambda *a: run(*a),
        mesh=mesh,
        in_specs=(P(),) * n_ops + (P(axis_name, None),),
        out_specs=P(axis_name),
    )


@functools.lru_cache(maxsize=None)
def _dp_run_matrix(run, n_ops: int, mesh: Mesh, axis_name: str):
    """:func:`_dp_run` for ``(op_1..op_n, points) -> (N, M)`` runners
    (the multi-spec report shape): rows shard, columns replicate."""
    from jax import shard_map
    return shard_map(
        lambda *a: run(*a),
        mesh=mesh,
        in_specs=(P(),) * n_ops + (P(axis_name, None),),
        out_specs=P(axis_name, None),
    )


@functools.lru_cache(maxsize=None)
def _dp_run_matrix_t(run, n_ops: int, mesh: Mesh, axis_name: str):
    """:func:`_dp_run` for ``(op_1..op_n, points) -> (M, N)`` runners
    (the book shape): model rows replicate, point columns shard."""
    from jax import shard_map
    return shard_map(
        lambda *a: run(*a),
        mesh=mesh,
        in_specs=(P(),) * n_ops + (P(axis_name, None),),
        out_specs=P(None, axis_name),
    )


# Identity-keyed cache of replicated operand pytrees (digit planes,
# grids): without it every engine bucket call re-broadcasts the same
# single-device-committed arrays across the mesh.  Strong refs keep
# identity keying sound; bounded LRU.
_replicate_cache: list = []
_REPLICATE_SLOTS = 64


def _replicated(tree, mesh: Mesh):
    """``device_put(tree, replicated-on-mesh)``, identity-cached when
    every leaf is a jax array (engine-held operands are; ad-hoc numpy
    callers just pay the broadcast each call)."""
    leaves, treedef = jax.tree.flatten(tree)
    key_ok = bool(leaves) and all(isinstance(x, jax.Array)
                                  for x in leaves)
    if key_ok:
        for i, entry in enumerate(_replicate_cache):
            if (entry[1] == mesh and entry[2] == treedef
                    and len(entry[0]) == len(leaves)
                    and all(a is b for a, b in zip(entry[0], leaves))):
                _replicate_cache.insert(0, _replicate_cache.pop(i))
                return entry[3]
    out = jax.device_put(tree, NamedSharding(mesh, P()))
    if key_ok:
        _replicate_cache.insert(0, (tuple(leaves), mesh, treedef, out))
        del _replicate_cache[_REPLICATE_SLOTS:]
    return out


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, ...] = ("dp",),
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """A mesh over the first ``n_devices`` devices.

    With one axis name the mesh is 1-D; pass ``shape`` for multi-axis
    meshes (e.g. ``axis_names=("dp", "tp"), shape=(2, 4)``).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def full_grid(domain, n_nodes) -> jax.Array:
    """(prod(n), d) Cartesian Chebyshev grid in C-order (device array)."""
    per_dim = [nodes_for_dim(domain[d][0], domain[d][1], int(n_nodes[d]))
               for d in range(len(n_nodes))]
    mesh_axes = jnp.meshgrid(*per_dim, indexing="ij")
    return jnp.stack([g.ravel() for g in mesh_axes], axis=-1)


def build_tensor_sharded(function: Callable, domain, n_nodes,
                         mesh: Mesh, additional_data=None,
                         axis_name: str = "dp") -> jax.Array:
    """Evaluate a JAX-traceable batched function over the grid, sharded.

    ``function(points (N, d), data) -> (N,)`` is traced once; the grid
    shards across ``axis_name`` and the gathered result is reshaped to
    the (replicated) value tensor.
    """
    grid = full_grid(domain, n_nodes)
    n = grid.shape[0]
    pad = -n % mesh.shape[axis_name]
    if pad:
        # Grid size rarely divides the mesh axis; replicate the first
        # point into the tail so the shard split is even, drop after.
        grid = jnp.concatenate(
            [grid, jnp.broadcast_to(grid[:1], (pad, grid.shape[1]))])
    grid = jax.device_put(grid, NamedSharding(mesh, P(axis_name, None)))

    @jax.jit
    def _eval(points):
        return function(points, additional_data)

    values = _eval(grid)
    replicated = jax.device_put(values, NamedSharding(mesh, P()))[:n]
    return replicated.reshape(tuple(int(n) for n in n_nodes))


def sharded_vectorized(function: Callable, mesh: Mesh,
                       axis_name: str = "dp") -> Callable:
    """Wrap a JAX-traceable batched function so that constructor-driven
    builds (``vectorized=True``) automatically shard grid evaluation
    across the mesh."""
    def wrapped(points, data):
        pts = jnp.asarray(points, dtype=jnp.float64)
        n = pts.shape[0]
        pad = -n % mesh.shape[axis_name]
        if pad:
            # Batches (e.g. TT cross matrices) rarely divide the axis;
            # replicate the first point into the tail, drop after.
            pts = jnp.concatenate(
                [pts, jnp.broadcast_to(pts[:1], (pad, pts.shape[1]))])
        pts = jax.device_put(pts, NamedSharding(mesh, P(axis_name,
                                                        None)))
        out = jax.jit(lambda p: function(p, data))(pts)
        return np.asarray(jax.device_put(
            out, NamedSharding(mesh, P())))[:n]
    return wrapped


def eval_batch_dp(tensor, nodes, weights, diff_matrices, points,
                  mesh: Mesh, orders: Tuple[int, ...],
                  axis_name: str = "dp") -> jax.Array:
    """Data-parallel batched evaluation: points shard over ``axis_name``,
    grid data replicate, result stays sharded over ``axis_name``."""
    replicate = NamedSharding(mesh, P())
    tensor = jax.device_put(tensor, replicate)
    nodes = tuple(jax.device_put(n, replicate) for n in nodes)
    weights = tuple(jax.device_put(w, replicate) for w in weights)
    diffs = tuple(jax.device_put(d, replicate) for d in diff_matrices)
    points = jnp.asarray(points, dtype=jnp.float64)
    n = points.shape[0]
    pad = -n % mesh.shape[axis_name]
    if pad:
        # Uneven batches pad with the first point (always valid) so the
        # dp split is even; the tail is dropped from the result.
        points = jnp.concatenate(
            [points, jnp.broadcast_to(points[:1], (pad, points.shape[1]))])
    points = jax.device_put(points, NamedSharding(mesh, P(axis_name, None)))
    out = eval_ops.eval_batch(tensor, nodes, weights, diffs, points,
                              orders)
    return out[:n] if pad else out


def integrate_box_batch_dp(tensor, domain, bounds, mesh: Mesh,
                           axis_name: str = "dp",
                           dtype=jnp.float64) -> jax.Array:
    """Data-parallel batched box integration: boxes shard over
    ``axis_name``, the value tensor replicates (box integrals are pure
    per-box work over replicated operands, exactly like dp eval).

    ``bounds`` is (B, d, 2), validated by the caller
    (``utils.calculus.normalize_bounds_batch``).  Uneven batches pad
    with the first box; the tail is dropped.  ``dtype=jnp.float32``
    selects the throughput tier.
    """
    from pychebyshev_tpu.ops.integrate import integrate_box_batch

    replicate = NamedSharding(mesh, P())
    tensor = jax.device_put(jnp.asarray(tensor, dtype), replicate)
    dom = jax.device_put(jnp.asarray(domain, dtype), replicate)
    b = jnp.asarray(bounds, jnp.float64)
    n = b.shape[0]
    flat, n, pad = _dp_points(b.reshape(n, 2 * tensor.ndim), mesh,
                              axis_name)
    out = integrate_box_batch(
        tensor, dom, flat.reshape(flat.shape[0], tensor.ndim, 2),
        dtype=dtype)
    return out[:n] if pad else out


def eval_batch_dd_dp(tensor, nodes, weights, diff_matrices, points,
                     mesh: Mesh, orders: Tuple[int, ...] = None,
                     axis_name: str = "dp",
                     cutoff: int = None) -> jax.Array:
    """Data-parallel digit-GEMM evaluation: near-f64 accuracy at the
    per-chip dd rate x the mesh axis size.

    The dd kernel is pure per-point work over replicated operands, so
    data parallelism is exact: digit planes are prepared once on host
    (cached per tensor/orders like the single-device path), replicated,
    and each device runs the dd pipeline on its shard of the batch via
    ``shard_map`` (explicit, so the chunked ``lax.map`` inside the
    kernel never induces cross-device resharding).
    """
    from pychebyshev_tpu.ops import eval_dd

    shape = tuple(int(x) for x in tensor.shape)
    d = len(shape)
    if orders is None:
        orders = (0,) * d
    if not eval_dd.supports_dd(shape):
        raise ValueError(
            f"grid shape {shape} outside digit-GEMM budget; "
            f"use eval_batch_dp"
        )
    run, _, plan = eval_dd._compiled(shape, d, cutoff)
    t_scale, planes = eval_dd._tensor_planes(
        tensor, tuple(jnp.asarray(m, jnp.float64)
                      for m in diff_matrices), tuple(orders), plan)

    planes, nodes64, weights64 = _replicated(
        (planes,
         tuple(jnp.asarray(a, jnp.float64) for a in nodes),
         tuple(jnp.asarray(a, jnp.float64) for a in weights)), mesh)
    t_scale = jax.device_put(jnp.asarray(t_scale, jnp.float64),
                             NamedSharding(mesh, P()))

    pts, n, pad = _dp_points(points, mesh, axis_name)
    out = _dp_run(run, 4, mesh, axis_name)(planes, t_scale, nodes64,
                                           weights64, pts)
    return out[:n] if pad else out


def tt_integrate_box_batch_dd_dp(coeff_cores, domain, bounds,
                                 mesh: Mesh, axis_name: str = "dp",
                                 cutoff: int = None,
                                 groups="auto") -> jax.Array:
    """Data-parallel near-f64 TT box integration: boxes shard over
    ``axis_name``, the prepared (grouped) core digit planes replicate —
    the scenario-calculus analog of :func:`eval_batch_dd_dp`, so a
    mesh serves bucket masses at the per-chip dd rate x the axis size
    with zero collectives past the initial broadcast."""
    from pychebyshev_tpu.ops import integrate as integrate_ops

    shapes = tuple(tuple(int(x) for x in np.shape(c))
                   for c in coeff_cores)
    groups, gplan = integrate_ops._resolve_tt_dd_groups(shapes, groups,
                                                        cutoff)
    run, gplan = integrate_ops._compiled_tt_integrate_dd(
        shapes, groups, gplan["cutoff"])
    scales, planes = integrate_ops._tt_dd_planes(coeff_cores, groups,
                                                 gplan)
    dom = np.asarray(domain, dtype=np.float64)
    measure = jnp.asarray(float(np.prod((dom[:, 1] - dom[:, 0]) * 0.5)),
                          jnp.float64)
    planes, lo, hi, measure = _replicated(
        (planes, jnp.asarray(dom[:, 0]), jnp.asarray(dom[:, 1]),
         measure), mesh)
    b = jnp.asarray(bounds, jnp.float64)
    flat, n, pad = _dp_points(b.reshape(b.shape[0], 2 * len(shapes)),
                              mesh, axis_name)
    out = _dp_run(run, 5, mesh, axis_name)(planes, scales, lo, hi,
                                           measure, flat)
    return out[:n] if pad else out


def slider_batch_dd_dp(slide_data, pivot_value, groups, points,
                       mesh: Mesh, orders=None, axis_name: str = "dp",
                       cutoff: int = None) -> jax.Array:
    """Data-parallel slider digit-GEMM: the concatenated-slide exact
    contraction at the per-chip dd rate x the mesh axis size.

    Same replication story as :func:`eval_batch_dd_dp`: the slide digit
    planes and grids replicate (a whole reference slider's operands are
    KBs), points shard, every device runs the exact-integer pipeline
    locally — zero collectives past the initial broadcast.
    """
    from pychebyshev_tpu.ops import slider_eval as se

    groups = tuple(tuple(int(x) for x in g) for g in groups)
    n_dims = sum(len(g) for g in groups)
    if orders is None:
        orders = (0,) * n_dims
    orders = tuple(int(o) for o in orders)

    owning = {gi for gi, g in enumerate(groups)
              if any(orders[d] > 0 for d in g)}
    if len(owning) > 1:
        return jnp.zeros(np.shape(points)[0], jnp.float64)
    if owning:
        active = (owning.pop(),)
        with_pivot = False
    else:
        active = tuple(range(len(groups)))
        with_pivot = True

    shapes = tuple(tuple(int(x) for x in np.shape(sd[0]))
                   for sd in slide_data)
    plan = se.slider_dd_plan([shapes[i] for i in active], cutoff)
    if not plan["ok"]:
        raise ValueError(
            f"slider slide shapes {[shapes[i] for i in active]} outside "
            f"the digit-GEMM budget; use eval_batch with shard_map")
    run, plan = se._compiled_slider_dd(shapes, groups, active,
                                       with_pivot, plan["cutoff"])
    blocks = []
    for i in active:
        sub = tuple(orders[d] for d in groups[i])
        blocks.append((i, "deriv", sub) if any(o > 0 for o in sub)
                      else (i, "raw", ()))
    t_scale, tensor_planes = se._slider_planes(slide_data,
                                               tuple(blocks), plan)
    replicate = NamedSharding(mesh, P())
    tensor_planes, grids = _replicated(
        (tensor_planes,
         tuple((tuple(jnp.asarray(a, jnp.float64)
                      for a in slide_data[i][1]),
                tuple(jnp.asarray(a, jnp.float64)
                      for a in slide_data[i][2]))
               for i in active)), mesh)
    t_scale = jax.device_put(jnp.asarray(t_scale, jnp.float64),
                             replicate)
    pivot = jax.device_put(jnp.asarray(pivot_value, jnp.float64),
                           replicate)

    pts, n, pad = _dp_points(points, mesh, axis_name)
    out = _dp_run(run, 4, mesh, axis_name)(tensor_planes, t_scale,
                                           grids, pivot, pts)
    return out[:n] if pad else out


def tt_eval_batch_dd_dp(coeff_cores, domain, points, mesh: Mesh,
                        axis_name: str = "dp",
                        cutoff: int = None, groups="auto") -> jax.Array:
    """Data-parallel TT digit-GEMM chain: core digit planes replicate,
    points shard, each device runs the recurrence + GEMM ladders + rank
    chain on its slice.  ``groups`` follows
    ``ops.tt_eval_dd.tt_eval_batch_dd`` (``"auto"`` default: grouped
    supercore chain when the planner predicts a win)."""
    from pychebyshev_tpu.ops import tt_eval_dd as tdd

    shapes = tuple(tuple(int(x) for x in np.shape(c))
                   for c in coeff_cores)
    plan = tdd.tt_dd_plan(shapes, cutoff)
    if not plan["ok"]:
        raise ValueError(
            f"TT core shapes {shapes} outside the digit-GEMM budget; "
            f"use tt_pipeline or eval_batch with shard_map")
    if groups == "auto":
        groups = tdd.tt_dd_auto_groups(shapes, plan["cutoff"])
    if groups is not None and tuple(groups) != (1,) * len(shapes):
        groups = tuple(int(g) for g in groups)
        if any(g < 1 for g in groups) or sum(groups) != len(shapes):
            raise ValueError(
                f"groups {groups} must be positive and sum to the "
                f"number of cores ({len(shapes)})")
        gplan = tdd.tt_dd_plan(tdd._merged_shapes(shapes, groups),
                               cutoff)
        if not gplan["ok"]:
            raise ValueError(
                f"grouped shapes outside the digit-GEMM budget; "
                f"loosen groups={groups}")
        run, gplan = tdd._compiled_grouped(shapes, groups,
                                           gplan["cutoff"])
        scales, planes = tdd._grouped_core_planes(
            tuple(coeff_cores), groups, gplan)
    else:
        run, plan = tdd._compiled(shapes, plan["cutoff"])
        scales, planes = tdd._core_planes(tuple(coeff_cores), plan)

    replicate = NamedSharding(mesh, P())
    planes = _replicated(planes, mesh)
    dom = np.asarray(domain, dtype=np.float64)
    lo = jax.device_put(jnp.asarray(dom[:, 0]), replicate)
    hi = jax.device_put(jnp.asarray(dom[:, 1]), replicate)

    pts, n, pad = _dp_points(points, mesh, axis_name)
    out = _dp_run(run, 4, mesh, axis_name)(planes, scales, lo, hi, pts)
    return out[:n] if pad else out


def _sharded_dim_rows(x, nodes_s, weights_s, tp_axis: str):
    """Globally-normalized barycentric rows of a tp-sharded dim.

    The unnormalized ``w/(x - node)`` terms come from the local node
    slice; a ``psum`` assembles the global denominator.  Exact hits use
    a global one-hot: a point within tolerance of a node must select
    the globally-FIRST hit (pmin over first-local-hit columns), exactly
    like the single-device argmax path.  Shared by ``eval_batch_tp``
    and the tp digit-GEMM kernel.  Returns (rows, col0).
    """
    blk = nodes_s.shape[0]
    col0 = (jax.lax.axis_index(tp_axis) * blk).astype(jnp.int32)
    diff0 = x[:, None] - nodes_s[None, :]
    exact_local = jnp.abs(diff0) < NODE_COINCIDENCE_TOL
    safe = jnp.where(exact_local, 1.0, diff0)
    w_over_diff = weights_s[None, :] / safe
    denom = jax.lax.psum(jnp.sum(w_over_diff, axis=1), tp_axis)
    has_exact = jax.lax.psum(
        exact_local.any(axis=1).astype(jnp.float64), tp_axis) > 0
    local_cols = col0 + jnp.arange(blk, dtype=jnp.int32)
    big = jnp.int32(2 ** 30)
    first_local = jnp.where(
        exact_local.any(axis=1),
        jnp.argmax(exact_local, axis=1).astype(jnp.int32) + col0,
        big)
    first_global = jax.lax.pmin(first_local, tp_axis)
    one_hot = (local_cols[None, :]
               == first_global[:, None]).astype(jnp.float64)
    rows = jnp.where(has_exact[:, None], one_hot,
                     w_over_diff / denom[:, None])
    return rows, col0


def eval_batch_tp(tensor, nodes, weights, diff_matrices, points,
                  mesh: Mesh, orders: Tuple[int, ...] = None,
                  dp_axis: str = "dp", tp_axis: str = "tp") -> jax.Array:
    """Tensor-parallel + data-parallel batched evaluation.

    The value tensor shards along grid axis 0 over ``tp_axis`` (for
    grids too large for one chip's HBM); queries shard over ``dp_axis``.
    Each device contracts its tensor slab with its slice of the dim-0
    barycentric rows, and a ``psum`` over ``tp_axis`` completes the dim-0
    reduction.

    Derivatives along the sharded axis fold into the dim-0 coefficient
    row — ``r . (D^k t) == (r D^k) . t`` — computed distributedly: each
    device multiplies its local row block by its block of D's rows, one
    ``psum`` assembles the transformed full row, and the device keeps
    the slice matching its slab.  D is n0 x n0 (tiny), so replicating
    it costs nothing; each derivative order costs one (N, n0) psum.
    """
    from jax import shard_map

    d = len(nodes)
    if orders is None:
        orders = (0,) * d

    tensor = jnp.asarray(tensor, dtype=jnp.float64)
    points = jnp.asarray(points, dtype=jnp.float64)
    nodes = tuple(jnp.asarray(n) for n in nodes)
    weights = tuple(jnp.asarray(w) for w in weights)
    diffs = tuple(jnp.asarray(m) for m in diff_matrices)

    # Uneven shapes pad transparently (VERDICT r2 #4):
    # - grid axis 0 pads with zero-weight sentinel nodes: w=0 rows
    #   contribute exactly 0 to numerator and denominator, a far-away
    #   sentinel node can never trip the exact-node test, and zero
    #   rows/cols in D and zero tensor slabs keep derivative passes
    #   exact — so the padded contraction is bit-identical in effect;
    # - the query batch pads with the first point, dropped at the end.
    n0 = tensor.shape[0]
    pad0 = -n0 % mesh.shape[tp_axis]
    if pad0:
        tensor = jnp.concatenate(
            [tensor, jnp.zeros((pad0,) + tensor.shape[1:], tensor.dtype)])
        nodes = (jnp.concatenate(
            [nodes[0], jnp.full((pad0,), 1e300, nodes[0].dtype)]),
        ) + nodes[1:]
        weights = (jnp.concatenate(
            [weights[0], jnp.zeros((pad0,), weights[0].dtype)]),
        ) + weights[1:]
        dm = jnp.zeros((n0 + pad0, n0 + pad0), diffs[0].dtype)
        diffs = (dm.at[:n0, :n0].set(diffs[0]),) + diffs[1:]

    nb = points.shape[0]
    padb = -nb % mesh.shape[dp_axis]
    if padb:
        points = jnp.concatenate(
            [points, jnp.broadcast_to(points[:1], (padb, d))])

    tensor_spec = P(tp_axis, *([None] * (d - 1)))
    in_specs = (
        tensor_spec,                      # tensor slab
        P(tp_axis),                       # nodes[0] slice
        P(tp_axis),                       # weights[0] slice
        P(None, None),                    # dim-0 differentiation matrix
        P(None),                          # other nodes (stacked pytree)
        P(None),
        P(None),
        P(dp_axis, None),                 # points
    )

    other_nodes = nodes[1:]
    other_weights = weights[1:]
    other_diffs = diffs[1:]

    def _kernel(tensor_slab, nodes0, weights0, dmat0, o_nodes, o_weights,
                o_diffs, pts):
        # Derivative passes on non-sharded dims only — the shared
        # helper, so precision policy (HIGHEST for f64) and pass
        # structure cannot drift from the single-device path.  dmat0's
        # order is handled distributed below, so dim 0 passes 0 here.
        t = eval_ops.apply_derivative_passes(
            tensor_slab, (dmat0,) + tuple(o_diffs),
            (0,) + tuple(orders[1:]))

        # Dim-0 rows need GLOBAL normalization (shared helper with the
        # tp digit-GEMM kernel).
        c0, col0 = _sharded_dim_rows(pts[:, 0], nodes0, weights0,
                                     tp_axis)
        blk = nodes0.shape[0]

        # Sharded-axis derivatives: r <- r @ D per order, distributed.
        # Local contribution is r_loc @ D[block, :]; the psum assembles
        # the full transformed row, then keep this slab's columns.
        if orders[0] > 0:
            prec = eval_ops._gemm_precision(tensor_slab.dtype)
            zero = jnp.zeros((), jnp.int32)
            for _ in range(orders[0]):
                d_rows = jax.lax.dynamic_slice(
                    dmat0, (col0, zero), (blk, dmat0.shape[1]))
                full_row = jax.lax.psum(
                    jnp.matmul(c0, d_rows, precision=prec), tp_axis)
                c0 = jax.lax.dynamic_slice(
                    full_row, (zero, col0), (full_row.shape[0], blk))

        rows = [c0] + [
            eval_ops.barycentric_coefficients(pts[:, k], o_nodes[k - 1],
                                              o_weights[k - 1])
            for k in range(1, d)
        ]
        local = eval_ops._contract(t, rows)
        return jax.lax.psum(local, tp_axis)

    sharded = shard_map(
        _kernel, mesh=mesh, in_specs=in_specs, out_specs=P(dp_axis),
        check_vma=False,
    )
    out = sharded(tensor, nodes[0], weights[0], diffs[0], other_nodes,
                  other_weights, other_diffs, points)
    return out[:nb] if padb else out


# ---------------------------------------------------------------------------
# Tensor-parallel digit-GEMM: near-f64 BEYOND the single-chip digit
# budget.
#
# The dense dd plan's MXU-exactness constraint is
# ``K * 2^(b_r + b_t) < 2^24`` with K the contracted right-group size —
# grids past K ~ 2^14 leave too few digit bits and ``supports_dd``
# refuses them.  Sharding the FIRST right-group dim over ``tp`` divides
# K per device, which RAISES the per-device bit budget: each device
# quantizes and contracts only its slab (exact integers locally), folds
# its pair ladder with branch-free TwoSum into an f64 partial, and one
# f64 ``psum`` over ``tp`` completes the contraction at full accuracy.
# Derivative passes fold into the tensor on HOST before the plane
# build, so no distributed D-matrix machinery is needed.  The sharded
# dim's barycentric rows use the same global-psum normalization and
# pmin one-hot as ``eval_batch_tp``.
# ---------------------------------------------------------------------------


def dd_tp_plan(shape, n_tp: int, cutoff: int = None) -> dict:
    """Static plan for the tp-sharded digit GEMM (per-device budget)."""
    from pychebyshev_tpu.ops import eval_dd as _dd
    from pychebyshev_tpu.ops.eval import _split_index

    if cutoff is None:
        cutoff = _dd._PAIR_CUTOFF
    shape = tuple(int(n) for n in shape)
    if len(shape) < 2:
        return {"ok": False}
    s = _split_index(shape)
    if len(shape) - s > 3:
        return {"ok": False}
    n_s = shape[s]
    n_s_pad = -(-n_s // n_tp) * n_tp
    n_rest = int(np.prod(shape[s + 1:])) if len(shape) > s + 1 else 1
    k_local = (n_s_pad // n_tp) * n_rest
    bits_budget = 24 - int(np.ceil(np.log2(k_local)))
    b_t = min(6, bits_budget - 6)
    b_r = min(7, bits_budget - b_t)
    if b_t < 4:
        return {"ok": False}
    pairs, js_by_i = _dd.pair_schedule(b_r, b_t, cutoff)
    return {"ok": True, "s": s, "n_left": int(np.prod(shape[:s])),
            "n_s_pad": n_s_pad, "n_rest": n_rest, "k_local": k_local,
            "b_r": b_r, "b_t": b_t, "pairs": pairs, "js_by_i": js_by_i,
            "cutoff": int(cutoff)}


@functools.lru_cache(maxsize=None)
def _compiled_dd_tp(shape: Tuple[int, ...], mesh: Mesh, dp_axis: str,
                    tp_axis: str, cutoff: int):
    """The tp digit-GEMM program (orders-independent: derivative
    passes fold into the tensor planes on host)."""
    from pychebyshev_tpu.ops import eval_dd as _dd
    from pychebyshev_tpu.ops.eval import (
        _khatri_rao,
        barycentric_coefficients,
        chunked_scalar_map,
    )
    from jax import shard_map

    n_tp = mesh.shape[tp_axis]
    plan = dd_tp_plan(shape, n_tp, cutoff)
    s = plan["s"]
    d = len(shape)
    b_r, b_t = plan["b_r"], plan["b_t"]
    js_by_i = plan["js_by_i"]
    p_r = 1 + max(i for i, _ in plan["pairs"])
    wr_scale = np.float64(2.0 ** _dd._WR_SCALE_LOG2)

    def _one(planes, t_scale, nodes_s, weights_s, o_nodes, o_weights,
             pts):
        # Left rows: replicated f64 Khatri-Rao (narrow).
        w_left = _khatri_rao([
            barycentric_coefficients(pts[:, k], o_nodes[k],
                                     o_weights[k])
            for k in range(s)]) if s > 0 else jnp.ones(
                (pts.shape[0], 1), jnp.float64)

        # Sharded dim-s rows: global psum normalization + global
        # one-hot (shared helper with eval_batch_tp).
        c_s, _ = _sharded_dim_rows(pts[:, s], nodes_s, weights_s,
                                   tp_axis)

        rest = [barycentric_coefficients(pts[:, k], o_nodes[k],
                                         o_weights[k])
                for k in range(s + 1, d)]
        dd_pairs = [_dd._split_f64(c_s * (1.0 / wr_scale))] + \
            [_dd._split_f64(r) for r in rest]
        qhi, qlo = _dd._khatri_rao_dd(dd_pairs)     # (N, k_local)
        r_planes = _dd._digit_planes_pair(qhi, qlo, b_r, p_r)

        acc, comp = _dd.dd_gemm_ladder(r_planes, planes, js_by_i,
                                       b_r, b_t, plan["n_left"])
        # Per-device partial in f64 (exact to ~2^-48 of the LOCAL
        # contribution); the narrow f64 psum finishes the contraction.
        y = (acc.astype(jnp.float64) + comp.astype(jnp.float64)) \
            * (wr_scale * t_scale)
        out_local = jnp.sum(w_left * y, axis=1)
        return jax.lax.psum(out_local, tp_axis)

    def _kernel(planes, t_scale, nodes_s, weights_s, o_nodes,
                o_weights, pts):
        return chunked_scalar_map(
            lambda p: _one(planes, t_scale, nodes_s, weights_s,
                           o_nodes, o_weights, p),
            pts, plan["k_local"] * (p_r + 2))

    fn = shard_map(
        _kernel,
        mesh=mesh,
        in_specs=(P(tp_axis, None), P(), P(tp_axis), P(tp_axis),
                  P(), P(), P(dp_axis, None)),
        out_specs=P(dp_axis),
    )
    return jax.jit(fn), plan


# Prepared tp operand bundles (planes, sharded grid slices, replicated
# grids, scale), identity-keyed on (tensor, nodes, weights, diffs) so
# the serving hot path never re-reads grids from device or
# re-broadcasts (same soundness rules as the other plane caches:
# immutable jax-array operands only).
_tp_plane_cache: list = []
_TP_PLANE_SLOTS = 8


def _tp_prepared(tensor, nodes, weights, diff_matrices, orders, mesh,
                 tp_axis, plan):
    from pychebyshev_tpu.ops import eval_dd as _dd
    from pychebyshev_tpu.ops.eval import apply_derivative_passes

    shape = tuple(int(x) for x in tensor.shape)
    s = plan["s"]
    diffs_key = tuple(diff_matrices) if any(o > 0 for o in orders) \
        else ()
    op_key = (tuple(nodes), tuple(weights), diffs_key)
    meta_key = (orders, plan["cutoff"], plan["b_t"], mesh, tp_axis)
    cacheable = isinstance(tensor, jax.Array) and all(
        isinstance(a, jax.Array)
        for grp in op_key for a in grp)
    if cacheable:
        for i, entry in enumerate(_tp_plane_cache):
            ok = (entry[0] is tensor and entry[1] == meta_key
                  and all(len(ga) == len(gb)
                          and all(a is b for a, b in zip(ga, gb))
                          for ga, gb in zip(entry[2], op_key)))
            if ok:
                _tp_plane_cache.insert(0, _tp_plane_cache.pop(i))
                return entry[3]

    t64 = jnp.asarray(tensor, jnp.float64)
    if any(o > 0 for o in orders):
        t64 = apply_derivative_passes(
            t64, tuple(jnp.asarray(m, jnp.float64)
                       for m in diff_matrices), orders)
    t_host = np.asarray(t64, dtype=np.float64)
    pad_s = plan["n_s_pad"] - shape[s]
    if pad_s:
        pad_shape = list(t_host.shape)
        pad_shape[s] = pad_s
        t_host = np.concatenate([t_host, np.zeros(pad_shape)], axis=s)
    flat = t_host.reshape(plan["n_left"], -1)
    t_max = float(np.abs(flat).max()) or 1.0
    t_scale = 2.0 ** np.ceil(np.log2(t_max))
    p_t_used = 1 + max(j for _, j in plan["pairs"])
    planes_host = _dd._digit_planes_tensor(flat.T / t_scale,
                                           plan["b_t"], p_t_used)
    planes = tuple(
        jax.device_put(
            jnp.asarray(np.concatenate(
                [planes_host[j] for j in js], axis=1), jnp.bfloat16),
            NamedSharding(mesh, P(tp_axis, None)))
        if js else jnp.zeros((flat.shape[1], 0), jnp.bfloat16)
        for js in plan["js_by_i"])

    # Sharded dim-s grid slices (sentinel nodes / zero weights for the
    # pad — they contribute exactly nothing, as in eval_batch_tp).
    nodes_s = np.asarray(nodes[s], dtype=np.float64)
    weights_s = np.asarray(weights[s], dtype=np.float64)
    if pad_s:
        nodes_s = np.concatenate([nodes_s, np.full(pad_s, 1e300)])
        weights_s = np.concatenate([weights_s, np.zeros(pad_s)])
    nodes_s = jax.device_put(jnp.asarray(nodes_s),
                             NamedSharding(mesh, P(tp_axis)))
    weights_s = jax.device_put(jnp.asarray(weights_s),
                               NamedSharding(mesh, P(tp_axis)))

    replicate = NamedSharding(mesh, P())
    o_nodes = jax.device_put(
        tuple(jnp.asarray(a, jnp.float64) for a in nodes), replicate)
    o_weights = jax.device_put(
        tuple(jnp.asarray(a, jnp.float64) for a in weights), replicate)
    t_scale = jax.device_put(jnp.asarray(t_scale, jnp.float64),
                             replicate)

    bundle = (planes, t_scale, nodes_s, weights_s, o_nodes, o_weights)
    if cacheable:
        _tp_plane_cache.insert(0, (tensor, meta_key, op_key, bundle))
        del _tp_plane_cache[_TP_PLANE_SLOTS:]
    return bundle


def eval_batch_dd_tp(tensor, nodes, weights, diff_matrices, points,
                     mesh: Mesh, orders: Tuple[int, ...] = None,
                     dp_axis: str = "dp", tp_axis: str = "tp",
                     cutoff: int = None) -> jax.Array:
    """Tensor-parallel digit-GEMM evaluation: near-f64 for grids BEYOND
    the single-chip digit budget.

    The contracted right group shards over ``tp_axis`` (first right dim,
    zero-padded to the axis like ``eval_batch_tp``), so each device's
    MXU-exactness budget is set by its LOCAL contraction size — grids
    ``ops.eval_dd.supports_dd`` refuses become plan-eligible once
    ``k_local`` fits (check with :func:`dd_tp_plan`).  Derivative
    passes fold into the tensor on host before the plane build.
    Queries shard over ``dp_axis``.
    """
    shape = tuple(int(x) for x in tensor.shape)
    d = len(shape)
    if orders is None:
        orders = (0,) * d
    orders = tuple(int(o) for o in orders)
    n_tp = mesh.shape[tp_axis]
    plan = dd_tp_plan(shape, n_tp, cutoff)
    if not plan["ok"]:
        raise ValueError(
            f"grid shape {shape} outside the tp digit-GEMM budget on "
            f"{n_tp} devices; use eval_batch_tp")

    run, plan = _compiled_dd_tp(shape, mesh, dp_axis, tp_axis,
                                plan["cutoff"])
    bundle = _tp_prepared(tensor, nodes, weights, diff_matrices,
                          orders, mesh, tp_axis, plan)

    pts, n, padb = _dp_points(points, mesh, dp_axis)
    out = run(*bundle, pts)
    return out[:n] if padb else out
