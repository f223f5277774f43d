"""Near-f64 batched evaluation on the bf16 MXU — the "digit GEMM" mode.

Why this exists: the north-star contract (BASELINE.md) asks for
~1e-12-class accuracy at multi-million queries/s per chip, but TPU v5e
has no f64 hardware — the f64 path runs ~0.5M q/s — and *any* f32 MXU
pipeline is floored at ~2^-24 x condition by the accumulator: splitting
operands more finely (bf16x3/x6, f32 pairs) sharpens the products but
every partial sum still rounds at f32 precision.  Getting below that
floor requires exact accumulation, which the MXU only offers for
integer-valued inputs.

The scheme (an Ozaki-style fixed-point decomposition):

1. Build the barycentric row factors in f64 (exact to 1e-16; the
   per-dim rows are tiny).
2. Split the grid dims in two groups L|R (same split as ``ops.eval``):
   ``out[n] = sum_{a,b} WL[n,a] * T2[a,b] * WR[n,b]``.
3. Quantize ``WR`` and ``T2`` into signed *digit planes* of ``b_r`` /
   ``b_t`` bits stored as bf16: every plane entry is a small integer,
   so a bf16 MXU dot of two planes computes integer products (< 2^13)
   accumulated in f32 **exactly** (K * 2^(b_r+b_t) < 2^24 enforced).
4. One bf16 GEMM per digit pair (i, j) with 7i + 6j below the accuracy
   cutoff (~20 GEMMs for the 11^5 benchmark); each output is an exact
   integer-valued f32 matrix.  Recombine with the per-pair power-of-two
   scales in f64 — that's ~20 cheap wide ops, not a GEMM.
5. Contract with ``WL`` in f64 elementwise (the L side is the small
   group, e.g. 121 lanes).

Accuracy: quantization residuals and dropped digit pairs are ~2^-41 of
the operand scales, so the deviation from the true f64 result is
~1e-12 x condition — measured ~2e-12 scale-normalized on the 5-D BS
benchmark vs the f64 path, i.e. two orders inside the 1e-10 target,
at ~7.0M queries/s (vs 0.49M for f64 emulation; tensor digit planes
are cached per (tensor, orders)) measured with the chained-timing
protocol.

Everything here is plain XLA (no Pallas): the GEMMs are bf16
``dot_general``s that map straight onto the MXU, and the f64 pieces
are narrow elementwise chains XLA fuses.

Reference context: this replaces reference ``barycentric.py:885-949``
in the accuracy regime where its NumPy f64 BLAS ran, which the plain
f32 TPU paths cannot reach.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from pychebyshev_tpu.ops.eval import (
    _khatri_rao,
    _split_index,
    apply_derivative_passes,
    barycentric_coefficients,
)

__all__ = ["eval_batch_dd", "eval_batch_dd_multi",
           "eval_batch_dd_models", "dd_multi_runner",
           "dd_models_runner", "supports_dd", "dd_plan",
           "pair_schedule"]

# Row factors are products of normalized barycentric rows; the Lebesgue
# bound for Chebyshev-1 grids keeps |row| < ~2.6 per dim, so a fixed
# power-of-two scale covers any 2-4 dim group.  (Quantization is
# absolute in these units; the error budget below accounts for it.)
_WR_SCALE_LOG2 = 5          # |WR| / 2^5 <= 1 for groups of <= 3 dims

# Keep digit pairs with b_r*i + b_t*j <= this.  Entrywise dropped-pair
# error ~2^-(cutoff+1) is amplified by up to K (the contracted size) in
# the dot, so the budget is cutoff >= 45-ish - log2-ish(K) for 1e-10:
# measured 3.2e-8 at cutoff 33, 9e-12 at 46, 2.4e-11 at 44 on the 11^5
# benchmark (target 1e-10; each step of 6-7 bits trades ~2 GEMMs for
# ~64x error).
_PAIR_CUTOFF = 44

# (chunk, n_right) working-set bound for the chunked lax.map runner
# (module-level so tests can shrink it to exercise the chunk path).
_CHUNK_ELEMS_TARGET = 1 << 21

# The "fast" preset for the class-level mode="fast": picked from the
# measured cutoff frontier on the 11^5 benchmark (docs/performance.md)
# as the highest-throughput point still comfortably under 1e-8.
FAST_PAIR_CUTOFF = 36


def pair_schedule(b_r: int, b_t: int, cutoff: int):
    """Digit-pair list and per-row-plane GEMM grouping for a cutoff.

    GEMMs group per row plane i: one dot against the concatenation of
    that i's allowed tensor planes — each wide row plane is read from
    HBM once instead of once per pair.  Shared by the dense, TT, and
    slider digit plans.
    """
    p_r = int(cutoff // b_r) + 1
    p_t = int(cutoff // b_t) + 1
    pairs = tuple((i, j) for i in range(p_r) for j in range(p_t)
                  if b_r * i + b_t * j <= cutoff)
    js_by_i = tuple(tuple(j for i2, j in pairs if i2 == i)
                    for i in range(p_r))
    return pairs, js_by_i


def dd_plan(shape: Sequence[int], cutoff: int = None) -> dict:
    """Static plan: group split, digit widths, GEMM pair list.

    The MXU-exactness constraint is K * 2^(b_r + b_t) < 2^24 where K is
    the contracted (right-group) size; digit widths shrink for larger
    grids and the plane counts grow to keep ~42 quantization bits.

    ``cutoff`` positions the accuracy-throughput tradeoff: digit pairs
    with b_r*i + b_t*j above it are dropped (entrywise error
    ~2^-(cutoff+1) x contraction amplification).  The measured frontier
    on the 11^5 benchmark is in docs/performance.md.
    """
    if cutoff is None:
        cutoff = _PAIR_CUTOFF
    shape = tuple(int(n) for n in shape)
    # d == 1 has no left/right split (the kernel indexes both groups),
    # and _WR_SCALE_LOG2's Lebesgue bound only covers right groups of
    # <= 3 dims — beyond that a worst-case Khatri-Rao product can
    # exceed the scaled-unit assumption and break MXU exactness.
    if len(shape) < 2:
        return {"ok": False}
    s = _split_index(shape)
    if len(shape) - s > 3:
        return {"ok": False}
    n_left = int(np.prod(shape[:s]))
    n_right = int(np.prod(shape[s:]))
    bits_budget = 24 - int(np.ceil(np.log2(n_right)))
    b_t = min(6, bits_budget - 6)
    b_r = min(7, bits_budget - b_t)
    if b_t < 4:
        return {"ok": False}
    pairs, js_by_i = pair_schedule(b_r, b_t, cutoff)
    return {"ok": True, "s": s, "n_left": n_left, "n_right": n_right,
            "b_r": b_r, "b_t": b_t,
            "p_r": int(cutoff // b_r) + 1, "p_t": int(cutoff // b_t) + 1,
            "pairs": pairs, "js_by_i": js_by_i,
            "cutoff": int(cutoff)}


def supports_dd(shape: Sequence[int], max_right: int = 1 << 14) -> bool:
    """Digit-GEMM mode applies when digit widths stay useful (>= 4 bits)
    and the right-group intermediate stays reasonable."""
    plan = dd_plan(shape)
    return bool(plan["ok"]) and plan["n_right"] <= max_right


# --- double-f32 (Dekker/Veltkamp) arithmetic --------------------------------
# The Khatri-Rao row products need ~47-bit precision, but XLA's generic
# f64 emulation on TPU is ~50x slower than f32 vector ops.  These
# error-free transformations run entirely in native f32: products of
# 12-bit Veltkamp halves are exact in f32, so (hi, lo) pairs carry
# ~2^-48 relative accuracy at a handful of VPU ops per element.

_VELTKAMP = np.float32(4097.0)  # 2^12 + 1: splits f32 into 12+12 bits


def _two_prod(a: jax.Array, b: jax.Array):
    """Exact f32 product: returns (p, e) with p + e == a*b exactly."""
    ca = a * _VELTKAMP
    ahi = ca - (ca - a)
    alo = a - ahi
    cb = b * _VELTKAMP
    bhi = cb - (cb - b)
    blo = b - bhi
    p = a * b
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def _dd_mul(ahi, alo, bhi, blo):
    """(ahi+alo) * (bhi+blo) in double-f32, renormalized."""
    p, e = _two_prod(ahi, bhi)
    e = e + (ahi * blo + alo * bhi)
    hi = p + e
    lo = e - (hi - p)
    return hi, lo


def _split_f64(x: jax.Array):
    """Lossless (hi, lo) f32 pair of a f64 array.

    Safe on TPU (unlike f32->bf16 astype splits, which XLA's
    excess-precision pass folds): f64 is represented as an f32 pair, so
    this is word extraction — measured reconstruction error exactly 0.
    """
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def _khatri_rao_dd(pairs):
    """Khatri-Rao product of per-dim (hi, lo) row pairs in double-f32.

    Replaces the f64 KR chain over the wide right group — the dominant
    cost of this mode under XLA's software f64 (measured ~3x total).
    """
    hi, lo = pairs[0]
    for nhi, nlo in pairs[1:]:
        n = hi.shape[0]
        # implicit broadcasting inside the elementwise dd chain — XLA
        # fuses (N, A, 1) x (N, 1, B) into one loop; explicit
        # broadcast_to + reshape materializes wide temporaries
        h3, l3 = _dd_mul(hi[:, :, None], lo[:, :, None],
                         nhi[:, None, :], nlo[:, None, :])
        hi = h3.reshape(n, -1)
        lo = l3.reshape(n, -1)
    return hi, lo


def _digit_planes_pair(hi: jax.Array, lo: jax.Array, bits: int,
                       planes: int) -> list:
    """Signed digit planes from a double-f32 pair (|hi+lo| <= 1).

    Returns ``planes`` bf16 arrays of integer values |p_i| <= 2^bits
    with ``hi+lo ~= sum_i p_i * 2^(-bits*(i+1))`` to ~2^-47.
    """
    base = np.float32(2.0 ** bits)
    # Fold the low f32 word in once the high word's 24 mantissa bits
    # are consumed; the add rounds at ~2^-45 in q units — inside budget.
    i_fold = 24 // bits - 1
    out = []
    r = hi                    # remainder, in units of q * 2^(bits*i)
    for i in range(planes):
        scaled = r * base     # exact: power-of-two scale
        p = jnp.round(scaled)
        r = scaled - p        # exact: |scaled| <= 2^bits, |r| <= 0.5
        if i == i_fold:
            r = r + lo * np.float32(2.0 ** (bits * (i_fold + 1)))
        out.append(p.astype(jnp.bfloat16))
    return out


def _digit_planes_tensor(qt: np.ndarray, bits: int, planes: int) -> list:
    """Digit planes of the (host, f64) scaled tensor — build-time cost."""
    out = []
    r = qt.copy()
    base = 2.0 ** bits
    for _ in range(planes):
        p = np.round(r * base)
        r = r * base - p
        out.append(p)
    return out


def dd_gemm_ladder(r_planes, tensor_planes, js_by_i, b_r, b_t,
                   width):
    """Exact digit-GEMM ladder -> (acc, comp) f32 TwoSum pair.

    Each GEMM output is an exact integer-valued f32 and the per-pair
    scale is a power of two, so every term is exactly representable in
    f32.  GEMMs run one-per-row-plane against the concatenated allowed
    tensor planes (HBM reads each wide row plane once); same-scale
    outputs pre-sum exactly in f32, then the ~25 scaled terms combine
    with branch-free TwoSum (Knuth) into a (hi, comp) pair accurate to
    ~2^-48 — a fraction of the cost of ~33 wide f64 scale-adds.
    ``width`` is the per-(i, j) output column count (n_left for the
    dense plan, 1 for the slider's concatenated vector).  Shared by
    the dense, slider, and tensor-parallel digit plans (CLAUDE.md: one
    home for the dd machinery).
    """
    by_scale = {}
    for i, js in enumerate(js_by_i):
        if not js:
            continue
        g_all = jnp.dot(r_planes[i], tensor_planes[i],
                        preferred_element_type=jnp.float32)
        for k, j in enumerate(js):
            g = jax.lax.slice_in_dim(g_all, k * width,
                                     (k + 1) * width, axis=1)
            v = b_r * (i + 1) + b_t * (j + 1)
            by_scale[v] = g if v not in by_scale else by_scale[v] + g
    acc = comp = None
    for v in sorted(by_scale):                       # largest terms first
        term = by_scale[v] * np.float32(2.0 ** -v)
        if acc is None:
            acc, comp = term, jnp.zeros_like(term)
        else:
            snew = acc + term
            bv = snew - acc
            err = (acc - (snew - bv)) + (term - bv)
            acc, comp = snew, comp + err
    return acc, comp


@functools.lru_cache(maxsize=None)
def _compiled(shape: Tuple[int, ...], n_dims: int, cutoff: int = None):
    plan = dd_plan(shape, cutoff)
    s = plan["s"]
    n_left, n_right = plan["n_left"], plan["n_right"]
    b_r, b_t = plan["b_r"], plan["b_t"]
    pairs = plan["pairs"]
    js_by_i = plan["js_by_i"]
    p_r = 1 + max(i for i, _ in pairs)
    wr_scale = np.float64(2.0 ** _WR_SCALE_LOG2)

    # Bound the (chunk, n_right) working set so the whole chunk
    # pipeline stays cache-friendly (sweeps on v5e/11^5 favored chunks
    # in the 768-2048 range; larger chunks push the wide pair
    # temporaries into HBM round-trips).
    chunk = max(512, _CHUNK_ELEMS_TARGET // max(n_right, 1))

    def _row_planes(pts, nodes, weights):
        rows = [barycentric_coefficients(pts[:, d], nodes[d], weights[d])
                for d in range(n_dims)]
        w_left = _khatri_rao(rows[:s])               # (N, nL) f64, small
        # Right group: per-dim rows are narrow (N, n_d) f64; everything
        # WIDE from here on runs in double-f32 — the f64 KR chain over
        # (N, nR) was this mode's bottleneck under XLA's software f64
        # (measured ~3x total).  The power-of-two pre-scale is exact.
        scaled_first = rows[s] * (1.0 / wr_scale)
        right_pairs = [_split_f64(scaled_first)] + \
            [_split_f64(r) for r in rows[s + 1:]]
        qhi, qlo = _khatri_rao_dd(right_pairs)
        return w_left, _digit_planes_pair(qhi, qlo, b_r, p_r)

    def _spec_value(w_left, r_planes, tensor_planes, t_scale):
        acc, comp = dd_gemm_ladder(r_planes, tensor_planes, js_by_i,
                                   b_r, b_t, n_left)
        y = (acc.astype(jnp.float64) + comp.astype(jnp.float64)) \
            * (wr_scale * t_scale)                   # (N, nL) f64
        return jnp.sum(w_left * y, axis=1)

    def _one(tensor_planes, t_scale, nodes, weights, pts):
        w_left, r_planes = _row_planes(pts, nodes, weights)
        return _spec_value(w_left, r_planes, tensor_planes, t_scale)

    def _one_multi(spec_planes, spec_scales, nodes, weights, pts):
        # M specs share ONE row-plane build (the dominant per-point
        # cost); each spec adds only its GEMM ladder.
        w_left, r_planes = _row_planes(pts, nodes, weights)
        return jnp.stack(
            [_spec_value(w_left, r_planes, tp, ts)
             for tp, ts in zip(spec_planes, spec_scales)], axis=1)

    @jax.jit
    def run(tensor_planes, t_scale, nodes, weights, points):
        n = points.shape[0]
        if n <= chunk:
            return _one(tensor_planes, t_scale, nodes, weights, points)
        pad = (-n) % chunk
        padded = jnp.pad(points, ((0, pad), (0, 0)))
        chunks = padded.reshape(-1, chunk, points.shape[1])
        out = jax.lax.map(
            lambda p: _one(tensor_planes, t_scale, nodes, weights, p),
            chunks)
        return out.reshape(-1)[:n]

    @jax.jit
    def run_multi(spec_planes, spec_scales, nodes, weights, points):
        n = points.shape[0]
        m = len(spec_planes)
        if n <= chunk:
            return _one_multi(spec_planes, spec_scales, nodes, weights,
                              points)
        pad = (-n) % chunk
        padded = jnp.pad(points, ((0, pad), (0, 0)))
        chunks = padded.reshape(-1, chunk, points.shape[1])
        out = jax.lax.map(
            lambda p: _one_multi(spec_planes, spec_scales, nodes,
                                 weights, p), chunks)
        return out.reshape(-1, m)[:n]

    return run, run_multi, plan


# Small strong-reference LRU of prepared tensor digit planes.  Keyed by
# the identity of the caller's tensor object plus the derivative orders:
# the class path passes its stable device array, so serving loops hit;
# holding the keyed tensors alive also makes identity keying sound (no
# id reuse).  Bounded, so at most _PLANE_CACHE_SLOTS tensors are pinned.
# 16 slots: a 16-piece dd-served spline keeps every piece's planes
# resident (planes are ~tens of MB each on benchmark grids — cheap
# against 16 GB HBM; the strong refs also keep identity keying sound).
_PLANE_CACHE_SLOTS = 16
_plane_cache: list = []


def _tensor_planes(tensor, diff_matrices, orders: Tuple[int, ...], plan):
    """(t_scale, per-row-plane concatenated bf16 digit planes), cached.

    Without the cache every call pays a device->host tensor readback
    (~30 ms over a relayed TPU), the host digit loops, and the re-upload.
    """
    # diff_matrices participate in the key (identity-wise): the same
    # tensor object evaluated under two different grids with orders>0
    # must not reuse the other grid's pre-differentiated planes.
    # Identity keying is only sound for IMMUTABLE operands (see
    # ops/pallas_eval): a numpy tensor mutated in place keeps its
    # identity, so only jax.Array tensors/diffs participate.
    diffs_key = tuple(diff_matrices) if any(o > 0 for o in orders) else ()
    plan_key = (plan["cutoff"], plan["b_t"])
    cacheable = all(isinstance(a, jax.Array)
                    for a in (tensor, *diffs_key))
    if cacheable:
        for i, entry in enumerate(_plane_cache):
            if (entry[0] is tensor and entry[1] == (orders, plan_key)
                    and len(entry[2]) == len(diffs_key)
                    and all(a is b for a, b in zip(entry[2], diffs_key))):
                # true LRU: refresh on hit so cyclic multi-tensor access
                # patterns (dd-served splines) keep their working set
                _plane_cache.insert(0, _plane_cache.pop(i))
                return entry[3], entry[4]

    n_left, n_right = plan["n_left"], plan["n_right"]
    b_t = plan["b_t"]
    p_t_used = 1 + max(j for _, j in plan["pairs"])

    t64 = jnp.asarray(tensor, jnp.float64)
    if any(o > 0 for o in orders):
        t64 = apply_derivative_passes(
            t64, tuple(jnp.asarray(m, jnp.float64)
                       for m in diff_matrices), orders)

    # Host-side plane build, once per (tensor, orders).  Concatenated
    # per row plane i (its allowed j planes side by side) so the jitted
    # GEMM loop reads each wide row plane exactly once.
    t_host = np.asarray(t64, dtype=np.float64).reshape(n_left, n_right)
    t_max = float(np.abs(t_host).max()) or 1.0
    t_scale = 2.0 ** np.ceil(np.log2(t_max))
    planes_host = _digit_planes_tensor(t_host.T / t_scale, b_t, p_t_used)
    tensor_planes = tuple(
        jnp.asarray(np.concatenate([planes_host[j] for j in js], axis=1),
                    jnp.bfloat16) if js else jnp.zeros((n_right, 0),
                                                       jnp.bfloat16)
        for js in plan["js_by_i"])

    if cacheable:
        _plane_cache.insert(0, (tensor, (orders, plan_key), diffs_key,
                                t_scale, tensor_planes))
        del _plane_cache[_PLANE_CACHE_SLOTS:]
    return t_scale, tensor_planes


def eval_batch_dd(tensor, nodes, weights, diff_matrices, points,
                  orders: Tuple[int, ...] = None,
                  cutoff: int = None) -> jax.Array:
    """f64-class batched evaluation via exact integer digit GEMMs.

    Same signature family as ``ops.eval.eval_batch``; returns f64
    results deviating ~1e-12 (scale-normalized) from the true f64
    path at ~14x the f64-emulation throughput on v5e.

    ``cutoff`` (default ``_PAIR_CUTOFF``) trades accuracy for
    throughput — see ``dd_plan`` and the measured frontier in
    docs/performance.md.
    """
    shape = tuple(int(n) for n in tensor.shape)
    d = len(shape)
    if orders is None:
        orders = (0,) * d
    if not supports_dd(shape):
        raise ValueError(
            f"grid shape {shape} outside digit-GEMM budget; "
            f"use ops.eval.eval_batch"
        )

    run, _, plan = _compiled(shape, d, cutoff)
    t_scale, tensor_planes = _tensor_planes(tensor, diff_matrices,
                                            tuple(orders), plan)
    pts = jnp.asarray(points, jnp.float64)
    nodes64 = tuple(jnp.asarray(nodes[k], jnp.float64) for k in range(d))
    weights64 = tuple(jnp.asarray(weights[k], jnp.float64)
                      for k in range(d))
    return run(tensor_planes, jnp.asarray(t_scale, jnp.float64),
               nodes64, weights64, pts)


def eval_batch_dd_models(tensors, nodes, weights, diff_matrices,
                         points, orders: Tuple[int, ...] = None,
                         cutoff: int = None) -> jax.Array:
    """Book-of-models digit-GEMM evaluation -> (M, N).

    The near-f64 analog of ``ops.eval.eval_batch_models``: M same-grid
    value tensors share ONE double-f32 row-plane build per bucket, each
    adding only its exact GEMM ladder.  All models are served at one
    fixed derivative spec (like the f32 book primitive).
    """
    tensors = tuple(tensors)
    if not tensors:
        raise ValueError("tensors must be a non-empty sequence")
    shape = tuple(int(n) for n in tensors[0].shape)
    d = len(shape)
    if orders is None:
        orders = (0,) * d
    orders = tuple(int(o) for o in orders)
    if any(tuple(int(n) for n in t.shape) != shape for t in tensors):
        raise ValueError("all tensors must share one grid shape")
    if not supports_dd(shape):
        raise ValueError(
            f"grid shape {shape} outside digit-GEMM budget; "
            f"use ops.eval.eval_batch_models"
        )
    return dd_models_runner(tensors, nodes, weights, diff_matrices,
                            orders, cutoff)(points)


def dd_models_runner(tensors, nodes, weights, diff_matrices, orders,
                     cutoff: int = None, mesh=None,
                     data_axis: str = "dp"):
    """Prepare-once form of :func:`eval_batch_dd_models`: returns a
    ``points -> (M, N)`` callable closing over every model's prepared
    planes.  With ``mesh``, planes replicate and points shard over
    ``data_axis``."""
    tensors = tuple(tensors)
    shape = tuple(int(n) for n in tensors[0].shape)
    d = len(shape)
    orders = tuple(int(o) for o in orders)
    _, run_multi, plan = _compiled(shape, d, cutoff)
    scales, planes = [], []
    for t in tensors:
        t_scale, tensor_planes = _tensor_planes(t, diff_matrices,
                                                orders, plan)
        scales.append(jnp.asarray(t_scale, jnp.float64))
        planes.append(tensor_planes)
    scales, planes = tuple(scales), tuple(planes)
    nodes64 = tuple(jnp.asarray(nodes[k], jnp.float64) for k in range(d))
    weights64 = tuple(jnp.asarray(weights[k], jnp.float64)
                      for k in range(d))

    if mesh is not None:
        from pychebyshev_tpu.parallel.sharding import (
            _dp_points,
            _dp_run_matrix,
            _replicated,
        )
        planes, scales, nodes64, weights64 = _replicated(
            (planes, scales, nodes64, weights64), mesh)
        fn = _dp_run_matrix(run_multi, 4, mesh, data_axis)

        def runner(points):
            pts, n, pad = _dp_points(points, mesh, data_axis)
            out = fn(planes, scales, nodes64, weights64, pts)
            return (out[:n] if pad else out).T

        return runner

    def runner(points):
        return run_multi(planes, scales, nodes64, weights64,
                         jnp.asarray(points, jnp.float64)).T

    return runner


def eval_batch_dd_multi(tensor, nodes, weights, diff_matrices, points,
                        specs, cutoff: int = None) -> jax.Array:
    """Batch x multi-spec digit-GEMM evaluation -> (N, len(specs)).

    The near-f64 analog of ``ops.eval.eval_batch_multi``: a whole Greek
    report at ~1e-11 deviation in ONE dispatch.  All specs share one
    double-f32 row-plane build (the dominant per-point cost); each spec
    adds only its ~7 exact GEMMs against its own (cached,
    pre-differentiated) tensor planes.
    """
    shape = tuple(int(n) for n in tensor.shape)
    d = len(shape)
    specs = tuple(tuple(int(o) for o in s) for s in specs)
    for s in specs:
        if len(s) != d:
            raise ValueError(
                f"spec {s} length != tensor ndim {d}")
    if not supports_dd(shape):
        raise ValueError(
            f"grid shape {shape} outside digit-GEMM budget; "
            f"use ops.eval.eval_batch_multi"
        )
    pts = jnp.asarray(points, jnp.float64)
    if not specs:
        return jnp.zeros((pts.shape[0], 0), jnp.float64)
    return dd_multi_runner(tensor, nodes, weights, diff_matrices,
                           specs, cutoff)(pts)


def dd_multi_runner(tensor, nodes, weights, diff_matrices, specs,
                    cutoff: int = None, mesh=None,
                    data_axis: str = "dp"):
    """Prepare-once form of :func:`eval_batch_dd_multi`.

    Returns a ``points -> (N, len(specs))`` callable closing over the
    prepared per-spec digit planes, so a serving engine holds its whole
    working set for its lifetime instead of depending on the bounded
    plane cache (which an M-spec x P-piece engine could thrash).

    With ``mesh``, the runner replicates the planes once and shards
    points over ``data_axis`` (explicit shard_map; the batch must
    divide the axis — serving buckets enforce this).
    """
    shape = tuple(int(n) for n in tensor.shape)
    d = len(shape)
    specs = tuple(tuple(int(o) for o in s) for s in specs)
    if not supports_dd(shape):
        raise ValueError(
            f"grid shape {shape} outside digit-GEMM budget; "
            f"use ops.eval.eval_batch_multi"
        )
    _, run_multi, plan = _compiled(shape, d, cutoff)
    spec_scales = []
    spec_planes = []
    for orders in specs:
        t_scale, tensor_planes = _tensor_planes(tensor, diff_matrices,
                                                orders, plan)
        spec_scales.append(jnp.asarray(t_scale, jnp.float64))
        spec_planes.append(tensor_planes)
    spec_scales = tuple(spec_scales)
    spec_planes = tuple(spec_planes)
    nodes64 = tuple(jnp.asarray(nodes[k], jnp.float64) for k in range(d))
    weights64 = tuple(jnp.asarray(weights[k], jnp.float64)
                      for k in range(d))

    if mesh is not None:
        from pychebyshev_tpu.parallel.sharding import (
            _dp_points,
            _dp_run_matrix,
            _replicated,
        )
        spec_planes, spec_scales, nodes64, weights64 = _replicated(
            (spec_planes, spec_scales, nodes64, weights64), mesh)
        fn = _dp_run_matrix(run_multi, 4, mesh, data_axis)

        def runner(points):
            pts, n, pad = _dp_points(points, mesh, data_axis)
            out = fn(spec_planes, spec_scales, nodes64, weights64, pts)
            return out[:n] if pad else out

        return runner

    def runner(points):
        return run_multi(spec_planes, spec_scales, nodes64, weights64,
                         jnp.asarray(points, jnp.float64))

    return runner
