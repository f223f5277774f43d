/* hosteval.c — C fast path for single-point barycentric evaluation.
 *
 * The Python library serves single queries on the host (dispatching one
 * point through the device would pay jit + tunnel latency); the NumPy
 * implementation (`models/approximation.py:_host_single_eval`) spends
 * roughly half its ~100 us on interpreter / ufunc call overhead.  This
 * file fuses the whole query — barycentric coefficient rows, derivative
 * folds, and the highest-dim-first GEMV chain — into one C call, which
 * is memory-bound on the single pass over the value tensor.
 *
 * Semantics mirror the reference's `vectorized_eval`
 * (reference barycentric.py:885-949): per dim the row is
 * w_i/(x-x_i) normalized by its sum, a coordinate within
 * `coincidence_tol` of its nearest node yields a one-hot row, and a
 * derivative of order k folds as row <- (D^T)^k row.  Summation order
 * differs from NumPy's pairwise reduction by O(1 ulp), well inside the
 * library's 1e-12 parity contract.
 *
 * Pure C99, no Python dependency — loaded via ctypes
 * (pychebyshev_tpu/utils/ceval.py).
 */

#include <math.h>
#include <stddef.h>
#include <stdint.h>

#define PCH_MAX_NODES 4096

static int build_row(const double *xs, const double *ws, int32_t n,
                     double x, double tol, double *row);
static void collapse_axis(const double *src, int64_t m, int32_t n,
                          const double *restrict row, double *restrict dst);

/* Evaluate one point against a C-order value tensor.
 *
 *   tensor   : flattened C-order grid values, prod(ns) doubles
 *   d        : number of dimensions (>= 1)
 *   ns       : per-dim node counts
 *   nodes    : per-dim node arrays (ascending), nodes[k] has ns[k] entries
 *   weights  : per-dim barycentric weights
 *   diffs_t  : per-dim TRANSPOSED differentiation matrices (ns[k] x ns[k],
 *              C-order), may be NULL when every order is zero
 *   point    : query coordinates, d doubles
 *   orders   : per-dim derivative orders (may be NULL for all-zero)
 *   tol      : node-coincidence tolerance (library: 1e-14)
 *   work     : scratch, >= prod(ns)/ns[d-1] doubles
 *   rowbuf   : scratch, >= 2*max(ns) doubles
 *   out      : receives the value
 *
 * Returns 0 on success, nonzero on unusable arguments (caller falls back
 * to the NumPy path).
 */
int pch_eval_single(const double *tensor,
                    int32_t d,
                    const int32_t *ns,
                    const double *const *nodes,
                    const double *const *weights,
                    const double *const *diffs_t,
                    const double *point,
                    const int32_t *orders,
                    double tol,
                    double *work,
                    double *rowbuf,
                    double *out)
{
    if (!tensor || d < 1 || !ns || !nodes || !weights || !point ||
        !work || !rowbuf || !out)
        return 1;

    int64_t total = 1;
    int32_t n_max = 0;
    for (int32_t k = 0; k < d; ++k) {
        if (ns[k] < 1 || ns[k] > PCH_MAX_NODES)
            return 2;
        total *= ns[k];
        if (ns[k] > n_max)
            n_max = ns[k];
    }

    double *row = rowbuf;          /* current coefficient row */
    double *tmp = rowbuf + n_max;  /* derivative-fold scratch  */

    /* Contract highest dim first: each step collapses the last axis of
     * the current C-order block with that dim's coefficient row.  The
     * first step streams the full tensor once (the memory-bound part);
     * later steps run in place on `work` (out[i] touches work[i*n..],
     * and i <= i*n, so forward writes never clobber pending reads). */
    const double *src = tensor;
    int64_t m = total;
    for (int32_t k = d - 1; k >= 0; --k) {
        const int32_t n = ns[k];

        const int rc = build_row(nodes[k], weights[k], n, point[k], tol,
                                 row);
        if (rc)
            return rc; /* degenerate weights: NumPy path decides */

        /* derivative folds: row <- (D^T)^order row */
        if (orders && orders[k] > 0) {
            if (!diffs_t || !diffs_t[k])
                return 4;
            const double *dt = diffs_t[k];
            for (int32_t rep = 0; rep < orders[k]; ++rep) {
                for (int32_t i = 0; i < n; ++i) {
                    double acc = 0.0;
                    const double *mrow = dt + (int64_t)i * n;
                    for (int32_t j = 0; j < n; ++j)
                        acc += mrow[j] * row[j];
                    tmp[i] = acc;
                }
                for (int32_t i = 0; i < n; ++i)
                    row[i] = tmp[i];
            }
        }

        m /= n;
        collapse_axis(src, m, n, row, work);
        src = work;
    }

    *out = work[0];
    return 0;
}

/* Build the normalized barycentric row for one dim into `row`.
 * Returns 0, or 3 on degenerate weights (caller falls back). */
static int build_row(const double *xs, const double *ws, int32_t n,
                     double x, double tol, double *row)
{
    int32_t nearest = 0;
    double best = HUGE_VAL;
    double denom = 0.0;
    for (int32_t i = 0; i < n; ++i) {
        const double gap = x - xs[i];
        const double ag = fabs(gap);
        if (ag < best) {
            best = ag;
            nearest = i;
        }
        const double r = ws[i] / gap;
        row[i] = r;
        denom += r;
    }
    if (best < tol) {
        for (int32_t i = 0; i < n; ++i)
            row[i] = 0.0;
        row[nearest] = 1.0;
        return 0;
    }
    if (denom == 0.0 || !isfinite(denom))
        return 3;
    for (int32_t i = 0; i < n; ++i)
        row[i] /= denom;
    return 0;
}

/* out[i] = dot(src[i*n .. i*n+n), row) for i in [0, m). */
static void collapse_axis(const double *src, int64_t m, int32_t n,
                          const double *restrict row, double *restrict dst)
{
    for (int64_t i = 0; i < m; ++i) {
        const double *restrict blk = src + i * n;
        double a0 = 0.0, a1 = 0.0, a2 = 0.0, a3 = 0.0;
        int32_t j = 0;
        for (; j + 4 <= n; j += 4) {
            a0 += blk[j] * row[j];
            a1 += blk[j + 1] * row[j + 1];
            a2 += blk[j + 2] * row[j + 2];
            a3 += blk[j + 3] * row[j + 3];
        }
        for (; j < n; ++j)
            a0 += blk[j] * row[j];
        dst[i] = (a0 + a1) + (a2 + a3);
    }
}

#define PCH_MAX_SPECS 64
#define PCH_MAX_ORDER 16

/* Multi-spec evaluation at one point with suffix-shared contractions.
 *
 * Evaluates `nspec` derivative specs (orders matrix, C-order nspec x d)
 * against the same tensor, contracting highest dim first and sharing
 * every partial contraction between specs whose trailing orders agree —
 * a full Greek report costs only as many full-tensor passes as there
 * are distinct orders in the LAST dim (the Python suffix-memoized path
 * in models/approximation.py:vectorized_eval_multi, fused into C).
 *
 *   arena : scratch, >= 2 * nspec * (prod(ns)/ns[d-1]) doubles
 *   rows  : scratch, >= (PCH_MAX_ORDER + 2) * max(ns) doubles
 *   out   : nspec doubles
 */
int pch_eval_multi(const double *tensor,
                   int32_t d,
                   const int32_t *ns,
                   const double *const *nodes,
                   const double *const *weights,
                   const double *const *diffs_t,
                   const double *point,
                   const int32_t *orders,
                   int32_t nspec,
                   double tol,
                   double *arena,
                   double *rows,
                   double *out)
{
    if (!tensor || d < 1 || !ns || !nodes || !weights || !point ||
        !orders || nspec < 1 || nspec > PCH_MAX_SPECS || !arena ||
        !rows || !out)
        return 1;

    int64_t total = 1;
    int32_t n_max = 0;
    for (int32_t k = 0; k < d; ++k) {
        if (ns[k] < 1 || ns[k] > PCH_MAX_NODES)
            return 2;
        total *= ns[k];
        if (ns[k] > n_max)
            n_max = ns[k];
    }

    const int64_t half = (int64_t)nspec * (total / ns[d - 1]);
    double *cur_half = arena;
    double *nxt_half = arena + half;
    double *tmp = rows + (int64_t)(PCH_MAX_ORDER + 1) * n_max;

    /* Which buffer each spec currently reads from; -1 = the tensor. */
    int32_t spec_buf[PCH_MAX_SPECS];
    int32_t child_parent[PCH_MAX_SPECS];
    int32_t child_order[PCH_MAX_SPECS];
    for (int32_t s = 0; s < nspec; ++s)
        spec_buf[s] = -1;

    int64_t m = total;
    for (int32_t k = d - 1; k >= 0; --k) {
        const int32_t n = ns[k];

        /* Derivative-folded rows for every order used at this dim. */
        int32_t max_o = 0;
        for (int32_t s = 0; s < nspec; ++s) {
            const int32_t o = orders[(int64_t)s * d + k];
            if (o < 0 || o > PCH_MAX_ORDER)
                return 5;
            if (o > max_o)
                max_o = o;
        }
        const int rc = build_row(nodes[k], weights[k], n, point[k], tol,
                                 rows);
        if (rc)
            return rc;
        if (max_o > 0) {
            if (!diffs_t || !diffs_t[k])
                return 4;
            const double *dt = diffs_t[k];
            for (int32_t o = 1; o <= max_o; ++o) {
                const double *prev = rows + (int64_t)(o - 1) * n_max;
                double *dst = rows + (int64_t)o * n_max;
                for (int32_t i = 0; i < n; ++i) {
                    double acc = 0.0;
                    const double *mrow = dt + (int64_t)i * n;
                    for (int32_t j = 0; j < n; ++j)
                        acc += mrow[j] * prev[j];
                    tmp[i] = acc;
                }
                for (int32_t i = 0; i < n; ++i)
                    dst[i] = tmp[i];
            }
        }

        /* One contraction per distinct (parent buffer, order) pair. */
        m /= n;
        int32_t n_children = 0;
        for (int32_t s = 0; s < nspec; ++s) {
            const int32_t o = orders[(int64_t)s * d + k];
            const int32_t p = spec_buf[s];
            int32_t c = -1;
            for (int32_t t = 0; t < n_children; ++t) {
                if (child_parent[t] == p && child_order[t] == o) {
                    c = t;
                    break;
                }
            }
            if (c < 0) {
                c = n_children++;
                child_parent[c] = p;
                child_order[c] = o;
                const double *src = (p < 0) ? tensor : cur_half + p * (m * n);
                collapse_axis(src, m, n, rows + (int64_t)o * n_max,
                              nxt_half + c * m);
            }
            spec_buf[s] = c;
        }
        double *swap = cur_half;
        cur_half = nxt_half;
        nxt_half = swap;
    }

    for (int32_t s = 0; s < nspec; ++s)
        out[s] = cur_half[spec_buf[s]];
    return 0;
}

#define PCH_MAX_RANK 1024

/* Single-point tensor-train evaluation (Chebyshev coefficient cores).
 *
 * Mirrors the Python storage-frame chain
 * (models/tensor_train.py:_eval_storage_frame): per dim, scale the
 * coordinate to [-1, 1], run the T_0..T_{n-1} recurrence, contract the
 * (r_l, n, r_r) core with the polynomial row and chain-multiply the
 * running (1, r) row vector.  O(sum r_l*n*r_r) — microseconds against
 * the Python loop's interpreter overhead.
 *
 *   cores   : d core pointers, each C-order (ranks[k], ns[k], ranks[k+1])
 *   ranks   : d+1 bond ranks (ranks[0] == ranks[d] == 1)
 *   domain  : C-order (d, 2) lo/hi pairs
 *   scratch : >= max(ns) + 2*max(ranks) + max(ns)*max(ranks) doubles
 */
int pch_tt_eval(const double *const *cores,
                int32_t d,
                const int32_t *ns,
                const int32_t *ranks,
                const double *domain,
                const double *point,
                double *scratch,
                double *out)
{
    if (!cores || d < 1 || !ns || !ranks || !domain || !point ||
        !scratch || !out)
        return 1;
    if (ranks[0] != 1 || ranks[d] != 1)
        return 2;
    int32_t n_max = 0, r_max = 1;
    for (int32_t k = 0; k < d; ++k) {
        if (ns[k] < 1 || ns[k] > PCH_MAX_NODES ||
            ranks[k] < 1 || ranks[k] > PCH_MAX_RANK)
            return 2;
        if (ns[k] > n_max)
            n_max = ns[k];
        if (ranks[k] > r_max)
            r_max = ranks[k];
    }

    double *q = scratch;                    /* n_max            */
    double *row = q + n_max;                /* r_max            */
    double *row_new = row + r_max;          /* r_max            */
    double *tmp = row_new + r_max;          /* n_max * r_max    */

    row[0] = 1.0;
    for (int32_t k = 0; k < d; ++k) {
        const int32_t n = ns[k];
        const int32_t rl = ranks[k];
        const int32_t rr = ranks[k + 1];
        const double lo = domain[2 * k];
        const double hi = domain[2 * k + 1];
        const double x = 2.0 * (point[k] - lo) / (hi - lo) - 1.0;

        q[0] = 1.0;
        if (n > 1)
            q[1] = x;
        for (int32_t j = 2; j < n; ++j)
            q[j] = 2.0 * x * q[j - 1] - q[j - 2];

        /* tmp[j, r] = sum_i row[i] * core[i, j, r] (axpy over planes) */
        const int64_t plane = (int64_t)n * rr;
        const double *core = cores[k];
        for (int64_t t = 0; t < plane; ++t)
            tmp[t] = row[0] * core[t];
        for (int32_t i = 1; i < rl; ++i) {
            const double ri = row[i];
            const double *restrict cp = core + (int64_t)i * plane;
            for (int64_t t = 0; t < plane; ++t)
                tmp[t] += ri * cp[t];
        }
        /* row_new[r] = sum_j q[j] * tmp[j, r] */
        for (int32_t r = 0; r < rr; ++r)
            row_new[r] = q[0] * tmp[r];
        for (int32_t j = 1; j < n; ++j) {
            const double qj = q[j];
            const double *restrict tp = tmp + (int64_t)j * rr;
            for (int32_t r = 0; r < rr; ++r)
                row_new[r] += qj * tp[r];
        }
        double *swap = row;
        row = row_new;
        row_new = swap;
    }

    *out = row[0];
    return 0;
}

/* Batched variant over the same grid: npts points, C-order (npts, d).
 * Used by host paths that loop small batches (e.g. multi-spec sharing);
 * each point is independent.  orders applies to every point. */
int pch_eval_batch(const double *tensor,
                   int32_t d,
                   const int32_t *ns,
                   const double *const *nodes,
                   const double *const *weights,
                   const double *const *diffs_t,
                   const double *points,
                   int64_t npts,
                   const int32_t *orders,
                   double tol,
                   double *work,
                   double *rowbuf,
                   double *out)
{
    for (int64_t p = 0; p < npts; ++p) {
        const int rc = pch_eval_single(tensor, d, ns, nodes, weights,
                                       diffs_t, points + p * d, orders,
                                       tol, work, rowbuf, out + p);
        if (rc)
            return rc;
    }
    return 0;
}
