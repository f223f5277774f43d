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
        const double *xs = nodes[k];
        const double *ws = weights[k];
        const double x = point[k];

        /* --- barycentric coefficient row for dim k --- */
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
        } else {
            if (denom == 0.0 || !isfinite(denom))
                return 3; /* degenerate weights: NumPy path decides */
            /* true division (not reciprocal-multiply): keeps each lane
             * bit-identical to the NumPy path's `raw / raw.sum()` */
            for (int32_t i = 0; i < n; ++i)
                row[i] /= denom;
        }

        /* --- derivative folds: row <- (D^T)^k row --- */
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

        /* --- collapse the last axis ---
         * Four accumulators break the FMA latency chain so the first
         * (full-tensor) pass runs at streaming bandwidth instead of
         * serial-reduction latency. */
        m /= n;
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
            work[i] = (a0 + a1) + (a2 + a3);
        }
        src = work;
    }

    *out = work[0];
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
