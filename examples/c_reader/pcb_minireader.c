/* pcb_minireader — standalone single-file C99 reader + evaluator for
 * the PyChebyshev `.pcb` v1 binary format (ChebyshevApproximation,
 * class_tag 1).
 *
 * Mirrors the role of the reference's C example reader
 * (reference examples/binary_reader/reader.c:1-242): a dependency-free
 * program any C toolchain can build, proving the format is consumable
 * without Python.  Format spec: reference docs/user-guide/binary-format.md
 * and pychebyshev_tpu/utils/binary.py (the byte-identical writer).
 * The fuller-featured C++ library (../../cpp/) also covers splines and
 * ships a C ABI; this file is the minimal, audit-it-in-one-sitting
 * counterpart.
 *
 * Usage:
 *   pcb_minireader file.pcb --info            # dump grid metadata
 *   pcb_minireader file.pcb x0 x1 ... xd-1    # evaluate one point
 *   pcb_minireader file.pcb -                 # batch: points on stdin,
 *                                             # one whitespace-separated
 *                                             # point per line
 * Values print as %.17g and agree with the Python evaluator to ~1 ulp
 * (the two compute barycentric weights in different floating-point
 * orders; the mathematics is identical).
 *
 * Build:  cc -std=c99 -O2 -o pcb_minireader pcb_minireader.c -lm
 */

#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif

#define PCB_TOL 1e-14 /* node-coincidence tolerance, matches Python */
/* Hard cap on tensor elements (~1 GiB of f64): keeps every size_t
 * product and byte count in this file overflow-free by construction. */
#define PCB_MAX_TENSOR_ELEMS ((size_t)1 << 27)

enum pcb_status {
    PCB_OK = 0,
    PCB_ERR_IO,
    PCB_ERR_MAGIC,
    PCB_ERR_VERSION,
    PCB_ERR_RESERVED,
    PCB_ERR_CLASS,
    PCB_ERR_TRUNCATED,
    PCB_ERR_FIELD,
    PCB_ERR_OOM,
};

static const char *pcb_strerror(enum pcb_status s) {
    switch (s) {
    case PCB_OK:            return "ok";
    case PCB_ERR_IO:        return "cannot open or read file";
    case PCB_ERR_MAGIC:     return "not a .pcb file (bad magic)";
    case PCB_ERR_VERSION:   return "unsupported format major version";
    case PCB_ERR_RESERVED:  return "reserved header bytes nonzero";
    case PCB_ERR_CLASS:     return "unsupported class_tag (only "
                                   "ChebyshevApproximation = 1)";
    case PCB_ERR_TRUNCATED: return "unexpected end of file";
    case PCB_ERR_FIELD:     return "invalid field value";
    default:                return "out of memory";
    }
}

/* A loaded interpolant: grid metadata + value tensor + per-dim nodes
 * and barycentric weights regenerated from the metadata (the format
 * stores only d, domain, n_nodes, tensor). */
struct pcb_approx {
    uint32_t d;
    double *lo, *hi;       /* [d] */
    uint32_t *n;           /* [d] */
    double *tensor;        /* C-order, prod(n) values */
    double **nodes;        /* [d][n[k]] ascending, in domain coords */
    double **weights;      /* [d][n[k]] barycentric weights */
};

/* --- little-endian buffered reads ----------------------------------- */

static int rd_bytes(FILE *f, void *dst, size_t n) {
    return fread(dst, 1, n, f) == n ? 0 : -1;
}

static int rd_u32(FILE *f, uint32_t *out) {
    unsigned char b[4];
    if (rd_bytes(f, b, 4)) return -1;
    *out = (uint32_t)b[0] | (uint32_t)b[1] << 8 | (uint32_t)b[2] << 16 |
           (uint32_t)b[3] << 24;
    return 0;
}

static int rd_f64(FILE *f, double *out) {
    unsigned char b[8];
    uint64_t u = 0;
    if (rd_bytes(f, b, 8)) return -1;
    for (int i = 7; i >= 0; i--) u = u << 8 | b[i];
    memcpy(out, &u, 8); /* IEEE-754 assumed, as in the spec */
    return 0;
}

static int rd_f64_vec(FILE *f, double *dst, size_t count) {
    for (size_t i = 0; i < count; i++)
        if (rd_f64(f, &dst[i])) return -1;
    return 0;
}

/* --- grid regeneration ------------------------------------------------
 * Type-I Chebyshev nodes ascending: x_k = -cos((2k+1)pi/(2n)) mapped to
 * [lo, hi].  Weights use the same product formula as the Python library
 * (w_i = 1/prod_{j!=i}(x_i - x_j) in domain coordinates) so the rounding
 * matches the writer's own evaluator, not just the math. */

static int regen_grid(struct pcb_approx *a) {
    a->nodes = calloc(a->d, sizeof *a->nodes);
    a->weights = calloc(a->d, sizeof *a->weights);
    if (!a->nodes || !a->weights) return -1;
    for (uint32_t k = 0; k < a->d; k++) {
        uint32_t n = a->n[k];
        double *x = malloc(n * sizeof *x), *w = malloc(n * sizeof *w);
        if (!x || !w) { free(x); free(w); return -1; }
        double mid = 0.5 * (a->lo[k] + a->hi[k]);
        double half = 0.5 * (a->hi[k] - a->lo[k]);
        for (uint32_t i = 0; i < n; i++)
            x[i] = mid - half * cos((2.0 * i + 1.0) * M_PI / (2.0 * n));
        for (uint32_t i = 0; i < n; i++) {
            double p = 1.0;
            for (uint32_t j = 0; j < n; j++)
                if (j != i) p *= x[i] - x[j];
            w[i] = 1.0 / p;
            /* collapsed/crafted domains coincide nodes in f64 and the
             * weights go inf/NaN (or underflow to 0): reject the file
             * instead of answering every query with NaN. */
            if (!isfinite(w[i]) || w[i] == 0.0) {
                free(x); free(w);
                return -2;
            }
        }
        a->nodes[k] = x;
        a->weights[k] = w;
    }
    return 0;
}

/* --- parse ----------------------------------------------------------- */

static enum pcb_status pcb_load(const char *path, struct pcb_approx *a) {
    memset(a, 0, sizeof *a);
    FILE *f = fopen(path, "rb");
    if (!f) return PCB_ERR_IO;

    enum pcb_status st = PCB_OK;
    unsigned char hdr[12];
    if (rd_bytes(f, hdr, 12))                    { st = PCB_ERR_TRUNCATED; goto done; }
    if (memcmp(hdr, "PCB\0", 4) != 0)            { st = PCB_ERR_MAGIC; goto done; }
    if (hdr[4] != 1)                             { st = PCB_ERR_VERSION; goto done; }
    if (hdr[8] | hdr[9] | hdr[10] | hdr[11])     { st = PCB_ERR_RESERVED; goto done; }
    uint16_t tag = (uint16_t)(hdr[6] | hdr[7] << 8);
    if (tag != 1)                                { st = PCB_ERR_CLASS; goto done; }

    if (rd_u32(f, &a->d))                        { st = PCB_ERR_TRUNCATED; goto done; }
    if (a->d < 1 || a->d > 64)                   { st = PCB_ERR_FIELD; goto done; }

    a->lo = malloc(a->d * sizeof *a->lo);
    a->hi = malloc(a->d * sizeof *a->hi);
    a->n = malloc(a->d * sizeof *a->n);
    if (!a->lo || !a->hi || !a->n)               { st = PCB_ERR_OOM; goto done; }
    if (rd_f64_vec(f, a->lo, a->d) ||
        rd_f64_vec(f, a->hi, a->d))              { st = PCB_ERR_TRUNCATED; goto done; }

    size_t total = 1;
    for (uint32_t k = 0; k < a->d; k++) {
        if (rd_u32(f, &a->n[k]))                 { st = PCB_ERR_TRUNCATED; goto done; }
        if (a->n[k] < 1 || a->n[k] > 100000)     { st = PCB_ERR_FIELD; goto done; }
        if (a->lo[k] >= a->hi[k])                { st = PCB_ERR_FIELD; goto done; }
        /* Reject before multiplying: the per-dim guards alone still
         * allow the size_t product (and the later *8 byte count) to
         * wrap, which would under-allocate and let file bytes be
         * written past the block.  Cap total elements so total*8 can
         * never overflow and allocations stay sane. */
        if (total > PCB_MAX_TENSOR_ELEMS / a->n[k]) { st = PCB_ERR_FIELD; goto done; }
        total *= a->n[k];
    }
    a->tensor = malloc(total * sizeof *a->tensor);
    if (!a->tensor)                              { st = PCB_ERR_OOM; goto done; }
    if (rd_f64_vec(f, a->tensor, total))         { st = PCB_ERR_TRUNCATED; goto done; }
    if (fgetc(f) != EOF)                         { st = PCB_ERR_FIELD; goto done; }

    {
        int rg = regen_grid(a);
        if (rg == -2)                            { st = PCB_ERR_FIELD; goto done; }
        if (rg)                                  { st = PCB_ERR_OOM; goto done; }
    }
done:
    fclose(f);
    return st;
}

static void pcb_free(struct pcb_approx *a) {
    if (a->nodes)
        for (uint32_t k = 0; k < a->d; k++) free(a->nodes[k]);
    if (a->weights)
        for (uint32_t k = 0; k < a->d; k++) free(a->weights[k]);
    free(a->nodes); free(a->weights);
    free(a->lo); free(a->hi); free(a->n); free(a->tensor);
}

/* --- evaluate ---------------------------------------------------------
 * Collapse the trailing axis repeatedly: with the tensor viewed as
 * (rows, n_last), replace each row by its normalized barycentric
 * combination at x[last].  After d collapses one scalar remains.  This
 * is the Python `vectorized_eval` contraction order. */

static double pcb_eval(const struct pcb_approx *a, const double *x,
                       double *scratch) {
    size_t rows = 1;
    for (uint32_t k = 0; k + 1 < a->d; k++) rows *= a->n[k];
    memcpy(scratch, a->tensor, rows * a->n[a->d - 1] * sizeof(double));

    for (uint32_t k = a->d; k-- > 0;) {
        uint32_t n = a->n[k];
        const double *xs = a->nodes[k], *ws = a->weights[k];
        double coef[4096]; /* n <= 100000 guarded; stack for n<=4096 */
        double *c = coef;
        if (n > 4096) {
            c = malloc(n * sizeof *c);
            if (!c) return NAN; /* allocation failure surfaces as nan */
        }

        int exact = -1;
        for (uint32_t i = 0; i < n; i++)
            if (fabs(x[k] - xs[i]) < PCB_TOL) { exact = (int)i; break; }
        if (exact >= 0) {
            for (uint32_t i = 0; i < n; i++) c[i] = 0.0;
            c[exact] = 1.0;
        } else {
            double s = 0.0;
            for (uint32_t i = 0; i < n; i++) {
                c[i] = ws[i] / (x[k] - xs[i]);
                s += c[i];
            }
            for (uint32_t i = 0; i < n; i++) c[i] /= s;
        }
        for (size_t r = 0; r < rows; r++) {
            double acc = 0.0;
            for (uint32_t i = 0; i < n; i++)
                acc += scratch[r * n + i] * c[i];
            scratch[r] = acc;
        }
        if (c != coef) free(c);
        rows = k ? rows / a->n[k - 1] : 1;
        /* next iteration treats scratch as (rows/n_{k-1}, n_{k-1}) */
    }
    return scratch[0];
}

/* --- CLI -------------------------------------------------------------- */

static int usage(const char *argv0) {
    fprintf(stderr,
            "usage: %s file.pcb --info | x0 x1 ... | -\n"
            "  --info  print dimensions, domain, n_nodes\n"
            "  x...    evaluate at one point (d coordinates)\n"
            "  -       read points from stdin, one per line\n", argv0);
    return 2;
}

int main(int argc, char **argv) {
    if (argc < 3) return usage(argv[0]);

    struct pcb_approx a;
    enum pcb_status st = pcb_load(argv[1], &a);
    if (st != PCB_OK) {
        fprintf(stderr, "%s: %s\n", argv[1], pcb_strerror(st));
        return 1;
    }

    size_t total = 1;
    for (uint32_t k = 0; k < a.d; k++) total *= a.n[k]; /* validated by pcb_load */
    double *scratch = malloc(total * sizeof *scratch);
    double *pt = malloc(a.d * sizeof *pt);
    if (!scratch || !pt) {
        fprintf(stderr, "%s: %s\n", argv[1], pcb_strerror(PCB_ERR_OOM));
        free(scratch); free(pt); pcb_free(&a);
        return 1;
    }
    int rc = 0;

    if (strcmp(argv[2], "--info") == 0) {
        printf("class: ChebyshevApproximation (tag 1)\n");
        printf("dimensions: %u\n", a.d);
        for (uint32_t k = 0; k < a.d; k++)
            printf("dim %u: n=%u domain=[%.17g, %.17g]\n", k, a.n[k],
                   a.lo[k], a.hi[k]);
        printf("tensor values: %zu\n", total);
    } else if (strcmp(argv[2], "-") == 0) {
        for (;;) {
            uint32_t got = 0;
            while (got < a.d && scanf("%lf", &pt[got]) == 1) got++;
            if (got == 0) {
                if (!feof(stdin)) {
                    /* a non-numeric token at a point boundary is bad
                     * input, not end-of-input: report it, don't
                     * silently drop the rest of the stream. */
                    fprintf(stderr, "stdin: malformed token at point "
                            "boundary\n");
                    rc = 1;
                }
                break;
            }
            if (got < a.d) {
                fprintf(stderr, "stdin: incomplete point (%u of %u "
                        "coordinates)\n", got, a.d);
                rc = 1;
                break;
            }
            printf("%.17g\n", pcb_eval(&a, pt, scratch));
        }
    } else {
        if ((uint32_t)(argc - 2) != a.d) {
            fprintf(stderr, "expected %u coordinates, got %d\n", a.d,
                    argc - 2);
            rc = 1;
        } else {
            for (uint32_t k = 0; k < a.d; k++) {
                char *end;
                pt[k] = strtod(argv[2 + k], &end);
                if (end == argv[2 + k] || *end) {
                    fprintf(stderr, "coordinate %u is not a number: "
                            "'%s'\n", k, argv[2 + k]);
                    rc = 1;
                    break;
                }
            }
            if (rc == 0)
                printf("%.17g\n", pcb_eval(&a, pt, scratch));
        }
    }

    free(scratch); free(pt); pcb_free(&a);
    return rc;
}
