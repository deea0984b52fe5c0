/* Implementation of the minimal GSL shim (see gsl_shim.h).
 *
 * The eigensolver is a cyclic Jacobi rotation scheme — adequate and
 * accurate for the tiny symmetric matrices the reference CSS kernel
 * decomposes (m = asize+bsize, ~21 for the stickleback panel).  dgemm
 * is a naive triple loop: css.c only multiplies m x m matrices with
 * m ~ 21, far off any BLAS-relevant scale, and the multiply is outside
 * the reference's hot Monte-Carlo loop (css.c:727-752 calls css(), not
 * cmds()), so baseline timings are not distorted.
 */
#include "gsl_shim.h"

#include <math.h>
#include <stdlib.h>
#include <string.h>

gsl_matrix_view gsl_matrix_view_array(double *base, size_t n1, size_t n2) {
    gsl_matrix_view v;
    v.matrix.size1 = n1;
    v.matrix.size2 = n2;
    v.matrix.tda = n2;
    v.matrix.data = base;
    return v;
}

gsl_matrix *gsl_matrix_alloc(size_t n1, size_t n2) {
    gsl_matrix *m = (gsl_matrix *)malloc(sizeof(gsl_matrix));
    m->size1 = n1;
    m->size2 = n2;
    m->tda = n2;
    m->data = (double *)malloc(n1 * n2 * sizeof(double));
    return m;
}

void gsl_matrix_free(gsl_matrix *m) {
    if (m) {
        free(m->data);
        free(m);
    }
}

gsl_vector_view gsl_matrix_column(gsl_matrix *m, size_t j) {
    gsl_vector_view v;
    v.vector.size = m->size1;
    v.vector.stride = m->tda;
    v.vector.data = m->data + j;
    return v;
}

gsl_vector *gsl_vector_alloc(size_t n) {
    gsl_vector *v = (gsl_vector *)malloc(sizeof(gsl_vector));
    v->size = n;
    v->stride = 1;
    v->data = (double *)malloc(n * sizeof(double));
    return v;
}

void gsl_vector_free(gsl_vector *v) {
    if (v) {
        free(v->data);
        free(v);
    }
}

double gsl_vector_get(const gsl_vector *v, size_t i) {
    return v->data[i * v->stride];
}

int gsl_blas_dgemm(CBLAS_TRANSPOSE_t ta, CBLAS_TRANSPOSE_t tb, double alpha,
                   const gsl_matrix *A, const gsl_matrix *B, double beta,
                   gsl_matrix *C) {
    /* css.c:427 only ever calls the NoTrans/NoTrans form. */
    size_t i, j, k;
    size_t m = C->size1, p = C->size2, n = A->size2;
    (void)ta;
    (void)tb;
    for (i = 0; i < m; i++) {
        for (j = 0; j < p; j++) {
            double acc = 0.0;
            for (k = 0; k < n; k++) {
                acc += A->data[i * A->tda + k] * B->data[k * B->tda + j];
            }
            /* BLAS semantics: beta == 0 means C is WRITE-ONLY — it must
             * not be read, so inf/NaN left in C by an earlier window of
             * the reference's reused scratch matrices cannot poison
             * this product (0.0 * NaN would be NaN).  Real GSL/BLAS
             * conforms; the reference relies on it (css.c reuses X/tmp
             * across windows, and a genuinely-negative second CMDS
             * eigenvalue legitimately NaNs one window's X). */
            C->data[i * C->tda + j] =
                (beta == 0.0)
                    ? alpha * acc
                    : alpha * acc + beta * C->data[i * C->tda + j];
        }
    }
    return 0;
}

gsl_eigen_symmv_workspace *gsl_eigen_symmv_alloc(size_t n) {
    gsl_eigen_symmv_workspace *w =
        (gsl_eigen_symmv_workspace *)malloc(sizeof(*w));
    w->n = n;
    return w;
}

void gsl_eigen_symmv_free(gsl_eigen_symmv_workspace *w) { free(w); }

int gsl_eigen_symmv(gsl_matrix *A, gsl_vector *eval, gsl_matrix *evec,
                    gsl_eigen_symmv_workspace *w) {
    /* Cyclic Jacobi on a private copy of A (real GSL destroys A's lower
     * triangle; the reference never reads A afterwards, css.c:538). */
    size_t n = A->size1;
    size_t i, j, p, q, sweep;
    double *a = (double *)malloc(n * n * sizeof(double));
    double *v = evec->data;
    (void)w;

    for (i = 0; i < n; i++)
        for (j = 0; j < n; j++) a[i * n + j] = A->data[i * A->tda + j];

    /* evec starts as identity */
    memset(v, 0, n * n * sizeof(double));
    for (i = 0; i < n; i++) v[i * evec->tda + i] = 1.0;

    for (sweep = 0; sweep < 128; sweep++) {
        double off = 0.0;
        for (p = 0; p < n; p++)
            for (q = p + 1; q < n; q++) off += a[p * n + q] * a[p * n + q];
        if (off < 1e-22) break;

        for (p = 0; p < n; p++) {
            for (q = p + 1; q < n; q++) {
                double apq = a[p * n + q];
                double app, aqq, theta, t, c, s;
                if (fabs(apq) < 1e-300) continue;
                app = a[p * n + p];
                aqq = a[q * n + q];
                theta = (aqq - app) / (2.0 * apq);
                t = (theta >= 0.0)
                        ? 1.0 / (theta + sqrt(1.0 + theta * theta))
                        : 1.0 / (theta - sqrt(1.0 + theta * theta));
                c = 1.0 / sqrt(1.0 + t * t);
                s = t * c;
                for (i = 0; i < n; i++) {
                    double aip = a[i * n + p], aiq = a[i * n + q];
                    a[i * n + p] = c * aip - s * aiq;
                    a[i * n + q] = s * aip + c * aiq;
                }
                for (i = 0; i < n; i++) {
                    double api = a[p * n + i], aqi = a[q * n + i];
                    a[p * n + i] = c * api - s * aqi;
                    a[q * n + i] = s * api + c * aqi;
                }
                for (i = 0; i < n; i++) {
                    double vip = v[i * evec->tda + p],
                           viq = v[i * evec->tda + q];
                    v[i * evec->tda + p] = c * vip - s * viq;
                    v[i * evec->tda + q] = s * vip + c * viq;
                }
            }
        }
    }

    for (i = 0; i < n; i++) eval->data[i * eval->stride] = a[i * n + i];
    free(a);
    return 0;
}

int gsl_eigen_symmv_sort(gsl_vector *eval, gsl_matrix *evec,
                         gsl_eigen_sort_t sort_type) {
    /* Selection sort + column swap; css.c:541 uses VAL_DESC only. */
    size_t n = eval->size;
    size_t i, j, best, r;
    for (i = 0; i < n; i++) {
        best = i;
        for (j = i + 1; j < n; j++) {
            double vj = eval->data[j * eval->stride];
            double vb = eval->data[best * eval->stride];
            int better = (sort_type == GSL_EIGEN_SORT_VAL_DESC) ? (vj > vb)
                                                                : (vj < vb);
            if (better) best = j;
        }
        if (best != i) {
            double tmp = eval->data[i * eval->stride];
            eval->data[i * eval->stride] = eval->data[best * eval->stride];
            eval->data[best * eval->stride] = tmp;
            for (r = 0; r < evec->size1; r++) {
                double t = evec->data[r * evec->tda + i];
                evec->data[r * evec->tda + i] =
                    evec->data[r * evec->tda + best];
                evec->data[r * evec->tda + best] = t;
            }
        }
    }
    return 0;
}
