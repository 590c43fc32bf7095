/* Implementation of the minimal GSL-compatible shim (see
 * gsl/gsl_shim_core.h).  Original code; standard textbook algorithms:
 *   - LU decomposition with partial pivoting + back substitution
 *   - adaptive Gauss-Legendre integration (G10 vs G21 error estimate)
 *   - Brent's bracketing root finder
 *   - Knuth's subtractive lagged-Fibonacci generator ("ran3")
 *   - Debye functions by direct numerical integration
 */
#include "gsl/gsl_shim_core.h"

#include <cmath>
#include <cstdio>
#include <cstring>
#include <vector>

/* ------------------------------------------------------------------ */
/* error handling                                                      */
/* ------------------------------------------------------------------ */
static gsl_error_handler_t *g_handler = nullptr;

gsl_error_handler_t *gsl_set_error_handler(gsl_error_handler_t *new_handler) {
  gsl_error_handler_t *old = g_handler;
  g_handler = new_handler;
  return old;
}

gsl_error_handler_t *gsl_set_error_handler_off(void) {
  return gsl_set_error_handler(nullptr);
}

const char *gsl_strerror(int gsl_errno) {
  switch (gsl_errno) {
    case GSL_SUCCESS:
      return "success";
    case GSL_CONTINUE:
      return "iteration has not converged";
    case GSL_EDOM:
      return "domain error";
    case GSL_ERANGE:
      return "range error";
    case GSL_EINVAL:
      return "invalid argument";
    case GSL_EMAXITER:
      return "exceeded max number of iterations";
    case GSL_EROUND:
      return "roundoff error prevents tolerance from being achieved";
    case GSL_ESING:
      return "apparent singularity detected";
    case GSL_EDIVERGE:
      return "integral or series is divergent";
    default:
      return "unknown error";
  }
}

void gsl_shim_error(const char *reason, const char *file, int line,
                    int gsl_errno) {
  if (g_handler != nullptr) {
    g_handler(reason, file, line, gsl_errno);
  }
  /* default handler: warn but do not abort (validation runs want the
   * best-effort result, matching the reference's downgraded handler) */
}

/* ------------------------------------------------------------------ */
/* vectors                                                             */
/* ------------------------------------------------------------------ */
gsl_vector *gsl_vector_alloc(size_t n) {
  gsl_block *b = (gsl_block *)malloc(sizeof(gsl_block));
  b->size = n;
  b->data = (double *)malloc(n * sizeof(double));
  gsl_vector *v = (gsl_vector *)malloc(sizeof(gsl_vector));
  v->size = n;
  v->stride = 1;
  v->data = b->data;
  v->block = b;
  v->owner = 1;
  return v;
}

gsl_vector *gsl_vector_calloc(size_t n) {
  gsl_vector *v = gsl_vector_alloc(n);
  memset(v->data, 0, n * sizeof(double));
  return v;
}

void gsl_vector_free(gsl_vector *v) {
  if (v == nullptr) return;
  if (v->owner && v->block != nullptr) {
    free(v->block->data);
    free(v->block);
  }
  free(v);
}

void gsl_vector_set_zero(gsl_vector *v) {
  for (size_t i = 0; i < v->size; i++) v->data[i * v->stride] = 0.0;
}

void gsl_vector_set_all(gsl_vector *v, double x) {
  for (size_t i = 0; i < v->size; i++) v->data[i * v->stride] = x;
}

int gsl_vector_memcpy(gsl_vector *dest, const gsl_vector *src) {
  for (size_t i = 0; i < src->size; i++)
    dest->data[i * dest->stride] = src->data[i * src->stride];
  return GSL_SUCCESS;
}

int gsl_vector_add(gsl_vector *a, const gsl_vector *b) {
  for (size_t i = 0; i < a->size; i++)
    a->data[i * a->stride] += b->data[i * b->stride];
  return GSL_SUCCESS;
}

int gsl_vector_mul(gsl_vector *a, const gsl_vector *b) {
  for (size_t i = 0; i < a->size; i++)
    a->data[i * a->stride] *= b->data[i * b->stride];
  return GSL_SUCCESS;
}

int gsl_vector_scale(gsl_vector *a, double x) {
  for (size_t i = 0; i < a->size; i++) a->data[i * a->stride] *= x;
  return GSL_SUCCESS;
}

int gsl_vector_isnonneg(const gsl_vector *v) {
  for (size_t i = 0; i < v->size; i++)
    if (v->data[i * v->stride] < 0.0) return 0;
  return 1;
}

gsl_vector_view gsl_vector_view_array(double *base, size_t n) {
  gsl_vector_view view;
  view.vector.size = n;
  view.vector.stride = 1;
  view.vector.data = base;
  view.vector.block = nullptr;
  view.vector.owner = 0;
  return view;
}

gsl_vector_view gsl_vector_subvector(gsl_vector *v, size_t offset, size_t n) {
  gsl_vector_view view;
  view.vector.size = n;
  view.vector.stride = v->stride;
  view.vector.data = v->data + offset * v->stride;
  view.vector.block = nullptr;
  view.vector.owner = 0;
  return view;
}

gsl_vector_const_view gsl_vector_const_subvector(const gsl_vector *v,
                                                 size_t offset, size_t n) {
  _gsl_vector_const_view view;
  view.vector.size = n;
  view.vector.stride = v->stride;
  view.vector.data = v->data + offset * v->stride;
  view.vector.block = nullptr;
  view.vector.owner = 0;
  return view;
}

/* ------------------------------------------------------------------ */
/* matrices                                                            */
/* ------------------------------------------------------------------ */
gsl_matrix *gsl_matrix_alloc(size_t n1, size_t n2) {
  gsl_block *b = (gsl_block *)malloc(sizeof(gsl_block));
  b->size = n1 * n2;
  b->data = (double *)malloc(n1 * n2 * sizeof(double));
  gsl_matrix *m = (gsl_matrix *)malloc(sizeof(gsl_matrix));
  m->size1 = n1;
  m->size2 = n2;
  m->tda = n2;
  m->data = b->data;
  m->block = b;
  m->owner = 1;
  return m;
}

gsl_matrix *gsl_matrix_calloc(size_t n1, size_t n2) {
  gsl_matrix *m = gsl_matrix_alloc(n1, n2);
  memset(m->data, 0, n1 * n2 * sizeof(double));
  return m;
}

void gsl_matrix_free(gsl_matrix *m) {
  if (m == nullptr) return;
  if (m->owner && m->block != nullptr) {
    free(m->block->data);
    free(m->block);
  }
  free(m);
}

void gsl_matrix_set_zero(gsl_matrix *m) {
  for (size_t i = 0; i < m->size1; i++)
    memset(m->data + i * m->tda, 0, m->size2 * sizeof(double));
}

int gsl_matrix_memcpy(gsl_matrix *dest, const gsl_matrix *src) {
  for (size_t i = 0; i < src->size1; i++)
    memcpy(dest->data + i * dest->tda, src->data + i * src->tda,
           src->size2 * sizeof(double));
  return GSL_SUCCESS;
}

int gsl_matrix_add(gsl_matrix *a, const gsl_matrix *b) {
  for (size_t i = 0; i < a->size1; i++)
    for (size_t j = 0; j < a->size2; j++)
      a->data[i * a->tda + j] += b->data[i * b->tda + j];
  return GSL_SUCCESS;
}

gsl_matrix_view gsl_matrix_view_array(double *base, size_t n1, size_t n2) {
  gsl_matrix_view view;
  view.matrix.size1 = n1;
  view.matrix.size2 = n2;
  view.matrix.tda = n2;
  view.matrix.data = base;
  view.matrix.block = nullptr;
  view.matrix.owner = 0;
  return view;
}

gsl_vector_view gsl_matrix_row(gsl_matrix *m, size_t i) {
  gsl_vector_view view;
  view.vector.size = m->size2;
  view.vector.stride = 1;
  view.vector.data = m->data + i * m->tda;
  view.vector.block = nullptr;
  view.vector.owner = 0;
  return view;
}

gsl_vector_const_view gsl_matrix_const_row(const gsl_matrix *m, size_t i) {
  _gsl_vector_const_view view;
  view.vector.size = m->size2;
  view.vector.stride = 1;
  view.vector.data = m->data + i * m->tda;
  view.vector.block = nullptr;
  view.vector.owner = 0;
  return view;
}

gsl_vector_view gsl_matrix_column(gsl_matrix *m, size_t j) {
  gsl_vector_view view;
  view.vector.size = m->size1;
  view.vector.stride = m->tda;
  view.vector.data = m->data + j;
  view.vector.block = nullptr;
  view.vector.owner = 0;
  return view;
}

gsl_vector_const_view gsl_matrix_const_column(const gsl_matrix *m, size_t j) {
  _gsl_vector_const_view view;
  view.vector.size = m->size1;
  view.vector.stride = m->tda;
  view.vector.data = m->data + j;
  view.vector.block = nullptr;
  view.vector.owner = 0;
  return view;
}

/* ------------------------------------------------------------------ */
/* permutation                                                         */
/* ------------------------------------------------------------------ */
gsl_permutation *gsl_permutation_alloc(size_t n) {
  gsl_permutation *p = (gsl_permutation *)malloc(sizeof(gsl_permutation));
  p->size = n;
  p->data = (size_t *)malloc(n * sizeof(size_t));
  return p;
}

gsl_permutation *gsl_permutation_calloc(size_t n) {
  gsl_permutation *p = gsl_permutation_alloc(n);
  for (size_t i = 0; i < n; i++) p->data[i] = i;
  return p;
}

void gsl_permutation_free(gsl_permutation *p) {
  if (p == nullptr) return;
  free(p->data);
  free(p);
}

/* ------------------------------------------------------------------ */
/* LU decomposition (Doolittle, partial pivoting)                      */
/* ------------------------------------------------------------------ */
int gsl_linalg_LU_decomp(gsl_matrix *A, gsl_permutation *p, int *signum) {
  const size_t n = A->size1;
  *signum = 1;
  for (size_t i = 0; i < n; i++) p->data[i] = i;

  for (size_t j = 0; j < n; j++) {
    /* find pivot */
    double maxval = fabs(gsl_matrix_get(A, j, j));
    size_t ipiv = j;
    for (size_t i = j + 1; i < n; i++) {
      const double v = fabs(gsl_matrix_get(A, i, j));
      if (v > maxval) {
        maxval = v;
        ipiv = i;
      }
    }
    if (ipiv != j) {
      /* swap rows j and ipiv */
      for (size_t k = 0; k < n; k++) {
        const double tmp = gsl_matrix_get(A, j, k);
        gsl_matrix_set(A, j, k, gsl_matrix_get(A, ipiv, k));
        gsl_matrix_set(A, ipiv, k, tmp);
      }
      const size_t tp = p->data[j];
      p->data[j] = p->data[ipiv];
      p->data[ipiv] = tp;
      *signum = -(*signum);
    }
    const double pivot = gsl_matrix_get(A, j, j);
    if (pivot != 0.0) {
      for (size_t i = j + 1; i < n; i++) {
        const double factor = gsl_matrix_get(A, i, j) / pivot;
        gsl_matrix_set(A, i, j, factor);
        for (size_t k = j + 1; k < n; k++) {
          gsl_matrix_set(
              A, i, k, gsl_matrix_get(A, i, k) - factor * gsl_matrix_get(A, j, k));
        }
      }
    }
  }
  return GSL_SUCCESS;
}

int gsl_linalg_LU_solve(const gsl_matrix *LU, const gsl_permutation *p,
                        const gsl_vector *b, gsl_vector *x) {
  const size_t n = LU->size1;
  /* x := P b */
  for (size_t i = 0; i < n; i++)
    gsl_vector_set(x, i, gsl_vector_get(b, p->data[i]));
  /* forward substitution: L y = P b (unit diagonal) */
  for (size_t i = 1; i < n; i++) {
    double sum = gsl_vector_get(x, i);
    for (size_t j = 0; j < i; j++)
      sum -= gsl_matrix_get(LU, i, j) * gsl_vector_get(x, j);
    gsl_vector_set(x, i, sum);
  }
  /* back substitution: U x = y */
  for (size_t ii = n; ii-- > 0;) {
    double sum = gsl_vector_get(x, ii);
    for (size_t j = ii + 1; j < n; j++)
      sum -= gsl_matrix_get(LU, ii, j) * gsl_vector_get(x, j);
    const double d = gsl_matrix_get(LU, ii, ii);
    if (d == 0.0) {
      GSL_ERROR("singular matrix in LU_solve", GSL_ESING);
    }
    gsl_vector_set(x, ii, sum / d);
  }
  return GSL_SUCCESS;
}

int gsl_linalg_LU_refine(const gsl_matrix *A, const gsl_matrix *LU,
                         const gsl_permutation *p, const gsl_vector *b,
                         gsl_vector *x, gsl_vector *work) {
  const size_t n = A->size1;
  /* residual r = A x - b */
  for (size_t i = 0; i < n; i++) {
    double sum = -gsl_vector_get(b, i);
    for (size_t j = 0; j < n; j++)
      sum += gsl_matrix_get(A, i, j) * gsl_vector_get(x, j);
    gsl_vector_set(work, i, sum);
  }
  /* solve A d = r, then x := x - d */
  std::vector<double> d(n);
  gsl_vector_view dv = gsl_vector_view_array(d.data(), n);
  const int status = gsl_linalg_LU_solve(LU, p, work, &dv.vector);
  if (status != GSL_SUCCESS) return status;
  for (size_t i = 0; i < n; i++)
    gsl_vector_set(x, i, gsl_vector_get(x, i) - d[i]);
  return GSL_SUCCESS;
}

/* ------------------------------------------------------------------ */
/* blas wrappers                                                       */
/* ------------------------------------------------------------------ */
double gsl_blas_dasum(const gsl_vector *x) {
  double sum = 0.0;
  for (size_t i = 0; i < x->size; i++) sum += fabs(x->data[i * x->stride]);
  return sum;
}

int gsl_blas_ddot(const gsl_vector *x, const gsl_vector *y, double *result) {
  double sum = 0.0;
  for (size_t i = 0; i < x->size; i++)
    sum += x->data[i * x->stride] * y->data[i * y->stride];
  *result = sum;
  return GSL_SUCCESS;
}

CBLAS_INDEX_t gsl_blas_idamax(const gsl_vector *x) {
  size_t imax = 0;
  double vmax = -1.0;
  for (size_t i = 0; i < x->size; i++) {
    const double v = fabs(x->data[i * x->stride]);
    if (v > vmax) {
      vmax = v;
      imax = i;
    }
  }
  return imax;
}

void gsl_blas_dscal(double alpha, gsl_vector *x) {
  for (size_t i = 0; i < x->size; i++) x->data[i * x->stride] *= alpha;
}

int gsl_blas_dgemv(CBLAS_TRANSPOSE_t TransA, double alpha, const gsl_matrix *A,
                   const gsl_vector *x, double beta, gsl_vector *y) {
  if (TransA == CblasNoTrans) {
    for (size_t i = 0; i < A->size1; i++) {
      double sum = 0.0;
      for (size_t j = 0; j < A->size2; j++)
        sum += gsl_matrix_get(A, i, j) * gsl_vector_get(x, j);
      gsl_vector_set(y, i, alpha * sum + beta * gsl_vector_get(y, i));
    }
  } else {
    for (size_t j = 0; j < A->size2; j++) {
      double sum = 0.0;
      for (size_t i = 0; i < A->size1; i++)
        sum += gsl_matrix_get(A, i, j) * gsl_vector_get(x, i);
      gsl_vector_set(y, j, alpha * sum + beta * gsl_vector_get(y, j));
    }
  }
  return GSL_SUCCESS;
}

/* ------------------------------------------------------------------ */
/* adaptive integration                                                */
/* ------------------------------------------------------------------ */
gsl_integration_workspace *gsl_integration_workspace_alloc(size_t n) {
  gsl_integration_workspace *w =
      (gsl_integration_workspace *)malloc(sizeof(gsl_integration_workspace));
  w->limit = n;
  return w;
}

void gsl_integration_workspace_free(gsl_integration_workspace *w) { free(w); }

/* Gauss-Legendre nodes/weights on [-1, 1], computed by Newton
 * iteration on the Legendre polynomial (standard construction). */
static void gauss_legendre(int n, double *xs, double *ws) {
  const int m = (n + 1) / 2;
  for (int i = 0; i < m; i++) {
    /* initial guess: Chebyshev-like approximation to the i-th root */
    double x = cos(M_PI * (i + 0.75) / (n + 0.5));
    double pp = 0.0;
    for (int it = 0; it < 100; it++) {
      /* evaluate P_n(x) and P'_n(x) via the recurrence */
      double p0 = 1.0, p1 = 0.0;
      for (int j = 0; j < n; j++) {
        const double p2 = p1;
        p1 = p0;
        p0 = ((2.0 * j + 1.0) * x * p1 - j * p2) / (j + 1.0);
      }
      pp = n * (x * p0 - p1) / (x * x - 1.0);
      const double dx = p0 / pp;
      x -= dx;
      if (fabs(dx) < 1e-15) break;
    }
    xs[i] = -x;
    xs[n - 1 - i] = x;
    ws[i] = 2.0 / ((1.0 - x * x) * pp * pp);
    ws[n - 1 - i] = ws[i];
  }
}

struct glrule {
  std::vector<double> x, w;
};

static const glrule &gl_rule(int n) {
  static glrule r10, r21;
  static bool init = false;
  if (!init) {
    r10.x.resize(10);
    r10.w.resize(10);
    gauss_legendre(10, r10.x.data(), r10.w.data());
    r21.x.resize(21);
    r21.w.resize(21);
    gauss_legendre(21, r21.x.data(), r21.w.data());
    init = true;
  }
  return (n == 10) ? r10 : r21;
}

/* integrate f over [a,b] with both rules; returns the G21 estimate and
 * |G21-G10| as the error estimate */
static double integrate_interval(const gsl_function *f, double a, double b,
                                 double *errest) {
  const glrule &g10 = gl_rule(10);
  const glrule &g21 = gl_rule(21);
  const double c = 0.5 * (a + b);
  const double h = 0.5 * (b - a);
  double s10 = 0.0, s21 = 0.0;
  for (int i = 0; i < 10; i++)
    s10 += g10.w[i] * GSL_FN_EVAL(f, c + h * g10.x[i]);
  for (int i = 0; i < 21; i++)
    s21 += g21.w[i] * GSL_FN_EVAL(f, c + h * g21.x[i]);
  s10 *= h;
  s21 *= h;
  *errest = fabs(s21 - s10);
  return s21;
}

struct subinterval {
  double a, b, val, err;
};

static int adaptive_integrate(const gsl_function *f,
                              std::vector<subinterval> &segs, double epsabs,
                              double epsrel, size_t limit, double *result,
                              double *abserr) {
  for (auto &s : segs) s.val = integrate_interval(f, s.a, s.b, &s.err);

  for (size_t iter = segs.size(); iter < limit; iter++) {
    double total = 0.0, toterr = 0.0;
    size_t worst = 0;
    double worsterr = -1.0;
    for (size_t i = 0; i < segs.size(); i++) {
      total += segs[i].val;
      toterr += segs[i].err;
      if (segs[i].err > worsterr) {
        worsterr = segs[i].err;
        worst = i;
      }
    }
    if (toterr <= GSL_MAX(epsabs, epsrel * fabs(total)) || worsterr <= 0.0) {
      *result = total;
      *abserr = toterr;
      return GSL_SUCCESS;
    }
    /* bisect the worst interval */
    const double a = segs[worst].a, b = segs[worst].b;
    const double mid = 0.5 * (a + b);
    if (mid <= a || mid >= b) break; /* cannot refine further */
    subinterval left{a, mid, 0.0, 0.0}, right{mid, b, 0.0, 0.0};
    left.val = integrate_interval(f, left.a, left.b, &left.err);
    right.val = integrate_interval(f, right.a, right.b, &right.err);
    segs[worst] = left;
    segs.push_back(right);
  }
  double total = 0.0, toterr = 0.0;
  for (auto &s : segs) {
    total += s.val;
    toterr += s.err;
  }
  *result = total;
  *abserr = toterr;
  gsl_shim_error("integration tolerance not reached", __FILE__, __LINE__,
                 GSL_EROUND);
  return GSL_EROUND;
}

int gsl_integration_qag(const gsl_function *f, double a, double b,
                        double epsabs, double epsrel, size_t limit, int key,
                        gsl_integration_workspace *workspace, double *result,
                        double *abserr) {
  (void)key;
  (void)workspace;
  if (a == b) {
    *result = 0.0;
    *abserr = 0.0;
    return GSL_SUCCESS;
  }
  std::vector<subinterval> segs{{a, b, 0.0, 0.0}};
  return adaptive_integrate(f, segs, epsabs, epsrel,
                            limit > 4 ? limit : 64, result, abserr);
}

int gsl_integration_qagp(const gsl_function *f, double *pts, size_t npts,
                         double epsabs, double epsrel, size_t limit,
                         gsl_integration_workspace *workspace, double *result,
                         double *abserr) {
  (void)workspace;
  std::vector<subinterval> segs;
  for (size_t i = 0; i + 1 < npts; i++) {
    if (pts[i + 1] > pts[i]) segs.push_back({pts[i], pts[i + 1], 0.0, 0.0});
  }
  if (segs.empty()) {
    *result = 0.0;
    *abserr = 0.0;
    return GSL_SUCCESS;
  }
  return adaptive_integrate(f, segs, epsabs, epsrel,
                            limit > segs.size() * 4 ? limit : segs.size() * 64,
                            result, abserr);
}

/* ------------------------------------------------------------------ */
/* Brent root solver                                                   */
/* ------------------------------------------------------------------ */
static const gsl_root_fsolver_type brent_type = {"brent"};
const gsl_root_fsolver_type *gsl_root_fsolver_brent = &brent_type;

gsl_root_fsolver *gsl_root_fsolver_alloc(const gsl_root_fsolver_type *T) {
  gsl_root_fsolver *s = (gsl_root_fsolver *)calloc(1, sizeof(gsl_root_fsolver));
  s->type = T;
  return s;
}

void gsl_root_fsolver_free(gsl_root_fsolver *s) { free(s); }

int gsl_root_fsolver_set(gsl_root_fsolver *s, gsl_function *f, double x_lower,
                         double x_upper) {
  s->function = f;
  s->x_lower = x_lower;
  s->x_upper = x_upper;
  s->a = x_lower;
  s->b = x_upper;
  s->fa = GSL_FN_EVAL(f, s->a);
  s->fb = GSL_FN_EVAL(f, s->b);
  s->c = s->a;
  s->fc = s->fa;
  s->d = s->b - s->a;
  s->e = s->b - s->a;
  s->root = 0.5 * (x_lower + x_upper);
  if ((s->fa < 0.0 && s->fb < 0.0) || (s->fa > 0.0 && s->fb > 0.0)) {
    GSL_ERROR("endpoints do not straddle y=0", GSL_EINVAL);
  }
  return GSL_SUCCESS;
}

int gsl_root_fsolver_iterate(gsl_root_fsolver *s) {
  /* one iteration of Brent's method (inverse quadratic interpolation
   * with bisection fallback) */
  double a = s->a, b = s->b, c = s->c;
  double fa = s->fa, fb = s->fb, fc = s->fc;
  double d = s->d, e = s->e;

  if ((fb < 0 && fc < 0) || (fb > 0 && fc > 0)) {
    c = a;
    fc = fa;
    d = b - a;
    e = b - a;
  }
  if (fabs(fc) < fabs(fb)) {
    a = b;
    b = c;
    c = a;
    fa = fb;
    fb = fc;
    fc = fa;
  }
  const double tol = 0.5 * 2.2204460492503131e-16 * fabs(b);
  const double m = 0.5 * (c - b);

  if (fb == 0.0 || fabs(m) <= tol) {
    s->root = b;
    s->x_lower = (b < c) ? b : c;
    s->x_upper = (b < c) ? c : b;
    s->a = a;
    s->b = b;
    s->c = c;
    s->fa = fa;
    s->fb = fb;
    s->fc = fc;
    s->d = d;
    s->e = e;
    return GSL_SUCCESS;
  }
  if (fabs(e) < tol || fabs(fa) <= fabs(fb)) {
    d = m;
    e = m; /* bisection */
  } else {
    double p, q, r;
    double sratio = fb / fa;
    if (a == c) {
      p = 2.0 * m * sratio;
      q = 1.0 - sratio;
    } else {
      q = fa / fc;
      r = fb / fc;
      p = sratio * (2.0 * m * q * (q - r) - (b - a) * (r - 1.0));
      q = (q - 1.0) * (r - 1.0) * (sratio - 1.0);
    }
    if (p > 0.0)
      q = -q;
    else
      p = -p;
    if (2.0 * p < GSL_MIN(3.0 * m * q - fabs(tol * q), fabs(e * q))) {
      e = d;
      d = p / q;
    } else {
      d = m;
      e = m;
    }
  }
  a = b;
  fa = fb;
  if (fabs(d) > tol)
    b += d;
  else
    b += (m > 0.0 ? tol : -tol);
  fb = GSL_FN_EVAL(s->function, b);

  s->a = a;
  s->b = b;
  s->c = c;
  s->fa = fa;
  s->fb = fb;
  s->fc = fc;
  s->d = d;
  s->e = e;
  s->root = b;
  if ((fb < 0 && fc < 0) || (fb > 0 && fc > 0)) {
    s->x_lower = (b < a) ? b : a;
    s->x_upper = (b < a) ? a : b;
  } else {
    s->x_lower = (b < c) ? b : c;
    s->x_upper = (b < c) ? c : b;
  }
  return GSL_SUCCESS;
}

double gsl_root_fsolver_root(const gsl_root_fsolver *s) { return s->root; }
double gsl_root_fsolver_x_lower(const gsl_root_fsolver *s) {
  return s->x_lower;
}
double gsl_root_fsolver_x_upper(const gsl_root_fsolver *s) {
  return s->x_upper;
}

int gsl_root_test_interval(double x_lower, double x_upper, double epsabs,
                           double epsrel) {
  const double abs_lower = fabs(x_lower);
  const double abs_upper = fabs(x_upper);
  double min_abs;
  if ((x_lower > 0.0 && x_upper > 0.0) || (x_lower < 0.0 && x_upper < 0.0))
    min_abs = GSL_MIN(abs_lower, abs_upper);
  else
    min_abs = 0.0;
  const double tolerance = epsabs + epsrel * min_abs;
  if (fabs(x_upper - x_lower) < tolerance) return GSL_SUCCESS;
  return GSL_CONTINUE;
}

/* ------------------------------------------------------------------ */
/* rng: Knuth subtractive generator ("ran3")                           */
/* ------------------------------------------------------------------ */
static const gsl_rng_type ran3_type = {"ran3"};
const gsl_rng_type *gsl_rng_ran3 = &ran3_type;

static const long RAN3_MBIG = 1000000000L;
static const long RAN3_MSEED = 161803398L;

gsl_rng *gsl_rng_alloc(const gsl_rng_type *T) {
  gsl_rng *r = (gsl_rng *)calloc(1, sizeof(gsl_rng));
  r->type = T;
  gsl_rng_set(r, 0);
  return r;
}

void gsl_rng_free(gsl_rng *r) { free(r); }

void gsl_rng_set(gsl_rng *r, unsigned long seed) {
  long mj = labs(RAN3_MSEED - labs((long)seed));
  mj %= RAN3_MBIG;
  r->ma[55] = mj;
  long mk = 1;
  for (int i = 1; i <= 54; i++) {
    const int ii = (21 * i) % 55;
    r->ma[ii] = mk;
    mk = mj - mk;
    if (mk < 0) mk += RAN3_MBIG;
    mj = r->ma[ii];
  }
  for (int k = 1; k <= 4; k++) {
    for (int i = 1; i <= 55; i++) {
      r->ma[i] -= r->ma[1 + (i + 30) % 55];
      if (r->ma[i] < 0) r->ma[i] += RAN3_MBIG;
    }
  }
  r->inext = 0;
  r->inextp = 31;
}

static long ran3_get(gsl_rng *r) {
  if (++r->inext == 56) r->inext = 1;
  if (++r->inextp == 56) r->inextp = 1;
  long mj = r->ma[r->inext] - r->ma[r->inextp];
  if (mj < 0) mj += RAN3_MBIG;
  r->ma[r->inext] = mj;
  return mj;
}

double gsl_rng_uniform(gsl_rng *r) {
  return (double)ran3_get(r) / (double)RAN3_MBIG;
}

double gsl_rng_uniform_pos(gsl_rng *r) {
  double u;
  do {
    u = gsl_rng_uniform(r);
  } while (u == 0.0);
  return u;
}

const char *gsl_rng_name(const gsl_rng *r) { return r->type->name; }

/* ------------------------------------------------------------------ */
/* Debye functions D_n(x) = (n/x^n) Int_0^x t^n/(e^t - 1) dt           */
/* ------------------------------------------------------------------ */
static double debye_integrand3(double t, void *p) {
  (void)p;
  if (t < 1e-8) return t * t; /* t^3/(e^t-1) -> t^2 as t->0 */
  return t * t * t / expm1(t);
}

static double debye_integrand4(double t, void *p) {
  (void)p;
  if (t < 1e-8) return t * t * t;
  return t * t * t * t / expm1(t);
}

static double debye_n(int n, double x) {
  if (x <= 0.0) return 1.0;
  gsl_function f;
  f.function = (n == 3) ? debye_integrand3 : debye_integrand4;
  f.params = nullptr;
  double result = 0.0, abserr = 0.0;
  /* integrand is smooth; cap the domain where e^-t underflows */
  const double upper = GSL_MIN(x, 700.0);
  std::vector<subinterval> segs{{0.0, upper, 0.0, 0.0}};
  adaptive_integrate(&f, segs, 0.0, 1e-12, 128, &result, &abserr);
  return (double)n * result / pow(x, n);
}

double gsl_sf_debye_3(double x) { return debye_n(3, x); }
double gsl_sf_debye_4(double x) { return debye_n(4, x); }

/* ------------------------------------------------------------------ */
/* linear spline                                                       */
/* ------------------------------------------------------------------ */
static const gsl_interp_type linear_type = {"linear"};
const gsl_interp_type *gsl_interp_linear = &linear_type;

gsl_interp_accel *gsl_interp_accel_alloc(void) {
  return (gsl_interp_accel *)calloc(1, sizeof(gsl_interp_accel));
}

void gsl_interp_accel_free(gsl_interp_accel *a) { free(a); }

gsl_spline *gsl_spline_alloc(const gsl_interp_type *T, size_t size) {
  (void)T;
  gsl_spline *s = (gsl_spline *)malloc(sizeof(gsl_spline));
  s->size = size;
  s->x = (double *)malloc(size * sizeof(double));
  s->y = (double *)malloc(size * sizeof(double));
  return s;
}

int gsl_spline_init(gsl_spline *spline, const double *xa, const double *ya,
                    size_t size) {
  memcpy(spline->x, xa, size * sizeof(double));
  memcpy(spline->y, ya, size * sizeof(double));
  spline->size = size;
  return GSL_SUCCESS;
}

double gsl_spline_eval(const gsl_spline *s, double x, gsl_interp_accel *a) {
  (void)a;
  const size_t n = s->size;
  if (x <= s->x[0]) return s->y[0];
  if (x >= s->x[n - 1]) return s->y[n - 1];
  /* binary search for the bracketing segment */
  size_t lo = 0, hi = n - 1;
  while (hi - lo > 1) {
    const size_t mid = (lo + hi) / 2;
    if (s->x[mid] > x)
      hi = mid;
    else
      lo = mid;
  }
  const double dx = s->x[hi] - s->x[lo];
  if (dx <= 0.0) return s->y[lo];
  const double t = (x - s->x[lo]) / dx;
  return s->y[lo] + t * (s->y[hi] - s->y[lo]);
}

void gsl_spline_free(gsl_spline *spline) {
  if (spline == nullptr) return;
  free(spline->x);
  free(spline->y);
  free(spline);
}
