/* Minimal GSL-compatible shim, written from scratch for this project.
 *
 * Purpose: the validation harness builds the reference ARTIS sources
 * (/root/reference/*.cc) to produce golden outputs for tolerance-based
 * comparison tests.  The build environment has no GSL installation, so
 * this header + gslshim.cc supply the small subset of the GSL API the
 * reference actually calls (vectors/matrices, LU solve, a few BLAS
 * level-1/2 wrappers, adaptive integration, Brent root solving, the
 * ran3 RNG, Debye functions, linear splines, error handling).
 *
 * This is NOT GSL code: all implementations are original (standard
 * textbook algorithms).  Numerical results agree with real GSL to the
 * accuracy the comparison tests need (tolerance-based, not bit-exact).
 */
#ifndef GSL_SHIM_CORE_H
#define GSL_SHIM_CORE_H

#include <cstddef>
#include <cstdlib>

/* ------------------------------------------------------------------ */
/* error handling (gsl_errno.h subset)                                 */
/* ------------------------------------------------------------------ */
enum {
  GSL_SUCCESS = 0,
  GSL_FAILURE = -1,
  GSL_CONTINUE = -2, /* iteration has not converged */
  GSL_EDOM = 1,
  GSL_ERANGE = 2,
  GSL_EINVAL = 4,
  GSL_EMAXITER = 11,
  GSL_EZERODIV = 12,
  GSL_ETOL = 14,
  GSL_EUNDRFLW = 15,
  GSL_EOVRFLW = 16,
  GSL_EROUND = 18, /* roundoff error in integration */
  GSL_ESING = 21,
  GSL_EDIVERGE = 22,
};

typedef void gsl_error_handler_t(const char *reason, const char *file,
                                 int line, int gsl_errno);

gsl_error_handler_t *gsl_set_error_handler(gsl_error_handler_t *new_handler);
gsl_error_handler_t *gsl_set_error_handler_off(void);
const char *gsl_strerror(int gsl_errno);
void gsl_shim_error(const char *reason, const char *file, int line,
                    int gsl_errno);

#define GSL_ERROR(reason, gsl_errno)                       \
  do {                                                     \
    gsl_shim_error(reason, __FILE__, __LINE__, gsl_errno); \
    return gsl_errno;                                      \
  } while (0)

/* ------------------------------------------------------------------ */
/* gsl_function (gsl_math.h subset)                                    */
/* ------------------------------------------------------------------ */
struct gsl_function_struct {
  double (*function)(double x, void *params);
  void *params;
};
typedef struct gsl_function_struct gsl_function;
#define GSL_FN_EVAL(F, x) (*((F)->function))(x, (F)->params)

#ifndef GSL_MAX
#define GSL_MAX(a, b) ((a) > (b) ? (a) : (b))
#endif
#ifndef GSL_MIN
#define GSL_MIN(a, b) ((a) < (b) ? (a) : (b))
#endif

/* ------------------------------------------------------------------ */
/* block / vector / matrix (double)                                    */
/* ------------------------------------------------------------------ */
typedef struct {
  size_t size;
  double *data;
} gsl_block;

typedef struct {
  size_t size;
  size_t stride;
  double *data;
  gsl_block *block;
  int owner;
} gsl_vector;

typedef struct {
  gsl_vector vector;
} _gsl_vector_view;
typedef _gsl_vector_view gsl_vector_view;

typedef struct {
  gsl_vector vector;
} _gsl_vector_const_view;
typedef const _gsl_vector_const_view gsl_vector_const_view;

typedef struct {
  size_t size1; /* rows */
  size_t size2; /* cols */
  size_t tda;   /* row stride */
  double *data;
  gsl_block *block;
  int owner;
} gsl_matrix;

typedef struct {
  gsl_matrix matrix;
} _gsl_matrix_view;
typedef _gsl_matrix_view gsl_matrix_view;

typedef struct {
  gsl_matrix matrix;
} _gsl_matrix_const_view;
typedef const _gsl_matrix_const_view gsl_matrix_const_view;

gsl_vector *gsl_vector_alloc(size_t n);
gsl_vector *gsl_vector_calloc(size_t n);
void gsl_vector_free(gsl_vector *v);
void gsl_vector_set_zero(gsl_vector *v);
void gsl_vector_set_all(gsl_vector *v, double x);
int gsl_vector_memcpy(gsl_vector *dest, const gsl_vector *src);
int gsl_vector_add(gsl_vector *a, const gsl_vector *b);
int gsl_vector_mul(gsl_vector *a, const gsl_vector *b);
int gsl_vector_scale(gsl_vector *a, double x);
int gsl_vector_isnonneg(const gsl_vector *v);
gsl_vector_view gsl_vector_view_array(double *base, size_t n);
gsl_vector_view gsl_vector_subvector(gsl_vector *v, size_t offset, size_t n);
gsl_vector_const_view gsl_vector_const_subvector(const gsl_vector *v,
                                                 size_t offset, size_t n);

static inline double gsl_vector_get(const gsl_vector *v, size_t i) {
  return v->data[i * v->stride];
}
static inline void gsl_vector_set(gsl_vector *v, size_t i, double x) {
  v->data[i * v->stride] = x;
}
static inline double *gsl_vector_ptr(gsl_vector *v, size_t i) {
  return v->data + i * v->stride;
}
static inline const double *gsl_vector_const_ptr(const gsl_vector *v,
                                                 size_t i) {
  return v->data + i * v->stride;
}

gsl_matrix *gsl_matrix_alloc(size_t n1, size_t n2);
gsl_matrix *gsl_matrix_calloc(size_t n1, size_t n2);
void gsl_matrix_free(gsl_matrix *m);
void gsl_matrix_set_zero(gsl_matrix *m);
int gsl_matrix_memcpy(gsl_matrix *dest, const gsl_matrix *src);
int gsl_matrix_add(gsl_matrix *a, const gsl_matrix *b);
gsl_matrix_view gsl_matrix_view_array(double *base, size_t n1, size_t n2);
gsl_vector_view gsl_matrix_row(gsl_matrix *m, size_t i);
gsl_vector_const_view gsl_matrix_const_row(const gsl_matrix *m, size_t i);
gsl_vector_view gsl_matrix_column(gsl_matrix *m, size_t j);
gsl_vector_const_view gsl_matrix_const_column(const gsl_matrix *m, size_t j);

static inline double gsl_matrix_get(const gsl_matrix *m, size_t i, size_t j) {
  return m->data[i * m->tda + j];
}
static inline void gsl_matrix_set(gsl_matrix *m, size_t i, size_t j,
                                  double x) {
  m->data[i * m->tda + j] = x;
}
static inline double *gsl_matrix_ptr(gsl_matrix *m, size_t i, size_t j) {
  return m->data + i * m->tda + j;
}
static inline const double *gsl_matrix_const_ptr(const gsl_matrix *m, size_t i,
                                                 size_t j) {
  return m->data + i * m->tda + j;
}

/* ------------------------------------------------------------------ */
/* permutation                                                         */
/* ------------------------------------------------------------------ */
typedef struct {
  size_t size;
  size_t *data;
} gsl_permutation;

gsl_permutation *gsl_permutation_alloc(size_t n);
gsl_permutation *gsl_permutation_calloc(size_t n);
void gsl_permutation_free(gsl_permutation *p);

/* ------------------------------------------------------------------ */
/* linalg: LU with partial pivoting                                    */
/* ------------------------------------------------------------------ */
int gsl_linalg_LU_decomp(gsl_matrix *A, gsl_permutation *p, int *signum);
int gsl_linalg_LU_solve(const gsl_matrix *LU, const gsl_permutation *p,
                        const gsl_vector *b, gsl_vector *x);
int gsl_linalg_LU_refine(const gsl_matrix *A, const gsl_matrix *LU,
                         const gsl_permutation *p, const gsl_vector *b,
                         gsl_vector *x, gsl_vector *work);

/* ------------------------------------------------------------------ */
/* cblas-compatible enums + level-1/2 wrappers                         */
/* ------------------------------------------------------------------ */
typedef enum { CblasRowMajor = 101, CblasColMajor = 102 } CBLAS_ORDER_t;
typedef enum {
  CblasNoTrans = 111,
  CblasTrans = 112,
  CblasConjTrans = 113
} CBLAS_TRANSPOSE_t;
typedef size_t CBLAS_INDEX_t;

static inline void cblas_dcopy(int n, const double *x, int incx, double *y,
                               int incy) {
  for (int i = 0; i < n; i++) y[i * incy] = x[i * incx];
}
static inline void cblas_daxpy(int n, double alpha, const double *x, int incx,
                               double *y, int incy) {
  for (int i = 0; i < n; i++) y[i * incy] += alpha * x[i * incx];
}

double gsl_blas_dasum(const gsl_vector *x);
int gsl_blas_ddot(const gsl_vector *x, const gsl_vector *y, double *result);
CBLAS_INDEX_t gsl_blas_idamax(const gsl_vector *x);
void gsl_blas_dscal(double alpha, gsl_vector *x);
int gsl_blas_dgemv(CBLAS_TRANSPOSE_t TransA, double alpha, const gsl_matrix *A,
                   const gsl_vector *x, double beta, gsl_vector *y);

/* ------------------------------------------------------------------ */
/* adaptive integration (qag/qagp)                                     */
/* ------------------------------------------------------------------ */
enum {
  GSL_INTEG_GAUSS15 = 1,
  GSL_INTEG_GAUSS21 = 2,
  GSL_INTEG_GAUSS31 = 3,
  GSL_INTEG_GAUSS41 = 4,
  GSL_INTEG_GAUSS51 = 5,
  GSL_INTEG_GAUSS61 = 6,
};

typedef struct {
  size_t limit;
} gsl_integration_workspace;

gsl_integration_workspace *gsl_integration_workspace_alloc(size_t n);
void gsl_integration_workspace_free(gsl_integration_workspace *w);
int gsl_integration_qag(const gsl_function *f, double a, double b,
                        double epsabs, double epsrel, size_t limit, int key,
                        gsl_integration_workspace *workspace, double *result,
                        double *abserr);
int gsl_integration_qagp(const gsl_function *f, double *pts, size_t npts,
                         double epsabs, double epsrel, size_t limit,
                         gsl_integration_workspace *workspace, double *result,
                         double *abserr);

/* ------------------------------------------------------------------ */
/* root solving (Brent bracketing solver)                              */
/* ------------------------------------------------------------------ */
typedef struct gsl_root_fsolver_type_struct {
  const char *name;
} gsl_root_fsolver_type;

extern const gsl_root_fsolver_type *gsl_root_fsolver_brent;

typedef struct {
  const gsl_root_fsolver_type *type;
  gsl_function *function;
  double root;
  double x_lower;
  double x_upper;
  /* Brent state */
  double a, b, c, d, e;
  double fa, fb, fc;
} gsl_root_fsolver;

gsl_root_fsolver *gsl_root_fsolver_alloc(const gsl_root_fsolver_type *T);
void gsl_root_fsolver_free(gsl_root_fsolver *s);
int gsl_root_fsolver_set(gsl_root_fsolver *s, gsl_function *f, double x_lower,
                         double x_upper);
int gsl_root_fsolver_iterate(gsl_root_fsolver *s);
double gsl_root_fsolver_root(const gsl_root_fsolver *s);
double gsl_root_fsolver_x_lower(const gsl_root_fsolver *s);
double gsl_root_fsolver_x_upper(const gsl_root_fsolver *s);
int gsl_root_test_interval(double x_lower, double x_upper, double epsabs,
                           double epsrel);

/* ------------------------------------------------------------------ */
/* rng (ran3: Knuth subtractive generator)                             */
/* ------------------------------------------------------------------ */
typedef struct gsl_rng_type_struct {
  const char *name;
} gsl_rng_type;

extern const gsl_rng_type *gsl_rng_ran3;

typedef struct {
  const gsl_rng_type *type;
  /* ran3 state */
  long ma[56];
  int inext, inextp;
} gsl_rng;

gsl_rng *gsl_rng_alloc(const gsl_rng_type *T);
void gsl_rng_free(gsl_rng *r);
void gsl_rng_set(gsl_rng *r, unsigned long seed);
double gsl_rng_uniform(gsl_rng *r);
double gsl_rng_uniform_pos(gsl_rng *r);
const char *gsl_rng_name(const gsl_rng *r);

/* ------------------------------------------------------------------ */
/* special functions: Debye D_3, D_4                                   */
/* ------------------------------------------------------------------ */
double gsl_sf_debye_3(double x);
double gsl_sf_debye_4(double x);

/* ------------------------------------------------------------------ */
/* linear spline interpolation                                         */
/* ------------------------------------------------------------------ */
typedef struct gsl_interp_type_struct {
  const char *name;
} gsl_interp_type;

extern const gsl_interp_type *gsl_interp_linear;

typedef struct {
  size_t cache;
} gsl_interp_accel;

typedef struct {
  size_t size;
  double *x;
  double *y;
} gsl_spline;

gsl_interp_accel *gsl_interp_accel_alloc(void);
void gsl_interp_accel_free(gsl_interp_accel *a);
gsl_spline *gsl_spline_alloc(const gsl_interp_type *T, size_t size);
int gsl_spline_init(gsl_spline *spline, const double *xa, const double *ya,
                    size_t size);
double gsl_spline_eval(const gsl_spline *spline, double x,
                       gsl_interp_accel *a);
void gsl_spline_free(gsl_spline *spline);

#endif /* GSL_SHIM_CORE_H */
