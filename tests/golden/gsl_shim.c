/* Drop-in shim for the three GSL CDF functions the reference stats tools
 * use (MaxCorrelation.c:415,457-458,491; RepeatResolver.c).
 *
 * Implemented as log-space tail sums over lgamma-based log-pmfs — the
 * same formulation as repeatresolver_tpu/ops/hypergeom.py — so the C
 * golden outputs and the Python/JAX implementation agree to ~1e-12
 * relative, far below the %f print precision of the MaxCorrs files.
 */
#include <math.h>

static double log_binom(double n, double k)
{
  return lgamma(n + 1.0) - lgamma(k + 1.0) - lgamma(n - k + 1.0);
}

/* log pmf of X ~ Hypergeometric(n1 successes, n2 failures, t draws) at k */
static double hyg_logpmf(double k, double n1, double n2, double t)
{
  return log_binom(n1, k) + log_binom(n2, t - k) - log_binom(n1 + n2, t);
}

/* P[X > k] (GSL upper tail semantics) */
double gsl_cdf_hypergeometric_Q(unsigned int k, unsigned int n1,
                                unsigned int n2, unsigned int t)
{
  long lo = (long)k + 1;
  long kmin = (long)t > (long)n2 ? (long)t - (long)n2 : 0;
  long kmax = (long)n1 < (long)t ? (long)n1 : (long)t;
  if (lo > kmax) return 0.0;
  if (lo <= kmin) return 1.0;
  /* log-sum-exp over j in [lo, kmax] */
  double m = -INFINITY, s = 0.0;
  long j;
  for (j = lo; j <= kmax; j++) {
    double lp = hyg_logpmf((double)j, (double)n1, (double)n2, (double)t);
    if (lp > m) { s = s * exp(m - lp) + 1.0; m = lp; }
    else        { s += exp(lp - m); }
  }
  double r = exp(m) * s;
  return r > 1.0 ? 1.0 : r;
}

/* P[X <= k] */
double gsl_cdf_hypergeometric_P(unsigned int k, unsigned int n1,
                                unsigned int n2, unsigned int t)
{
  long kmin = (long)t > (long)n2 ? (long)t - (long)n2 : 0;
  long kmax = (long)n1 < (long)t ? (long)n1 : (long)t;
  long hi = (long)k;
  if (hi >= kmax) return 1.0;
  if (hi < kmin) return 0.0;
  double m = -INFINITY, s = 0.0;
  long j;
  for (j = kmin; j <= hi; j++) {
    double lp = hyg_logpmf((double)j, (double)n1, (double)n2, (double)t);
    if (lp > m) { s = s * exp(m - lp) + 1.0; m = lp; }
    else        { s += exp(lp - m); }
  }
  double r = exp(m) * s;
  return r > 1.0 ? 1.0 : r;
}

/* P[X > k] for X ~ Binomial(n, p) */
double gsl_cdf_binomial_Q(unsigned int k, double p, unsigned int n)
{
  if ((long)k >= (long)n) return 0.0;
  if (p <= 0.0) return 0.0;
  if (p >= 1.0) return 1.0;
  double lq = log1p(-p), lpp = log(p);
  double m = -INFINITY, s = 0.0;
  long j;
  for (j = (long)k + 1; j <= (long)n; j++) {
    double lp = log_binom((double)n, (double)j)
              + (double)j * lpp + (double)(n - j) * lq;
    if (lp > m) { s = s * exp(m - lp) + 1.0; m = lp; }
    else        { s += exp(lp - m); }
  }
  double r = exp(m) * s;
  return r > 1.0 ? 1.0 : r;
}
