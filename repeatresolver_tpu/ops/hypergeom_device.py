"""On-device (f32) hypergeometric upper-tail significance.

The exact float64 series (ops/hypergeom.py) is the golden-parity path;
this is the production TPU path for MaxCorrs at scale, where ~1e8-1e9
pair evaluations per MSA make host evaluation impossible.

Accuracy contract: Z = -log10 P[X >= s] to ~1e-3 for significant pairs
(geometric-decay series, fixed K terms), and exactly 0 for pairs at or
below the distribution mode — those have true Z < ~0.5, far below the
MaxCorrelation cutoff -log10(1/(5*siglength)) >= 4, so zeroing them
cannot change which correlations matter (MaxCorrelation.c:998).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

LOG10E = 0.4342944819032518


def _log_binom(n, k):
    return gammaln(n + 1.0) - gammaln(k + 1.0) - gammaln(n - k + 1.0)


@functools.partial(jax.jit, static_argnames=("terms",))
def positive_significance_f32(schnitt, gr1, gr2, cov, size1, size2,
                              terms: int = 128):
    """Vectorized reference PositiveSignificance (MaxCorrelation.c:
    421-434) in f32 on device, incl. the 98 -> 98+F1 cap.

    X ~ HG(N=cov, K=gr2 successes, n=gr1 draws);
    Z = -log10 P[X >= schnitt]. All args broadcastable integer arrays.
    """
    s = jnp.asarray(schnitt, jnp.float32)
    k = jnp.asarray(gr2, jnp.float32)
    n = jnp.asarray(gr1, jnp.float32)
    nn = jnp.asarray(cov, jnp.float32)
    mode = (n + 1.0) * (k + 1.0) / (nn + 2.0)
    relevant = (s > mode) & (s >= 1) & (n > 0) & (k > 0)

    logp0 = (_log_binom(k, s) + _log_binom(nn - k, n - s)
             - _log_binom(nn, n))
    # pmf ratio r_j = p(s+j+1)/p(s+j); terms t_j = prod_{i<=j} r_i
    j = jnp.arange(terms, dtype=jnp.float32)
    sj = s[..., None] + j
    num = (k[..., None] - sj) * (n[..., None] - sj)
    den = (sj + 1.0) * (nn[..., None] - k[..., None]
                        - n[..., None] + sj + 1.0)
    ratio = jnp.where((num > 0) & (den > 0), num / jnp.maximum(den, 1.0),
                      0.0)
    alive = jnp.cumprod((ratio > 0).astype(jnp.float32), axis=-1)
    logr = jnp.log(jnp.where(ratio > 0, ratio, 1.0))
    csum = jnp.cumsum(logr, axis=-1)
    tail = 1.0 + jnp.sum(jnp.exp(csum) * alive, axis=-1)

    z = -(logp0 + jnp.log(tail)) * LOG10E
    z = jnp.where(jnp.isfinite(z), jnp.minimum(z, 99.0), 99.0)
    f1num = 2.0 * s
    f1den = (jnp.asarray(size1, jnp.float32)
             + jnp.asarray(size2, jnp.float32))
    f1 = jnp.where(f1num < 0.0001, 0.0,
                   f1num / jnp.maximum(f1den, 1.0))
    z = jnp.where(z > 98.0, 98.0 + f1, z)
    return jnp.where(relevant, z, 0.0)
