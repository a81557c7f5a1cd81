"""Log-density kernels used by the parametric log-posterior.

Self-contained JAX implementations (with normalizing constants, so ``lp__``
is comparable to the reference's Stan-math values) of every distribution the
``continuous`` model touches (/root/reference/src/stan_files/continuous.stan).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln

_LOG_SQRT_2PI = 0.9189385332046727417803297364056176


def normal_lpdf(x, mu=0.0, sigma=1.0):
    z = (x - mu) / sigma
    return jnp.sum(-0.5 * z * z - jnp.log(sigma) - _LOG_SQRT_2PI)


def student_t_lpdf(x, nu, mu=0.0, sigma=1.0):
    z = (x - mu) / sigma
    half_nup1 = 0.5 * (nu + 1.0)
    return jnp.sum(
        gammaln(half_nup1) - gammaln(0.5 * nu)
        - 0.5 * jnp.log(nu * jnp.pi) - jnp.log(sigma)
        - half_nup1 * jnp.log1p(z * z / nu)
    )


def exponential_lpdf(x, rate=1.0):
    return jnp.sum(jnp.log(rate) - rate * x)


def gamma_lpdf(x, alpha, beta=1.0):
    return jnp.sum(
        alpha * jnp.log(beta) - gammaln(alpha)
        + (alpha - 1.0) * jnp.log(x) - beta * x
    )


def inv_gamma_lpdf(x, alpha, beta):
    return jnp.sum(
        alpha * jnp.log(beta) - gammaln(alpha)
        - (alpha + 1.0) * jnp.log(x) - beta / x
    )


def beta_lpdf(x, a, b):
    return jnp.sum(
        gammaln(a + b) - gammaln(a) - gammaln(b)
        + (a - 1.0) * jnp.log(x) + (b - 1.0) * jnp.log1p(-x)
    )


def chi_square_lpdf(x, nu):
    half_nu = 0.5 * nu
    return jnp.sum(
        -half_nu * jnp.log(2.0) - gammaln(half_nu)
        + (half_nu - 1.0) * jnp.log(x) - 0.5 * x
    )
