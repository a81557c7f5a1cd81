"""ADVI backend: conjugate-case accuracy (meanfield + fullrank) and
integration with the parametric model."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stan4bart_tpu.ops.advi import advi, advi_draws


def _conjugate_problem(seed=0, n=300, k=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, k))
    w = rng.normal(size=k)
    s2, t2 = 0.7**2, 3.0**2
    y = X @ w + rng.normal(0, np.sqrt(s2), n)
    prec = X.T @ X / s2 + np.eye(k) / t2
    cov = np.linalg.inv(prec)
    mean = cov @ (X.T @ y / s2)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)

    def logp(q):
        r = yj - Xj @ q
        return -0.5 * jnp.sum(r * r) / s2 - 0.5 * jnp.sum(q * q) / t2

    return logp, mean, cov, k


def test_meanfield_recovers_mean():
    logp, mean, cov, k = _conjugate_problem()
    mu, omega, info = advi(logp, k, jax.random.PRNGKey(0),
                           family="meanfield", max_iters=3000)
    assert np.allclose(np.asarray(mu), mean, atol=0.05)
    # meanfield marginal sds within a factor of the truth
    sd = np.exp(np.asarray(omega))
    assert np.all(sd / np.sqrt(np.diag(cov)) > 0.4)
    assert np.all(sd / np.sqrt(np.diag(cov)) < 2.0)


def test_fullrank_recovers_covariance():
    logp, mean, cov, k = _conjugate_problem(seed=1)
    mu, L, info = advi(logp, k, jax.random.PRNGKey(1),
                       family="fullrank", max_iters=4000, n_mc=20)
    assert np.allclose(np.asarray(mu), mean, atol=0.08)
    Sig = np.asarray(L) @ np.asarray(L).T
    # fullrank should capture the posterior covariance reasonably
    assert np.allclose(Sig, cov, atol=0.3 * np.abs(cov).max() + 0.02)


def test_draws_from_q():
    logp, mean, cov, k = _conjugate_problem(seed=2)
    mu, omega, _ = advi(logp, k, jax.random.PRNGKey(2), max_iters=2000)
    draws = np.asarray(advi_draws(mu, omega, jax.random.PRNGKey(3), 4000))
    assert draws.shape == (4000, k)
    assert np.allclose(draws.mean(axis=0), np.asarray(mu), atol=0.1)


def test_advi_on_parametric_model():
    from stan4bart_tpu.formula import build_model_frame
    from stan4bart_tpu.models.assemble import build_parametric_model
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    d = generate_friedman_data(200, ranef=True, causal=True)
    df = friedman_dataframe(d)
    mf = build_model_frame("y ~ bart(X1 + X2) + X4 + z + (1 | g.2)", df)
    model, _, _ = build_parametric_model(mf, "gaussian")
    offset = jnp.asarray(d["mu_bart"])
    y = jnp.asarray(mf.y)

    mu, omega, info = advi(
        lambda u: model.log_prob(u, offset, y),
        model.num_upars, jax.random.PRNGKey(4), max_iters=3000,
    )
    names = model.constrained_names()
    draws = jax.vmap(model.constrained_draw)(
        advi_draws(mu, omega, jax.random.PRNGKey(5), 500)
    )
    draws = np.asarray(draws)
    beta = draws[:, [names.index("beta.1"), names.index("beta.2")]].mean(0)
    assert abs(beta[0] - 10.0) < 2.0   # X4 slope
    assert abs(beta[1] - 5.0) < 1.5    # treatment effect
    sigma = draws[:, names.index("aux.1")].mean()
    assert 0.7 < sigma < 2.2
