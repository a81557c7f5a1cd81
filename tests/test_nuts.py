"""NUTS kernel correctness: known posteriors (standard/correlated normal,
conjugate linear regression) and adaptation behavior (SURVEY.md section 7.2
step 2)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stan4bart_tpu.ops.nuts import NutsConfig
from stan4bart_tpu.ops.nuts_driver import nuts_sample


def test_standard_normal():
    def logp(q):
        return -0.5 * jnp.sum(q * q)

    qs, infos, state = nuts_sample(
        logp, jnp.zeros(3), jax.random.PRNGKey(0),
        num_warmup=500, num_samples=2000,
    )
    qs = np.asarray(qs)
    assert np.abs(qs.mean(axis=0)).max() < 0.1
    assert np.abs(qs.std(axis=0) - 1.0).max() < 0.1
    assert np.asarray(infos.divergent).sum() == 0
    # adaptation targets delta=0.8 accept stat
    assert 0.6 < np.asarray(infos.accept_stat).mean() < 1.0


def test_scaled_normal_metric_adaptation():
    scales = jnp.asarray([0.1, 1.0, 10.0])

    def logp(q):
        return -0.5 * jnp.sum((q / scales) ** 2)

    qs, infos, state = nuts_sample(
        logp, jnp.zeros(3), jax.random.PRNGKey(1),
        num_warmup=800, num_samples=2000,
    )
    qs = np.asarray(qs)
    assert np.allclose(qs.std(axis=0), np.asarray(scales), rtol=0.15)
    # inv_mass should approximate the marginal variances
    ratio = np.asarray(state.inv_mass) / np.asarray(scales) ** 2
    assert np.all(ratio > 0.3) and np.all(ratio < 3.0)


def test_conjugate_linear_regression():
    # y = X w + e, e ~ N(0, s2); prior w ~ N(0, t2 I)
    rng = np.random.default_rng(3)
    n, k = 200, 4
    X = rng.normal(size=(n, k))
    w_true = rng.normal(size=k)
    s2, t2 = 0.5**2, 2.0**2
    y = X @ w_true + rng.normal(0, np.sqrt(s2), size=n)

    prec = X.T @ X / s2 + np.eye(k) / t2
    cov_post = np.linalg.inv(prec)
    mean_post = cov_post @ (X.T @ y / s2)

    Xj, yj = jnp.asarray(X), jnp.asarray(y)

    def logp(q):
        resid = yj - Xj @ q
        return (-0.5 * jnp.sum(resid * resid) / s2
                - 0.5 * jnp.sum(q * q) / t2)

    qs, infos, _ = nuts_sample(
        logp, jnp.zeros(k), jax.random.PRNGKey(2),
        num_warmup=500, num_samples=3000,
    )
    qs = np.asarray(qs)
    se = np.sqrt(np.diag(cov_post) / 200)  # generous ESS-adjusted MC error
    assert np.all(np.abs(qs.mean(axis=0) - mean_post) < 5 * se)
    assert np.allclose(qs.std(axis=0), np.sqrt(np.diag(cov_post)), rtol=0.15)


def test_diagnostics_shape_and_treedepth():
    def logp(q):
        return -0.5 * jnp.sum(q * q)

    qs, infos, _ = nuts_sample(
        logp, jnp.zeros(2), jax.random.PRNGKey(4),
        num_warmup=200, num_samples=100,
        cfg=NutsConfig(max_treedepth=6),
    )
    assert infos.treedepth.shape == (100,)
    assert np.all(np.asarray(infos.treedepth) <= 6)
    assert np.all(np.asarray(infos.n_leapfrog) >= 1)
    # energy = -lp + kinetic >= -lp
    assert np.all(np.asarray(infos.energy) >= np.asarray(-infos.lp) - 1e-8)


def test_divergence_flagging():
    # pathological density: extreme curvature funnel forced with huge step
    def logp(q):
        return -0.5 * q[0] ** 2 - 0.5 * jnp.exp(q[0] * 4.0) * q[1] ** 2

    qs, infos, _ = nuts_sample(
        logp, jnp.asarray([2.0, 0.1]), jax.random.PRNGKey(5),
        num_warmup=0, num_samples=200, stepsize0=8.0, tune_stepsize=False,
    )
    assert np.asarray(infos.divergent).sum() > 0
