"""Tempered SMC backend: known-posterior recovery and evidence estimate."""

import numpy as np
import jax
import jax.numpy as jnp

from stan4bart_tpu.ops.smc import smc_sample


def test_gaussian_target():
    mean = jnp.asarray([1.0, -2.0, 0.5])
    sd = jnp.asarray([0.5, 2.0, 1.0])

    def logp(q):
        return -0.5 * jnp.sum(((q - mean) / sd) ** 2)

    res = smc_sample(logp, 3, 2048, jax.random.PRNGKey(0))
    assert float(res.final_temp) == 1.0
    u = np.asarray(res.particles)
    assert np.allclose(u.mean(axis=0), np.asarray(mean), atol=0.15)
    assert np.allclose(u.std(axis=0), np.asarray(sd), rtol=0.2)


def test_evidence_estimate():
    # target = unnormalized N(0, s^2); bridging from N(0,1):
    # Z = integral exp(logp) = (2 pi s^2)^(d/2); base included in bridge so
    # log_evidence estimates log [integral exp(logp)] - log [integral base]
    s = 2.0
    d = 2

    def logp(q):
        return -0.5 * jnp.sum(q * q) / s**2

    res = smc_sample(logp, d, 4096, jax.random.PRNGKey(1))
    logZ_true = 0.5 * d * np.log(2 * np.pi * s**2) - 0.5 * d * np.log(
        2 * np.pi
    )
    assert abs(float(res.log_evidence) - logZ_true) < 0.25


def test_bimodal_mixing():
    # two well-separated modes: tempering should populate both
    def logp(q):
        return jnp.logaddexp(
            -0.5 * jnp.sum((q - 3.0) ** 2) * 4.0,
            -0.5 * jnp.sum((q + 3.0) ** 2) * 4.0,
        )

    res = smc_sample(logp, 1, 4096, jax.random.PRNGKey(2), n_mcmc=10)
    u = np.asarray(res.particles)[:, 0]
    frac_pos = (u > 0).mean()
    assert 0.2 < frac_pos < 0.8, f"mode collapse: {frac_pos}"


def test_parametric_model_smc():
    from stan4bart_tpu.formula import build_model_frame
    from stan4bart_tpu.models.assemble import build_parametric_model
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    d = generate_friedman_data(150, ranef=True, causal=True)
    df = friedman_dataframe(d)
    mf = build_model_frame("y ~ bart(X1 + X2) + X4 + z + (1 | g.2)", df)
    model, _, _ = build_parametric_model(mf, "gaussian")
    offset = jnp.asarray(d["mu_bart"])
    y = jnp.asarray(mf.y)

    res = smc_sample(
        lambda u: model.log_prob(u, offset, y),
        model.num_upars, 1024, jax.random.PRNGKey(3), n_mcmc=8,
    )
    assert float(res.final_temp) == 1.0
    names = model.constrained_names()
    draws = np.asarray(jax.vmap(model.constrained_draw)(res.particles))
    beta1 = draws[:, names.index("beta.1")].mean()
    assert abs(beta1 - 10.0) < 2.5, f"beta1 = {beta1}"
