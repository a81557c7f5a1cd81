"""Centered random-effect parameterization: identical posterior to the
reference's non-centered rstanarm parameterization (pure reparameterization)
with better geometry in the data-dominated regime."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.stats import multivariate_normal, norm

from stan4bart_tpu.formula import build_model_frame
from stan4bart_tpu.models.assemble import build_parametric_model
from stan4bart_tpu.models.parametric import ParametricConfig, ParametricModel
from stan4bart_tpu.ops.nuts_driver import nuts_sample
from stan4bart_tpu.utils.friedman import friedman_dataframe, generate_friedman_data


def test_centered_b_lpdf_exact():
    cfg = ParametricConfig(
        N=4, K=0, has_intercept=False, is_binary=False, has_weights=False,
        prior_dist=0, prior_dist_for_intercept=0, prior_dist_for_aux=3,
        t=2, p=(2, 1), l=(3, 4), centered=True,
    )
    hyper = dict(
        prior_mean=np.zeros(0), prior_scale=np.ones(0), prior_df=np.ones(0),
        global_prior_df=0.0, global_prior_scale=0.0, slab_df=0.0,
        slab_scale=0.0, prior_mean_for_aux=0.0, prior_scale_for_aux=1.0,
        prior_df_for_aux=1.0, prior_mean_for_intercept=0.0,
        prior_scale_for_intercept=1.0, prior_df_for_intercept=1.0,
        shape_decov=np.ones(2), scale_decov=np.ones(2),
        regularization=np.ones(1), delta=np.ones(2),
    )
    zs = [(np.ones((4, 1)), np.zeros(4, dtype=np.int32))] * 2
    pm = ParametricModel(cfg, np.zeros((4, 0)), zs, hyper)
    rng = np.random.default_rng(0)
    theta_L = jnp.asarray([1.5, 0.4, 0.9, 2.0])
    b = jnp.asarray(rng.normal(size=10))
    lp = float(pm._centered_b_lpdf(b, theta_L))
    T1 = np.array([[1.5, 0.0], [0.4, 0.9]])
    expected = sum(
        multivariate_normal.logpdf(np.asarray(b[2 * j : 2 * j + 2]),
                                   np.zeros(2), T1 @ T1.T)
        for j in range(3)
    ) + norm.logpdf(np.asarray(b[6:]), 0, 2.0).sum()
    assert lp == pytest.approx(expected, rel=1e-12)


def test_centered_matches_noncentered_posterior():
    """Both parameterizations of the parametric posterior must agree
    (adjudicated against SMC: E[Sigma11] ~ 12.4 on this fixture)."""
    d = generate_friedman_data(250, ranef=True, causal=True)
    df = friedman_dataframe(d)
    mf = build_model_frame(
        "y ~ bart(X1+X2) + X4 + z + (1 + X4 | g.1) + (1 | g.2)", df
    )
    offset = jnp.asarray(d["mu_bart"])
    y = jnp.asarray(mf.y)
    out = {}
    for cen in (False, True):
        model, _, _ = build_parametric_model(
            mf, "gaussian", {"centered_ranef": cen}
        )
        qs, infos, _ = nuts_sample(
            lambda u: model.log_prob(u, offset, y),
            jnp.zeros(model.num_upars), jax.random.PRNGKey(0), 800, 2500,
        )
        draws = np.asarray(jax.vmap(model.constrained_draw)(qs))
        names = model.constrained_names()
        beta = draws[:, [names.index("beta.1"), names.index("beta.2")]]
        s11 = draws[:, names.index("theta_L.1")] ** 2
        out[cen] = dict(beta=beta.mean(0), s11=np.median(s11),
                        sigma=draws[:, names.index("aux.1")].mean())
    assert np.allclose(out[False]["beta"], out[True]["beta"], atol=0.5)
    assert out[False]["sigma"] == pytest.approx(out[True]["sigma"], abs=0.1)
    # heavy-tailed Sigma marginal: compare medians within 35%
    assert out[True]["s11"] == pytest.approx(out[False]["s11"], rel=0.35)
