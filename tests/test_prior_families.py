"""Every coefficient/aux prior family runs through the full Gibbs fit and
produces sane estimates (continuous.stan prior codes 1-7)."""

import numpy as np
import pytest

import stan4bart_tpu as s4b
from stan4bart_tpu.models import priors
from stan4bart_tpu.utils.friedman import friedman_dataframe, generate_friedman_data


@pytest.fixture(scope="module")
def df():
    return friedman_dataframe(generate_friedman_data(150, causal=True))


@pytest.mark.parametrize("prior", [
    priors.normal(0, 2.5, autoscale=True),
    priors.student_t(df=4, scale=2.5, autoscale=True),
    priors.cauchy(scale=2.5),
    priors.hs(),
    priors.hs_plus(),
    priors.laplace(scale=2.5, autoscale=True),
    priors.lasso(scale=2.5),
    priors.product_normal(df=2, scale=1.0),
], ids=lambda p: p["dist"])
def test_coef_prior_family(df, prior):
    fit = s4b.stan4bart(
        "y ~ bart(X1 + X2 + X3 + X5) + X4 + z", df,
        chains=1, warmup=100, iter=250, seed=8, verbose=-1,
        bart_args={"n.trees": 20}, stan_args={"prior": prior},
    )
    fx = fit.extract("fixef").mean(-1)
    assert np.all(np.isfinite(fx))
    # z coefficient (treatment effect 5) identified under every prior;
    # shrinkage priors (hs global_scale .01) pull hard on small data
    assert abs(fx[1] - 5.0) < 3.5, (prior["dist"], fx)
    assert 0.5 < fit.fitted("sigma") < 4.0


@pytest.mark.parametrize("prior_aux", [
    priors.normal(0, 1, autoscale=True),
    priors.student_t(df=4, scale=1, autoscale=True),
    priors.exponential(autoscale=True),
], ids=lambda p: p["dist"])
def test_aux_prior_family(df, prior_aux):
    fit = s4b.stan4bart(
        "y ~ bart(X1 + X2 + X3 + X5) + X4 + z", df,
        chains=1, warmup=100, iter=250, seed=9, verbose=-1,
        bart_args={"n.trees": 20}, stan_args={"prior_aux": prior_aux},
    )
    assert 0.5 < fit.fitted("sigma") < 4.0


def test_decov_hyperparams(df):
    d = generate_friedman_data(150, ranef=True)
    dfr = friedman_dataframe(d)
    fit = s4b.stan4bart(
        "y ~ bart(X1 + X2) + X4 + (1 + X4 | g.1)", dfr,
        chains=1, warmup=100, iter=250, seed=10, verbose=-1,
        bart_args={"n.trees": 15},
        stan_args={"prior_covariance": priors.decov(
            regularization=2.0, concentration=2.0, shape=2.0, scale=2.0)},
    )
    S = fit.extract("Sigma")["g.1"].mean(-1)
    assert np.all(np.linalg.eigvalsh(S) > 0)
