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


def test_R2_prior_fit(df):
    """An actual R2-prior fit (stan_lm semantics over the QR-rotated
    coefficients; priors.R:560-563, 626-659)."""
    fit = s4b.stan4bart(
        "y ~ bart(X1 + X2 + X3 + X5) + X4 + z", df,
        chains=1, warmup=100, iter=250, seed=11, verbose=-1,
        bart_args={"n.trees": 20},
        stan_args={"prior": priors.R2(0.5, "mean"), "qr": True},
    )
    fx = fit.extract("fixef").mean(-1)
    assert np.all(np.isfinite(fx))
    assert abs(fx[1] - 5.0) < 3.5
    r2 = fit.extract("stan")[fit._name_idx["R2.1"]]
    assert np.all((r2 > 0) & (r2 < 1))


def test_R2_validation():
    with pytest.raises(ValueError, match="negative"):
        priors.R2(0.5, "log")
    with pytest.raises(ValueError, match="mode"):
        priors.R2(1.5, "mode")
    with pytest.raises(ValueError, match="single numeric"):
        priors.R2(None)
    # mode needs K > 2 (priors.R:637-643)
    with pytest.raises(ValueError, match="fewer than three"):
        priors.make_eta(0.5, "mode", 2)
    # eta closed forms (priors.R:645-648)
    assert priors.make_eta(0.5, "mean", 4) == pytest.approx(2.0)
    assert priors.make_eta(0.5, "mode", 4) == pytest.approx(
        (2.0 - 1.0 - 0.5 * 2.0 + 0.5 * 2.0) / 0.5)
    # median/log solve numerically and are positive
    assert priors.make_eta(0.5, "median", 4) > 0
    assert priors.make_eta(-1.0, "log", 4) > 0


def test_R2_requires_qr(df):
    with pytest.raises(ValueError, match="qr"):
        s4b.stan4bart(
            "y ~ bart(X1 + X2) + X4 + z", df, chains=1, warmup=10, iter=20,
            verbose=-1, stan_args={"prior": priors.R2(0.5, "mean")},
        )


def test_dirichlet_constructor_and_misuse(df):
    d = priors.dirichlet(concentration=2.0)
    assert d == {"dist": "dirichlet", "concentration": 2.0}
    with pytest.raises(ValueError, match="positive"):
        priors.dirichlet(-1.0)
    with pytest.raises(ValueError, match="covariance-simplex"):
        s4b.stan4bart(
            "y ~ bart(X1 + X2) + X4", df, chains=1, warmup=10, iter=20,
            verbose=-1, stan_args={"prior": d},
        )


def test_prior_validation_errors():
    with pytest.raises(ValueError, match="positive"):
        priors.normal(0, -1.0)
    with pytest.raises(ValueError, match="positive"):
        priors.student_t(df=-2)
    with pytest.raises(ValueError, match="positive"):
        priors.decov(shape=0.0)
    with pytest.raises(ValueError, match="positive"):
        priors.lkj(scale=-1.0)


def test_lkj_prior_covariance():
    """lkj() as prior_covariance: independent half-t sds + LKJ correlation
    (wired, not just constructible)."""
    d = generate_friedman_data(150, ranef=True)
    dfr = friedman_dataframe(d)
    fit = s4b.stan4bart(
        "y ~ bart(X1 + X2) + X4 + (1 + X4 | g.1)", dfr,
        chains=1, warmup=100, iter=250, seed=12, verbose=-1,
        bart_args={"n.trees": 15},
        stan_args={"prior_covariance": priors.lkj(
            regularization=2.0, scale=5.0, df=3.0)},
    )
    S = fit.extract("Sigma")["g.1"].mean(-1)
    assert np.all(np.linalg.eigvalsh(S) > 0)
    assert np.all(np.isfinite(fit.extract("ev")))
    # sds block present in the draw layout (replaces decov tau/zeta)
    assert "sds.1" in fit.stan_names and "tau.1" not in fit.stan_names


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
