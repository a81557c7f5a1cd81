"""Binary probit end-to-end, mirroring test-02-binary.R: deviance quality,
predict/extract consistency, ppd calibration."""

import numpy as np
import pytest
from scipy.stats import norm

import stan4bart_tpu as s4b
from stan4bart_tpu.utils.friedman import friedman_dataframe, generate_friedman_data

N = 300


@pytest.fixture(scope="module")
def fit_and_data():
    d = generate_friedman_data(N, ranef=True, binary=True)
    df = friedman_dataframe(d)
    fit = s4b.stan4bart(
        "y ~ bart(X1 + X2 + X3 + X5) + X4 + (1 | g.2)", df,
        chains=2, warmup=300, iter=700, seed=11, verbose=-1,
        bart_args={"n.trees": 40},
    )
    return fit, d, df


def test_family_detected(fit_and_data):
    fit, d, df = fit_and_data
    assert fit.family == "binomial"
    assert "aux.1" not in fit.stan_names  # no sigma for probit


def test_probabilities_calibrated(fit_and_data):
    """ev must be probabilities tracking the true probit mean."""
    fit, d, df = fit_and_data
    ev = fit.fitted("ev")
    assert np.all((ev > 0) & (ev < 1))
    p_true = norm.cdf(d["mu"])
    cor = np.corrcoef(ev, p_true)[0, 1]
    assert cor > 0.75, f"cor(ev, true p) = {cor}"
    # deviance no worse than the null model by a wide margin
    y = d["y"]
    dev = -2 * np.sum(y * np.log(ev) + (1 - y) * np.log1p(-ev))
    p0 = y.mean()
    dev0 = -2 * np.sum(y * np.log(p0) + (1 - y) * np.log1p(-p0))
    assert dev < 0.8 * dev0, f"deviance {dev} vs null {dev0}"


def _deviance(p, y):
    p = np.clip(p, 1e-9, 1 - 1e-9)
    return -2 * np.sum(y * np.log(p) + (1 - y) * np.log1p(-p))


@pytest.mark.slow
def test_deviance_ladder_vs_fitted_comparators(fit_and_data):
    """The reference's test-02-binary.R:32-79 gates against FITTED
    comparators, not the null: deviance <= glmer-analog (probit IRLS with
    group dummies), <= 1.35x a BART-only fit (bart2 analog), and <= 1.35x
    the VI backend (rbart_vi analog)."""
    fit, d, df = fit_and_data
    y = d["y"]
    ev = fit.fitted("ev")
    dev_s4b = _deviance(ev, y)

    # glmer analog: probit IRLS on [1, X, Z] (the package's init ladder)
    from stan4bart_tpu.fit import _init_parametric_fit

    eta_glm, _ = _init_parametric_fit(fit.mf, "binomial")
    dev_glm = _deviance(norm.cdf(eta_glm), y)

    # bart2 analog: BART-only probit fit on the same predictors
    bart_only = s4b.stan4bart(
        "y ~ bart(X1 + X2 + X3 + X4 + X5)", df,
        chains=2, warmup=300, iter=700, seed=12, verbose=-1,
        bart_args={"n.trees": 40},
    )
    dev_bart = _deviance(bart_only.fitted("ev"), y)

    # rbart_vi analog: the VI backend on the full model
    vi = s4b.stan4bart(
        "y ~ bart(X1 + X2 + X3 + X5) + X4 + (1 | g.2)", df,
        chains=2, warmup=300, iter=700, seed=13, verbose=-1,
        algorithm="vi", bart_args={"n.trees": 40},
    )
    dev_vi = _deviance(vi.fitted("ev"), y)

    assert dev_s4b <= dev_glm, (dev_s4b, dev_glm)
    assert dev_s4b <= 1.35 * dev_bart, (dev_s4b, dev_bart)
    assert dev_s4b <= 1.35 * dev_vi, (dev_s4b, dev_vi)


def test_sigma_raises(fit_and_data):
    fit, _, _ = fit_and_data
    with pytest.raises(ValueError, match="binary"):
        fit.extract("sigma")


def test_ppd_binary(fit_and_data):
    """ppd draws are 0/1 with mean matching ev (test-02:125-145)."""
    fit, d, df = fit_and_data
    ppd = fit.extract("ppd")
    assert set(np.unique(ppd)) <= {0.0, 1.0}
    ev = fit.fitted("ev")
    # standardized residual of ppd mean vs ev small
    resid = np.abs(ppd.mean(axis=-1) - ev).mean()
    assert resid < 0.05, f"mean |ppd - ev| = {resid}"


def test_latent_flow_components(fit_and_data):
    """indiv components combine on the LATENT scale then map through Phi."""
    fit, d, df = fit_and_data
    bart = fit.extract("indiv.bart")
    fx = fit.extract("indiv.fixef")
    rf = fit.extract("indiv.ranef")
    ev = fit.extract("ev")
    np.testing.assert_allclose(ev, norm.cdf(bart + fx + rf), atol=1e-10)
