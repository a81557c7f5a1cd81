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
