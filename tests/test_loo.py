"""PSIS-LOO / WAIC surface (stan4bart_tpu/loo.py + fit.log_lik/loo/waic).

Beyond the reference (rstanarm's log_lik/loo/waic generics); algorithm
tests pin the published definitions — Zhang-Stephens GPD recovery,
exact log-density reconstruction, and the elpd orderings that must
hold for any correct implementation.
"""

import numpy as np
import pytest
from scipy.special import logsumexp
from scipy.stats import genpareto, norm

import stan4bart_tpu as s4b
from stan4bart_tpu.loo import gpdfit, psis_loo, psis_smooth, waic
from stan4bart_tpu.utils.friedman import (
    friedman_dataframe,
    generate_friedman_data,
)


def test_gpdfit_recovers_shape():
    """Zhang-Stephens fit recovers k on simulated GPD exceedances."""
    rng = np.random.default_rng(0)
    for k_true in (0.1, 0.4, 0.7):
        x = genpareto.rvs(k_true, scale=1.0, size=4000,
                          random_state=rng)
        k_hat, sigma = gpdfit(x)
        assert abs(k_hat - k_true) < 0.1, (k_true, k_hat)
        assert 0.8 < sigma < 1.25


def test_psis_smooth_properties():
    """Smoothed weights: max 0, tail order preserved, finite k on a
    heavy-tailed sample; tiny draw counts fall back to raw weights."""
    rng = np.random.default_rng(1)
    lr = rng.standard_t(3, size=2000)  # heavy-tailed log ratios
    lw, k = psis_smooth(lr)
    assert lw.max() <= 1e-12
    assert np.isfinite(k)
    # smoothing must not reorder the tail
    order_raw = np.argsort(lr)[-50:]
    order_sm = np.argsort(lw)[-50:]
    assert np.array_equal(np.sort(order_raw), np.sort(order_sm))
    lw_small, k_small = psis_smooth(lr[:20])
    np.testing.assert_allclose(lw_small, lr[:20] - lr[:20].max())
    assert k_small == -np.inf


def test_psis_loo_matches_analytic_on_iid_normal():
    """For iid Normal(mu, 1) with a flat-ish posterior approximated by
    exact posterior draws, PSIS-LOO elpd must approach the closed-form
    LOO predictive density sum_i log p(y_i | y_-i)."""
    rng = np.random.default_rng(2)
    n, S = 80, 4000
    y = rng.standard_normal(n) + 1.7
    # conjugate posterior mu | y ~ N(ybar, 1/n) (sigma = 1 known)
    mu_draws = y.mean() + rng.standard_normal(S) / np.sqrt(n)
    ll = norm.logpdf(y[:, None], loc=mu_draws[None, :], scale=1.0)
    res = psis_loo(ll)
    # closed form: y_i | y_-i ~ N(mean(y_-i), 1 + 1/(n-1))
    elpd_exact = 0.0
    for i in range(n):
        m_i = (y.sum() - y[i]) / (n - 1)
        elpd_exact += norm.logpdf(y[i], loc=m_i,
                                  scale=np.sqrt(1.0 + 1.0 / (n - 1)))
    assert abs(res["elpd_loo"] - elpd_exact) < 1.0, (
        res["elpd_loo"], elpd_exact)
    assert res["n_high_k"] == 0
    # p_loo ~ 1 effective parameter (mu)
    assert 0.5 < res["p_loo"] < 2.0
    w = waic(ll)
    assert abs(w["elpd_waic"] - res["elpd_loo"]) < 0.5
    assert 0.5 < w["p_waic"] < 2.0


@pytest.fixture(scope="module")
def small_fit():
    # n and tree count chosen so per-point leverage is moderate: a
    # 75-tree default on n ~ 100 is so flexible that a THIRD of the
    # points legitimately get pareto_k > 0.7 (p_loo ~ n/2) — correct
    # diagnostics, but useless as a regression gate
    df = friedman_dataframe(generate_friedman_data(250, ranef=True))
    return s4b.stan4bart(
        "y ~ bart(X1 + X2 + X3 + X5) + X4 + (1 | g.1)", df,
        chains=2, iter=300, warmup=150, seed=11, verbose=-1,
        bart_args={"n.trees": 25}), df


def test_log_lik_matches_extracted_density(small_fit):
    """fit.log_lik reconstructs exactly from extract('ev') and sigma."""
    fit, _ = small_fit
    ll = fit.log_lik()
    ev = fit.extract("ev")
    sigma = fit.extract("sigma")
    y = np.asarray(fit.mf.y)
    expect = norm.logpdf(y[:, None], loc=ev, scale=sigma[None, :])
    np.testing.assert_allclose(ll, expect, rtol=1e-10)
    assert ll.shape == (250, fit.extract("sigma").size)


def test_loo_waic_on_fit(small_fit):
    """elpd_loo <= lppd (positive penalty), p_loo > 0, loo ~ waic, and
    most pareto_k below 0.7 on a well-specified model."""
    fit, _ = small_fit
    res = fit.loo()
    w = fit.waic()
    ll = fit.log_lik()
    lppd = float(np.sum(logsumexp(ll, axis=1) - np.log(ll.shape[1])))
    assert res["elpd_loo"] < lppd
    assert res["p_loo"] > 0
    assert w["p_waic"] > 0
    assert abs(res["elpd_loo"] - w["elpd_waic"]) < max(
        5.0, 3 * res["se_elpd_loo"])
    assert np.mean(res["pareto_k"] < 0.7) > 0.9


def test_loo_model_comparison(small_fit):
    """The true model must dominate a noise-feature-only model by
    several standard errors of the difference."""
    fit, df = small_fit
    rng = np.random.default_rng(3)
    df_noise = dict(df)
    df_noise["junk"] = rng.standard_normal(len(np.asarray(df["y"])))
    fit_bad = s4b.stan4bart(
        "y ~ bart(junk) + X4 + (1 | g.1)", df_noise,
        chains=2, iter=300, warmup=150, seed=12, verbose=-1,
        bart_args={"n.trees": 25})
    e_good = fit.loo()
    e_bad = fit_bad.loo()
    diff = e_good["elpd_loo"] - e_bad["elpd_loo"]
    se = np.sqrt(e_good["n_obs"] * np.var(
        e_good["elpd_i"] - e_bad["elpd_i"], ddof=1))
    assert diff > 3 * se, (diff, se)
    table = s4b.loo_compare({"true": e_good, "noise": e_bad})
    assert [r["name"] for r in table] == ["true", "noise"]
    assert table[0]["elpd_diff"] == 0.0 and table[0]["se_diff"] == 0.0
    np.testing.assert_allclose(table[1]["elpd_diff"], -diff)
    np.testing.assert_allclose(table[1]["se_diff"], se)


def test_log_lik_weighted_and_probit():
    """Weighted gaussian: var_i = sigma^2 / w_i; probit: Bernoulli."""
    df = friedman_dataframe(generate_friedman_data(100))
    w = np.linspace(0.5, 2.0, 100)
    fit = s4b.stan4bart("y ~ bart(X1 + X2 + X3 + X5) + X4", df,
                        weights=w, chains=2, iter=120, warmup=60,
                        seed=4, verbose=-1)
    ll = fit.log_lik()
    ev = fit.extract("ev")
    sigma = fit.extract("sigma")[None, :] / np.sqrt(w)[:, None]
    y = np.asarray(fit.mf.y)
    expect = norm.logpdf(y[:, None], loc=ev, scale=sigma)
    np.testing.assert_allclose(ll, expect, rtol=1e-10)

    yb = (np.asarray(df["y"]) > np.median(df["y"])).astype(float)
    dfb = dict(df)
    dfb["y"] = yb
    fitb = s4b.stan4bart("y ~ bart(X1 + X2 + X3 + X5) + X4", dfb,
                         chains=2, iter=120, warmup=60, seed=5,
                         verbose=-1)
    llb = fitb.log_lik()
    p = np.clip(fitb.extract("ev"), 1e-12, 1 - 1e-12)
    expectb = np.where(yb[:, None] > 0, np.log(p), np.log1p(-p))
    np.testing.assert_allclose(llb, expectb, rtol=1e-10)
    res = fitb.loo()
    assert np.all(np.isfinite(res["elpd_i"]))
