"""End-to-end continuous + causal model, mirroring the reference's
test-01-continuous.R: extract/fitted consistency, component identities,
statistical-quality gates (cor(indiv.bart, truth) >= 0.95 etc.), warmup
splicing, varcount dims, ppd calibration."""

import numpy as np
import pytest
from scipy.stats import norm

import stan4bart_tpu as s4b
from stan4bart_tpu.utils.friedman import friedman_dataframe, generate_friedman_data

N = 250
CHAINS = 3
WARMUP, ITER = 300, 700  # 400 kept


@pytest.fixture(scope="module")
def data():
    d = generate_friedman_data(N, ranef=True, causal=True)
    return d, friedman_dataframe(d)


@pytest.fixture(scope="module")
def fit(data):
    d, df = data
    return s4b.stan4bart(
        "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 + X4 | g.1) + (1 | g.2)",
        df,
        treatment="z",
        chains=CHAINS, warmup=WARMUP, iter=ITER, seed=7, verbose=-1,
        bart_args={"n.trees": 50},
    )


def test_no_intercept(fit):
    assert "(Intercept)" not in fit.mf.X_names
    assert not any(n.startswith("gamma") for n in fit.stan_names)


def test_shapes(fit):
    kept = ITER - WARMUP
    ev = fit.extract("ev")
    assert ev.shape == (N, kept * CHAINS)
    ev_nc = fit.extract("ev", combine_chains=False)
    assert ev_nc.shape == (N, kept, CHAINS)
    ev_w = fit.extract("ev", include_warmup=True)
    assert ev_w.shape == (N, ITER * CHAINS)
    vc = fit.extract("varcount")
    assert vc.shape == (9, kept * CHAINS)
    k = fit.extract("sigma")
    assert k.shape == (kept * CHAINS,)


def test_extract_matches_fitted(fit):
    for typ in ("ev", "indiv.bart", "indiv.fixef", "indiv.ranef"):
        draws = fit.extract(typ)
        m = fit.fitted(typ)
        assert np.allclose(draws.mean(axis=-1), m), typ
    # test sample
    draws = fit.extract("ev", sample="test")
    assert np.allclose(draws.mean(axis=-1), fit.fitted("ev", sample="test"))


def test_ev_is_sum_of_components(fit):
    ev = fit.fitted("ev")
    parts = (fit.fitted("indiv.bart") + fit.fitted("indiv.fixef")
             + fit.fitted("indiv.ranef"))
    assert np.allclose(ev, parts, atol=1e-8)


def test_statistical_quality(fit, data):
    """The reference's quality gates (test-01-continuous.R:119-160)."""
    d, df = data
    bart = fit.fitted("indiv.bart")
    # bart component identified up to a constant shift (intercept absorbed)
    bc = bart - bart.mean()
    tc = d["mu_bart"] - d["mu_bart"].mean()
    cor_bart = np.corrcoef(bc, tc)[0, 1]
    assert cor_bart >= 0.95, f"cor(indiv.bart, truth) = {cor_bart}"

    fx = fit.fitted("indiv.fixef")
    mu_fx = np.where(d["z"] == 1, d["mu_fixef_1"], d["mu_fixef_0"])
    cor_fx = np.corrcoef(fx - fx.mean(), mu_fx - mu_fx.mean())[0, 1]
    assert cor_fx >= 0.99, f"cor(indiv.fixef, truth) = {cor_fx}"

    rf = fit.fitted("indiv.ranef")
    cor_rf = np.corrcoef(rf, d["mu_ranef"])[0, 1]
    assert cor_rf >= 0.68, f"cor(indiv.ranef, truth) = {cor_rf}"

    sigma = fit.fitted("sigma")
    assert 0.8 < sigma < 1.4, f"sigma = {sigma}"


def test_treatment_effect(fit, data):
    """ICATE/SATE machinery (readme.md:60-92): ev train vs counterfactual."""
    d, df = data
    ev_train = fit.extract("ev")
    ev_test = fit.extract("ev", sample="test")
    z = d["z"][:, None]
    icate = (ev_train - ev_test) * (2 * z - 1)
    sate = icate.mean(axis=0)
    # truth tau = 5
    assert abs(sate.mean() - d["tau"]) < 1.0, f"SATE = {sate.mean()}"


def test_ppd_noise_calibration(fit):
    """sd(ppd - ev) / sigma within 1.1 (test-01-continuous.R:263-281)."""
    ev = fit.extract("ev")
    ppd = fit.extract("ppd")
    sigma = fit.fitted("sigma")
    ratio = (ppd - ev).std() / sigma
    assert 1 / 1.15 < ratio < 1.15, f"ppd noise ratio = {ratio}"


def test_sigma_Sigma_ranef(fit, data):
    d, _ = data
    Sig = fit.extract("Sigma")
    assert set(Sig.keys()) == {"g.1", "g.2"}
    assert Sig["g.1"].shape[:2] == (2, 2)
    assert Sig["g.2"].shape[:2] == (1, 1)
    # posterior mean covariances positive definite
    S1 = Sig["g.1"].mean(axis=-1)
    assert np.all(np.linalg.eigvalsh(S1) > 0)
    ranef = fit.extract("ranef")
    assert ranef["g.1"].shape[:2] == (5, 2)
    assert ranef["g.2"].shape[:2] == (8, 1)


def test_fixef_names_and_vals(fit, data):
    d, _ = data
    fx = fit.extract("fixef")
    assert fx.shape[0] == 2
    assert fit.mf.X_names == ["X4", "z"]
    est = fx.mean(axis=-1)
    assert abs(est[0] - 10.0) < 3.0   # X4 slope
    assert abs(est[1] - 5.0) < 1.5    # treatment effect


def test_diagnostics_present(fit):
    stan = fit.extract("stan")
    assert stan.shape[0] == len(fit.stan_names)
    div_idx = fit.stan_names.index("divergent__")
    assert stan[div_idx].sum() < 0.2 * stan.shape[1]


def test_rmse_beats_linear_mixed_model():
    """test-01-continuous.R:152/193: held-out RMSE <= the linear
    mixed-model comparator (the reference gates against lme4::lmer; here
    the comparator is unpenalized least squares on [1, X, Z-dummies] —
    at n >> p that is lmer's fixed+BLUP fit without shrinkage, an upper
    bound on its flexibility).  BART must beat it on the nonlinear
    Friedman surface."""
    rng = np.random.default_rng(3)
    d = generate_friedman_data(300, ranef=True, causal=False)
    df = friedman_dataframe(d)
    idx = rng.permutation(300)
    tr, te = idx[:220], idx[220:]
    df_tr = {k: np.asarray(v)[tr] for k, v in df.items()}
    df_te = {k: np.asarray(v)[te] for k, v in df.items()}

    fit = s4b.stan4bart(
        "y ~ bart(. - g.1 - g.2 - X4) + X4 + (1 + X4 | g.1) + (1 | g.2)",
        df_tr, test=df_te,
        chains=2, warmup=250, iter=600, seed=9, verbose=-1,
        bart_args={"n.trees": 50},
    )
    yhat_test = fit.fitted(sample="test")
    rmse_bart = float(np.sqrt(np.mean((yhat_test - df_te["y"]) ** 2)))

    # linear comparator: least squares on [1, X1..X10, g.1 dummies,
    # X4:g.1 dummies, g.2 dummies]
    def design(dd):
        cols = [np.ones(len(dd["y"]))]
        for j in range(1, 11):
            cols.append(np.asarray(dd[f"X{j}"], float))
        for g, inter in (("g.1", False), ("g.1", True), ("g.2", False)):
            levels = np.unique(np.asarray(df[g]))
            onehot = (np.asarray(dd[g])[:, None] == levels[None, :]
                      ).astype(float)
            cols.append(onehot * np.asarray(dd["X4"], float)[:, None]
                        if inter else onehot)
        return np.column_stack(cols)

    A_tr, A_te = design(df_tr), design(df_te)
    coef, *_ = np.linalg.lstsq(A_tr, np.asarray(df_tr["y"], float),
                               rcond=None)
    rmse_lin = float(np.sqrt(np.mean((A_te @ coef - df_te["y"]) ** 2)))
    assert rmse_bart <= rmse_lin, (rmse_bart, rmse_lin)
