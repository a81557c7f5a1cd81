"""Misc reference-parity behaviors: rng reproducibility (test-05-rng.R),
fixef-only models (test-06-no_ranef.R), callback/keep_fits
(test-11-callback.R), bart_args reaching the sampler (test-09-bartArgs.R),
offset_type substitution (man/stan4bart.Rd:91-97), factor levels
(test-04-factor_levels.R)."""

import numpy as np
import pytest

import stan4bart_tpu as s4b
from stan4bart_tpu.utils.friedman import friedman_dataframe, generate_friedman_data


def _small_df(n=100, **kw):
    return friedman_dataframe(generate_friedman_data(n, **kw))


def test_rng_reproducibility():
    """Same seed -> identical draws; different seed -> different
    (test-05-rng.R)."""
    df = _small_df()
    kw = dict(chains=2, warmup=20, iter=50, verbose=-1,
              bart_args={"n.trees": 5})
    f1 = s4b.stan4bart("y ~ bart(X1 + X2) + X4", df, seed=123, **kw)
    f2 = s4b.stan4bart("y ~ bart(X1 + X2) + X4", df, seed=123, **kw)
    f3 = s4b.stan4bart("y ~ bart(X1 + X2) + X4", df, seed=124, **kw)
    np.testing.assert_array_equal(f1.extract("stan"), f2.extract("stan"))
    assert not np.array_equal(f1.extract("stan"), f3.extract("stan"))


def test_no_ranef_model():
    """Fixef-only model works; ranef extract returns empty dict
    (test-06-no_ranef.R)."""
    df = _small_df()
    fit = s4b.stan4bart("y ~ bart(X1 + X2 + X3 + X5) + X4", df,
                        chains=2, warmup=50, iter=150, seed=5, verbose=-1,
                        bart_args={"n.trees": 20})
    assert fit.mf.q == 0
    assert fit.extract("ranef") == {}
    assert fit.extract("Sigma") == {}
    ev = fit.fitted("ev")
    parts = fit.fitted("indiv.bart") + fit.fitted("indiv.fixef")
    np.testing.assert_allclose(ev, parts + fit.fitted("indiv.ranef"),
                               atol=1e-10)
    # still fits reasonably
    r2 = np.corrcoef(ev, df["y"])[0, 1] ** 2
    assert r2 > 0.7


def test_pure_bart_model():
    """K=0: no fixed effects at all."""
    df = _small_df()
    fit = s4b.stan4bart("y ~ bart(X1 + X2 + X3 + X4 + X5)", df,
                        chains=1, warmup=50, iter=150, seed=5, verbose=-1,
                        bart_args={"n.trees": 20})
    assert fit.mf.K == 0
    assert fit.extract("fixef").shape[0] == 0
    assert np.corrcoef(fit.fitted("ev"), df["y"])[0, 1] ** 2 > 0.7


def test_callback_keep_fits_false():
    """keep_fits=False stores only callback results (test-11:43-100)."""
    import jax.numpy as jnp

    df = _small_df()

    def cb(draw):
        # named access parity with the reference's callback environment
        # (yhat.train + named stan_pars; init.cpp:849-911)
        return {"yhat_mean": jnp.mean(draw.yhat_train),
                "sigma": draw["aux.1"]}

    fit = s4b.stan4bart("y ~ bart(X1 + X2) + X4", df,
                        chains=2, warmup=20, iter=60, seed=9, verbose=-1,
                        keep_fits=False, callback=cb,
                        bart_args={"n.trees": 5})
    out = fit.extract("callback")
    assert out["yhat_mean"].shape == (80,)
    assert np.all(out["sigma"] > 0)
    with pytest.raises(ValueError, match="keep_fits"):
        fit.extract("ev")


def test_callback_named_matches_extract():
    """Callback sigma by NAME reproduces extract('sigma') componentwise
    (test-11-callback.R:43-100); with keep_fits=True both are stored."""
    df = _small_df()

    def cb(draw):
        return {"sigma": draw["aux.1"], "yhat": draw.yhat_train}

    fit = s4b.stan4bart("y ~ bart(X1 + X2) + X4", df,
                        chains=2, warmup=20, iter=60, seed=9, verbose=-1,
                        keep_fits=True, callback=cb,
                        bart_args={"n.trees": 5})
    out = fit.extract("callback")
    np.testing.assert_allclose(out["sigma"], fit.extract("sigma"))
    np.testing.assert_allclose(out["yhat"], fit.extract("indiv.bart"))


def test_keep_fits_false_no_callback_stores_nothing():
    """Nothing raw is materialized (reference allocates no storage,
    init.cpp:691-720); only final states survive."""
    df = _small_df()
    fit = s4b.stan4bart("y ~ bart(X1 + X2) + X4", df,
                        chains=2, warmup=20, iter=60, seed=9, verbose=-1,
                        keep_fits=False, bart_args={"n.trees": 5})
    assert fit.draws is None
    assert fit.final_states is not None
    with pytest.raises(ValueError, match="keep_fits"):
        fit.extract("ev")
    with pytest.raises(ValueError, match="stored no raw draws"):
        fit.extract("callback")


def test_bart_args_reach_sampler():
    """n.trees/power/base/split.probs land in the kernel config
    (test-09-bartArgs.R)."""
    df = _small_df()
    sp = np.zeros(2)
    sp[0] = 1.0  # force all splits onto X1
    fit = s4b.stan4bart(
        "y ~ bart(X1 + X2) + X4", df,
        chains=1, warmup=30, iter=80, seed=2, verbose=-1,
        bart_args={"n.trees": 7, "power": 3.0, "base": 0.8,
                   "split.probs": sp},
    )
    assert fit.prog.bart_cfg.num_trees == 7
    assert fit.prog.bart_cfg.power == 3.0
    assert fit.prog.bart_cfg.base == 0.8
    vc = fit.fitted("varcount")
    assert vc[1] == 0.0 and vc[0] > 0.0


def test_offset_type_parametric():
    """offset_type='parametric' replaces the whole Stan mean with the user
    offset while still sampling it (init.cpp:83-97)."""
    d = generate_friedman_data(120)
    df = friedman_dataframe(d)
    user_off = d["mu_fixef"]
    fit = s4b.stan4bart(
        "y ~ bart(X1 + X2 + X3 + X5) + X4", df,
        offset=user_off, offset_type="parametric",
        chains=1, warmup=60, iter=160, seed=4, verbose=-1,
        bart_args={"n.trees": 20},
    )
    # BART conditions on the TRUE parametric mean: its fit should track
    # mu_bart well
    bart = fit.fitted("indiv.bart")
    cor = np.corrcoef(bart - bart.mean(),
                      d["mu_bart"] - d["mu_bart"].mean())[0, 1]
    assert cor > 0.87  # short run; exact value is seed-stream sensitive


def test_factor_levels():
    """Unused/new factor levels don't break fitting (test-04)."""
    rng = np.random.default_rng(0)
    n = 80
    df = {
        "y": rng.normal(size=n),
        "x1": rng.normal(size=n),
        "f": np.array(["a", "b", "c", "d"])[rng.integers(0, 3, n)],  # 'd' unused
        "g": np.array(["u", "v", "w"])[rng.integers(0, 3, n)],
    }
    fit = s4b.stan4bart("y ~ bart(x1 + f) + (1 | g)", df,
                        chains=1, warmup=15, iter=40, seed=1, verbose=-1,
                        bart_args={"n.trees": 4})
    new = dict(df)
    new["g"] = np.array(["u", "zz", "w"])[rng.integers(0, 3, n)]  # new level
    ev = None
    fit2 = s4b.stan4bart("y ~ bart(x1 + f) + (1 | g)", df,
                         chains=1, warmup=15, iter=40, seed=1, verbose=-1,
                         test=new, bart_args={"n.trees": 4})
    ev = fit2.extract("ev", sample="test")
    assert np.all(np.isfinite(ev))


def test_weights():
    df = _small_df()
    w = np.ones(100)
    w[:50] = 4.0
    fit = s4b.stan4bart("y ~ bart(X1 + X2) + X4", df, weights=w,
                        chains=1, warmup=30, iter=80, seed=6, verbose=-1,
                        bart_args={"n.trees": 8})
    # ppd noise is scaled by 1/sqrt(w)
    ev = fit.extract("ev")
    ppd = fit.extract("ppd")
    noise = ppd - ev
    sd_hi = noise[:50].std()
    sd_lo = noise[50:].std()
    assert sd_lo / sd_hi > 1.5  # ~2 expected


def test_subset_offset_test_accessors():
    """subset/offset_test formals + per-component accessors
    (stan4bart.R:4,11,108; lme4_functions.R:1403-1482)."""
    df = _small_df(120)
    sub = np.arange(100)
    fit = s4b.stan4bart("y ~ bart(X1 + X2) + X4", df, subset=sub,
                        chains=1, warmup=15, iter=40, seed=2, verbose=-1,
                        bart_args={"n.trees": 4})
    assert fit.mf.N == 100
    # boolean mask form
    mask = np.zeros(120, dtype=bool)
    mask[:90] = True
    fit_b = s4b.stan4bart("y ~ bart(X1 + X2) + X4", df, subset=mask,
                          chains=1, warmup=15, iter=40, seed=2, verbose=-1,
                          bart_args={"n.trees": 4})
    assert fit_b.mf.N == 90
    # offset_test replaces the test offset (stan4bart.R:108)
    test = {k: np.asarray(v)[:20] for k, v in df.items()}
    off = np.full(20, 7.0)
    f1 = s4b.stan4bart("y ~ bart(X1 + X2) + X4", df, test=test,
                       offset_test=off, chains=1, warmup=15, iter=40,
                       seed=2, verbose=-1, bart_args={"n.trees": 4})
    f0 = s4b.stan4bart("y ~ bart(X1 + X2) + X4", df, test=test,
                       chains=1, warmup=15, iter=40, seed=2, verbose=-1,
                       bart_args={"n.trees": 4})
    np.testing.assert_allclose(
        f1.fitted("ev", sample="test"), f0.fitted("ev", sample="test") + 7.0,
        atol=1e-8,
    )
    # accessors
    assert "bart(" in f1.formula
    assert f1.terms("fixed") == ["X4"]
    assert f1.terms("bart") == ["X1", "X2"]
    X, names = f1.model_frame("fixed")
    assert X.shape[1] == len(names) == 1


def test_gram_fit_matches_direct_fit():
    """An end-to-end fit with the Gram-compressed likelihood reproduces
    the direct-likelihood fit (exact reformulation; f64 round-off only —
    compare the early window before MH chaos can amplify ulps)."""
    df = friedman_dataframe(generate_friedman_data(90, ranef=True))
    kw = dict(chains=2, warmup=15, iter=40, seed=5, verbose=-1,
              bart_args={"n.trees": 4})
    f_on = s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df,
                         stan_args={"gram_lik": True}, **kw)
    f_off = s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df,
                          stan_args={"gram_lik": False}, **kw)
    assert f_on.prog.use_gram and not f_off.prog.use_gram
    np.testing.assert_allclose(
        np.asarray(f_on.draws.stan[:, :10]),
        np.asarray(f_off.draws.stan[:, :10]),
        rtol=1e-6, atol=1e-6,
    )
    # and both sample the same posterior over the full (short) run
    assert np.all(np.isfinite(f_on.extract("ev")))


def test_logical_treatment():
    """test-10-treatment.R: a logical (boolean) treatment column builds
    the counterfactual frame and fitted(sample='test') works."""
    df = dict(_small_df(100, ranef=True, causal=True))
    df["z"] = np.asarray(df["z"]) > 0
    fit = s4b.stan4bart(
        "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 + X4 | g.1) "
        "+ (1 | g.2)", df,
        chains=3, warmup=7, iter=13, verbose=-1, seed=0,
        bart_args={"n.trees": 11}, treatment="z",
    )
    ft = fit.fitted(sample="test")
    assert ft.shape == (100,) and np.all(np.isfinite(ft))
    # counterfactual frame flipped the treatment for every row
    assert not np.array_equal(
        np.asarray(fit.test_frame.X), np.asarray(fit.mf.X)
    )
