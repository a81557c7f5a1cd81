"""The Stan control surface: adaptation buffers, stepsize, jitter, unknown
key warnings, derived skip default (stan_sampler.cpp:395-458;
init.cpp:206-209)."""

import warnings

import numpy as np
import pytest

import stan4bart_tpu as s4b
from stan4bart_tpu.formula.design import build_model_frame
from stan4bart_tpu.models.assemble import StanArgs, build_parametric_model
from stan4bart_tpu.ops.nuts import make_adapt_schedule
from stan4bart_tpu.utils.friedman import friedman_dataframe, generate_friedman_data


def test_custom_windows_change_schedule():
    default = make_adapt_schedule(300)
    custom = make_adapt_schedule(300, init_buffer=20, term_buffer=20,
                                 base_window=40)
    assert not np.array_equal(default["collect"], custom["collect"])
    assert not np.array_equal(default["window_end"], custom["window_end"])
    # custom collection starts at its init buffer, default at 75
    assert custom["collect"][:20].sum() == 0 and custom["collect"][20]
    assert default["collect"][:75].sum() == 0 and default["collect"][75]
    # last window in both ends exactly at num_warmup - term_buffer
    assert np.flatnonzero(custom["window_end"])[-1] == 300 - 20 - 1
    assert np.flatnonzero(default["window_end"])[-1] == 300 - 50 - 1


def test_unknown_stan_args_warn():
    df = friedman_dataframe(generate_friedman_data(60))
    mf = build_model_frame("y ~ bart(X1+X2) + X4", df)
    with pytest.warns(UserWarning, match="unsupported stan_args"):
        build_parametric_model(mf, "gaussian", {"not_a_real_arg": 1})
    with pytest.warns(UserWarning, match="BART component"):
        build_parametric_model(mf, "gaussian",
                               {"prior_intercept": {"dist": "normal"}})


def test_adapt_buffers_reach_gibbs_program():
    df = friedman_dataframe(generate_friedman_data(60))
    fit = s4b.stan4bart(
        "y ~ bart(X1+X2) + X4", df, chains=1, warmup=120, iter=140, seed=0,
        verbose=-1, bart_args={"n.trees": 3},
        stan_args={"adapt_init_buffer": 10, "adapt_term_buffer": 10,
                   "adapt_base_window": 30},
    )
    sched_collect = np.asarray(fit.prog.sched_collect)
    assert sched_collect[:10].sum() == 0 and sched_collect[10]
    assert np.flatnonzero(np.asarray(fit.prog.sched_window_end))[-1] == 109


def test_stepsize_and_jitter_wired():
    df = friedman_dataframe(generate_friedman_data(60))
    fit = s4b.stan4bart(
        "y ~ bart(X1+X2) + X4", df, chains=1, warmup=20, iter=50, seed=0,
        verbose=-1, bart_args={"n.trees": 3},
        stan_args={"stepsize": 0.25, "stepsize_jitter": 0.3},
    )
    assert fit.prog.stepsize_init == 0.25
    assert fit.prog.nuts_cfg.stepsize_jitter == 0.3
    # jitter makes the reported post-warmup stepsize vary draw to draw
    ss = fit.extract("stan")[fit._name_idx["stepsize__"]]
    assert np.std(ss) > 1e-3
    base = s4b.stan4bart(
        "y ~ bart(X1+X2) + X4", df, chains=1, warmup=20, iter=50, seed=0,
        verbose=-1, bart_args={"n.trees": 3},
    )
    ss0 = base.extract("stan")[base._name_idx["stepsize__"]]
    assert np.std(ss0) < 1e-12  # frozen stepsize without jitter


def test_derived_skip_default():
    df = friedman_dataframe(generate_friedman_data(60))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fit = s4b.stan4bart("y ~ bart(X1+X2) + X4", df, chains=1, warmup=0,
                            iter=12, seed=0, verbose=-1,
                            bart_args={"n.trees": 3})
    # skip unset, warmup 0 -> stan skip = (2000 - 0) // 1000 = 2
    assert fit.prog.skip_stan == 2 and fit.prog.skip_bart == 1


def test_stan_args_seed_used():
    df = friedman_dataframe(generate_friedman_data(60))
    kw = dict(chains=1, warmup=15, iter=35, verbose=-1,
              bart_args={"n.trees": 3})
    f1 = s4b.stan4bart("y ~ bart(X1+X2) + X4", df,
                       stan_args={"seed": 123}, **kw)
    f2 = s4b.stan4bart("y ~ bart(X1+X2) + X4", df, seed=123, **kw)
    np.testing.assert_allclose(f1.extract("ev"), f2.extract("ev"))


def test_sigma_gibbs_posterior_parity():
    """The extra exact sigma conditional update (stan_args sigma_gibbs) is
    its own Metropolis-within-Gibbs kernel: the sigma posterior must match
    the NUTS-only chain within MC error."""
    df = friedman_dataframe(generate_friedman_data(150, ranef=True))
    # sigma mixes slowly against the Gibbs-moving conditional, so short
    # chains compare transients, not posteriors — use a real run length
    # (validated further by the exact-invariance check of the slice kernel
    # against a grid-integrated conditional during development)
    kw = dict(chains=2, warmup=500, iter=1500, seed=77, verbose=-1,
              bart_args={"n.trees": 15})
    base = s4b.stan4bart("y ~ bart(X1+X2+X3) + X4 + (1 | g.2)", df, **kw)
    sg = s4b.stan4bart("y ~ bart(X1+X2+X3) + X4 + (1 | g.2)", df,
                       stan_args={"sigma_gibbs": True}, **kw)
    s0, s1 = base.extract("sigma"), sg.extract("sigma")
    assert abs(s0.mean() - s1.mean()) < 0.5 * s0.std() + 0.05
    assert 0.5 < s1.std() / s0.std() < 2.0
    assert np.all(np.isfinite(sg.extract("ev")))


def test_bounds_validation():
    """rc_bounds-analog validation of formals and stan control values
    (stan4bart_fit.R:385-410; stan_sampler.cpp:420-458)."""
    df = friedman_dataframe(generate_friedman_data(40))
    for kw, msg in [
        (dict(iter=0), "iter"),
        (dict(chains=0), "chains"),
        (dict(skip=0), "skip"),
        (dict(cores=0), "cores"),
        (dict(stan_args={"adapt_delta": 1.5}), "adapt_delta"),
        (dict(stan_args={"stepsize": -1.0}), "stepsize"),
        (dict(stan_args={"max_treedepth": 0}), "max_treedepth"),
        (dict(stan_args={"freeze_rule": "nope"}), "freeze_rule"),
    ]:
        with pytest.raises(ValueError, match=msg):
            s4b.stan4bart("y ~ bart(X1+X2) + X4", df, verbose=-1, **kw)
