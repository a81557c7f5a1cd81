"""Cross-chain pooled NUTS adaptation (NutsConfig.pooled_axis).

The reference adapts each chain in its own process
(/root/reference/R/stan4bart_fit.R:495-558), so cross-chain pooling was
impossible there.  On TPU chains are one vmapped axis, so pooling the
dual-averaging accept signal and the window-end metric is a single pmean
collective.  These tests check the structural contract (shared stepsize /
metric across chains, unpooled path unchanged) and that a pooled fit
still passes a statistical sanity gate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stan4bart_tpu.formula import build_model_frame
from stan4bart_tpu.gibbs import GibbsProgram
from stan4bart_tpu.models.assemble import build_parametric_model
from stan4bart_tpu.ops.bart import BartConfig
from stan4bart_tpu.ops.nuts import (
    NutsConfig,
    WelfordState,
    pooled_welford_variance,
    welford_variance,
)
from stan4bart_tpu.utils.friedman import (
    friedman_dataframe,
    generate_friedman_data,
)


def _make_prog(nuts_cfg, n=150, warmup=60, iters=5):
    d = generate_friedman_data(n, ranef=True, causal=True)
    df = friedman_dataframe(d)
    mf = build_model_frame(
        "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 | g.1)", df
    )
    pm, _, _ = build_parametric_model(
        mf, "gaussian", {}, dtype=jnp.float64
    )
    return GibbsProgram(
        pm, BartConfig(num_trees=5), mf.y, mf.bart_X,
        warmup=warmup, iterations=iters, dtype=jnp.float64,
        nuts_cfg=nuts_cfg,
    )


def _warm_states(prog, chains=4, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), chains)
    states = jax.jit(jax.vmap(prog.init_state, axis_name="chains"))(keys)

    def wchunk(state):
        def body(state, i):
            state, _ = prog.step(state, i, True)
            return state, None
        state, _ = jax.lax.scan(body, state, jnp.arange(prog.warmup))
        return state

    return jax.jit(jax.vmap(wchunk, axis_name="chains"))(states)


def test_pooled_welford_variance_math():
    # two "chains" with known samples; pooled within-chain variance is the
    # mean of per-chain variances with pooled-count regularization
    xs = np.array([[1.0, 2.0, 3.0, 4.0], [2.0, 4.0, 6.0, 8.0]])
    n = xs.shape[1]
    w = WelfordState(
        count=jnp.asarray([float(n)] * 2),
        mean=jnp.asarray(xs.mean(axis=1)),
        m2=jnp.asarray(((xs - xs.mean(axis=1, keepdims=True)) ** 2).sum(1)),
    )
    pooled = jax.vmap(
        lambda wi: pooled_welford_variance(wi, "c"), axis_name="c"
    )(w)
    # geometric mean of per-chain variances (outlier-chain robustness)
    var_within = np.exp(np.log(xs.var(axis=1, ddof=1)).mean())
    N = n * 2
    expect = (N / (N + 5.0)) * var_within + 1e-3 * (5.0 / (N + 5.0))
    np.testing.assert_allclose(np.asarray(pooled), expect, rtol=1e-12)

    # between-term variant adds Var[chain means] (c/(c-1) scaling)
    pooled_b = jax.vmap(
        lambda wi: pooled_welford_variance(wi, "c", include_between=True),
        axis_name="c",
    )(w)
    between = ((xs.mean(axis=1) - xs.mean()) ** 2).mean() * 2.0
    expect_b = (N / (N + 5.0)) * (var_within + between) + 1e-3 * (
        5.0 / (N + 5.0)
    )
    np.testing.assert_allclose(np.asarray(pooled_b), expect_b, rtol=1e-12)
    assert np.all(np.asarray(pooled_b) > np.asarray(pooled))


def test_pooled_shares_stepsize_and_metric_across_chains():
    prog = _make_prog(
        NutsConfig(pooled_axis="chains", pooled_parts="both"), warmup=60
    )
    states = _warm_states(prog, chains=4)
    # pooled DA consumes an identical pmean accept signal every iteration
    # and restarts from a consensus stepsize at window ends, so chain
    # stepsizes collapse to one value; same for the pooled metric
    log_eps = np.asarray(states.nuts.da.log_eps)
    np.testing.assert_allclose(log_eps, log_eps[0], rtol=1e-10)
    inv_mass = np.asarray(states.nuts.inv_mass)
    assert np.allclose(inv_mass, inv_mass[0:1], rtol=1e-10)
    assert np.all(np.isfinite(inv_mass)) and np.all(inv_mass > 0)


def test_pooled_metric_only_keeps_per_chain_stepsize():
    # the default pooled_parts="metric": shared metric, independent
    # dual-averaging (the accept-signal pooling measured harmful — see
    # NutsConfig.pooled_parts)
    prog = _make_prog(NutsConfig(pooled_axis="chains"), warmup=60)
    assert prog.nuts_cfg.pooled_parts == "metric"
    states = _warm_states(prog, chains=4)
    inv_mass = np.asarray(states.nuts.inv_mass)
    assert np.allclose(inv_mass, inv_mass[0:1], rtol=1e-10)
    log_eps = np.asarray(states.nuts.da.log_eps)
    assert np.ptp(log_eps) > 0


def test_unpooled_chains_differ():
    prog = _make_prog(NutsConfig(), warmup=60)
    states = _warm_states(prog, chains=4)
    log_eps = np.asarray(states.nuts.da.log_eps)
    assert np.ptp(log_eps) > 0  # independent adaptation paths


def test_pooled_fit_statistical_sanity():
    # full fit path through stan4bart(stan_args=dict(pooled_adaptation=…))
    from stan4bart_tpu import stan4bart

    d = generate_friedman_data(200, ranef=True, causal=False)
    df = friedman_dataframe(d)
    fit = stan4bart(
        "y ~ bart(. - g.1 - g.2 - X4) + X4 + (1 | g.1) + (1 | g.2)", df,
        iter=220, warmup=150, chains=4, seed=11,
        stan_args=dict(pooled_adaptation=True),
        bart_args={"n.trees": 25},
    )
    truth = d["mu_bart"] + d["mu_fixef"] + d["mu_ranef"]
    ev = fit.fitted("ev")
    assert np.corrcoef(ev, truth)[0, 1] > 0.9
    sig = fit.extract("sigma")
    assert np.all(np.isfinite(sig)) and 0.1 < float(np.mean(sig)) < 10.0
