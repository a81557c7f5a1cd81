"""BART kernel tests: Friedman-function recovery (the reference gates
cor(indiv.bart, truth) >= 0.95, test-01-continuous.R:155), tree-structure
invariants, varcount behavior, probit latents."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stan4bart_tpu.ops.bart import (
    BartConfig,
    BartState,
    bart_init,
    bart_sweep,
    compute_ranks,
    make_cut_grid,
    predict_trees,
    sample_probit_latents,
    walk_tree,
)
from stan4bart_tpu.utils.friedman import generate_friedman_data


def run_bart(cfg, X, y, sigma, n_iter, seed=0, sigma_mu=None):
    ranks = jnp.asarray(compute_ranks(X, make_cut_grid(X, cfg.n_cuts)))
    state = bart_init(cfg, len(y))
    rng_range = float(np.max(y) - np.min(y))
    state = state._replace(
        sigma_mu=jnp.asarray(
            sigma_mu if sigma_mu is not None
            else cfg.node_scale * rng_range / (cfg.k_init * np.sqrt(cfg.num_trees))
        )
    )
    split_probs = jnp.full(X.shape[1], 1.0 / X.shape[1])
    yj = jnp.asarray(y)

    @jax.jit
    def step(carry, _):
        state, rng = carry
        rng, rng_s = jax.random.split(rng)
        state, varcount = bart_sweep(cfg, state, yj, ranks, split_probs,
                                     jnp.asarray(sigma), rng_s)
        return (state, rng), (state.allfit, varcount)

    (state, _), (fits, varcounts) = jax.lax.scan(
        step, (state, jax.random.PRNGKey(seed)), None, length=n_iter
    )
    return state, np.asarray(fits), np.asarray(varcounts)


@pytest.fixture(scope="module")
def friedman():
    return generate_friedman_data(300)


def test_bart_recovers_friedman(friedman):
    d = friedman
    y_centered = d["mu_bart"] + (d["y"] - d["mu_bart"] - d["mu_fixef"])
    cfg = BartConfig(num_trees=50, k_df=0.0)  # fixed k for the marginal test
    state, fits, _ = run_bart(cfg, d["x"], y_centered - y_centered.mean(),
                              sigma=1.0, n_iter=300)
    post_fit = fits[150:].mean(axis=0) + y_centered.mean()
    cor = np.corrcoef(post_fit, d["mu_bart"])[0, 1]
    assert cor > 0.93, f"cor(fit, truth) = {cor}"
    rmse = np.sqrt(np.mean((post_fit - d["mu_bart"]) ** 2))
    assert rmse < 1.5, f"rmse = {rmse}"


def test_tree_structure_invariants(friedman):
    d = friedman
    cfg = BartConfig(num_trees=20)
    state, _, _ = run_bart(cfg, d["x"], d["y"] - d["y"].mean(),
                           sigma=1.0, n_iter=50)
    feature = np.asarray(state.feature)
    M = cfg.max_nodes
    for t in range(cfg.num_trees):
        f = feature[t]
        assert f[0] != -2, "root must be active"
        for i in range((M - 1) // 2):
            if f[i] >= 0:  # internal
                assert f[2 * i + 1] != -2 and f[2 * i + 2] != -2
            else:  # leaf or inactive: children inactive
                assert f[2 * i + 1] == -2 and f[2 * i + 2] == -2
    # leaf_idx cache consistent with a fresh walk
    ranks = jnp.asarray(compute_ranks(d["x"], make_cut_grid(d["x"],
                                                            cfg.n_cuts)))
    for t in range(0, cfg.num_trees, 5):
        fresh = np.asarray(walk_tree(state.feature[t], state.cut[t], ranks,
                                     cfg.max_depth))
        assert np.array_equal(fresh, np.asarray(state.leaf_idx[t]))
    # allfit consistent with leaf values
    fit = np.zeros(len(d["y"]))
    lv = np.asarray(state.leaf_value)
    li = np.asarray(state.leaf_idx)
    for t in range(cfg.num_trees):
        fit += lv[t][li[t]]
    assert np.allclose(fit, np.asarray(state.allfit), atol=1e-8)


def test_varcount_selects_signal_vars(friedman):
    d = friedman
    cfg = BartConfig(num_trees=30)
    _, _, varcounts = run_bart(cfg, d["x"], d["mu_bart"] - d["mu_bart"].mean(),
                               sigma=0.5, n_iter=200)
    vc = varcounts[100:].mean(axis=0)
    signal = vc[[0, 1, 2, 4]].mean()  # X1, X2, X3, X5 drive mu_bart
    noise = vc[[5, 6, 7, 8, 9]].mean()
    assert signal > 2 * noise, f"signal {signal} vs noise {noise}"


def test_k_hyperprior_moves():
    d = generate_friedman_data(150)
    cfg = BartConfig(num_trees=20, k_df=1.25)
    state, _, _ = run_bart(cfg, d["x"], d["y"] - d["y"].mean(),
                           sigma=1.0, n_iter=30)
    assert np.isfinite(float(state.k)) and float(state.k) > 0
    assert float(state.k) != cfg.k_init


def test_probit_latents_signs():
    rng = jax.random.PRNGKey(0)
    mean = jnp.asarray(np.linspace(-2, 2, 100))
    y = jnp.asarray((np.arange(100) % 2).astype(np.float64))
    z = np.asarray(sample_probit_latents(mean, y, rng, jnp.float64))
    assert np.all(z[np.asarray(y) > 0] > 0)
    assert np.all(z[np.asarray(y) == 0] <= 0)
    assert np.all(np.isfinite(z))


def test_predict_matches_train_fit(friedman):
    d = friedman
    cfg = BartConfig(num_trees=10)
    cuts = make_cut_grid(d["x"], cfg.n_cuts)
    ranks = jnp.asarray(compute_ranks(d["x"], cuts))
    state, _, _ = run_bart(cfg, d["x"], d["y"] - d["y"].mean(),
                           sigma=1.0, n_iter=20)
    pred = np.asarray(predict_trees(cfg, state.feature, state.cut,
                                    state.leaf_value, ranks))
    assert np.allclose(pred, np.asarray(state.allfit), atol=1e-8)
