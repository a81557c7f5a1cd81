"""Chain init from the tree prior (sampleTreesFromPrior parity), verbose
initial summary, and formula dimension sanity checks (checkNlevels)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import stan4bart_tpu as s4b
from stan4bart_tpu.formula import build_model_frame
from stan4bart_tpu.ops import bart as bart_ops
from stan4bart_tpu.ops.bart import BartConfig
from stan4bart_tpu.utils.friedman import friedman_dataframe, generate_friedman_data


def test_prior_tree_structures_valid():
    d = generate_friedman_data(200)
    cfg = BartConfig(num_trees=40)
    cuts = bart_ops.make_cut_grid(d["x"], cfg.n_cuts)
    ranks = jnp.asarray(bart_ops.compute_ranks(d["x"], cuts))
    sp = np.full(10, 0.1)
    st = bart_ops.sample_trees_from_prior(cfg, jax.random.PRNGKey(0),
                                          ranks, sp)
    f = np.asarray(st.feature)
    M = cfg.max_nodes
    # heap invariants
    assert np.all(f[:, 0] != -2)
    for t in range(cfg.num_trees):
        for i in range((M - 1) // 2):
            if f[t, i] >= 0:
                assert f[t, 2 * i + 1] != -2 and f[t, 2 * i + 2] != -2
            else:
                assert f[t, 2 * i + 1] == -2 and f[t, 2 * i + 2] == -2
    # prior produces a mix of stumps and splits: ~base of roots split
    frac_split = (f[:, 0] >= 0).mean()
    assert 0.6 < frac_split <= 1.0
    # leaf_idx consistent with structures
    fresh = np.asarray(bart_ops.walk_tree(st.feature[0], st.cut[0], ranks,
                                          cfg.max_depth))
    assert np.array_equal(fresh, np.asarray(st.leaf_idx[0]))


def test_checkNlevels_single_level():
    n = 30
    rng = np.random.default_rng(0)
    data = {"y": rng.normal(size=n), "x": rng.normal(size=n),
            "g": np.array(["a"] * n)}
    with pytest.raises(ValueError, match="> 1 sampled level"):
        build_model_frame("y ~ bart(x) + (1 | g)", data)


def test_checkNlevels_too_many_levels():
    n = 20
    rng = np.random.default_rng(1)
    data = {"y": rng.normal(size=n), "x": rng.normal(size=n),
            "g": np.array([str(i) for i in range(n)])}
    with pytest.raises(ValueError, match="must be < number of observations"):
        build_model_frame("y ~ bart(x) + (1 | g)", data)


def test_verbose_initial_summary(capsys):
    df = friedman_dataframe(generate_friedman_data(60, ranef=True))
    s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df, chains=1,
                  warmup=5, iter=15, seed=0, verbose=1,
                  bart_args={"n.trees": 3})
    out = capsys.readouterr().out
    assert "stan4bart: gaussian model" in out
    assert "trees = 3" in out
    assert "adapt_delta = 0.8" in out


def test_print_trees_and_prior_summary(capsys):
    """printTrees parity (init.cpp:505-576) + prior summary surface
    (rstanarm_functions.R:270-365)."""
    import stan4bart_tpu as s4b
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    df = friedman_dataframe(generate_friedman_data(60, ranef=True))
    fit = s4b.stan4bart(
        "y ~ bart(X1+X2) + X4 + (1 | g.2)", df, chains=1, warmup=10,
        iter=25, seed=0, verbose=-1,
        bart_args={"n.trees": 3, "keep_trees": True},
    )
    fit.print_trees(samples=[0], max_print=3)
    out = capsys.readouterr().out
    assert "tree 1:" in out and ("leaf" in out)
    fit.prior_summary()
    out = capsys.readouterr().out
    assert "coefficients: normal" in out
    assert "covariance: decov" in out
    assert fit.timings["total"] > 0
