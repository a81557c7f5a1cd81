"""FULL ensemble-wide blocked leaf draw (GibbsProgram.leaf_block).

Given all tree structures the leaf values of all trees are jointly
Gaussian; the kernel redraws ALL of them from that exact conditional
N(P^{-1} h, P^{-1}) with P = W' diag(w) W / sigma^2 + I / sigma_mu^2 over
the active-leaf membership design W.  The tests pin the kernel against a
dense numpy construction of that conditional, the cached-fit consistency
invariants, the overflow skip, and the public-API wiring.  No reference
counterpart: this is dbarts' per-node conjugate leaf posterior (SURVEY.md
section 2.4) applied jointly across the ensemble, impossible across the
reference's per-tree backfitting."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stan4bart_tpu.formula import build_model_frame
from stan4bart_tpu.gibbs import GibbsProgram
from stan4bart_tpu.models.assemble import build_parametric_model
from stan4bart_tpu.ops import bart as bart_ops
from stan4bart_tpu.ops.bart import BartConfig
from stan4bart_tpu.utils.friedman import (
    friedman_dataframe,
    generate_friedman_data,
)


def _setup(weights=False, binary=False, leaf_block_dim=0):
    d = generate_friedman_data(150, ranef=True, causal=True, binary=binary)
    df = friedman_dataframe(d)
    mf = build_model_frame(
        "y ~ bart(X1 + X2) + X4 + z + (1 + X4 | g.1) + (1 | g.2)", df,
        weights=np.linspace(0.5, 2.0, 150) if weights else None,
    )
    fam = "binomial" if binary else "gaussian"
    pm, _, _ = build_parametric_model(mf, fam, {"centered_ranef": True})
    prog = GibbsProgram(
        pm, BartConfig(num_trees=7), mf.y, mf.bart_X,
        weights=mf.weights if weights else None,
        warmup=5, iterations=5, leaf_block=1,
        leaf_block_dim=leaf_block_dim,
        linear_gibbs=False, level_gibbs=False,
    )
    state = jax.jit(prog.init_state)(jax.random.PRNGKey(0))
    for it in range(3):
        state, _ = jax.jit(lambda s, i: prog.step(s, i, True))(state, it)
    return mf, pm, prog, state


@pytest.fixture(scope="module")
def setup():
    return _setup()


def _dense_conditional(prog, bart_state, bart_offset, sigma, y_stan):
    """Dense numpy N(P^{-1} h, P^{-1}) over the active (t, leaf) slots,
    in the kernel's per-tree-rank compact order."""
    li = np.asarray(bart_state.leaf_idx)
    mask = np.asarray(bart_state.feature) == bart_ops.LEAF
    T, M = mask.shape
    slots = [(t, m) for t in range(T) for m in range(M) if mask[t, m]]
    W = np.stack([(li[t] == m).astype(np.float64) for t, m in slots],
                 axis=1)
    w = (np.asarray(prog.weights) if prog.weights is not None
         else np.ones(prog.N))
    r = np.asarray(y_stan) - np.asarray(bart_offset)
    s2 = float(sigma) ** 2
    smu2 = float(bart_state.sigma_mu) ** 2
    P = W.T @ (w[:, None] * W) / s2 + np.eye(len(slots)) / smu2
    h = W.T @ (w * r) / s2
    return slots, np.linalg.solve(P, h), np.linalg.inv(P)


def _moment_check(prog, state, sigma, bart_offset, y_stan, n_draws=6000):
    bart_state = state.bart
    slots, mean, cov = _dense_conditional(prog, bart_state, bart_offset,
                                          sigma, y_stan)
    idx_t = np.array([t for t, _ in slots])
    idx_m = np.array([m for _, m in slots])

    def draw(key):
        b2 = prog._leaf_block_update(bart_state, bart_offset,
                                     state.latents, sigma, key)
        return b2.leaf_value[idx_t, idx_m]

    keys = jax.random.split(jax.random.PRNGKey(7), n_draws)
    ss = np.asarray(jax.jit(jax.vmap(draw))(keys))
    se = np.sqrt(np.diag(cov) / len(ss))
    assert np.all(np.abs(ss.mean(axis=0) - mean) < 5 * se + 1e-8)
    emp = np.cov(ss.T)
    scale = np.sqrt(np.outer(np.diag(cov), np.diag(cov)))
    assert np.max(np.abs(emp - cov) / (scale + 1e-12)) < 0.15


@pytest.mark.parametrize("weights", [False, True])
def test_leaf_block_matches_dense_conditional(setup, weights):
    mf, pm, prog, state = _setup(weights=True) if weights else setup
    c0, _ = pm.layout.constrain(state.nuts.q)
    tp0 = pm.transformed(c0)
    bart_offset = pm.parametric_mean(c0, tp0)
    _moment_check(prog, state, tp0["aux"], bart_offset,
                  jnp.asarray(np.asarray(mf.y)))


def test_leaf_block_matches_dense_conditional_probit():
    mf, pm, prog, state = _setup(binary=True)
    c0, _ = pm.layout.constrain(state.nuts.q)
    tp0 = pm.transformed(c0)
    bart_offset = pm.parametric_mean(c0, tp0)
    _moment_check(prog, state, jnp.asarray(1.0), bart_offset,
                  state.latents)


def test_leaf_block_preserves_fit_consistency(setup):
    mf, pm, prog, state = setup
    c0, _ = pm.layout.constrain(state.nuts.q)
    tp0 = pm.transformed(c0)
    bart_offset = pm.parametric_mean(c0, tp0)
    b2 = prog._leaf_block_update(state.bart, bart_offset, state.latents,
                                 tp0["aux"], jax.random.PRNGKey(11))
    lv = np.asarray(b2.leaf_value)
    li = np.asarray(b2.leaf_idx)
    refit = np.stack([lv[t][li[t]] for t in range(lv.shape[0])])
    assert np.allclose(refit, np.asarray(b2.tree_fit), atol=1e-9)
    assert np.allclose(refit.sum(axis=0), np.asarray(b2.allfit), atol=1e-8)
    # non-leaf slots untouched; leaf values actually moved
    nonleaf = np.asarray(state.bart.feature) != bart_ops.LEAF
    assert np.array_equal(
        lv[nonleaf], np.asarray(state.bart.leaf_value)[nonleaf]
    )
    assert not np.allclose(lv[~nonleaf],
                           np.asarray(state.bart.leaf_value)[~nonleaf])


def test_leaf_block_overflow_skips(setup):
    """Active-leaf count above the static cap: the kernel is the
    identity for that iteration (state-dependent selection among
    invariant kernels)."""
    mf, pm, prog, state = setup
    tiny = _setup(leaf_block_dim=2)[2]
    assert tiny.leaf_block_dim == 2
    c0, _ = pm.layout.constrain(state.nuts.q)
    tp0 = pm.transformed(c0)
    bart_offset = pm.parametric_mean(c0, tp0)
    b2 = tiny._leaf_block_update(state.bart, bart_offset, state.latents,
                                 tp0["aux"], jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(b2.leaf_value),
                                  np.asarray(state.bart.leaf_value))
    np.testing.assert_array_equal(np.asarray(b2.allfit),
                                  np.asarray(state.bart.allfit))


def test_leaf_block_auto_dim():
    """Auto cap: ~8 leaves/tree rounded to the 128-lane tile, never more
    than the full heap."""
    _, _, prog, _ = _setup()
    assert prog.leaf_block_dim == min(128, 7 * prog.bart_cfg.max_nodes)


def test_e2e_with_leaf_block():
    """Short fit through the public API with the kernel on every 2nd
    iteration: finite draws, plausible sigma, components coherent."""
    from stan4bart_tpu import stan4bart

    df = friedman_dataframe(
        generate_friedman_data(120, ranef=True, causal=True)
    )
    fit = stan4bart(
        "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 + X4 | g.1) "
        "+ (1 | g.2)",
        df, seed=5, chains=2, iter=300, warmup=150, verbose=-1,
        bart_args={"n.trees": 15},
        stan_args={"centered_ranef": True, "leaf_block": 2},
    )
    assert fit.prog.leaf_block == 2
    sig = fit.extract("sigma")
    assert np.all(np.isfinite(sig)) and 0.5 < sig.mean() < 2.5
    ev = fit.extract("ev")
    comp = (fit.extract("indiv.bart") + fit.extract("indiv.fixef")
            + fit.extract("indiv.ranef"))
    assert np.allclose(ev, comp, atol=1e-6)
