"""Ensemble-wide conjugate leaf refresh (GibbsProgram.leaf_gibbs).

Given all tree structures the leaf values are jointly Gaussian; the kernel
draws exactly along a random rank-T Walsh-direction subspace
{leaf_value[t] += c_t * d_t}.  Conditioned on the direction masks, the
restricted conditional over c is Gaussian and recoverable by autodiff of
the joint log-density (likelihood + leaf prior) along the subspace — the
kernel's draws must match.  The kernel has no reference counterpart: it is
the joint application of dbarts' per-node conjugate leaf posterior
(SURVEY.md section 2.4) across the whole ensemble, impossible across the
reference's per-tree backfitting."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stan4bart_tpu.formula import build_model_frame
from stan4bart_tpu.gibbs import GibbsProgram
from stan4bart_tpu.models.assemble import build_parametric_model
from stan4bart_tpu.models import dists
from stan4bart_tpu.ops import bart as bart_ops
from stan4bart_tpu.ops.bart import BartConfig
from stan4bart_tpu.utils.friedman import (
    friedman_dataframe,
    generate_friedman_data,
)


def _setup(weights=False, binary=False):
    d = generate_friedman_data(150, ranef=True, causal=True,
                               binary=binary)
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
        warmup=5, iterations=5, leaf_gibbs=1,
        linear_gibbs=False, level_gibbs=False,
    )
    assert prog.leaf_gibbs == 1
    state = jax.jit(prog.init_state)(jax.random.PRNGKey(0))
    for it in range(3):
        state, _ = jax.jit(lambda s, i: prog.step(s, i, True))(state, it)
    return mf, pm, prog, state


@pytest.fixture(scope="module")
def setup():
    return _setup()


def _conditional_check(mf, prog, state, sigma, bart_offset, y_stan):
    """Draw the kernel many times with FIXED direction masks and compare
    the (c_1..c_T) sample moments to the autodiff conditional."""
    T = prog.bart_cfg.num_trees
    M = prog.bart_cfg.max_nodes
    bart_state = state.bart
    leaf_mask = bart_state.feature == bart_ops.LEAF
    nbits = max(int(M).bit_length(), 1)
    rng = np.random.default_rng(42)
    masks = jnp.asarray(
        rng.integers(1, 2**nbits, size=T), dtype=jnp.int32
    )
    node_ids = jnp.arange(M, dtype=jnp.int32)
    d_leaf = jnp.where(
        leaf_mask,
        prog._walsh_signs(node_ids[None, :], masks[:, None], jnp.float64),
        0.0,
    )
    V = prog._walsh_signs(bart_state.leaf_idx, masks[:, None], jnp.float64)

    def logjoint(c):
        lv = bart_state.leaf_value + c[:, None] * d_leaf
        lp = jnp.sum(jnp.where(
            leaf_mask, -0.5 * (lv / bart_state.sigma_mu) ** 2, 0.0))
        eta = bart_state.allfit + jnp.dot(c, V) + bart_offset
        if prog.weights is not None:
            lp = lp - 0.5 * jnp.dot(prog.weights, (y_stan - eta) ** 2) \
                / (sigma * sigma)
        else:
            lp = lp + dists.normal_lpdf(y_stan, eta, sigma)
        return lp

    g = np.asarray(jax.grad(logjoint)(jnp.zeros(T)))
    H = np.asarray(jax.hessian(logjoint)(jnp.zeros(T)))
    Q = -H
    mean = np.linalg.solve(Q, g)
    cov = np.linalg.inv(Q)

    def draw(key):
        b2 = prog._leaf_gibbs_update(bart_state, bart_offset,
                                     state.latents, sigma, key,
                                     masks=masks)
        # recover c_t: the shift restricted to leaves is c_t * d_t with
        # d_t = +-1, so sum(shift * d) / n_leaves = c_t
        shift = (b2.leaf_value - bart_state.leaf_value) * d_leaf
        return jnp.sum(shift, axis=1) / jnp.sum(jnp.abs(d_leaf), axis=1)

    keys = jax.random.split(jax.random.PRNGKey(7), 6000)
    ss = np.asarray(jax.jit(jax.vmap(draw))(keys))
    se = np.sqrt(np.diag(cov) / len(ss))
    assert np.all(np.abs(ss.mean(axis=0) - mean) < 5 * se + 1e-8)
    emp = np.cov(ss.T)
    scale = np.sqrt(np.outer(np.diag(cov), np.diag(cov)))
    assert np.max(np.abs(emp - cov) / (scale + 1e-12)) < 0.12


@pytest.mark.parametrize("weights", [False, True])
def test_leaf_update_matches_autodiff_conditional(setup, weights):
    mf, pm, prog, state = _setup(weights) if weights else setup
    c0, _ = pm.layout.constrain(state.nuts.q)
    tp0 = pm.transformed(c0)
    bart_offset = pm.parametric_mean(c0, tp0)
    _conditional_check(mf, prog, state, tp0["aux"], bart_offset,
                       jnp.asarray(np.asarray(mf.y)))


def test_leaf_update_matches_autodiff_conditional_probit():
    """Probit family: sigma = 1, response = latents."""
    mf, pm, prog, state = _setup(binary=True)
    c0, _ = pm.layout.constrain(state.nuts.q)
    tp0 = pm.transformed(c0)
    bart_offset = pm.parametric_mean(c0, tp0)
    _conditional_check(mf, prog, state, jnp.asarray(1.0), bart_offset,
                       state.latents)


def test_leaf_update_preserves_fit_consistency(setup):
    mf, pm, prog, state = setup
    c0, _ = pm.layout.constrain(state.nuts.q)
    tp0 = pm.transformed(c0)
    bart_offset = pm.parametric_mean(c0, tp0)
    b2 = prog._leaf_gibbs_update(state.bart, bart_offset, state.latents,
                                 tp0["aux"], jax.random.PRNGKey(11))
    lv = np.asarray(b2.leaf_value)
    li = np.asarray(b2.leaf_idx)
    refit = np.stack([lv[t][li[t]] for t in range(lv.shape[0])])
    assert np.allclose(refit, np.asarray(b2.tree_fit), atol=1e-9)
    assert np.allclose(refit.sum(axis=0), np.asarray(b2.allfit), atol=1e-8)
    # non-leaf slots untouched
    nonleaf = np.asarray(state.bart.feature) != bart_ops.LEAF
    assert np.array_equal(
        lv[nonleaf], np.asarray(state.bart.leaf_value)[nonleaf]
    )


def test_walsh_signs_are_valid_directions():
    """+-1 valued, deterministic in (index, mask), non-constant across
    masks, and the mask=0 column is all +1 (the level direction, excluded
    by the kernel's mask >= 1 support)."""
    x = jnp.arange(128, dtype=jnp.int32)
    d0 = np.asarray(GibbsProgram._walsh_signs(x, jnp.int32(0), jnp.float64))
    assert np.all(d0 == 1.0)
    seen = set()
    for m in (1, 2, 3, 37, 127):
        d = np.asarray(
            GibbsProgram._walsh_signs(x, jnp.int32(m), jnp.float64)
        )
        assert set(np.unique(d)) == {-1.0, 1.0}
        # Walsh rows are balanced over the full 2^7 index range
        assert d.sum() == 0
        seen.add(tuple(d))
    assert len(seen) == 5  # distinct masks give distinct sign patterns


def test_e2e_with_leaf_gibbs():
    """Short fit through the public API with the kernel on: finite draws,
    plausible sigma, components coherent."""
    from stan4bart_tpu import stan4bart

    df = friedman_dataframe(
        generate_friedman_data(120, ranef=True, causal=True)
    )
    fit = stan4bart(
        "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 + X4 | g.1) "
        "+ (1 | g.2)",
        df, seed=5, chains=2, iter=300, warmup=150, verbose=-1,
        bart_args={"n.trees": 15},
        stan_args={"centered_ranef": True, "leaf_gibbs": 2},
    )
    assert fit.prog.leaf_gibbs == 2
    sig = fit.extract("sigma")
    assert np.all(np.isfinite(sig)) and 0.5 < sig.mean() < 2.5
    ev = fit.extract("ev")
    comp = (fit.extract("indiv.bart") + fit.extract("indiv.fixef")
            + fit.extract("indiv.ranef"))
    assert np.allclose(ev, comp, atol=1e-6)
