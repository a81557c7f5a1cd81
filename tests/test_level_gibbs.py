"""Additive-level interweave kernel (GibbsProgram.level_gibbs).

The restricted conditional over s = (c_1..c_T, a_i...) is Gaussian; its
mean/covariance are recoverable by autodiff of the joint log-density
restricted to the shift subspace (likelihood + leaf prior + centered-b
prior).  The kernel's draws must match.  No reference counterpart — the
reference cannot interweave across its dbarts/Stan process boundary
(SURVEY.md section 3.2)."""

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


def _setup(weights=False):
    df = friedman_dataframe(
        generate_friedman_data(150, ranef=True, causal=True)
    )
    mf = build_model_frame(
        "y ~ bart(X1 + X2) + X4 + z + (1 + X4 | g.1) + (1 | g.2)", df,
        weights=np.linspace(0.5, 2.0, 150) if weights else None,
    )
    pm, _, _ = build_parametric_model(mf, "gaussian",
                                      {"centered_ranef": True})
    prog = GibbsProgram(
        pm, BartConfig(num_trees=7), mf.y, mf.bart_X,
        weights=mf.weights if weights else None,
        warmup=5, iterations=5, level_gibbs=True,
    )
    assert prog.level_gibbs
    state = jax.jit(prog.init_state)(jax.random.PRNGKey(0))
    # a few warmup steps so trees/coefs are non-trivial
    for it in range(3):
        state, _ = jax.jit(
            lambda s, i: prog.step(s, i, True), static_argnums=()
        )(state, it)
    return mf, pm, prog, state


@pytest.fixture(scope="module")
def setup():
    return _setup()


@pytest.mark.parametrize("weights", [False, True])
def test_level_update_matches_autodiff_conditional(setup, weights):
    mf, pm, prog, state = _setup(weights) if weights else setup
    T = prog.bart_cfg.num_trees
    nuts, bart_state = state.nuts, state.bart
    # bart_offset as the step computes it (phase 2)
    c0, _ = pm.layout.constrain(nuts.q)
    tp0 = pm.transformed(c0)
    bart_offset = pm.parametric_mean(c0, tp0)
    y = jnp.asarray(np.asarray(mf.y))
    sigma = tp0["aux"]

    leaf_mask = (bart_state.feature == bart_ops.LEAF)
    m_terms = prog._level_terms
    dim = T + len(m_terms)

    def logjoint(s):
        c_t = s[:T]
        a = s[T:]
        # shifted leaf values + prior
        lv = bart_state.leaf_value + c_t[:, None] * leaf_mask
        lp = jnp.sum(
            jnp.where(leaf_mask,
                      -0.5 * (lv / bart_state.sigma_mu) ** 2
                      - jnp.log(bart_state.sigma_mu)
                      - 0.5 * jnp.log(2 * jnp.pi),
                      0.0)
        )
        # shifted b + prior
        q = nuts.q
        b_off0 = pm.layout.slices["b_raw"][0]
        for k, (ti, j0) in enumerate(m_terms):
            nc, li = pm.cfg.p[ti], pm.cfg.l[ti]
            idx = b_off0 + pm.b_offsets[ti] + np.arange(li) * nc + j0
            q = q.at[idx].add(a[k])
        c_, _ = pm.layout.constrain(q)
        tp = pm.transformed(c_)
        lp = lp + pm._centered_b_lpdf(tp["b"], tp["theta_L"])
        # likelihood with total shift (weighted variant matches
        # ParametricModel.log_prob's weighted form up to constants)
        eta = (bart_state.allfit + jnp.sum(c_t) + bart_offset
               + jnp.sum(a))
        if prog.weights is not None:
            lp = lp - 0.5 * jnp.dot(
                prog.weights, (y - eta) ** 2
            ) / (sigma * sigma)
        else:
            lp = lp + dists.normal_lpdf(y, eta, sigma)
        return lp

    s0 = jnp.zeros(dim)
    g = np.asarray(jax.grad(logjoint)(s0))
    H = np.asarray(jax.hessian(logjoint)(s0))
    Q = -H
    mean = np.linalg.solve(Q, g)
    cov = np.linalg.inv(Q)

    # sample the kernel many times from the same state
    def draw(key):
        n2, b2 = prog._level_gibbs_update(nuts, bart_state, bart_offset,
                                          state.latents, key)
        # recover s: c_t from any active leaf's shift; a from q diff
        c_rec = jnp.sum(
            (b2.leaf_value - bart_state.leaf_value) * leaf_mask, axis=1
        ) / jnp.sum(leaf_mask, axis=1)
        a_rec = []
        b_off0 = pm.layout.slices["b_raw"][0]
        for ti, j0 in m_terms:
            nc = pm.cfg.p[ti]
            idx = b_off0 + pm.b_offsets[ti] + j0
            a_rec.append(n2.q[idx] - nuts.q[idx])
        return jnp.concatenate([c_rec, jnp.stack(a_rec)])

    keys = jax.random.split(jax.random.PRNGKey(7), 6000)
    ss = np.asarray(jax.jit(jax.vmap(draw))(keys))
    se = np.sqrt(np.diag(cov) / len(ss))
    assert np.all(np.abs(ss.mean(axis=0) - mean) < 5 * se + 1e-8)
    emp = np.cov(ss.T)
    scale = np.sqrt(np.outer(np.diag(cov), np.diag(cov)))
    assert np.max(np.abs(emp - cov) / (scale + 1e-12)) < 0.12


def test_level_update_preserves_fit_consistency(setup):
    """allfit and tree_fit must stay consistent with leaf_value/leaf_idx
    after the shift (the sweep relies on the cached invariants)."""
    mf, pm, prog, state = setup
    c0, _ = pm.layout.constrain(state.nuts.q)
    tp0 = pm.transformed(c0)
    bart_offset = pm.parametric_mean(c0, tp0)
    n2, b2 = prog._level_gibbs_update(
        state.nuts, state.bart, bart_offset, state.latents,
        jax.random.PRNGKey(11),
    )
    # recompute per-tree fits from leaf_value/leaf_idx
    lv = np.asarray(b2.leaf_value)
    li = np.asarray(b2.leaf_idx)
    refit = np.stack([lv[t][li[t]] for t in range(lv.shape[0])])
    assert np.allclose(refit, np.asarray(b2.tree_fit), atol=1e-10)
    assert np.allclose(refit.sum(axis=0), np.asarray(b2.allfit), atol=1e-9)


def test_e2e_with_level_gibbs(setup):
    """Short fit through the public API with the kernel on: finite draws,
    plausible sigma, ev coherent with the components."""
    from stan4bart_tpu import stan4bart

    df = friedman_dataframe(
        generate_friedman_data(120, ranef=True, causal=True)
    )
    fit = stan4bart(
        "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 + X4 | g.1) "
        "+ (1 | g.2)",
        df, seed=5, chains=2, iter=300, warmup=150, verbose=-1,
        bart_args={"n.trees": 15},
        stan_args={"centered_ranef": True, "linear_gibbs": True,
                   "sigma_gibbs": True, "level_gibbs": True},
    )
    sig = fit.extract("sigma")
    assert np.all(np.isfinite(sig)) and 0.5 < sig.mean() < 2.5
    ev = fit.extract("ev")
    comp = (fit.extract("indiv.bart") + fit.extract("indiv.fixef")
            + fit.extract("indiv.ranef"))
    assert np.allclose(ev, comp, atol=1e-6)


def test_level_gibbs_ineligible_warns():
    import warnings

    df = friedman_dataframe(
        generate_friedman_data(60, ranef=True, causal=False)
    )
    # non-default offset_type -> ineligible (the shift algebra assumes
    # the default eta decomposition)
    mf = build_model_frame("y ~ bart(X1 + X2) + X4 + (1 | g.1)", df)
    pm, _, _ = build_parametric_model(mf, "gaussian", {})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        prog = GibbsProgram(pm, BartConfig(num_trees=5), mf.y, mf.bart_X,
                            warmup=2, iterations=2, level_gibbs=True,
                            user_offset=np.zeros(60), offset_type="bart")
    assert not prog.level_gibbs
    assert any("level_gibbs" in str(x.message) for x in w)

    # non-centered ranef (the default) IS eligible now
    prog2 = GibbsProgram(pm, BartConfig(num_trees=5), mf.y, mf.bart_X,
                         warmup=2, iterations=2, level_gibbs=True)
    assert prog2.level_gibbs


def test_level_update_matches_autodiff_noncentered():
    """Non-centered parameterization: the shift conditional is identical;
    the write-back goes through z_b += a T^{-1} e_j0.  Verify the drawn
    (c, a) distribution against autodiff of the z-space joint."""
    df = friedman_dataframe(
        generate_friedman_data(150, ranef=True, causal=True)
    )
    mf = build_model_frame(
        "y ~ bart(X1 + X2) + X4 + z + (1 + X4 | g.1) + (1 | g.2)", df
    )
    pm, _, _ = build_parametric_model(mf, "gaussian", {})
    prog = GibbsProgram(
        pm, BartConfig(num_trees=7), mf.y, mf.bart_X,
        warmup=5, iterations=5, level_gibbs=True,
    )
    assert prog.level_gibbs
    state = jax.jit(prog.init_state)(jax.random.PRNGKey(0))
    for it in range(3):
        state, _ = jax.jit(lambda s, i: prog.step(s, i, True))(state, it)
    T = prog.bart_cfg.num_trees
    nuts, bart_state = state.nuts, state.bart
    c0, _ = pm.layout.constrain(nuts.q)
    tp0 = pm.transformed(c0)
    bart_offset = pm.parametric_mean(c0, tp0)
    y = jnp.asarray(np.asarray(mf.y))
    sigma = tp0["aux"]
    leaf_mask = (bart_state.feature == bart_ops.LEAF)
    m_terms = prog._level_terms
    dim = T + len(m_terms)

    # z-space shift directions per term: w_i = T_i^{-1} e_j0
    th = np.asarray(tp0["theta_L"])
    Ws = []
    tm = 0
    for ti, j0 in m_terms:
        nc = pm.cfg.p[ti]
        Tm = np.zeros((nc, nc))
        # advance tm to this term's offset
        Tm_off = sum(p + (p * (p - 1)) // 2 for p in pm.cfg.p[:ti])
        k = Tm_off
        for ci in range(nc):
            for ri in range(ci, nc):
                Tm[ri, ci] = th[k]
                k += 1
        Ws.append(np.linalg.solve(Tm, np.eye(nc)[:, j0]))

    def logjoint(s):
        c_t = s[:T]
        a = s[T:]
        lv = bart_state.leaf_value + c_t[:, None] * leaf_mask
        lp = jnp.sum(
            jnp.where(leaf_mask,
                      -0.5 * (lv / bart_state.sigma_mu) ** 2, 0.0)
        )
        q = nuts.q
        z_off = pm.layout.slices["z_b"][0]
        for k2, (ti, j0) in enumerate(m_terms):
            nc, li = pm.cfg.p[ti], pm.cfg.l[ti]
            idx = z_off + pm.b_offsets[ti] + np.arange(li * nc)
            q = q.at[idx].add(jnp.tile(jnp.asarray(Ws[k2]), li) * a[k2])
        zb = q[z_off : z_off + pm.cfg.q]
        lp = lp - 0.5 * jnp.sum(zb * zb)
        eta = (bart_state.allfit + jnp.sum(c_t) + bart_offset
               + jnp.sum(a))
        lp = lp - 0.5 * jnp.sum((y - eta) ** 2) / (sigma * sigma)
        return lp

    s0 = jnp.zeros(dim)
    g = np.asarray(jax.grad(logjoint)(s0))
    H = np.asarray(jax.hessian(logjoint)(s0))
    Q = -H
    mean = np.linalg.solve(Q, g)
    cov = np.linalg.inv(Q)

    def draw(key):
        n2, b2 = prog._level_gibbs_update(nuts, bart_state, bart_offset,
                                          state.latents, key)
        c_rec = jnp.sum(
            (b2.leaf_value - bart_state.leaf_value) * leaf_mask, axis=1
        ) / jnp.sum(leaf_mask, axis=1)
        a_rec = []
        z_off = pm.layout.slices["z_b"][0]
        for k2, (ti, j0) in enumerate(m_terms):
            idx = z_off + pm.b_offsets[ti]
            # recover a from the first z coordinate shift: dz = a * w[0]
            a_rec.append((n2.q[idx] - nuts.q[idx]) / Ws[k2][0])
        return jnp.concatenate([c_rec, jnp.stack(a_rec)])

    keys = jax.random.split(jax.random.PRNGKey(7), 6000)
    ss = np.asarray(jax.jit(jax.vmap(draw))(keys))
    se = np.sqrt(np.diag(cov) / len(ss))
    assert np.all(np.abs(ss.mean(axis=0) - mean) < 5 * se + 1e-8)
    emp = np.cov(ss.T)
    scale = np.sqrt(np.outer(np.diag(cov), np.diag(cov)))
    assert np.max(np.abs(emp - cov) / (scale + 1e-12)) < 0.12
