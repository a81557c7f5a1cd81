"""Exact conjugate refresh of the linear block (GibbsProgram.linear_gibbs).

Verifies ParametricModel.linear_gibbs_refresh against autodiff: the full
conditional of v = [gamma | beta | b] given (aux, theta_L, offset, y) is
Gaussian, so its mean/covariance are recoverable from the gradient and
Hessian of the log-posterior restricted to the v coordinates.  The refresh
draws must match that analytic conditional, and the end-to-end fit must
leave the posterior unchanged (it is an extra Gibbs kernel, not a new
model).  No reference counterpart — the reference's only sampler of these
coordinates is Stan NUTS (SURVEY.md section 2.3)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stan4bart_tpu.formula import build_model_frame
from stan4bart_tpu.models.assemble import build_parametric_model
from stan4bart_tpu.utils.friedman import (
    friedman_dataframe,
    generate_friedman_data,
)


@pytest.fixture(scope="module")
def df():
    return friedman_dataframe(
        generate_friedman_data(120, ranef=True, causal=True)
    )


def _centered_model(df, weights=False, centered=True):
    mf = build_model_frame(
        "y ~ bart(X1 + X2) + X4 + z + (1 + X4 | g.1) + (1 | g.2)", df,
        weights=np.linspace(0.5, 2.0, len(np.asarray(df["y"])))
        if weights else None,
    )
    pm, _, _ = build_parametric_model(mf, "gaussian",
                                      {"centered_ranef": centered})
    return mf, pm


def _unpack_T_blocks(pm, theta_L):
    """Per-term lower-triangular T_i from the theta_L vech."""
    blocks = []
    tm = 0
    for nc in pm.cfg.p:
        T = np.zeros((nc, nc))
        for ci in range(nc):
            for ri in range(ci, nc):
                T[ri, ci] = theta_L[tm]
                tm += 1
        blocks.append(T)
    return blocks


def _u_from_v(pm, u0, v, T_blocks=None):
    """Write a v = [gamma|beta|b] vector into the unconstrained layout
    (same affine map as linear_gibbs_refresh's write-back; non-centered
    uses z_b = T^{-1} b per level)."""
    cfg = pm.cfg
    u = u0
    pos = 0
    if cfg.has_intercept:
        u = u.at[pm.layout.slices["gamma"][0]].set(v[0])
        pos = 1
    if cfg.K > 0:
        beta = v[pos : pos + cfg.K]
        zb = (beta - pm.hyper["prior_mean"]) / pm.hyper["prior_scale"]
        off = pm.layout.slices["z_beta"][0]
        u = jax.lax.dynamic_update_slice_in_dim(u, zb, off, 0)
        pos += cfg.K
    if cfg.q > 0:
        b = v[pos : pos + cfg.q]
        if cfg.centered:
            off = pm.layout.slices["b_raw"][0]
            u = jax.lax.dynamic_update_slice_in_dim(u, b, off, 0)
        else:
            z_parts = []
            mark = 0
            for (nc, li), T in zip(zip(cfg.p, cfg.l), T_blocks):
                Tinv = jnp.asarray(np.linalg.inv(T))
                seg = b[mark : mark + nc * li].reshape(li, nc)
                z_parts.append(jnp.dot(seg, Tinv.T).reshape(-1))
                mark += nc * li
            off = pm.layout.slices["z_b"][0]
            u = jax.lax.dynamic_update_slice_in_dim(
                u, jnp.concatenate(z_parts), off, 0
            )
    return u


@pytest.mark.parametrize("weights,centered", [
    (False, True), (True, True), (False, False),
])
def test_refresh_matches_autodiff_conditional(df, weights, centered):
    mf, pm = _centered_model(df, weights=weights, centered=centered)
    assert pm.enable_linear_gibbs()

    rng = np.random.default_rng(7)
    u0 = jnp.asarray(rng.normal(size=pm.num_upars) * 0.3)
    offset = jnp.asarray(rng.normal(size=mf.N) * 0.5)
    y = jnp.asarray(np.asarray(mf.y))

    # analytic conditional from autodiff: f(v) is the log-posterior as a
    # function of v only (fixed aux/theta_L/other coords); Gaussian, so
    # Q = -hess f, m = v0 + Q^{-1} grad f(v0)
    c, _ = pm.layout.constrain(u0)
    tp = pm.transformed(c)
    v0 = np.asarray(pm._coef_vector(c, tp))
    T_blocks = _unpack_T_blocks(pm, np.asarray(tp["theta_L"]))

    def f(v):
        return pm.log_prob(_u_from_v(pm, u0, v, T_blocks), offset, y)

    g = np.asarray(jax.grad(f)(jnp.asarray(v0)))
    H = np.asarray(jax.hessian(f)(jnp.asarray(v0)))
    Q = -H
    m = v0 + np.linalg.solve(Q, g)
    cov = np.linalg.inv(Q)

    # sampled conditional from the refresh (same u0, many keys)
    keys = jax.random.split(jax.random.PRNGKey(3), 6000)
    refreshed = jax.jit(jax.vmap(
        lambda k: pm.linear_gibbs_refresh(u0, offset, y, k)
    ))(keys)

    # read v back out of the refreshed unconstrained vectors
    def v_of(u):
        c, _ = pm.layout.constrain(u)
        return pm._coef_vector(c, pm.transformed(c))

    vs = np.asarray(jax.vmap(v_of)(refreshed))
    se = np.sqrt(np.diag(cov) / len(vs))
    assert np.all(np.abs(vs.mean(axis=0) - m) < 5 * se + 1e-8)
    emp_cov = np.cov(vs.T)
    scale = np.sqrt(np.outer(np.diag(cov), np.diag(cov)))
    assert np.max(np.abs(emp_cov - cov) / (scale + 1e-12)) < 0.12


def test_ineligible_configs_fall_back():
    import warnings

    from stan4bart_tpu.gibbs import GibbsProgram
    from stan4bart_tpu.models import priors
    from stan4bart_tpu.ops.bart import BartConfig

    df = friedman_dataframe(
        generate_friedman_data(60, ranef=True, causal=False)
    )
    mf = build_model_frame("y ~ bart(X1 + X2) + X4 + (1 | g.1)", df)
    # non-centered ranef (the default) IS eligible: the write-back goes
    # through z_b = T^{-1} b
    pm, _, _ = build_parametric_model(mf, "gaussian", {})
    assert pm.enable_linear_gibbs()

    # hs prior -> ineligible, warns at program build
    pm2, _, _ = build_parametric_model(
        mf, "gaussian",
        {"prior": priors.hs(), "centered_ranef": True},
    )
    assert not pm2.enable_linear_gibbs()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        prog = GibbsProgram(pm2, BartConfig(num_trees=5), mf.y, mf.bart_X,
                            warmup=2, iterations=2, linear_gibbs=True)
    assert not prog.linear_gibbs
    assert any("linear_gibbs" in str(x.message) for x in w)


def test_e2e_qr_with_kernels(df):
    """QR reparameterization composes with the interweaving pair: the
    refresh operates on the QR-space coefficients (normal prior on the
    rotated betas), and extract() un-rotates as usual."""
    from stan4bart_tpu import stan4bart

    fit = stan4bart(
        "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 + X4 | g.1) "
        "+ (1 | g.2)",
        df, seed=3, chains=2, iter=200, warmup=100, verbose=-1,
        bart_args={"n.trees": 15},
        stan_args={"qr": True, "centered_ranef": True,
                   "linear_gibbs": True, "level_gibbs": True},
    )
    fx = fit.extract("fixef")
    assert fx.shape[0] == 2 and np.all(np.isfinite(fx))
    sig = fit.extract("sigma").mean()
    assert 0.5 < sig < 2.5


def test_e2e_posterior_unchanged(df):
    """linear_gibbs is an extra kernel over the SAME posterior (exactness
    is pinned by test_refresh_matches_autodiff_conditional): a short
    Friedman fit with and without it must agree within the loose MC error
    of tiny-n short chains, and neither may leave the plausible range.
    At n=2000/1200 draws the two agree to 0.006 in sigma (measured);
    tiny-n short-chain tolerances are necessarily wide because the
    hierarchical coordinates have IACT of hundreds of draws."""
    from stan4bart_tpu import stan4bart

    fits = {}
    for lg in (False, True):
        fits[lg] = stan4bart(
            "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 + X4 | g.1) "
            "+ (1 | g.2)",
            df, seed=11, chains=2, iter=500, warmup=250, verbose=-1,
            bart_args={"n.trees": 20},
            stan_args={"centered_ranef": True, "linear_gibbs": lg,
                       "sigma_gibbs": lg},
        )
    ev = {lg: f.extract("ev").mean(axis=-1) for lg, f in fits.items()}
    assert np.corrcoef(ev[False], ev[True])[0, 1] > 0.97
    for lg, f in fits.items():
        sig = f.extract("sigma").mean()
        assert 0.6 < sig < 2.0, (lg, sig)  # truth 1.0
    # cross-config mean comparison only on a coordinate the BASELINE can
    # mix at this budget: beta.2 (treatment z, no competing ranef slope).
    # beta.1 trades against the X4 random-slope mean — a prior-identified
    # ridge where the baseline's IACT is in the thousands (measured:
    # ESS 5 after 24000 draws at n=2000), so its short-chain mean is
    # arbitrary; the refresh chain is the converged one there.
    a = fits[False].extract("fixef").mean(axis=-1)
    b = fits[True].extract("fixef").mean(axis=-1)
    assert abs(a[1] - b[1]) < 1.0
