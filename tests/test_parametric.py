"""Parametric log-posterior tests: hand-computed densities (scipy) vs the
JAX model, onion-method invariants, and gradient sanity (SURVEY.md section
7.2 step 1)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import stats

from stan4bart_tpu.formula import build_model_frame
from stan4bart_tpu.models import priors
from stan4bart_tpu.models.assemble import build_parametric_model
from stan4bart_tpu.models.parametric import (
    ParametricConfig,
    make_b,
    make_theta_L,
    cft,
)
from stan4bart_tpu.utils.friedman import friedman_dataframe, generate_friedman_data


@pytest.fixture(scope="module")
def df():
    return friedman_dataframe(generate_friedman_data(80, ranef=True, causal=True))


def _model_fixed_only(df, prior=None, prior_aux=None):
    mf = build_model_frame("y ~ bart(X1 + X2) + X4 + z", df)
    stan_args = {"prior": prior, "prior_aux": prior_aux}
    model, sa, info = build_parametric_model(mf, "gaussian", stan_args)
    return mf, model


def test_logprob_fixed_only_matches_scipy(df):
    mf, model = _model_fixed_only(df)
    rng = np.random.default_rng(5)
    u = rng.normal(size=model.num_upars) * 0.5
    offset = rng.normal(size=mf.N)
    y = np.asarray(mf.y)

    lp = float(model.log_prob(jnp.asarray(u), jnp.asarray(offset),
                              jnp.asarray(y)))

    # hand computation
    h = {k: np.asarray(v) for k, v in model.hyper.items()}
    z_beta = u[:2]
    aux_unscaled = np.exp(u[2])
    aux = h["prior_scale_for_aux"] * aux_unscaled
    beta = z_beta * h["prior_scale"] + h["prior_mean"]
    eta = offset + np.asarray(mf.X) @ beta
    expected = (
        stats.norm.logpdf(y, eta, aux).sum()
        + stats.expon.logpdf(aux_unscaled)          # aux prior, rate 1
        + stats.norm.logpdf(z_beta).sum()           # z_beta ~ N(0,1)
        + u[2]                                      # exp-transform jacobian
    )
    assert lp == pytest.approx(expected, rel=1e-10)


def test_logprob_student_t_prior(df):
    mf, model = _model_fixed_only(df, prior=priors.student_t(df=4.0))
    rng = np.random.default_rng(6)
    u = rng.normal(size=model.num_upars) * 0.3
    offset = np.zeros(mf.N)
    lp = float(model.log_prob(jnp.asarray(u), jnp.asarray(offset),
                              jnp.asarray(mf.y)))
    # t-prior via CFt keeps z_beta ~ N(0,1) in the density; beta changes only
    # through the transformed parameter, so lp matches the normal-prior hand
    # computation with beta = CFt(z) * scale + mean.
    h = {k: np.asarray(v) for k, v in model.hyper.items()}
    z_beta = u[:2]
    aux = h["prior_scale_for_aux"] * np.exp(u[2])
    beta = np.asarray(cft(jnp.asarray(z_beta), jnp.asarray(h["prior_df"])))
    beta = beta * h["prior_scale"] + h["prior_mean"]
    eta = offset + np.asarray(mf.X) @ beta
    expected = (
        stats.norm.logpdf(np.asarray(mf.y), eta, aux).sum()
        + stats.expon.logpdf(np.exp(u[2]))
        + stats.norm.logpdf(z_beta).sum()
        + u[2]
    )
    assert lp == pytest.approx(expected, rel=1e-10)


def test_logprob_with_ranef_matches_scipy(df):
    mf = build_model_frame(
        "y ~ bart(X1 + X2) + X4 + (1 + X4 | g.1) + (1 | g.2)", df
    )
    model, _, _ = build_parametric_model(mf, "gaussian")
    rng = np.random.default_rng(7)
    u = rng.normal(size=model.num_upars) * 0.4
    offset = rng.normal(size=mf.N)
    y = np.asarray(mf.y)
    lp = float(model.log_prob(jnp.asarray(u), jnp.asarray(offset),
                              jnp.asarray(y)))

    # hand computation through the same layout
    c, log_jac = model.layout.constrain(jnp.asarray(u))
    c = {k: np.asarray(v) for k, v in c.items()}
    h = {k: np.asarray(v) for k, v in model.hyper.items()}
    aux = h["prior_scale_for_aux"] * c["aux_unscaled"][0]
    beta = c["z_beta"] * h["prior_scale"] + h["prior_mean"]
    theta_L = np.asarray(
        make_theta_L(model.cfg, jnp.asarray(aux), jnp.asarray(c["tau"]),
                     jnp.asarray(h["scale_decov"]), jnp.asarray(c["zeta"]),
                     jnp.asarray(c["rho"]),
                     jnp.asarray(c.get("z_T", np.zeros(0))))
    )
    b = np.asarray(make_b(model.cfg, jnp.asarray(c["z_b"]),
                          jnp.asarray(theta_L)))
    # manual eta
    eta = offset + np.asarray(mf.X) @ beta
    g1 = mf.re_terms[0]
    b1 = b[: 2 * 5].reshape(5, 2)
    eta = eta + (g1.lhs * b1[g1.group_idx]).sum(axis=1)
    g2 = mf.re_terms[1]
    b2 = b[10:18]
    eta = eta + b2[g2.group_idx]

    # decov_lp for p=[2,1]: rho has 1 element with shape1=shape2=reg+0
    reg = h["regularization"][0]
    nu = reg + 0.5 * (2 - 2)
    expected = (
        stats.norm.logpdf(y, eta, aux).sum()
        + stats.expon.logpdf(c["aux_unscaled"][0])
        + stats.norm.logpdf(c["z_beta"]).sum()
        + stats.norm.logpdf(c["z_b"]).sum()
        + stats.beta.logpdf(c["rho"][0], nu, nu)
        + stats.gamma.logpdf(c["zeta"], h["delta"]).sum()
        + stats.gamma.logpdf(c["tau"], h["shape_decov"]).sum()
        + float(log_jac)
    )
    assert lp == pytest.approx(expected, rel=1e-10)


def test_make_theta_L_onion_invariants():
    cfg = ParametricConfig(
        N=1, K=0, has_intercept=False, is_binary=False, has_weights=False,
        prior_dist=0, prior_dist_for_intercept=0, prior_dist_for_aux=3,
        t=1, p=(3,), l=(4,),
    )
    rng = np.random.default_rng(8)
    tau = jnp.asarray([1.3])
    scale = jnp.asarray([2.0])
    disp = jnp.asarray(0.7)
    zeta = jnp.asarray(rng.gamma(1.0, 1.0, size=3))
    rho = jnp.asarray(rng.uniform(0.2, 0.8, size=2))
    z_T = jnp.asarray(rng.normal(size=2))
    theta_L = np.asarray(make_theta_L(cfg, disp, tau, scale, zeta, rho, z_T))
    assert theta_L.shape == (6,)
    # unpack vech -> T (column-major lower)
    T = np.zeros((3, 3))
    idx = 0
    for c in range(3):
        for r in range(c, 3):
            T[r, c] = theta_L[idx]
            idx += 1
    Sigma = T @ T.T
    trace_expected = float(tau[0] * scale[0] * disp) ** 2 * 3
    pi = np.asarray(zeta) / np.asarray(zeta).sum()
    rho_np = np.asarray(rho)
    # rows 1-2 norms^2 = pi_i * trace; row 3 mixes pi_2/pi_3 because the
    # reference's scale_factor uses the previous row's std_dev
    # (continuous.stan:40-49) — we match that exactly
    assert Sigma[0, 0] == pytest.approx(pi[0] * trace_expected)
    assert Sigma[1, 1] == pytest.approx(pi[1] * trace_expected)
    assert Sigma[2, 2] == pytest.approx(
        rho_np[1] * pi[1] * trace_expected
        + (1.0 - rho_np[1]) * pi[2] * trace_expected
    )
    # valid covariance
    assert np.all(np.linalg.eigvalsh(Sigma) > 0)


def test_make_b_layout():
    cfg = ParametricConfig(
        N=1, K=0, has_intercept=False, is_binary=False, has_weights=False,
        prior_dist=0, prior_dist_for_intercept=0, prior_dist_for_aux=3,
        t=2, p=(2, 1), l=(3, 4),
    )
    theta_L = jnp.asarray([1.0, 0.5, 2.0, 3.0])  # T1 vech = [T11,T21,T22], T2
    z_b = jnp.arange(1.0, 11.0)  # 2*3 + 1*4
    b = np.asarray(make_b(cfg, z_b, theta_L))
    T1 = np.array([[1.0, 0.0], [0.5, 2.0]])
    for j in range(3):
        z = np.asarray(z_b[2 * j : 2 * j + 2])
        assert np.allclose(b[2 * j : 2 * j + 2], T1 @ z)
    assert np.allclose(b[6:], 3.0 * np.asarray(z_b[6:]))


def test_grad_finite(df):
    mf = build_model_frame(
        "y ~ bart(X1 + X2) + X4 + (1 + X4 | g.1) + (1 | g.2)", df
    )
    model, _, _ = build_parametric_model(mf, "gaussian")
    u = jnp.zeros(model.num_upars)
    g = jax.grad(model.log_prob)(u, jnp.zeros(mf.N), jnp.asarray(mf.y))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)


def test_constrained_draw_names(df):
    mf = build_model_frame(
        "y ~ bart(X1 + X2) + X4 + (1 + X4 | g.1) + (1 | g.2)", df
    )
    model, _, _ = build_parametric_model(mf, "gaussian")
    names = model.constrained_names()
    draw = np.asarray(model.constrained_draw(jnp.zeros(model.num_upars)))
    assert len(names) == len(draw)
    assert "aux.1" in names and "beta.1" in names and "theta_L.1" in names
    assert names.index("z_beta.1") < names.index("aux.1") < names.index("beta.1")
    # aux at u=0: prior_scale_for_aux * exp(0)
    aux_val = draw[names.index("aux.1")]
    assert aux_val == pytest.approx(float(model.hyper["prior_scale_for_aux"]))


def test_probit_config(df):
    dfb = friedman_dataframe(generate_friedman_data(60, ranef=True, binary=True))
    mf = build_model_frame("y ~ bart(X1 + X2) + X4 + (1 | g.2)", dfb)
    model, _, _ = build_parametric_model(mf, "binomial")
    assert model.cfg.is_binary
    # no aux parameter
    assert "aux_unscaled" not in [b[0] for b in model.layout.blocks]
    u = jnp.zeros(model.num_upars)
    lp = model.log_prob(u, jnp.zeros(mf.N), jnp.asarray(mf.y))
    assert np.isfinite(float(lp))


def test_large_q_gather_path_matches_onehot():
    """Above LARGE_Q_THRESHOLD the Z matvec switches to gather/segment-sum;
    both paths must agree (value and gradient) — the large-q regime the
    reference engineered CSR for (continuous.hpp:1176-1197)."""
    import jax
    import jax.numpy as jnp

    from stan4bart_tpu.models.parametric import ParametricModel

    rng = np.random.default_rng(0)
    n, l, p = 400, 37, 2
    lhs = rng.normal(size=(n, p))
    gidx = rng.integers(0, l, size=n).astype(np.int32)
    gidx[5] = -1  # one unseen level contributes zero
    cfg = ParametricConfig(
        N=n, K=0, has_intercept=False, is_binary=False, has_weights=False,
        prior_dist=0, prior_dist_for_intercept=0, prior_dist_for_aux=3,
        t=1, p=(p,), l=(l,),
    )
    hyper = dict(prior_mean=np.zeros(0), prior_scale=np.ones(0),
                 prior_df=np.ones(0), global_prior_df=0.0,
                 global_prior_scale=0.0, slab_df=0.0, slab_scale=0.0,
                 prior_mean_for_aux=0.0, prior_scale_for_aux=1.0,
                 prior_df_for_aux=1.0, prior_mean_for_intercept=0.0,
                 prior_scale_for_intercept=1.0, prior_df_for_intercept=1.0,
                 shape_decov=np.ones(1), scale_decov=np.ones(1),
                 regularization=np.ones(1), delta=np.ones(p))
    pm = ParametricModel(cfg, np.zeros((n, 0)), [(lhs, gidx)], hyper)
    b = jnp.asarray(rng.normal(size=l * p))

    def both(threshold):
        old = ParametricModel.LARGE_Q_THRESHOLD
        ParametricModel.LARGE_Q_THRESHOLD = threshold
        try:
            val = pm.eta_random(b)
            g = jax.grad(lambda bb: jnp.sum(pm.eta_random(bb) ** 2))(b)
        finally:
            ParametricModel.LARGE_Q_THRESHOLD = old
        return np.asarray(val), np.asarray(g)

    v_onehot, g_onehot = both(10_000)  # one-hot path
    v_gather, g_gather = both(1)       # gather path
    np.testing.assert_allclose(v_gather, v_onehot, rtol=1e-12)
    np.testing.assert_allclose(g_gather, g_onehot, rtol=1e-12)
    assert v_onehot[5] == 0.0  # unseen level row


@pytest.mark.parametrize("fam,wts,centered", [
    ("gaussian", False, False),
    ("gaussian", True, False),
    ("gaussian", False, True),
    ("binomial", False, False),
])
def test_gram_likelihood_matches_direct(fam, wts, centered):
    """log_prob_gram (anchored sufficient-statistic quadratic form,
    O(D^2) per evaluation) is an exact reformulation of log_prob: lp and
    gradients match at arbitrary points away from the anchor, for
    weighted, centered-ranef, and probit variants."""
    d = generate_friedman_data(150, ranef=True, causal=True,
                               binary=(fam == "binomial"))
    dfx = friedman_dataframe(d)
    mf = build_model_frame(
        "y ~ bart(X1+X2+X3+X5) + X4 + z + (1 + X4 | g.1) + (1 | g.2)", dfx
    )
    rng = np.random.default_rng(0)
    if wts:
        mf.weights = rng.uniform(0.5, 2.0, 150)
    pm, _, _ = build_parametric_model(
        mf, fam, {"centered_ranef": centered}, dtype=jnp.float64
    )
    assert pm.enable_gram()

    off = jnp.asarray(rng.normal(size=150))
    y = jnp.asarray(rng.normal(size=150) + 3.0)
    anchor = pm.gram_anchor(
        jnp.asarray(rng.normal(size=pm.num_upars) * 0.5), off, y
    )
    for _ in range(4):
        u = jnp.asarray(rng.normal(size=pm.num_upars) * 0.8)
        lp_direct = float(pm.log_prob(u, off, y))
        lp_gram = float(pm.log_prob_gram(u, anchor))
        np.testing.assert_allclose(lp_gram, lp_direct, rtol=1e-9,
                                   atol=1e-7)
        g_direct = np.asarray(jax.grad(pm.log_prob)(u, off, y))
        g_gram = np.asarray(
            jax.grad(lambda uu: pm.log_prob_gram(uu, anchor))(u)
        )
        np.testing.assert_allclose(g_gram, g_direct, rtol=1e-7, atol=1e-7)


def test_gram_disabled_for_empty_design():
    """A model with no intercept, no fixef, no ranef has D == 0 — gram
    must decline (and GibbsProgram falls back to the direct path)."""
    dfx = friedman_dataframe(generate_friedman_data(60, ranef=False))
    mf = build_model_frame("y ~ bart(X1 + X2 + X3)", dfx)
    pm, _, _ = build_parametric_model(mf, "gaussian", {}, dtype=jnp.float64)
    if pm.cfg.K == 0 and not pm.cfg.has_intercept and pm.cfg.q == 0:
        assert pm.enable_gram() is False
