"""Simulation-based calibration gates (reduced in-suite variant of
benchmarks/sbc.py — the full model matrix runs there; SBC_r03.json is the
recorded artifact).  Certifies the composed sampler end to end: prior
draws (ParametricModel.prior_draw_unconstrained + the CGM tree prior with
sigma_mu_fixed) -> simulated data -> fit -> uniform posterior ranks
(Talts et al. 2018).  The strongest in-image substitute for matching
R/stan4bart within MC error (BASELINE.md north star)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sbc():
    spec = importlib.util.spec_from_file_location(
        "sbc_harness", os.path.join(REPO, "benchmarks", "sbc.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["sbc_harness"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
@pytest.mark.parametrize("cell", ["continuous", "leaf_block"])
def test_sbc_ranks_uniform(cell):
    """64 reps, chi-square over 8 bins at alpha=1e-4 per quantity (loose
    vs the 160-rep artifact gates; a real miscalibration fails hard)."""
    sbc = _sbc()
    out = sbc.run_cell(cell, sbc.CELLS[cell], n_reps=64, seed=11,
                       batch=16, verbose=False)
    for qn, q in out["quantities"].items():
        assert q["p"] > 1e-4, (
            f"cell {cell} quantity {qn}: SBC ranks non-uniform "
            f"(chi2 {q['chi2']}, p {q['p']:.2e}, counts {q['counts']})"
        )


def test_prior_draw_moments():
    """Block-level prior sampler sanity: aux ~ exponential, beta sd
    matches the prior scale, tau ~ gamma(shape, 1), rho in (0, 1)."""
    import jax

    sbc = _sbc()
    mf, pm, prog, cfg = sbc.build_cell(sbc.CELLS["continuous"], seed=0)
    keys = jax.random.split(jax.random.PRNGKey(0), 8000)
    us = jax.jit(jax.vmap(pm.prior_draw_unconstrained))(keys)
    cs = np.asarray(jax.jit(jax.vmap(pm.constrained_draw))(us))
    names = pm.constrained_names()

    def col(n):
        return cs[:, names.index(n)]

    # aux_unscaled ~ exponential(1), aux = scale * unscaled
    scale = float(pm.hyper["prior_scale_for_aux"])
    assert abs(col("aux.1").mean() - scale) < 0.06 * scale
    # beta ~ normal(0, prior_scale)
    bscale = float(np.atleast_1d(np.asarray(pm.hyper["prior_scale"]))[0])
    assert abs(col("beta.1").std() - bscale) < 0.06 * bscale
    assert abs(col("beta.1").mean()) < 0.06 * bscale
    # decov tau ~ gamma(shape=1, 1) per term
    taus = us[:, pm.layout.slices["tau"][0]]
    assert abs(float(np.exp(np.asarray(taus)).mean()) - 1.0) < 0.06


def test_prior_draw_unsupported_raises():
    import jax

    sbc = _sbc()
    from stan4bart_tpu.formula import build_model_frame
    from stan4bart_tpu.models.assemble import build_parametric_model
    from stan4bart_tpu.models import priors

    df = sbc.covariate_frame(50, 0)
    mf = build_model_frame("y ~ bart(X1) + X4 + (1 | g)", df)
    pm, _, _ = build_parametric_model(
        mf, "gaussian", {"prior": priors.hs(), "centered_ranef": False})
    with pytest.raises(NotImplementedError, match="hs"):
        pm.prior_draw_unconstrained(jax.random.PRNGKey(0))
