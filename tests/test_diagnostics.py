"""split-R-hat / ESS diagnostics (first-class here; vendored-but-unused in
the reference, SURVEY.md section 5)."""

import pytest
import numpy as np
import jax

from stan4bart_tpu.parallel.diagnostics import ess, split_rhat


def test_rhat_iid_near_one():
    rng = np.random.default_rng(0)
    draws = rng.standard_normal((4, 1000))
    r = float(split_rhat(draws))
    assert 0.99 < r < 1.02


def test_rhat_detects_shifted_chains():
    rng = np.random.default_rng(1)
    draws = rng.standard_normal((4, 500))
    draws[0] += 3.0
    assert float(split_rhat(draws)) > 1.5


def test_rhat_multiparam():
    rng = np.random.default_rng(2)
    draws = rng.standard_normal((4, 400, 3))
    r = np.asarray(split_rhat(draws))
    assert r.shape == (3,)
    assert np.all(r < 1.05)


def test_ess_iid_near_total():
    rng = np.random.default_rng(3)
    draws = rng.standard_normal((4, 1000))
    e = float(ess(draws))
    assert 2400 < e < 5600  # ~4000 expected


def test_ess_ar1_much_smaller():
    rng = np.random.default_rng(4)
    phi = 0.95
    n, C = 2000, 4
    x = np.zeros((C, n))
    for c in range(C):
        for i in range(1, n):
            x[c, i] = phi * x[c, i - 1] + rng.standard_normal()
    e = float(ess(x))
    # theoretical ESS factor (1-phi)/(1+phi) ~ 0.026 -> ~205
    assert e < 0.15 * C * n
    assert e > 20


def test_jittable():
    rng = np.random.default_rng(5)
    draws = rng.standard_normal((4, 256))
    e1 = float(ess(draws))
    e2 = float(jax.jit(ess)(draws))
    assert abs(e1 - e2) < 1e-6
    r1 = float(split_rhat(draws))
    r2 = float(jax.jit(split_rhat)(draws))
    assert abs(r1 - r2) < 1e-9


def test_equilibration_warning_fires_and_stays_quiet():
    """Post-fit lp-trend check (BENCH_NOTES round 3): a fabricated
    monotone lp drift warns; a stationary fit does not."""
    import warnings as _warnings

    import stan4bart_tpu as s4b
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    df = friedman_dataframe(generate_friedman_data(100, ranef=True))
    fit = s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df,
                        chains=2, warmup=40, iter=140, seed=3,
                        verbose=-1, bart_args={"n.trees": 5})
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        fit.check_sampler_diagnostics()
    # healthy chain: no equilibration warning (divergence warnings from
    # the deliberately tiny warmup are fine)
    assert not any("equilibrated" in str(w.message) for w in rec)

    # inject a strong monotone drift into chain 1's stored lp
    lp_col = fit._name_idx["lp__"]
    drift = np.linspace(0.0, 300.0, fit.iterations - fit.warmup)
    fit.draws.stan[0, fit.warmup:, lp_col] += drift
    with pytest.warns(UserWarning, match="before the BART ensemble"):
        fit.check_sampler_diagnostics()
