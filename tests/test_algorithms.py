"""Public `algorithm` surface (VERDICT round-2 ask #5): algorithm="advi"
runs stan::variational-style adagrad ADVI (meanfield / fullrank) on the
parametric block within Gibbs; algorithm="vi" carries its documented
accuracy contract as a user-facing warning; SMC is exposed on the fit as
`adjudicate_parametric_smc`.  Accuracy contracts asserted here are the
documented ones (point estimates track NUTS; spread approximate)."""

import numpy as np
import pytest

import stan4bart_tpu as s4b
from stan4bart_tpu.utils.friedman import (
    friedman_dataframe,
    generate_friedman_data,
)

FORMULA = ("y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 + X4 | g.1) "
           "+ (1 | g.2)")


def _fit(algorithm, d, df, **stan_args):
    return s4b.stan4bart(
        FORMULA, df, treatment="z", chains=2, warmup=300, iter=600,
        seed=11, verbose=-1, bart_args={"n.trees": 40},
        algorithm=algorithm,
        stan_args=stan_args or None,
    )


@pytest.fixture(scope="module")
def data():
    d = generate_friedman_data(250, ranef=True, causal=True)
    return d, friedman_dataframe(d)


@pytest.mark.parametrize("family", ["meanfield", "fullrank"])
def test_advi_point_estimates_track_truth(data, family):
    d, df = data
    fit = _fit("advi", d, df, vi_family=family)
    assert fit.prog.vi_method == "adagrad"
    assert fit.prog.vi_family == family
    bart = fit.fitted("indiv.bart")
    cor = np.corrcoef(bart - bart.mean(),
                      d["mu_bart"] - d["mu_bart"].mean())[0, 1]
    assert cor > 0.9, f"cor = {cor}"
    fx = fit.extract("fixef").mean(-1)
    assert abs(fx[1] - 5.0) < 1.5
    # contract: spread approximate but bounded
    assert 0.5 < fit.fitted("sigma") < 3.0


def test_vi_algorithm_warns_about_sigma(data):
    d, df = data
    with pytest.warns(UserWarning, match="biased high"):
        fit = s4b.stan4bart(
            FORMULA, df, treatment="z", chains=1, warmup=30, iter=60,
            seed=1, verbose=-1, bart_args={"n.trees": 10},
            algorithm="vi",
        )
    assert fit.prog.vi_method == "rmsprop"


def test_bad_algorithm_message():
    df = friedman_dataframe(generate_friedman_data(60, ranef=True))
    with pytest.raises(ValueError, match="'nuts', 'vi', or 'advi'"):
        s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df,
                      algorithm="laplace")


def test_smc_adjudication(data):
    """SMC (a sampler with no kernels in common) agrees with the NUTS
    fit on the parametric conditional's means."""
    d, df = data
    fit = s4b.stan4bart(
        FORMULA, df, treatment="z", chains=2, warmup=200, iter=500,
        seed=3, verbose=-1, bart_args={"n.trees": 40},
    )
    adj = fit.adjudicate_parametric_smc(n_particles=512, n_mcmc=6)
    assert adj["final_temp"] == 1.0
    assert np.isfinite(adj["log_evidence"])
    names = adj["names"]
    i_b1 = names.index("beta.1")
    # conditional-vs-marginal means agree within a loose MC band
    assert abs(adj["smc_mean"][i_b1] - adj["mcmc_mean"][i_b1]) < 1.0
    # sigma's CONDITIONAL mean sits below the marginal one by
    # construction (the posterior-mean BART fit beats any single draw,
    # so conditional residuals are smaller — the documented contract)
    i_sig = names.index("aux.1")
    assert adj["smc_mean"][i_sig] < adj["mcmc_mean"][i_sig] + 0.05
    assert adj["smc_mean"][i_sig] > 0.4 * adj["mcmc_mean"][i_sig]


def test_smc_adjudication_binary_raises():
    d = generate_friedman_data(80, ranef=True, binary=True)
    df = friedman_dataframe(d)
    fit = s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df,
                        chains=1, warmup=20, iter=50, seed=0, verbose=-1,
                        bart_args={"n.trees": 5})
    with pytest.raises(NotImplementedError):
        fit.adjudicate_parametric_smc(n_particles=64)
