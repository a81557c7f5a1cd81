"""IHDP-style semi-synthetic causal benchmark generator.

Python equivalent of the reference's IHDP simulation harness
(/root/reference/ihdp/{data,sim}.R; runSimulations.R): Hill (2011)
response-surface-B style nonlinear outcome with confounded binary treatment,
extended — as the reference does — with multilevel random intercepts and
treatment-slopes over a grouping factor with a sampled covariance
(runSimulations.R:42-56).  The reference consumes the real IHDP covariate
file (sim.data.gz, an R serialization we don't parse); covariates here are
synthesized with matching structure (continuous + binary mix), so metric
DEFINITIONS (bias, coverage, interval length, PEHE, PEGSTE) are comparable
while raw values are generator-specific.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import norm


def generate_ihdp_sim(
    n: int = 600,
    n_cont: int = 6,
    n_bin: int = 9,
    n_groups: int = 10,
    target_att: float = 4.0,
    seed: int = 0,
) -> dict:
    rng = np.random.default_rng(seed)
    Xc = rng.standard_normal((n, n_cont))
    Xb = (rng.uniform(size=(n, n_bin))
          < rng.uniform(0.2, 0.8, size=n_bin)).astype(np.float64)
    X = np.concatenate([Xc, Xb], axis=1)
    P = X.shape[1]

    # confounded treatment assignment
    gamma = rng.choice([0.0, 0.2, -0.2, 0.4], size=P, p=[0.5, 0.2, 0.2, 0.1])
    p_z = 1.0 / (1.0 + np.exp(-(X @ gamma - 0.3)))
    z = rng.binomial(1, p_z).astype(np.float64)

    # surface B: nonlinear control surface, linear treated surface
    beta = rng.choice([0.0, 0.1, 0.2, 0.3, 0.4], size=P,
                      p=[0.6, 0.1, 0.1, 0.1, 0.1])
    mu0 = np.exp((X + 0.5) @ beta * 0.4)
    mu1 = X @ beta

    # multilevel structure (runSimulations.R:42-56): correlated random
    # intercept + treatment slope, |Sigma_b| = 1
    g = rng.integers(0, n_groups, size=n)
    rho = rng.beta(16, 4)
    r_var = rng.f(5, 7)
    s1 = np.sqrt(r_var / (1 - rho**2))
    s2 = s1 / r_var
    Sigma_b = np.array([
        [s1, rho * np.sqrt(s1 * s2)],
        [rho * np.sqrt(s1 * s2), s2],
    ])
    b = rng.standard_normal((n_groups, 2)) @ np.linalg.cholesky(Sigma_b).T
    mu0 = mu0 + b[g, 0]
    mu1 = mu1 + b[g, 0] + b[g, 1]
    # calibrate omega so the ATT equals target_att ("truthIsFour",
    # runSimulations.R:38) — after the group effects so the truth is exact
    omega = (mu1[z == 1] - mu0[z == 1]).mean() - target_att
    mu1 = mu1 - omega

    sigma = 1.0
    y0 = mu0 + rng.normal(0, sigma, n)
    y1 = mu1 + rng.normal(0, sigma, n)
    y = np.where(z == 1, y1, y0)

    cols = {f"x{j + 1}": X[:, j] for j in range(P)}
    cols.update(y=y, z=z, g=g.astype(str))
    return dict(
        data=cols, X=X, z=z, y=y, g=g,
        mu0=mu0, mu1=mu1, icate=mu1 - mu0,
        att=(mu1 - mu0)[z == 1].mean(),
        Sigma_b=Sigma_b, sigma=sigma,
    )


def causal_metrics(icate_draws: np.ndarray, sim: dict,
                   ci_level: float = 0.95) -> dict:
    """bias / coverage / interval length / PEHE / PEGSTE for ICATE draws
    (obs, draws) against the simulation truth (runSimulations.R:75-123)."""
    z = sim["z"].astype(bool)
    truth_i = sim["icate"]
    att_truth = truth_i[z].mean()

    satt_draws = icate_draws[z].mean(axis=0)
    est = satt_draws.mean()
    lo, hi = np.quantile(satt_draws, [(1 - ci_level) / 2,
                                      1 - (1 - ci_level) / 2])
    icate_est = icate_draws.mean(axis=1)
    pehe = float(np.sqrt(np.mean((icate_est - truth_i) ** 2)))

    # PEGSTE: precision in estimating group-level treatment effects
    g = sim["g"]
    gste_true = np.array([truth_i[(g == j) & z].mean()
                          for j in np.unique(g)
                          if ((g == j) & z).any()])
    gste_est = np.array([icate_est[(g == j) & z].mean()
                         for j in np.unique(g)
                         if ((g == j) & z).any()])
    pegste = float(np.sqrt(np.mean((gste_est - gste_true) ** 2)))

    return dict(
        bias=float(est - att_truth),
        covered=bool(lo <= att_truth <= hi),
        ci_length=float(hi - lo),
        pehe=pehe,
        pegste=pegste,
        satt_est=float(est),
        satt_truth=float(att_truth),
    )
