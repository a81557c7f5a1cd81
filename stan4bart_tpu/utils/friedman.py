"""Deterministic Friedman test-data generator.

Python equivalent of the reference's test fixture
(/root/reference/inst/common/friedmanData.R:1-126): the Friedman (1991) MARS
benchmark function with optional multilevel random effects, a causal
treatment arm, and a probit binary transform.  Uses a fixed numpy Generator
seed so tests are platform-stable (the reference uses ``set.seed(99)`` plus a
``round(sin(.), 14)`` trick; bit-level equality with R is not required, only
the same generative structure).
"""

from __future__ import annotations

import numpy as np
from scipy.stats import norm


def friedman_f(x: np.ndarray) -> np.ndarray:
    """mu_bart: 10 sin(pi x1 x2) + 20 (x3 - .5)^2 + 5 x5 (friedmanData.R:4-8)."""
    return (
        10.0 * np.round(np.sin(np.pi * x[:, 0] * x[:, 1]), 14)
        + 20.0 * (x[:, 2] - 0.5) ** 2
        + 5.0 * x[:, 4]
    )


def generate_friedman_data(
    n: int,
    ranef: bool = False,
    causal: bool = False,
    binary: bool = False,
    seed: int = 99,
) -> dict:
    """Generate the Friedman fixture (friedmanData.R:1-126).

    Returns a dict with keys mirroring the reference fixture: ``x`` (n,10),
    ``y``, ``sigma``, ``mu_bart``, ``mu_fixef``; plus ``g_1``/``g_2``/``b_1``/
    ``b_2``/``mu_ranef`` when ``ranef``; plus ``z``/``tau``/``mu_0``/``mu_1``/
    ``y_0``/``y_1`` when ``causal``.
    """
    rng = np.random.default_rng(seed)
    sigma = 1.0

    x = rng.uniform(size=(n, 10))
    out: dict = {
        "x": x,
        "sigma": sigma,
        "mu_bart": friedman_f(x),
        "mu_fixef": x[:, 3] * 10.0,
    }

    if ranef:
        n_g1, n_g2 = 5, 8
        g_1 = rng.integers(0, n_g1, size=n)
        Sigma_b1 = np.array([[1.5**2, 0.2], [0.2, 1.0**2]])
        b_1 = rng.standard_normal((n_g1, 2)) @ np.linalg.cholesky(Sigma_b1).T
        g_2 = rng.integers(0, n_g2, size=n)
        sigma_b2 = np.sqrt(1.2)
        b_2 = rng.normal(0.0, sigma_b2, size=n_g2)
        mu_ranef = b_1[g_1, 0] + x[:, 3] * b_1[g_1, 1] + b_2[g_2]
        out.update(
            g_1=g_1, g_2=g_2, b_1=b_1, b_2=b_2,
            Sigma_b_1=Sigma_b1, Sigma_b_2=np.array([[1.2]]),
            mu_ranef=mu_ranef,
        )
        mu = out["mu_bart"] + out["mu_fixef"] + mu_ranef
    else:
        mu = out["mu_bart"] + out["mu_fixef"]

    if causal:
        tau = 5.0
        z = rng.binomial(1, 0.2, size=n)
        out["tau"] = tau
        out["z"] = z
        mu_0 = mu
        mu_1 = mu + tau
        out["mu_fixef_0"] = out["mu_fixef"]
        out["mu_fixef_1"] = out["mu_fixef"] + tau
        if binary:
            both = np.concatenate([mu_0, mu_1])
            loc, scale = both.mean(), both.std(ddof=1) / norm.ppf(0.15)
            mu_0 = (mu_0 - loc) / scale
            mu_1 = (mu_1 - loc) / scale
            out["mu_bart"] = out["mu_bart"] / scale
            out["mu_fixef_0"] = (out["mu_fixef_0"] - loc) / scale
            out["mu_fixef_1"] = (out["mu_fixef_1"] - loc) / scale
            if ranef:
                out["mu_ranef"] = out["mu_ranef"] / scale
            y_0 = rng.binomial(1, norm.cdf(mu_0)).astype(np.float64)
            y_1 = rng.binomial(1, norm.cdf(mu_1)).astype(np.float64)
        else:
            y_0 = mu_0 + rng.normal(0.0, sigma, size=n)
            y_1 = mu_1 + rng.normal(0.0, sigma, size=n)
        out["mu_0"], out["mu_1"] = mu_0, mu_1
        out["y_0"], out["y_1"] = y_0, y_1
        out["y"] = np.where(z == 1, y_1, y_0)
    else:
        if binary:
            loc, scale = mu.mean(), mu.std(ddof=1) / norm.ppf(0.15)
            mu = (mu - loc) / scale
            out["mu_bart"] = out["mu_bart"] / scale
            out["mu_fixef"] = (out["mu_fixef"] - loc) / scale
            if ranef:
                out["mu_ranef"] = out["mu_ranef"] / scale
            out["y"] = rng.binomial(1, norm.cdf(mu)).astype(np.float64)
        else:
            out["y"] = mu + rng.normal(0.0, sigma, size=n)
        out["mu"] = mu

    return out


def friedman_dataframe(data: dict):
    """Flatten the fixture into a dict-of-columns usable by the formula API."""
    cols = {f"X{j + 1}": data["x"][:, j] for j in range(data["x"].shape[1])}
    cols["y"] = data["y"]
    if "g_1" in data:
        cols["g.1"] = data["g_1"].astype(str)
        cols["g.2"] = data["g_2"].astype(str)
    if "z" in data:
        cols["z"] = data["z"].astype(np.float64)
    return cols
