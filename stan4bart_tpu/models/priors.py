"""Prior specification constructors.

Python equivalents of the reference's prior constructors
(/root/reference/R/priors.R:439-659) and the rstanarm prior-resolution
machinery (/root/reference/R/rstanarm_functions.R:449-512
``handle_glm_prior``).  Each constructor returns a plain dict; resolution
turns user specs into the integer prior codes + hyperparameter vectors
consumed by the parametric log-posterior:

    coef codes   (continuous.stan:184-186): 0 none, 1 normal, 2 student_t,
                 3 hs, 4 hs_plus, 5 laplace, 6 lasso, 7 product_normal
    aux codes    (continuous.stan:189-190): 0 none, 1 normal, 2 student_t,
                 3 exponential
"""

from __future__ import annotations

import numpy as np

CAUCHY_DF = 1.0


def _validate_positive(name, x):
    """Positive scale/df/shape check (priors.R:574-587
    validate_parameter_value; None is allowed = use the default)."""
    if x is None:
        return
    arr = np.atleast_1d(np.asarray(x, dtype=np.float64))
    if not np.issubdtype(arr.dtype, np.number):
        raise ValueError(f"{name} should be None or numeric")
    if np.any(arr <= 0):
        raise ValueError(f"{name} should be positive")


def normal(location=0.0, scale=None, autoscale=False):
    _validate_positive("scale", scale)
    return dict(dist="normal", location=location, scale=scale, df=np.nan,
                autoscale=autoscale)


def student_t(df=1.0, location=0.0, scale=None, autoscale=False):
    _validate_positive("df", df)
    _validate_positive("scale", scale)
    return dict(dist="t", location=location, scale=scale, df=df,
                autoscale=autoscale)


def cauchy(location=0.0, scale=None, autoscale=False):
    return student_t(df=CAUCHY_DF, location=location, scale=scale,
                     autoscale=autoscale)


def hs(df=1.0, global_df=1.0, global_scale=0.01, slab_df=4.0, slab_scale=2.5):
    for nm, v in (("df", df), ("global_df", global_df),
                  ("global_scale", global_scale), ("slab_df", slab_df),
                  ("slab_scale", slab_scale)):
        _validate_positive(nm, v)
    return dict(dist="hs", df=df, location=0.0, scale=np.nan,
                global_df=global_df, global_scale=global_scale,
                slab_df=slab_df, slab_scale=slab_scale, autoscale=False)


def hs_plus(df1=1.0, df2=1.0, global_df=1.0, global_scale=0.01,
            slab_df=4.0, slab_scale=2.5):
    # as in rstanarm, df2 rides in the 'scale' slot (continuous.stan:397-398)
    return dict(dist="hs_plus", df=df1, location=0.0, scale=df2,
                global_df=global_df, global_scale=global_scale,
                slab_df=slab_df, slab_scale=slab_scale, autoscale=False)


def laplace(location=0.0, scale=None, autoscale=False):
    return dict(dist="laplace", location=location, scale=scale, df=np.nan,
                autoscale=autoscale)


def lasso(df=1.0, location=0.0, scale=None, autoscale=False):
    return dict(dist="lasso", location=location, scale=scale, df=df,
                autoscale=autoscale)


def product_normal(df=2.0, location=0.0, scale=1.0):
    return dict(dist="product_normal", location=location, scale=scale, df=df,
                autoscale=False)


def exponential(rate=1.0, autoscale=False):
    return dict(dist="exponential", location=None, scale=1.0 / rate,
                df=np.nan, autoscale=autoscale)


def decov(regularization=1.0, concentration=1.0, shape=1.0, scale=1.0):
    for nm, v in (("regularization", regularization),
                  ("concentration", concentration), ("shape", shape),
                  ("scale", scale)):
        _validate_positive(nm, v)
    return dict(dist="decov", regularization=regularization,
                concentration=concentration, shape=shape, scale=scale)


def lkj(regularization=1.0, scale=10.0, df=1.0, autoscale=True):
    """LKJ covariance prior: per-coefficient sds ~ half-Student-t(df, 0,
    scale), correlation Cholesky ~ LKJ(regularization) (priors.R:547-552).
    Usable as ``prior_covariance`` alongside decov."""
    for nm, v in (("regularization", regularization), ("scale", scale),
                  ("df", df)):
        _validate_positive(nm, v)
    return dict(dist="lkj", regularization=regularization, scale=scale,
                df=df, autoscale=autoscale)


def dirichlet(concentration=1.0):
    """Symmetric Dirichlet spec (priors.R:554-558).  In this model family it
    parameterizes the decov variance simplex: ``decov(concentration=...)``."""
    _validate_positive("concentration", concentration)
    return dict(dist="dirichlet", concentration=concentration)


def R2(location=None, what="mode"):
    """Joint shrinkage prior on the coefficients via a Beta(K/2, eta) prior
    on the model R^2 (priors.R:560-563; rstanarm stan_lm semantics).
    Requires ``qr=True``; eta is derived from (location, what) by
    :func:`make_eta`."""
    if what not in ("mode", "mean", "median", "log"):
        raise ValueError("what must be mode, mean, median, or log")
    validate_R2_location(location, what)
    return dict(dist="R2", location=location, what=what, df=0.0, scale=0.0,
                autoscale=False)


def validate_R2_location(location, what):
    """priors.R:591-618."""
    if location is None or not np.isscalar(location):
        raise ValueError("'R2' takes a single numeric 'location'")
    location = float(location)
    if what == "log":
        if location >= 0:
            raise ValueError("if 'what' is 'log' then location must be "
                             "negative")
    elif what == "mode":
        if location <= 0 or location > 1:
            raise ValueError("if 'what' is 'mode', location must be in (0,1]")
    else:
        if location <= 0 or location >= 1:
            raise ValueError("if 'what' is 'mean' or 'median', location must "
                             "be in (0,1)")


def make_eta(location, what, K: int) -> float:
    """LKJ/Beta shape eta for the R2 prior (priors.R:626-659)."""
    if K == 0:
        raise ValueError("R2 prior is not applicable with no covariates")
    from scipy.optimize import brentq
    from scipy.special import digamma
    from scipy.stats import beta as beta_dist, expon

    half_K = K / 2.0
    location = float(location)
    if what == "mode":
        if K <= 2:
            raise ValueError(
                "the mode of the beta distribution does not exist with fewer "
                "than three predictors; use what='mean', 'median', or 'log'"
            )
        return (half_K - 1.0 - location * half_K + location * 2.0) / location
    if what == "mean":
        return (half_K - location * half_K) / location
    if what == "median":
        f = lambda u: beta_dist.ppf(0.5, half_K, expon.ppf(u)) - location  # noqa: E731
        return float(expon.ppf(brentq(f, 1e-12, 1.0 - 1e-12)))
    # what == "log": E[log R2] = digamma(half_K) - digamma(half_K + eta)
    f = lambda u: digamma(half_K) - digamma(half_K + expon.ppf(u)) - location  # noqa: E731
    return float(expon.ppf(brentq(f, 1e-12, 1.0 - 1e-12)))


def default_prior_coef():
    """stan_args default: normal(0, 2.5, autoscale=TRUE)
    (rstanarm_functions.R / stan4bart_fit.R:104-106)."""
    return normal(0.0, 2.5, autoscale=True)


def default_prior_aux():
    """stan_args default: exponential(autoscale=TRUE) (stan4bart_fit.R:110-111)."""
    return exponential(1.0, autoscale=True)


_COEF_CODES = {"normal": 1, "t": 2, "hs": 3, "hs_plus": 4, "laplace": 5,
               "lasso": 6, "product_normal": 7}
_AUX_CODES = {"normal": 1, "t": 2, "exponential": 3}


def _broadcast(x, n):
    a = np.atleast_1d(np.asarray(x, dtype=np.float64))
    if a.size == 1:
        a = np.full(n, float(a[0]))
    if a.size != n:
        raise ValueError(f"prior hyperparameter length {a.size} != nvars {n}")
    return a


def handle_glm_prior(prior: dict | None, nvars: int, default_scale: float):
    """Resolve a prior spec into codes + hyperparameter vectors
    (rstanarm_functions.R:449-512; link fixed to identity as in
    stan4bart_fit.R:139-145)."""
    if prior is None:
        return dict(
            prior_dist=0, prior_mean=np.zeros(nvars),
            prior_scale=np.ones(nvars), prior_df=np.ones(nvars),
            prior_dist_name=None, global_prior_scale=0.0,
            global_prior_df=0.0, slab_df=0.0, slab_scale=0.0,
            prior_autoscale=False,
        )
    name = prior["dist"]
    scale = prior.get("scale")
    if scale is None or (np.isscalar(scale) and
                         not np.isfinite(np.float64(scale or np.nan))):
        scale = default_scale
    mean = prior.get("location", 0.0)
    df = prior.get("df", 1.0)
    out = dict(
        prior_dist_name=name,
        prior_mean=np.nan_to_num(_broadcast(mean if mean is not None else 0.0,
                                            nvars)),
        prior_scale=_broadcast(scale, nvars),
        prior_df=np.nan_to_num(_broadcast(df, nvars), nan=1.0),
        global_prior_scale=0.0, global_prior_df=0.0,
        slab_df=0.0, slab_scale=0.0,
        prior_autoscale=bool(prior.get("autoscale", False)),
    )
    if name in ("hs", "hs_plus"):
        out["prior_dist"] = _COEF_CODES[name]
        out["global_prior_scale"] = float(prior["global_scale"])
        out["global_prior_df"] = float(prior["global_df"])
        out["slab_df"] = float(prior["slab_df"])
        out["slab_scale"] = float(prior["slab_scale"])
    elif name in _COEF_CODES:
        out["prior_dist"] = _COEF_CODES[name]
    elif name == "exponential":
        out["prior_dist"] = 3  # aux-only code (rstanarm_functions.R:495-496)
    elif name == "R2":
        # joint Beta(K/2, eta) shrinkage on R^2 (stan_lm semantics); eta is
        # resolved at assembly time when K is known (priors.R:626-659)
        out["prior_dist"] = 8
        out["R2_location"] = float(prior["location"])
        out["R2_what"] = prior["what"]
    elif name == "dirichlet":
        raise ValueError(
            "dirichlet is a covariance-simplex spec; pass it as "
            "decov(concentration=...), not as a coefficient prior"
        )
    else:
        raise ValueError(f"unsupported prior distribution {name!r}")
    return out
