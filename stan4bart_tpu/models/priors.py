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


def normal(location=0.0, scale=None, autoscale=False):
    return dict(dist="normal", location=location, scale=scale, df=np.nan,
                autoscale=autoscale)


def student_t(df=1.0, location=0.0, scale=None, autoscale=False):
    return dict(dist="t", location=location, scale=scale, df=df,
                autoscale=autoscale)


def cauchy(location=0.0, scale=None, autoscale=False):
    return student_t(df=CAUCHY_DF, location=location, scale=scale,
                     autoscale=autoscale)


def hs(df=1.0, global_df=1.0, global_scale=0.01, slab_df=4.0, slab_scale=2.5):
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
    return dict(dist="decov", regularization=regularization,
                concentration=concentration, shape=shape, scale=scale)


def lkj(regularization=1.0, scale=10.0, df=1.0, autoscale=True):
    return dict(dist="lkj", regularization=regularization, scale=scale,
                df=df, autoscale=autoscale)


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
    else:
        raise ValueError(f"unsupported prior distribution {name!r}")
    return out
