"""Assemble a ParametricModel from a ModelFrame + user prior specs.

Python equivalent of the reference's fit orchestration data assembly
(/root/reference/R/stan4bart_fit.R:99-365): default priors, autoscaling by
sd(y) and per-column sd(x), decov hyperparameter broadcasting, and the
Stan-data dimension bookkeeping.  QR reparameterization is supported via
``qr=True`` (stan4bart_fit.R:239-253) with the un-rotation matrix returned
for draw post-processing (stan4bart_fit.R:560-570).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from stan4bart_tpu.formula.design import ModelFrame
from stan4bart_tpu.models import priors as priors_mod
from stan4bart_tpu.models.parametric import (
    ParametricConfig,
    ParametricModel,
    decov_delta,
)


@dataclass
class StanArgs:
    """Resolved stan-side arguments (control defaults from
    stan_sampler.cpp:420-458)."""

    prior: dict | None = None
    prior_aux: dict | None = None
    prior_covariance: dict | None = None
    qr: bool = False
    # centered random-effect parameterization (same posterior, better
    # geometry when data dominates; see ParametricConfig.centered)
    centered_ranef: bool = False
    init_r: float = 2.0
    adapt_gamma: float = 0.05
    adapt_delta: float = 0.8
    adapt_kappa: float = 0.75
    adapt_t0: float = 10.0
    adapt_init_buffer: int = 75
    adapt_term_buffer: int = 50
    adapt_base_window: int = 25
    max_treedepth: int = 10
    stepsize: float = 1.0
    stepsize_jitter: float = 0.0
    freeze_rule: str = "bar"   # NutsConfig.freeze_rule
    # cross-chain pooled NUTS adaptation (NutsConfig.pooled_axis): the
    # dual-averaging accept signal and window-end metric pool over the
    # chain axis with one pmean collective — impossible in the reference's
    # process-per-chain design (stan4bart_fit.R:495-558)
    pooled_adaptation: bool = False
    pooled_parts: str = "metric"   # NutsConfig.pooled_parts
    pooled_between: bool = False   # NutsConfig.pooled_between
    # extra exact sigma conditional update per iteration (same posterior,
    # decouples sigma mixing from NUTS drift; GibbsProgram.sigma_gibbs)
    sigma_gibbs: bool = False
    # extra exact conjugate refresh of [gamma|beta|b] from its full
    # conditional per iteration (same posterior; GibbsProgram.linear_gibbs;
    # needs normal/flat gamma+beta priors; either parameterization).
    # None = auto: ON when the model is eligible (the baseline sampler
    # class is effectively unable to mix the beta <-> random-slope and
    # level directions — measured ESS 2-5 per 24k draws; see
    # docs/interweaving.md); False opts out explicitly.
    linear_gibbs: bool | None = None
    # extra conjugate interweave of the additive level between the tree
    # ensemble and the ranef intercepts (same posterior;
    # GibbsProgram.level_gibbs; either parameterization).  None = auto.
    level_gibbs: bool | None = None
    # ensemble-wide conjugate leaf refresh: N random Walsh-direction
    # rank-T exact conjugate draws over per-tree leaf-value shifts per
    # iteration (same posterior; GibbsProgram.leaf_gibbs) — targets the
    # joint leaf-value relaxation across trees (the lp/sigma ESS floor).
    # 0 = off.
    leaf_gibbs: int = 0
    # FULL ensemble-wide blocked leaf draw every k iterations: all trees'
    # leaf values jointly from their exact Gaussian conditional given the
    # structures (same posterior; GibbsProgram.leaf_block).  0 = off.
    leaf_block: int = 0
    leaf_block_dim: int = 0   # active-leaf cap; 0 = auto (~8/tree)
    # VI-within-Gibbs knobs (algorithm="vi"/"advi"; GibbsProgram
    # vi_family/vi_steps/vi_mc/vi_eta).  vi_family applies to
    # algorithm="advi" only ("meanfield" | "fullrank").
    vi_family: str = "meanfield"
    vi_steps: int = 5
    vi_mc: int = 4
    vi_eta: float = 0.5
    # Gram-compressed Gaussian likelihood in the NUTS hot loop (exact
    # reformulation; GibbsProgram.gram_lik).  None = auto by D
    gram_lik: bool | None = None
    # observation sharding: split the data axis over this many devices
    # on a 2-D chains x data mesh with explicitly psum'd sufficient
    # statistics (parallel/mesh.run_chains_obs_sharded) — the multi-chip
    # large-n path; needs obs_shards * k devices (k chain groups) and
    # the Gram likelihood.  0/1 = off.
    obs_shards: int = 0
    seed: int | None = None
    keep_trees: bool = False


def _sd(x):
    return float(np.std(x, ddof=1)) if len(x) > 1 else 1.0


def _validate_stan_args(sa: StanArgs):
    """Bounds validation of the resolved control surface — the analog of
    the reference's rc_bounds constraint DSL applied to every control
    field (stan_sampler.cpp:420-458; rc_bounds.c)."""
    def check(name, value, lo=None, hi=None, lo_open=False, hi_open=False):
        v = float(value)
        if lo is not None and (v < lo or (lo_open and v == lo)):
            raise ValueError(
                f"stan_args {name} must be {'>' if lo_open else '>='} {lo}"
            )
        if hi is not None and (v > hi or (hi_open and v == hi)):
            raise ValueError(
                f"stan_args {name} must be {'<' if hi_open else '<='} {hi}"
            )

    check("init_r", sa.init_r, lo=0.0)
    check("adapt_gamma", sa.adapt_gamma, lo=0.0, lo_open=True)
    check("adapt_delta", sa.adapt_delta, lo=0.0, hi=1.0,
          lo_open=True, hi_open=True)
    check("adapt_kappa", sa.adapt_kappa, lo=0.0, lo_open=True)
    check("adapt_t0", sa.adapt_t0, lo=0.0, lo_open=True)
    check("adapt_init_buffer", sa.adapt_init_buffer, lo=0)
    check("adapt_term_buffer", sa.adapt_term_buffer, lo=0)
    check("adapt_base_window", sa.adapt_base_window, lo=1)
    check("max_treedepth", sa.max_treedepth, lo=1)
    check("stepsize", sa.stepsize, lo=0.0, lo_open=True)
    check("stepsize_jitter", sa.stepsize_jitter, lo=0.0, hi=1.0)
    check("leaf_gibbs", sa.leaf_gibbs, lo=0)
    check("obs_shards", sa.obs_shards, lo=0)
    check("leaf_block", sa.leaf_block, lo=0)
    check("leaf_block_dim", sa.leaf_block_dim, lo=0)
    check("vi_steps", sa.vi_steps, lo=1)
    check("vi_mc", sa.vi_mc, lo=1)
    check("vi_eta", sa.vi_eta, lo=0.0, lo_open=True)
    if sa.vi_family not in ("meanfield", "fullrank"):
        raise ValueError("stan_args vi_family must be meanfield or "
                         "fullrank")
    if sa.freeze_rule not in ("bar", "mid", "last"):
        raise ValueError("stan_args freeze_rule must be bar, mid, or last")
    if sa.pooled_parts not in ("metric", "stepsize", "both"):
        raise ValueError(
            "stan_args pooled_parts must be metric, stepsize, or both"
        )


def build_parametric_model(
    mf: ModelFrame,
    family: str,
    stan_args: StanArgs | dict | None = None,
    dtype=jnp.float64,
):
    """-> (ParametricModel, resolved StanArgs, info dict with R_inv/x used)."""
    if stan_args is None:
        stan_args = StanArgs()
    elif isinstance(stan_args, dict):
        known = {k: v for k, v in stan_args.items()
                 if k in StanArgs.__dataclass_fields__}
        unknown = sorted(set(stan_args) - set(known))
        if unknown:
            # the reference validates every control name and warns on
            # unrecognized ones (stan_sampler.cpp:112-139; it warns
            # specifically on prior_intercept, stan4bart_fit.R:108-109)
            import warnings

            if "prior_intercept" in unknown:
                warnings.warn(
                    "the intercept is part of the BART component, so "
                    "'prior_intercept' is ignored (stan4bart_fit.R:108-109)"
                )
                unknown.remove("prior_intercept")
            if unknown:
                warnings.warn(f"ignoring unsupported stan_args: {unknown}")
        stan_args = StanArgs(**known)

    is_binary = family == "binomial"
    _validate_stan_args(stan_args)
    prior = (stan_args.prior if stan_args.prior is not None
             else priors_mod.default_prior_coef())
    prior_aux = (stan_args.prior_aux if stan_args.prior_aux is not None
                 else priors_mod.default_prior_aux())
    decov = (stan_args.prior_covariance
             if stan_args.prior_covariance is not None
             else priors_mod.decov())

    xtemp = np.asarray(mf.X, dtype=np.float64)
    y = np.asarray(mf.y, dtype=np.float64)
    K = xtemp.shape[1]

    ps = priors_mod.handle_glm_prior(prior, K, default_scale=2.5)
    pa = priors_mod.handle_glm_prior(prior_aux, 1, default_scale=1.0)

    if ps["prior_dist"] == 8:
        # R2 prior: only meaningful jointly over the QR-rotated coefficients
        # with unit-variance columns (rstanarm stan_lm always uses QR)
        if is_binary:
            raise ValueError("the R2 prior requires a gaussian response")
        if not stan_args.qr:
            raise ValueError("the R2 prior requires stan_args qr=True "
                             "(stan_lm semantics)")
        if K < 2:
            raise ValueError("the R2 prior requires multiple predictors")

    if decov.get("dist") not in ("decov", "lkj"):
        raise ValueError(
            "prior_covariance must be decov() or lkj() "
            f"(got {decov.get('dist')!r})"
        )
    cov_prior = 1 if decov["dist"] == "lkj" else 0

    # gaussian autoscaling by sd(y) (stan4bart_fit.R:206-214)
    if not is_binary:
        ss = _sd(y)
        if ps["prior_dist"] > 0 and ps["prior_autoscale"]:
            ps["prior_scale"] = ss * ps["prior_scale"]
        if pa["prior_dist"] > 0 and pa["prior_autoscale"]:
            pa["prior_scale"] = ss * pa["prior_scale"]

    R_inv = None
    if not stan_args.qr and ps["prior_dist"] > 0 and ps["prior_autoscale"]:
        # per-column sd rescale (stan4bart_fit.R:218-232)
        col_scale = np.ones(K)
        for j in range(K):
            if len(np.unique(xtemp[:, j])) > 1:
                col_scale[j] = _sd(xtemp[:, j])
        ps["prior_scale"] = np.maximum(1e-12,
                                       ps["prior_scale"] / col_scale)
    elif stan_args.qr and K > 0:
        if K <= 1:
            raise ValueError("'qr' requires multiple predictors "
                             "(stan4bart_fit.R:241-242)")
        Q, R = np.linalg.qr(xtemp)
        if ps["prior_autoscale"] or ps["prior_dist"] == 8:
            # R2 needs X = Q sqrt(N-1) so var(X beta) = |beta|^2
            scale_factor = np.sqrt(xtemp.shape[0] - 1.0)
        else:
            scale_factor = np.diag(R)[-1]
        R_inv = np.linalg.solve(R, np.eye(K)) * scale_factor
        xtemp = Q * scale_factor

    num_normals = ()
    if ps["prior_dist"] == 7:
        num_normals = tuple(int(v) for v in ps["prior_df"])

    cfg = ParametricConfig(
        N=mf.N,
        K=K,
        has_intercept=False,  # BART absorbs the level (stan4bart_fit.R:127)
        is_binary=is_binary,
        has_weights=mf.weights is not None and len(mf.weights) > 0,
        prior_dist=int(ps["prior_dist"]),
        prior_dist_for_intercept=0,
        prior_dist_for_aux=0 if is_binary else int(pa["prior_dist"]),
        t=len(mf.re_terms),
        p=tuple(mf.p),
        l=tuple(mf.l),
        num_normals=num_normals,
        centered=bool(stan_args.centered_ranef),
        cov_prior=cov_prior,
    )

    t = cfg.t
    concentration = np.broadcast_to(
        np.atleast_1d(decov.get("concentration", 1.0)),
        (cfg.len_concentration,)
    ).astype(np.float64) if cfg.len_concentration else np.zeros(0)
    regularization = np.broadcast_to(
        np.atleast_1d(decov["regularization"]), (cfg.len_regularization,)
    ).astype(np.float64) if cfg.len_regularization else np.zeros(0)

    hyper = dict(
        prior_mean=ps["prior_mean"],
        prior_scale=np.asarray(ps["prior_scale"], dtype=np.float64),
        prior_df=ps["prior_df"],
        global_prior_df=ps["global_prior_df"],
        global_prior_scale=ps["global_prior_scale"],
        slab_df=ps["slab_df"],
        slab_scale=ps["slab_scale"],
        prior_mean_for_aux=float(np.atleast_1d(pa["prior_mean"])[0]),
        prior_scale_for_aux=(
            0.0 if is_binary
            else float(np.atleast_1d(pa["prior_scale"])[0])
        ),
        prior_df_for_aux=float(np.atleast_1d(pa["prior_df"])[0]),
        prior_mean_for_intercept=0.0,
        prior_scale_for_intercept=1.0,
        prior_df_for_intercept=1.0,
        shape_decov=np.broadcast_to(
            np.atleast_1d(decov.get("shape", 1.0)), (t,)).astype(np.float64),
        scale_decov=np.broadcast_to(
            np.atleast_1d(decov.get("scale", 1.0)), (t,)).astype(np.float64),
        regularization=regularization,
    )
    hyper["delta"] = decov_delta(cfg, concentration)
    if cov_prior == 1:
        lkj_scale = np.broadcast_to(
            np.atleast_1d(decov.get("scale", 10.0)), (t,)
        ).astype(np.float64).copy()
        if decov.get("autoscale", True) and not is_binary:
            lkj_scale = lkj_scale * _sd(y)
        hyper["lkj_scale"] = lkj_scale
        hyper["lkj_df"] = np.broadcast_to(
            np.atleast_1d(decov.get("df", 1.0)), (t,)).astype(np.float64)
    if ps["prior_dist"] == 8:
        hyper["R2_eta"] = priors_mod.make_eta(
            ps["R2_location"], ps["R2_what"], K
        )
        hyper["R2_s"] = _sd(y)

    z_structs = [(rt.lhs, rt.group_idx) for rt in mf.re_terms]
    model = ParametricModel(cfg, xtemp, z_structs, hyper,
                            weights=mf.weights, dtype=dtype)
    info = dict(R_inv=R_inv, x=xtemp,
                prior_summary=dict(coef=ps, aux=pa, covariance=decov))
    return model, stan_args, info
