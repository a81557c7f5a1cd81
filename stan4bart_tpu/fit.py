"""Top-level user API: ``stan4bart(formula, data, ...)``.

Python/JAX equivalent of the reference entry point
(/root/reference/R/stan4bart.R:1-253): validates arguments, builds model
frames, auto-detects the family ({0,1} response -> probit, else gaussian;
stan4bart.R:64-71), constructs the treatment counterfactual frame
(:457-478), computes parametric initializations (ridge/IRLS stand-ins for
the lmer -> lm -> intercept ladder, :130-200), assembles the samplers, runs
chains (vmapped; sharded over a device mesh when one is configured), and
packages draws into a :class:`~stan4bart_tpu.results.Stan4bartFit`.
"""

from __future__ import annotations

import math
import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from stan4bart_tpu.formula.design import ModelFrame, build_model_frame
from stan4bart_tpu.gibbs import OFFSET_TYPES, GibbsProgram
from stan4bart_tpu.models.assemble import StanArgs, build_parametric_model
from stan4bart_tpu.ops.bart import BartConfig
from stan4bart_tpu.ops.nuts import NutsConfig


def _detect_family(y: np.ndarray) -> str:
    vals = np.unique(y[~np.isnan(y)])
    if len(vals) <= 2 and np.all(np.isin(vals, (0.0, 1.0))):
        return "binomial"
    return "gaussian"


def _dense_Z(mf: ModelFrame) -> np.ndarray:
    """Dense (N, q) random-effects design in lme4 flat-b order."""
    from stan4bart_tpu.native import dense_z

    N = mf.N
    Z = np.zeros((N, mf.q))
    off = 0
    for t in mf.re_terms:
        dense_z(Z, np.asarray(t.group_idx, dtype=np.int32),
                np.ascontiguousarray(t.lhs, dtype=np.float64), off, t.p)
        off += t.p * t.l
    return Z


def _init_parametric_fit(mf: ModelFrame, family: str):
    """Stand-in for the reference's lmer/glmer -> lm/glm -> intercept-only
    init ladder (stan4bart.R:130-200): ridge least squares (gaussian) or a
    few probit IRLS steps (binomial) on [1, X, Z], returning
    (bart_offset_init, sigma_init)."""
    y = np.asarray(mf.y, dtype=np.float64)
    N = mf.N
    A = np.concatenate(
        [np.ones((N, 1)), np.asarray(mf.X), _dense_Z(mf)], axis=1
    )
    lam = 1e-2
    ridge = lam * np.eye(A.shape[1])
    ridge[0, 0] = 1e-8  # do not shrink the intercept
    try:
        if family == "gaussian":
            w = np.linalg.solve(A.T @ A + ridge, A.T @ y)
            fitted = A @ w
            resid = y - fitted
            dof = max(N - A.shape[1], 1)
            sigma = float(np.sqrt(resid @ resid / dof))
            return fitted, max(sigma, 1e-6)
        # probit IRLS
        from scipy.stats import norm

        w = np.zeros(A.shape[1])
        for _ in range(15):
            eta = np.clip(A @ w, -8, 8)
            p = np.clip(norm.cdf(eta), 1e-6, 1 - 1e-6)
            phi = norm.pdf(eta)
            wls = phi**2 / (p * (1 - p))
            z = eta + (y - p) / phi
            Aw = A * wls[:, None]
            w = np.linalg.solve(A.T @ Aw + ridge, Aw.T @ z)
        return np.clip(A @ w, -8, 8), 1.0
    except np.linalg.LinAlgError:
        if family == "gaussian":
            return np.full(N, y.mean()), max(float(np.std(y, ddof=1)), 1e-6)
        return np.zeros(N), 1.0


def _resolve_bart_args(bart_args: dict | None, is_binary: bool):
    """Map user bart_args (dbarts-style names) onto BartConfig
    (stan4bart_fit.R:434-479)."""
    ba = dict(bart_args or {})

    def pop(*names, default=None):
        for n in names:
            if n in ba:
                return ba.pop(n)
        return default

    n_trees = int(pop("n.trees", "n_trees", "ntree", default=75))
    power = float(pop("power", default=2.0))
    base = float(pop("base", default=0.95))
    n_cuts = int(pop("n.cuts", "n_cuts", default=100))
    max_depth = int(pop("max_depth", default=6))
    split_probs = pop("split.probs", "split_probs")
    k = pop("k")
    keep_trees = bool(pop("keepTrees", "keep_trees", default=False))
    # beyond-reference subtree-regrow tree kernel (ops/bart.
    # _subtree_regrow): probability of attempting one regrow MH step per
    # tree update; 0 = reference-parity move set.  XLA sweep path only —
    # a nonzero value disables the fused sweep kernel.
    p_regrow = float(pop("p_regrow", default=0.0))
    # cheap shape of the same kernel: N random single-tree regrow +
    # leaf-redraw updates appended per sweep (~1 tree-move cost each)
    regrow_per_sweep = int(pop("regrow_per_sweep", default=0))
    # fixed leaf-prior sd (disables the data-driven range scaling +
    # warmup decay) — makes the model a well-defined generative prior
    # for simulation-based calibration (BartConfig.sigma_mu_fixed)
    sigma_mu_fixed = pop("sigma_mu_fixed", default=None)
    if sigma_mu_fixed is not None:
        sigma_mu_fixed = float(sigma_mu_fixed)
    # None = auto: on when running on real TPU hardware and the model is
    # eligible (f32, max_depth <= 6); see stan4bart() below
    sweep_kernel = pop("sweep_kernel", default=None)
    if sweep_kernel is not None:
        sweep_kernel = bool(sweep_kernel)

    # k: numeric -> fixed; chi spec (dict or ("chi", df, scale)) -> sampled;
    # default = fixed k = 2 (see BartConfig.k_df note)
    k_init, k_df, k_scale = 2.0, 0.0, float("inf")
    if k is not None:
        if isinstance(k, (int, float)):
            k_init, k_df = float(k), 0.0
        elif isinstance(k, dict) and k.get("dist") == "chi":
            k_df, k_scale = float(k["df"]), float(k["scale"])
        elif isinstance(k, (tuple, list)) and k and k[0] == "chi":
            k_df, k_scale = float(k[1]), float(k[2])
        else:
            raise ValueError(f"cannot interpret bart k spec: {k!r}")

    if ba:
        warnings.warn(f"ignoring unsupported bart_args: {sorted(ba)}")

    cfg = BartConfig(
        num_trees=n_trees, max_depth=max_depth, n_cuts=n_cuts,
        power=power, base=base,
        node_scale=3.0 if is_binary else 0.5,
        k_init=k_init, k_df=k_df, k_scale=k_scale,
        p_regrow=p_regrow, regrow_per_sweep=regrow_per_sweep,
        sigma_mu_fixed=sigma_mu_fixed,
    )
    if p_regrow > 0:
        # the in-sweep per-tree form stays XLA-only (it is also the
        # measured-dead shape — BENCH_NOTES round 2); regrow_per_sweep
        # composes with the fused kernel as a post-sweep refresh pass
        # (gibbs.GibbsProgram._maybe_regrow)
        if sweep_kernel:
            warnings.warn(
                "p_regrow forces the XLA sweep path (the fused sweep "
                "kernel composes only with regrow_per_sweep)"
            )
        sweep_kernel = False
    return cfg, split_probs, keep_trees, sweep_kernel


def _print_initial_summary(mf, family, bart_cfg, warmup, iterations, chains,
                           skip_bart, skip_stan, stan_args, sigma_init):
    """The reference's printInitialSummary (init.cpp:971-993): dump the
    resolved control + model configuration before sampling."""
    print(
        f"stan4bart: {family} model, n = {mf.N}, "
        f"fixed effects K = {mf.K}, bart predictors = {mf.bart_X.shape[1]}, "
        f"ranef terms t = {len(mf.re_terms)} (q = {mf.q})"
    )
    print(
        f"  chains = {chains}, warmup = {warmup}, draws = {iterations}, "
        f"skip (bart, stan) = ({skip_bart}, {skip_stan})"
    )
    print(
        f"  bart: trees = {bart_cfg.num_trees}, power = {bart_cfg.power}, "
        f"base = {bart_cfg.base}, k = {bart_cfg.k_init}"
        f"{' (chi hyperprior)' if bart_cfg.k_df > 0 else ''}, "
        f"n.cuts = {bart_cfg.n_cuts}"
    )
    print(
        f"  stan: adapt_delta = {stan_args.adapt_delta}, "
        f"max_treedepth = {stan_args.max_treedepth}, "
        f"init_r = {stan_args.init_r}, sigma_init = {sigma_init:.4g}"
    )


def chi(df=1.25, scale=float("inf")):
    """k hyperprior spec, mirroring the reference's chi() quoting
    (stan4bart.R:202-210)."""
    return {"dist": "chi", "df": df, "scale": scale}


class CallbackDraw:
    """Named per-iteration view handed to user callbacks — parity with the
    reference's (yhat.train, yhat.test, stan named vector) environment
    (init.cpp:849-911; test-11-callback.R).

    Attributes: ``yhat_train`` (n,), ``yhat_test`` (n_test,) or None,
    ``stan_pars`` (full diagnostic+constrained row), ``names``; index by
    parameter name: ``draw["beta.1"]``.  ``raw`` is the underlying
    GibbsDraw.  All values are traced arrays (the callback runs inside the
    compiled scan)."""

    def __init__(self, draw, names, name_idx, has_test):
        self.raw = draw
        self.yhat_train = draw.bart_train
        self.yhat_test = draw.bart_test if has_test else None
        self.stan_pars = draw.stan
        self.names = names
        self._idx = name_idx

    def __getitem__(self, name):
        return self.raw.stan[self._idx[name]]


def _auto_chunk_size(n_obs: int, num_trees: int, chains: int,
                     skip_bart: int, budget_s: float = 20.0) -> int:
    """Iterations per device execution on time-capped backends.

    The axon TPU tunnel kills single device executions over ~60s; one
    fused scan over all iterations at production sizes exceeds that.
    Sized from a conservative per-iteration estimate so each execution
    stays well under the cap: the XLA sweep measures ~2e-9 s per
    (obs x tree x chain) on this chip class, and the fused Mosaic kernel
    is ~4x faster, so this undershoots the cap either way."""
    est_iter_s = (2e-9 * n_obs * num_trees * chains
                  * max(int(skip_bart), 1) + 1e-6)
    return int(np.clip(budget_s / est_iter_s, 1, 500))


def stan4bart(
    formula: str,
    data,
    *,
    test=None,
    treatment: str | None = None,
    family: str | None = None,
    subset=None,
    offset_test=None,
    iter: int = 2000,
    warmup: int | None = None,
    skip=None,
    chains: int = 4,
    cores: int | None = None,
    verbose: int = 0,
    seed: int | None = None,
    keep_fits: bool = True,
    callback=None,
    stan_args: dict | None = None,
    bart_args: dict | None = None,
    offset=None,
    weights=None,
    refresh: int | None = None,
    offset_type: str = "default",
    na_action: str = "omit",
    chunk_size: int | None = None,
    algorithm: str = "nuts",
    dtype=None,
    _progress=None,
):
    """Fit a semiparametric BART + multilevel model. Returns Stan4bartFit.

    Mirrors the reference formals (stan4bart.R:1-24; man/stan4bart.Rd):
    ``iter`` is the TOTAL per-chain iterations including ``warmup``
    (default iter/2); ``skip`` thins (int, or dict with 'bart'/'stan'
    entries); ``offset_type`` selects the component-substitution debugging
    semantics for a user ``offset``.

    ``algorithm`` selects the parametric-block sampler within Gibbs
    (the reference vendors stan/variational but only exposes NUTS;
    BASELINE.json names VI as a first-class backend):

    - ``"nuts"`` (default): full MCMC.  The only algorithm with exact
      posterior contracts; use for inference.
    - ``"advi"``: stan::variational's adagrad ADVI (meanfield, or
      fullrank via ``stan_args={"vi_family": "fullrank"}``) warm-started
      across Gibbs iterations.  Accuracy contract: point estimates
      (fixef, ranef means, the BART fit, SATE) track NUTS closely;
      posterior SPREAD is approximate — meanfield understates
      correlated-parameter variance, and the residual-sd posterior
      inherits the VI-within-Gibbs upward bias below.
    - ``"vi"``: EXPERIMENTAL streaming RMSProp VI tuned to track the
      moving conditional.  Accuracy contract: fastest exploratory fits;
      point estimates track NUTS, but the residual-sd (sigma) posterior
      is biased HIGH (~1.8x measured on Friedman n=250) because q lags
      the moving conditional — do not report sigma or interval widths
      from this algorithm.  A post-fit warning restates this.
    """
    from stan4bart_tpu.results import Stan4bartFit

    if offset_type not in OFFSET_TYPES:
        raise ValueError(f"offset_type must be one of {OFFSET_TYPES}")
    if algorithm not in ("nuts", "vi", "advi"):
        raise ValueError("algorithm must be 'nuts', 'vi', or 'advi'")
    # formal bounds (the reference validates these R-side,
    # stan4bart_fit.R:385-410, and native-side via rc_bounds)
    if not isinstance(iter, (int, np.integer)) or iter <= 0:
        raise ValueError("'iter' must be a positive integer")
    if warmup is not None and (warmup < 0 or int(warmup) != warmup):
        raise ValueError("'warmup' must be a non-negative integer")
    if chains <= 0:
        raise ValueError("'chains' must be a positive integer")
    if cores is not None and cores <= 0:
        raise ValueError("'cores' must be a positive integer")
    if skip is not None:
        flat = (list(skip.values()) if isinstance(skip, dict)
                else np.atleast_1d(skip).tolist())
        if any(s <= 0 for s in flat):
            raise ValueError("'skip' must be one or two positive integers")
    if warmup is None:
        warmup = iter // 2
    iterations = iter - warmup
    if iterations < 0:
        raise ValueError("'warmup' cannot exceed 'iter'")
    if skip is None:
        # the reference's derived default for the Stan thinning when unset:
        # skip = max(1, (2000 - warmup) / 1000) (init.cpp:206-209)
        skip_bart = 1
        skip_stan = max(1, (2000 - warmup) // 1000)
    elif isinstance(skip, dict):
        skip_bart = int(skip.get("bart", 1))
        skip_stan = int(skip.get("stan", 1))
    elif isinstance(skip, (tuple, list)):
        skip_bart = int(skip[0])
        skip_stan = int(skip[1] if len(skip) > 1 else skip[0])
    else:
        skip_bart = skip_stan = int(skip)

    if subset is not None:
        # row subsetting before any frame building (the reference's
        # 'subset' formal, stan4bart.R:4)
        subset = np.asarray(subset)
        if subset.dtype == bool:
            subset = np.flatnonzero(subset)
        data = {k: np.asarray(v)[subset] for k, v in (
            data.items() if isinstance(data, dict)
            else {c: data[c] for c in data.columns}.items()
        )}
        if weights is not None:
            weights = np.asarray(weights)[subset]
        if offset is not None:
            offset = np.asarray(offset)[subset]

    mf = build_model_frame(formula, data, weights=weights, offset=offset,
                           na_action=na_action)
    y = np.asarray(mf.y)
    if family is None:
        family = _detect_family(y)
    if family not in ("gaussian", "binomial"):
        raise ValueError("family must be gaussian or binomial "
                         "(stan4bart_fit.R:93-96)")
    is_binary = family == "binomial"

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    # treatment -> counterfactual test frame (stan4bart.R:93-102, 457-478)
    test_frame = None
    if treatment is not None:
        if test is not None:
            raise ValueError("cannot give both 'test' and 'treatment'")
        cols = {k: np.asarray(v).copy() for k, v in (
            data.items() if isinstance(data, dict)
            else {c: data[c] for c in data.columns}.items()
        )}
        z = np.asarray(cols[treatment], dtype=np.float64)
        if not np.all(np.isin(np.unique(z[~np.isnan(z)]), (0.0, 1.0))):
            raise ValueError("treatment variable must be binary/logical")
        flipped = 1.0 - z
        orig = cols[treatment]
        cols[treatment] = flipped.astype(orig.dtype) if orig.dtype.kind == "f" \
            else flipped
        test_frame = mf.build_test_frame(cols)
    elif test is not None:
        test_frame = mf.build_test_frame(test)
    if test_frame is not None and offset is not None:
        # carry the array-valued user offset= to the test frame so
        # ev/ppd on sample="test" (and the treatment counterfactual) stay
        # consistent with train (the reference's test-offset machinery,
        # stan4bart.R:104-120; testUsesRegularOffset,
        # stan4bart_fit.R:436-451).  offset_test below still REPLACES it.
        uo = np.asarray(offset, dtype=np.float64)
        if len(uo) == test_frame.n_original:
            extra = uo[np.asarray(test_frame.complete_rows)]
            test_frame.offset = (
                extra if test_frame.offset is None
                else test_frame.offset + extra
            )
        else:
            warnings.warn(
                "user 'offset' vector length does not match the test "
                "frame; the test predictions will omit it"
            )
    if test_frame is not None and offset_test is not None:
        # the reference's offset_test formal REPLACES the test offset
        # (stan4bart.R:108: result$test$offset <- offset_test)
        test_frame.offset = np.asarray(offset_test, dtype=np.float64)

    pm, resolved_stan_args, assemble_info = build_parametric_model(
        mf, family, stan_args, dtype=dtype
    )
    bart_cfg, split_probs, keep_trees_flag, sweep_kernel = (
        _resolve_bart_args(bart_args, is_binary)
    )
    # one predicate for "the batched shard_map driver can carry this
    # fit", shared by the sweep-kernel auto-default AND the dispatch
    # below (keeping them in lockstep): keep_fits=False installs a
    # store-nothing callback (cb below), which forces the per-chain
    # vmapped driver just like a user callback or pooled adaptation does
    sharded_batched_ok = (
        callback is None
        and keep_fits
        and not resolved_stan_args.pooled_adaptation
    )
    if sweep_kernel is None:
        # default the fused Pallas sweep ON where it is Mosaic-compiled
        # and eligible (the production headline path: 4.7x draws/s with
        # the chain-blocked batch driver); off-TPU the kernel would run
        # interpreted.  Multi-device / multi-host chain dispatch rides
        # shard_map (parallel.mesh.run_chains_batched_sharded /
        # multihost) — GSPMD cannot auto-partition a Pallas custom call,
        # so anything forcing the vmapped per-chain driver falls back to
        # the XLA scan sweep when the dispatch spans devices
        multi_device_dispatch = (
            jax.process_count() > 1
            or (cores is not None and cores > 1
                and len(jax.devices()) > 1)
        )
        # No n ceiling: chip measurement (benchmarks/large_n_chip.py,
        # BENCH_NOTES round 3) shows the lane-sliced kernel 3.1x the XLA
        # scan at n=50k (117.5 vs 367.8 ms/iter; the old 20k fallback was
        # a hidden 3x cliff), and past the single-pass kernel's 51840-obs
        # scoped-VMEM ceiling the batch driver switches to the obs-tiled
        # kernel (GibbsProgram.sweep_tiled) whose live VMEM is bounded at
        # any n.  S4B_SWEEP_KERNEL_MAX_N remains as an escape hatch.
        n_cap = os.environ.get("S4B_SWEEP_KERNEL_MAX_N")
        n_ok = n_cap is None or mf.bart_X.shape[0] <= int(n_cap)
        # weighted likelihoods ride the kernel too (round 4): the
        # sufficient statistics become (sum w, sum w r) in-kernel
        sweep_kernel = (
            jax.default_backend() in ("tpu", "axon")
            and jnp.dtype(dtype) == jnp.float32
            and bart_cfg.max_depth <= 6
            and n_ok
            and (not multi_device_dispatch or sharded_batched_ok)
            # the obs-sharded shard_map driver composes XLA one-hot
            # statistics with psums — one Pallas launch cannot host the
            # per-tree cross-shard all-reduces (GibbsProgram.local_view)
            and resolved_stan_args.obs_shards < 2
        )
    if isinstance(stan_args, dict) and stan_args.get("keep_trees"):
        keep_trees_flag = True

    nuts_cfg = NutsConfig(
        max_treedepth=resolved_stan_args.max_treedepth,
        delta=resolved_stan_args.adapt_delta,
        gamma=resolved_stan_args.adapt_gamma,
        kappa=resolved_stan_args.adapt_kappa,
        t0=resolved_stan_args.adapt_t0,
        stepsize_jitter=resolved_stan_args.stepsize_jitter,
        freeze_rule=resolved_stan_args.freeze_rule,
        pooled_axis=("chains" if resolved_stan_args.pooled_adaptation
                     else None),
        pooled_parts=resolved_stan_args.pooled_parts,
        pooled_between=resolved_stan_args.pooled_between,
    )

    bart_offset_init, sigma_init = _init_parametric_fit(mf, family)

    prog = GibbsProgram(
        pm, bart_cfg, y, mf.bart_X,
        split_probs=split_probs,
        bart_X_test=test_frame.bart_X if test_frame is not None else None,
        weights=mf.weights,
        user_offset=mf.offset,
        offset_type=offset_type,
        warmup=warmup, iterations=iterations,
        skip_stan=skip_stan, skip_bart=skip_bart,
        nuts_cfg=nuts_cfg,
        init_r=resolved_stan_args.init_r,
        adapt_init_buffer=resolved_stan_args.adapt_init_buffer,
        adapt_term_buffer=resolved_stan_args.adapt_term_buffer,
        adapt_base_window=resolved_stan_args.adapt_base_window,
        stepsize_init=resolved_stan_args.stepsize,
        sigma_gibbs=resolved_stan_args.sigma_gibbs,
        linear_gibbs=resolved_stan_args.linear_gibbs,
        level_gibbs=resolved_stan_args.level_gibbs,
        leaf_gibbs=resolved_stan_args.leaf_gibbs,
        leaf_block=resolved_stan_args.leaf_block,
        leaf_block_dim=resolved_stan_args.leaf_block_dim,
        # the obs-sharded driver REQUIRES the Gram-compressed likelihood
        # (NUTS gradients may not cross the observation psum — see
        # GibbsProgram.local_view), so obs_shards promotes the auto
        # default to on; an explicit gram_lik=False fails loudly there
        gram_lik=(True if (resolved_stan_args.obs_shards >= 2
                           and resolved_stan_args.gram_lik is None)
                  else resolved_stan_args.gram_lik),
        keep_trees=keep_trees_flag,
        parametric_method="vi" if algorithm in ("vi", "advi") else "nuts",
        vi_method="adagrad" if algorithm == "advi" else "rmsprop",
        vi_family=(resolved_stan_args.vi_family if algorithm == "advi"
                   else "meanfield"),
        vi_steps=resolved_stan_args.vi_steps,
        vi_mc=resolved_stan_args.vi_mc,
        vi_eta=resolved_stan_args.vi_eta,
        sweep_kernel=sweep_kernel,
        dtype=dtype,
    )

    if verbose >= 1:
        _print_initial_summary(mf, family, bart_cfg, warmup, iterations,
                               chains, skip_bart, skip_stan,
                               resolved_stan_args, sigma_init)

    if seed is None and resolved_stan_args.seed is not None:
        seed = resolved_stan_args.seed
    if seed is None:
        seed = np.random.SeedSequence().entropy % (2**31)
    keys = jax.random.split(jax.random.PRNGKey(int(seed)), chains)
    boi = jnp.asarray(bart_offset_init, dtype=dtype)

    # callback semantics (init.cpp:849-911; test-11-callback.R): the user
    # callback gets a NAMED view (yhat_train/yhat_test/stan by name); its
    # results are stored alongside raw draws, and with keep_fits=False ONLY
    # the callback results are stored.  keep_fits=False with no callback
    # stores nothing at all (the reference allocates no sample storage,
    # init.cpp:691-720) — only the final sampler states survive.
    stan_names_list = prog.stan_names()
    stan_name_idx = {n: i for i, n in enumerate(stan_names_list)}
    has_test = test_frame is not None

    def named(d):
        return CallbackDraw(d, stan_names_list, stan_name_idx, has_test)

    if callback is not None and keep_fits:
        cb = lambda d: {"draw": d, "callback": callback(named(d))}  # noqa: E731
    elif callback is not None:
        cb = lambda d: callback(named(d))  # noqa: E731
    elif not keep_fits:
        cb = lambda d: jnp.zeros((), dtype)  # noqa: E731 — store nothing
    else:
        cb = None

    # the reference's refresh formal defaults to iter/10
    # (stan4bart.R:18); progress prints at phase level for verbose > 0 and
    # per-refresh for verbose > 1 (init.cpp:746-754)
    if refresh is None:
        refresh = max(iter // 10, 1)
    # auto-chunking on time-capped devices (see _auto_chunk_size)
    if (chunk_size is None and jax.process_count() == 1
            and jax.default_backend() in ("tpu", "axon")):
        chunk_size = _auto_chunk_size(mf.N, bart_cfg.num_trees, chains,
                                      skip_bart)
    # per-refresh progress printing needs chunk boundaries at the refresh
    # cadence
    if verbose > 1 and chunk_size is None:
        chunk_size = max(int(refresh), 1)
    if chunk_size is not None and verbose > 1:
        chunk_size = min(chunk_size, max(int(refresh), 1))

    import time as _time

    run_info = None
    t_start = _time.perf_counter()
    if resolved_stan_args.obs_shards >= 2:
        # explicit 2-D chains x data shard_map: one obs shard per device,
        # every sufficient statistic a hand-placed psum over 'data' — the
        # multi-chip large-n path (the reference's only big-axis answer
        # is single-core CSR, continuous.hpp:1176-1197).  The mesh spans
        # the GLOBAL device set, so under multi-process (jax.distributed)
        # this same dispatch composes observation sharding with the
        # multi-host chain axis: obs-shard groups ride ICI within a
        # host, independent chain groups span DCN.
        from stan4bart_tpu.parallel.mesh import (
            chain_data_mesh,
            run_chains_obs_sharded,
        )
        from stan4bart_tpu.parallel.multihost import gather

        if cb is not None:
            raise ValueError(
                "obs_shards does not compose with callback / "
                "keep_fits=False (the shard_map program stores full "
                "draws); run those on the default driver"
            )
        n_data = int(resolved_stan_args.obs_shards)
        n_dev = len(jax.devices())
        if n_dev % n_data != 0:
            raise ValueError(
                f"obs_shards ({n_data}) must divide the global device "
                f"count ({n_dev})"
            )
        n_chain = max(n_dev // n_data, 1)
        while chains % n_chain != 0:  # chain mesh must divide the chains
            n_chain -= 1
        if jax.process_count() > 1:
            lcl = len(jax.local_devices())
            if n_data > lcl and lcl % n_data != 0 and n_data % lcl != 0:
                raise ValueError(
                    f"obs_shards ({n_data}) must nest with the per-host "
                    f"device count ({lcl}) so obs-shard groups do not "
                    f"straddle hosts unaligned"
                )
        final_states, draws, run_info = run_chains_obs_sharded(
            prog, keys, mesh=chain_data_mesh(n_chain, n_data),
            bart_offset_init=boi, sigma_init=sigma_init,
            keep_warmup=True, chunk_size=chunk_size,
        )
        if jax.process_count() > 1:
            # all-gather the sharded draw pytree to every host (the
            # final states stay sharded, like the multihost chain path)
            draws = gather(draws)
    elif jax.process_count() > 1:
        # multi-host SPMD: every process runs this same program; chains
        # shard over the global mesh (DCN across hosts), draws all-gather
        # back to every host (parallel.multihost; replaces the reference's
        # PSOCK cluster, stan4bart_fit.R:495-558)
        from stan4bart_tpu.parallel.multihost import run_chains_multihost

        phase_times = {}
        final_states, draws = run_chains_multihost(
            prog, np.asarray(keys), bart_offset_init=boi,
            sigma_init=sigma_init, keep_warmup=True, callback=cb,
            timings=phase_times,
        )
        run_info = dict(phase_times, interrupted=False,
                        warmup_done=warmup)
    elif cores is not None and cores > 1 and len(jax.devices()) > 1:
        # the reference's chain-over-cores parallelism mapped to a device
        # mesh (stan4bart_fit.R:495-558 -> parallel.mesh)
        from stan4bart_tpu.parallel.mesh import (
            chain_mesh,
            run_chains_batched_sharded,
            run_chains_sharded,
        )

        n_dev = min(int(cores), len(jax.devices()), chains)
        while chains % n_dev != 0:  # mesh size must divide the chain count
            n_dev -= 1
        phase_times = {}
        if prog.sweep_consts is not None and sharded_batched_ok:
            # fused Pallas sweep on every chip via shard_map
            final_states, draws = run_chains_batched_sharded(
                prog, keys, mesh=chain_mesh(n_dev),
                bart_offset_init=boi, sigma_init=sigma_init,
                keep_warmup=True, timings=phase_times,
            )
        else:
            final_states, draws = run_chains_sharded(
                prog, keys, mesh=chain_mesh(n_dev),
                bart_offset_init=boi, sigma_init=sigma_init,
                keep_warmup=True, callback=cb, timings=phase_times,
            )
        run_info = dict(phase_times, interrupted=False,
                        warmup_done=warmup)
    else:
        # default path: host-chunked execution (GibbsProgram.
        # run_chains_chunked dispatches to the chain-blocked fused-sweep
        # driver when eligible, the vmapped per-chain driver otherwise).
        # chunk_size=None runs each phase as ONE device execution — the
        # same compiled programs as a fused scan, but with real per-phase
        # wall clock, phase banners, and interruptibility for free.
        eff_chunk = (chunk_size if chunk_size is not None
                     else max(warmup, iterations, 1))
        final_states, draws, run_info = prog.run_chains_chunked(
            keys, eff_chunk, bart_offset_init=boi, sigma_init=sigma_init,
            keep_warmup=True, callback=cb, verbose=verbose,
            refresh=refresh, progress=_progress,
        )
    draws = jax.tree_util.tree_map(np.asarray, draws)
    total_time = _time.perf_counter() - t_start
    callback_draws = None
    if callback is not None and keep_fits:
        callback_draws = draws["callback"]
        draws = draws["draw"]
    elif callback is None and not keep_fits:
        draws = None  # nothing was stored (reference init.cpp:691-720)

    if run_info is not None:
        timings = dict(
            total=total_time,
            # REAL measured per-phase wall clock (the reference's
            # warm/sample_delta_t, interruptable_sampler.hpp:101-102)
            warmup=run_info["warmup_s"],
            sample=run_info["sample_s"],
        )
        if run_info["interrupted"]:
            timings["interrupted"] = True
            # a partial fit is still a valid fit: the warmup boundary is
            # however many warmup draws actually completed
            warmup = min(warmup, run_info["warmup_done"])
    else:  # pragma: no cover — every dispatch path now reports run_info
        timings = dict(
            total=total_time,
            warmup=total_time * warmup / max(iter, 1),
            sample=total_time * iterations / max(iter, 1),
        )

    fit = Stan4bartFit(
        mf=mf, pm=pm, prog=prog, family=family,
        draws=draws, warmup=warmup, chains=chains,
        stan_names=prog.stan_names(),
        test_frame=test_frame, treatment=treatment,
        final_states=final_states,
        R_inv=assemble_info.get("R_inv"),
        keep_fits=keep_fits,
        sigma_init=sigma_init,
        seed=int(seed),
        callback_draws=callback_draws,
        prior_info=assemble_info.get("prior_summary"),
        timings=timings,
    )
    if verbose >= 1:
        fit.prior_summary()
    if verbose >= 0:
        fit.check_sampler_diagnostics()
    if algorithm == "vi":
        warnings.warn(
            "algorithm='vi' is a streaming variational approximation: "
            "point estimates track NUTS but the residual-sd (sigma) "
            "posterior is biased high (~1.8x measured) — do not report "
            "sigma or interval widths from this fit; use "
            "algorithm='nuts' for inference",
            stacklevel=2,
        )
    return fit
