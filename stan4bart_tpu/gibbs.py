"""The coupled BART + NUTS Gibbs sampler as one compiled scan step.

TPU-native re-creation of the reference's native Gibbs coordinator
(/root/reference/src/init.cpp:678-965 ``stan4bart_run``): where the reference
alternates two foreign samplers through mutable offset buffers across four
process/library boundaries, here the whole iteration is a single pure
function ``(state) -> (state, draw)`` driven by ``lax.scan`` and vmapped over
chains.  Per iteration, matching init.cpp order exactly:

1. ``skip_stan`` NUTS transitions over the parametric posterior conditioned
   on the current BART fit as data offset (keeping the last draw;
   interruptable_sampler.hpp:185-203);
2. parametric mean -> BART offset, honoring the ``offset_type``
   default/fixef/ranef/bart/parametric substitution semantics
   (init.cpp:762-795) — the reference's component fault-injection facility;
3. sigma handoff, and the decaying warmup rescale schedule
   ``update_scale_mod = 1 << (8 iter / numIter)`` (init.cpp:813-818), which
   here updates the leaf-prior scale from range(y - offset) instead of
   dbarts' internal response rescale;
4. ``skip_bart`` BART sweeps (probit: truncated-normal latents first);
5. BART fit -> Stan offset; probit latents -> Stan response.

The draw layout mirrors the reference writer row: 7 NUTS diagnostics then
the constrained parameters (stan_sampler.cpp:476-489), plus bart train/test
fits, varcount, and k (bart_util.cpp:13-81).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from stan4bart_tpu.models.parametric import ParametricModel
from stan4bart_tpu.ops import bart as bart_ops
from stan4bart_tpu.ops.bart import BartConfig, BartState
from stan4bart_tpu.ops.nuts import (
    NutsConfig,
    NutsState,
    init_stepsize,
    make_adapt_schedule,
    nuts_init,
    nuts_transition,
)

OFFSET_DEFAULT, OFFSET_FIXEF, OFFSET_RANEF, OFFSET_BART, OFFSET_PARAMETRIC = (
    range(5)
)
OFFSET_TYPES = ("default", "fixef", "ranef", "bart", "parametric")


class ViState(NamedTuple):
    """Streaming variational state for the VI-within-Gibbs backends
    (mu, log-sd, optimizer second-moment accumulator, step count, and —
    fullrank only — the strict lower triangle of the covariance factor
    L = diag(exp(omega)) + strict_tril(L_off))."""

    mu: jnp.ndarray
    omega: jnp.ndarray
    acc: jnp.ndarray
    count: jnp.ndarray
    L_off: jnp.ndarray = jnp.zeros((0, 0))


class GibbsState(NamedTuple):
    nuts: NutsState
    bart: BartState
    bart_offset: jnp.ndarray   # (N,) parametric mean fed to BART
    stan_offset: jnp.ndarray   # (N,) BART fit fed to Stan
    latents: jnp.ndarray       # (N,) probit latent response (unused o.w.)
    rng: jax.Array
    vi: ViState = ViState(jnp.zeros(0), jnp.zeros(0), jnp.zeros(0),
                          jnp.zeros(()))


class GibbsDraw(NamedTuple):
    stan: jnp.ndarray          # (7 + n_constrained,)
    bart_train: jnp.ndarray    # (N,) pure f(x), no offset
    bart_test: jnp.ndarray     # (N_test,)
    varcount: jnp.ndarray      # (P_bart,) int32
    k: jnp.ndarray             # scalar
    # tree-state export per draw, populated when keep_trees=True (the
    # reference's keepTrees/exportBARTState machinery, init.cpp:409-446);
    # zero-size placeholders otherwise
    tree_feature: jnp.ndarray = jnp.zeros((0, 0), dtype=jnp.int32)
    tree_cut: jnp.ndarray = jnp.zeros((0, 0), dtype=jnp.int32)
    tree_leaf_value: jnp.ndarray = jnp.zeros((0, 0))


class GibbsProgram:
    """Builds the per-iteration compiled step for one model.

    Holds only static/iteration-constant data; all sampler state lives in
    GibbsState so the step is a pure function.
    """

    def __init__(
        self,
        pm: ParametricModel,
        bart_cfg: BartConfig,
        y: np.ndarray,
        bart_X: np.ndarray,
        split_probs: np.ndarray | None = None,
        bart_X_test: np.ndarray | None = None,
        weights: np.ndarray | None = None,
        user_offset: np.ndarray | None = None,
        offset_type: str = "default",
        warmup: int = 1000,
        iterations: int = 1000,   # post-warmup draws
        skip_stan: int = 1,
        skip_bart: int = 1,
        nuts_cfg: NutsConfig = NutsConfig(),
        init_r: float = 2.0,
        # Stan windowed-adaptation buffers + starting stepsize
        # (stan_sampler.cpp:427-455 defaults 75/50/25, stepsize=1)
        adapt_init_buffer: int = 75,
        adapt_term_buffer: int = 50,
        adapt_base_window: int = 25,
        stepsize_init: float = 1.0,
        # extra exact Gibbs update of sigma from its full conditional
        # (slice sampler) each iteration, BEFORE the NUTS transition.  A
        # valid additional Metropolis-within-Gibbs kernel: the posterior
        # is unchanged, but sigma decouples from NUTS's slow drift against
        # the Gibbs-moving conditional (round-1 measured ESS(sigma)/draw
        # ~ 0.01 — the declared min-ESS/s bottleneck).  Beyond-reference.
        sigma_gibbs: bool = False,
        # extra exact conjugate Gibbs refresh of the linear block
        # v = [gamma|beta|b] from its full conditional given
        # (offset, aux, theta_L) — closed-form MVN via the Gram matrix
        # (ParametricModel.linear_gibbs_refresh).  Valid
        # Metropolis-within-Gibbs composition; targets the beta <-> b
        # hierarchical ridge a diagonal-metric NUTS traverses slowly.
        # Requires all-normal/flat gamma/beta priors; either ranef
        # parameterization (non-centered write-back: z_b = T^{-1} b).
        # None = auto: ON together with level_gibbs when both eligible.
        linear_gibbs: bool | None = None,
        # extra exact Gibbs update along the additive-shift subspace
        # {per-tree leaf-level shifts c_t} x {per-ranef-term intercept
        # shifts a_i} (x gamma): the global response level is traded
        # between the BART ensemble's mean and the group-intercept means
        # — an (almost) likelihood-flat direction the offset exchange
        # random-walks at BART's slowest timescale (measured ESS(b
        # intercepts) ~ 2-4 per 4800 draws at n=2000).  The conditional
        # posterior restricted to this affine subspace is Gaussian in
        # (c, a), so one (T+m)-dimensional conjugate draw per iteration
        # re-mixes the direction exactly.  A directional-Gibbs kernel:
        # posterior invariant.  Works in either ranef parameterization
        # (non-centered write-back: z_b += a T^{-1} e_j0); requires the
        # default offset_type; no reference counterpart (interweaving is
        # impossible across its dbarts/Stan process boundary).
        # None = auto: ON together with linear_gibbs when both eligible.
        level_gibbs: bool | None = None,
        # ensemble-wide conjugate leaf-block refresh (beyond reference):
        # N exact conjugate draws per iteration along random rank-T
        # Walsh-direction subspaces of the JOINT leaf-value space.  Given
        # all tree structures the leaf values of all trees are jointly
        # Gaussian (f is linear in leaves); the full M-dim blocked draw is
        # too large per iteration, but an exact directional-Gibbs draw
        # along {shift tree t's leaves by c_t * d_t} with random signs
        # d_t[leaf] = Walsh(leaf_index, random mask) mixes the CROSS-TREE
        # directions the per-tree backfitting conditions away (dbarts'
        # per-node conjugate posterior, SURVEY.md section 2.4, applied
        # jointly).  MEASURED (BENCH_NOTES round 3): does NOT move the
        # lp/sigma ESS floor — the slow mode is ensemble-complexity /
        # structural relaxation, not leaf values — so this stays a
        # special-purpose opt-in.  Directions are computed
        # ELEMENTWISE from leaf_idx (bit-parity of node & mask: no
        # gathers), and the T x T Gram V V' of the +-1 direction columns
        # is exact at default MXU precision.  0 = off.
        leaf_gibbs: int = 0,
        # FULL ensemble-wide blocked leaf draw (beyond reference): every
        # ``leaf_block`` iterations redraw the leaf values of ALL trees
        # jointly from their exact Gaussian conditional given the
        # structures (f is linear in leaves; the membership one-hots give
        # the design).  Unlike the rank-T directional refresh above, this
        # re-mixes the COLLINEAR cross-tree directions (trees fitting
        # overlapping regions) where directional Gibbs mixes at ~1/kappa —
        # the natural completion of dbarts' per-node conjugate posterior
        # (SURVEY.md section 2.4) applied jointly.  MEASURED (BENCH_NOTES
        # round 3): exact and SBC-certified but NOT a perf win — lp stays
        # flat and the full-rank refresh slows confounded fixef
        # coordinates by re-randomizing f's X-span overlap every
        # application — so it ships OPT-IN, like regrow.  Active leaves are
        # compacted to a static ``leaf_block_dim``-dimensional system
        # (Gram via 0/1 one-hot matmuls: exact at integer counts < 2^24;
        # Cholesky on the MXU); when the ensemble's active-leaf count
        # exceeds the cap the draw is skipped for that iteration — a
        # state-dependent selection among posterior-invariant kernels
        # (the draw never changes structures, so the selector is constant
        # along its moves; invariance preserved).  0 = off; k = every k
        # iterations.
        leaf_block: int = 0,
        leaf_block_dim: int = 0,   # 0 = auto: ~8 leaves/tree, 128-padded
        keep_trees: bool = False,
        # "vi" = EXPERIMENTAL streaming meanfield VI-within-Gibbs: point
        # estimates (fixef, SATE) and the BART fit track NUTS closely but
        # the residual-sd posterior is biased high (~1.8x on Friedman
        # n=250) because q lags the moving conditional; use for fast
        # exploratory fits, NUTS for inference
        parametric_method: str = "nuts",   # "nuts" | "vi"
        # optimizer for the VI-within-Gibbs conditional: "rmsprop"
        # (streaming, slow-decay — tracks the moving conditional) or
        # "adagrad" (stan::variational's rule, advi.hpp semantics —
        # the public algorithm="advi" surface)
        vi_method: str = "rmsprop",
        # variational family: "meanfield" (diagonal) or "fullrank"
        # (dense lower-triangular factor; stan::variational parity)
        vi_family: str = "meanfield",
        vi_steps: int = 5,
        vi_mc: int = 4,
        vi_eta: float = 0.5,
        # fused whole-sweep Pallas kernel for the BART phase (one kernel
        # launch per sweep instead of a 75-step scan; see
        # ops/bart_sweep_kernel.py).  Requires float32, unweighted
        # likelihoods, max_depth <= 6.  Interpreted (slow, exact) off-TPU.
        sweep_kernel: bool = False,
        # Gram-compressed Gaussian likelihood in the NUTS hot loop: per
        # Gibbs iteration one O(N*D) anchored sufficient-statistic pass,
        # then every leapfrog is O(D^2) and independent of N
        # (ParametricModel.log_prob_gram).  Exact reformulation of the
        # same posterior.  None = auto (on when 0 < D <= S4B_GRAM_MAX_D).
        gram_lik: bool | None = None,
        dtype=jnp.float64,
    ):
        self.keep_trees = bool(keep_trees)
        if parametric_method not in ("nuts", "vi"):
            raise ValueError("parametric_method must be 'nuts' or 'vi'")
        self.parametric_method = parametric_method
        if vi_method not in ("rmsprop", "adagrad"):
            raise ValueError("vi_method must be 'rmsprop' or 'adagrad'")
        if vi_family not in ("meanfield", "fullrank"):
            raise ValueError("vi_family must be 'meanfield' or 'fullrank'")
        self.vi_method = vi_method
        self.vi_family = vi_family
        self.vi_steps = int(vi_steps)
        self.vi_mc = int(vi_mc)
        self.vi_eta = float(vi_eta)
        self.pm = pm
        self.bart_cfg = bart_cfg
        self.dtype = dtype
        self.is_binary = pm.cfg.is_binary
        self.N = len(y)
        self.y = jnp.asarray(y, dtype=dtype)
        # observation sharding (parallel/mesh.run_obs_sharded): on a
        # local view these change — obs_axis names the 'data' mesh axis,
        # self.N / self.y / self.ranks / self.weights hold the LOCAL
        # shard, N_global keeps the true count for global scalars, and
        # N_global_pad the padded total (= shards * local N)
        self.obs_axis = None
        self.N_global = self.N
        self.N_global_pad = self.N
        self.warmup = int(warmup)
        self.iterations = int(iterations)
        self.skip_stan = int(skip_stan)
        self.skip_bart = int(skip_bart)
        self.nuts_cfg = nuts_cfg
        self.init_r = float(init_r)

        self.cuts = bart_ops.make_cut_grid(np.asarray(bart_X),
                                           bart_cfg.n_cuts)
        self.ranks = jnp.asarray(
            bart_ops.compute_ranks(np.asarray(bart_X), self.cuts)
        )
        self.has_test = bart_X_test is not None
        if self.has_test:
            self.ranks_test = jnp.asarray(
                bart_ops.compute_ranks(np.asarray(bart_X_test), self.cuts)
            )
            self.n_test = bart_X_test.shape[0]
        else:
            self.ranks_test = jnp.zeros((1, bart_X.shape[1]),
                                        dtype=jnp.int32)
            self.n_test = 1

        P = bart_X.shape[1]
        self.split_probs = jnp.asarray(
            split_probs if split_probs is not None else np.full(P, 1.0 / P),
            dtype=dtype,
        )
        self.user_offset = (
            jnp.asarray(user_offset, dtype=dtype)
            if user_offset is not None else None
        )
        self.weights = (
            jnp.asarray(weights, dtype=dtype)
            if weights is not None and len(np.asarray(weights)) else None
        )
        self.offset_type = OFFSET_TYPES.index(offset_type)

        # Gram-compressed likelihood resolution (see gram_lik docstring)
        D = int(pm.cfg.has_intercept) + pm.cfg.K + pm.cfg.q
        if gram_lik is None:
            gram_lik = 0 < D <= int(os.environ.get("S4B_GRAM_MAX_D",
                                                   "1024"))
        self.use_gram = bool(gram_lik) and pm.enable_gram()

        self.sweep_consts = None
        self.sweep_interpret = False
        if sweep_kernel:
            if jnp.dtype(dtype) != jnp.float32:
                raise ValueError("sweep_kernel requires dtype=float32")
            if bart_cfg.p_regrow > 0:
                raise ValueError(
                    "sweep_kernel does not implement the in-sweep "
                    "p_regrow kernel — use the XLA sweep "
                    "(regrow_per_sweep composes with the kernel as a "
                    "post-sweep XLA refresh pass)"
                )
            from .ops.bart_sweep_kernel import make_sweep_consts

            self.sweep_consts = make_sweep_consts(
                bart_cfg, np.asarray(self.ranks),
                np.asarray(self.split_probs),
            )
            # Mosaic compile on TPU; exact interpreter elsewhere
            self.sweep_interpret = (
                jax.default_backend() not in ("tpu", "axon")
            )
            # obs-tiled kernel (batch driver) wherever the single-pass
            # body cannot run chain block 8 (npad > 82944/8 = 10368):
            # tiled + 5184-lane tiles measured 1.47x / 1.21x / 1.26x
            # the single-pass sliced kernel at n = 15k / 30k / 50k and
            # is the only compilable fused body past npad 51840
            # (BENCH_NOTES rounds 3-4)
            self.sweep_tiled = self.sweep_consts.npad > int(
                os.environ.get("S4B_SWEEP_TILED_MIN_NPAD", "10368"))
            # the per-chain (vmapped) step keeps the single-pass sliced
            # body up to its CB=1 scoped-VMEM ceiling, XLA above it
            self.sweep_single_ok = self.sweep_consts.npad <= 51840

        self.stepsize_init = float(stepsize_init)
        self.sigma_gibbs = bool(sigma_gibbs) and not self.is_binary

        # ---- interweaving-pair resolution (docs/interweaving.md) --------
        # eligibility of each kernel, computed up front
        max_d = int(os.environ.get("S4B_LINEAR_GIBBS_MAX_D", "512"))
        lg_elig = 0 < D <= max_d and pm.enable_linear_gibbs()
        terms = []
        if parametric_method == "nuts":
            # ranef terms with an all-ones (intercept) column — the
            # parametric compensators of the level-shift subspace
            for ti, ((lhs, gidx), pi) in enumerate(
                zip(pm.z_structs, pm.cfg.p)
            ):
                lhs_np = np.asarray(lhs)
                for j in range(pi):
                    if np.allclose(lhs_np[:, j], 1.0):
                        terms.append((ti, j))
                        break
        lvl_elig = (
            parametric_method == "nuts"
            and offset_type == "default"
            and bool(terms or pm.cfg.has_intercept)
        )
        # None = auto: the PAIR activates together when both are
        # eligible — measured: level_gibbs alone lets the unpinned
        # parametric ridge wander, linear_gibbs alone slows sigma/lp
        # through the b <-> aux coupling; only the pair is the
        # 10-500x ESS win (BENCH_NOTES round-2).  Explicit True/False
        # always honored (True warns when ineligible).
        if linear_gibbs is None and level_gibbs is None:
            lg_on = lvl_on = lg_elig and lvl_elig
        else:
            lg_on = bool(
                (linear_gibbs is True and lg_elig)
                or (linear_gibbs is None and lg_elig
                    and level_gibbs is True and lvl_elig)
            )
            lvl_on = bool(
                (level_gibbs is True and lvl_elig)
                or (level_gibbs is None and lvl_elig and lg_on)
            )
        if linear_gibbs is True and not lg_elig:
            import warnings

            warnings.warn(
                "linear_gibbs requested but the model is ineligible "
                "(needs normal/flat gamma+beta priors and "
                f"D <= {max_d}); running without it"
            )
        if level_gibbs is True and not lvl_elig:
            import warnings

            warnings.warn(
                "level_gibbs requested but the model is ineligible "
                "(needs a ranef intercept term or a model intercept, "
                "default offset_type, NUTS); running without it"
            )
        self.linear_gibbs = lg_on
        self.level_gibbs = lvl_on
        if lvl_on:
            self._level_terms = terms
        self.leaf_gibbs = int(leaf_gibbs)
        self.leaf_block = int(leaf_block)
        T_, M_ = bart_cfg.num_trees, bart_cfg.max_nodes
        if leaf_block_dim:
            self.leaf_block_dim = min(int(leaf_block_dim), T_ * M_)
        else:
            # auto: ~8 active leaves/tree of headroom (equilibrium under
            # the CGM prior is ~2-3), rounded up to the 128-lane tile
            self.leaf_block_dim = min(-(-8 * T_ // 128) * 128, T_ * M_)

        # NUTS windowed-adaptation schedule over warmup * skip_stan
        # transitions (interruptable_sampler.hpp:171)
        sched = make_adapt_schedule(
            self.warmup * self.skip_stan,
            init_buffer=int(adapt_init_buffer),
            term_buffer=int(adapt_term_buffer),
            base_window=int(adapt_base_window),
        )
        self.sched_adapt = jnp.asarray(sched["adapt_stepsize"])
        self.sched_collect = jnp.asarray(sched["collect"])
        self.sched_window_end = jnp.asarray(sched["window_end"])
        self.n_sched = len(sched["adapt_stepsize"])

        # warmup rescale schedule: update sigma_mu when
        # iter % (1 << (8 iter / warmup)) == 0 (init.cpp:813-818)
        it = np.arange(max(self.warmup, 1))
        mod = 1 << (8 * it // max(self.warmup, 1))
        self.rescale_sched = jnp.asarray((it % mod) == 0)

    # ------------------------------------------------------------------

    def _bart_offset_from_draw(self, c, tp):
        """Parametric mean with offset_type substitution (init.cpp:762-795)."""
        pm, ot, uo = self.pm, self.offset_type, self.user_offset
        if uo is None or ot == OFFSET_BART:
            return pm.parametric_mean(c, tp)
        if ot == OFFSET_DEFAULT:
            return pm.parametric_mean(c, tp) + uo
        if ot == OFFSET_RANEF:
            # user offset REPLACES the ranef component; keep fixef
            return pm.parametric_mean(c, tp, include_random=False) + uo
        if ot == OFFSET_FIXEF:
            return pm.parametric_mean(c, tp, include_fixed=False) + uo
        # OFFSET_PARAMETRIC: replaces the whole Stan mean
        return jnp.broadcast_to(uo, (self.N,))

    def _stan_offset_from_fit(self, bart_fit):
        """BART fit -> Stan offset with offset_type semantics
        (init.cpp:831-839)."""
        ot, uo = self.offset_type, self.user_offset
        if uo is None:
            return bart_fit
        if ot == OFFSET_BART:
            return jnp.broadcast_to(uo, (self.N,))
        if ot == OFFSET_DEFAULT:
            return bart_fit + uo
        return bart_fit

    def _sigma_mu(self, bart_offset, k):
        """Leaf-prior sd in original units (SURVEY.md 2.4: node.scale forced
        response scale)."""
        cfg = self.bart_cfg
        if cfg.sigma_mu_fixed is not None:
            return jnp.asarray(cfg.sigma_mu_fixed, self.dtype)
        if self.is_binary:
            rng_scale = 1.0
        else:
            resp = self.y - bart_offset
            if self.obs_axis is not None:
                rng_scale = (jax.lax.pmax(jnp.max(resp), self.obs_axis)
                             - jax.lax.pmin(jnp.min(resp), self.obs_axis))
            else:
                rng_scale = jnp.max(resp) - jnp.min(resp)
        # NOTE: np.sqrt returns a float64 scalar — without the cast the
        # result silently promotes downstream state to f64 under x64
        return jnp.asarray(
            cfg.node_scale * rng_scale / (k * np.sqrt(cfg.num_trees)),
            self.dtype,
        )

    # ------------------------------------------------------------------

    def _probit_latent_u(self, rng):
        """Per-obs uniforms for the truncated-normal latent draw.  The
        obs-sharded view draws the GLOBAL(-padded) stream and slices its
        local shard so every observation sees the same variate at any
        shard count (see sample_probit_latents); unsharded returns None
        (the sampler draws internally, unchanged numerics)."""
        if self.obs_axis is None:
            return None
        u = jax.random.uniform(rng, (self.N_global_pad,), dtype=self.dtype,
                               minval=1e-7, maxval=1.0 - 1e-7)
        start = jax.lax.axis_index(self.obs_axis) * self.N
        return jax.lax.dynamic_slice_in_dim(u, start, self.N)

    def init_state(self, rng, bart_offset_init=None, sigma_init=1.0
                   ) -> GibbsState:
        """Mirror createSampler's wiring (init.cpp:190-310): seed offsets
        from the parametric pre-fit, one BART sweep to initialize the Stan
        offset, probit latents seeded from that sweep."""
        pm, cfg = self.pm, self.bart_cfg
        rng, rng_q, rng_b, rng_l, rng_b2 = jax.random.split(rng, 5)

        q0 = jax.random.uniform(
            rng_q, (pm.num_upars,), dtype=self.dtype,
            minval=-self.init_r, maxval=self.init_r,
        )
        bart_offset = (
            jnp.asarray(bart_offset_init, dtype=self.dtype)
            if bart_offset_init is not None
            else jnp.zeros(self.N, dtype=self.dtype)
        )
        # draw tree structures from the CGM prior then run one sweep —
        # the reference's init order (init.cpp:261-285)
        bart_state = bart_ops.sample_trees_from_prior(
            cfg, rng_b, self.ranks, self.split_probs, dtype=self.dtype
        )
        bart_state = bart_state._replace(
            sigma_mu=self._sigma_mu(bart_offset, bart_state.k)
        )

        if self.is_binary:
            latents = bart_ops.sample_probit_latents(
                bart_state.allfit + bart_offset, self.y, rng_l, self.dtype,
                u=self._probit_latent_u(rng_l),
            )
            y_target = latents - bart_offset
            sigma = jnp.asarray(1.0, self.dtype)
        else:
            latents = jnp.zeros(self.N, dtype=self.dtype)
            y_target = self.y - bart_offset
            sigma = jnp.asarray(sigma_init, self.dtype)

        bart_state, _ = bart_ops.bart_sweep(
            cfg, bart_state, y_target, self.ranks, self.split_probs,
            sigma, rng_b2, weights=self.weights, axis_name=self.obs_axis,
        )
        stan_offset = self._stan_offset_from_fit(bart_state.allfit)

        nuts = nuts_init(None, q0, stepsize=self.stepsize_init)
        # jnp (not host numpy): y may be a traced argument when whole
        # fits are jitted over simulated responses (benchmarks/sbc.py).
        # The obs-sharded local view carries precomputed global values
        # (sd over a local shard would be wrong, and initial_inv_mass is
        # host numpy over the global X).
        if self.obs_axis is not None:
            scale_y = self._scale_y_global
            inv_mass0 = self._inv_mass0_global
        else:
            scale_y = (1.0 if self.is_binary
                       else jnp.std(self.y, ddof=1))
            inv_mass0 = pm.initial_inv_mass(scale_y, self.N)
        nuts = nuts._replace(inv_mass=jnp.asarray(
            inv_mass0, dtype=self.dtype
        ))
        # stepsize search against the initial conditional posterior
        y_stan = latents if self.is_binary else self.y
        if self.obs_axis is not None:
            # gradients may not cross the manual psum (see
            # ParametricModel.log_prob) — anchor the Gram form at q0 so
            # the stepsize-search leapfrogs stay communication-free
            anchor0 = pm.gram_anchor(q0, stan_offset, y_stan)
            logp = lambda u: pm.log_prob_gram(u, anchor0)  # noqa: E731
        else:
            logp = lambda u: pm.log_prob(u, stan_offset, y_stan)  # noqa: E731,E501
        eps = init_stepsize(logp, q0, nuts.inv_mass, self.stepsize_init,
                            jax.random.fold_in(rng, 3))
        nuts = nuts._replace(da=nuts.da._replace(
            log_eps=jnp.log(eps), mu=jnp.log(10.0 * eps)))

        if self.parametric_method == "vi":
            P_u = pm.num_upars
            fullrank = self.vi_family == "fullrank"
            n_vparams = 2 * P_u + (P_u * P_u if fullrank else 0)
            vi = ViState(
                mu=q0,
                omega=0.5 * jnp.log(jnp.asarray(
                    pm.initial_inv_mass(scale_y, self.N), dtype=self.dtype
                )),
                acc=jnp.zeros(n_vparams, dtype=self.dtype),
                count=jnp.zeros((), dtype=self.dtype),
                L_off=jnp.zeros((P_u if fullrank else 0,) * 2, self.dtype),
            )
        else:
            vi = ViState(jnp.zeros(0, self.dtype), jnp.zeros(0, self.dtype),
                         jnp.zeros(0, self.dtype),
                         jnp.zeros((), self.dtype))
        return GibbsState(
            nuts=nuts, bart=bart_state, bart_offset=bart_offset,
            stan_offset=stan_offset, latents=latents, rng=rng, vi=vi,
        )

    # ------------------------------------------------------------------

    def _sigma_gibbs_update(self, q, stan_offset, y_stan, rng):
        """Exact slice-sampling update of the aux (sigma) coordinate from
        its full conditional.  The conditional is evaluated through the
        FULL model log-density as a function of the single unconstrained
        aux coordinate — mandatory because the decov parameterization
        folds sigma into theta_L, so b (and hence eta) moves with sigma in
        the non-centered model; a residual-only conditional is wrong
        there.  Returns the updated unconstrained vector."""
        pm = self.pm
        off, size, _ = pm.layout.slices["aux_unscaled"]

        def logpost(x):
            # x = unconstrained aux coordinate; log_prob includes the
            # positivity-transform Jacobian, so slicing in x is exact
            return pm.log_prob(q.at[off].set(x), stan_offset, y_stan)

        # Neal (2003) slice sampling: stepping-out + shrinkage
        x0 = q[off]
        r_h, r_u, r_shrink = jax.random.split(rng, 3)
        log_y = logpost(x0) + jnp.log(
            jax.random.uniform(r_h, (), self.dtype)
        )
        w = jnp.asarray(0.5, self.dtype)
        u0 = jax.random.uniform(r_u, (), self.dtype)
        L0, R0 = x0 - w * u0, x0 + w * (1.0 - u0)

        def expand(carry):
            L, R, i = carry
            L = jnp.where(logpost(L) > log_y, L - w, L)
            R = jnp.where(logpost(R) > log_y, R + w, R)
            return L, R, i + 1

        def expand_cond(carry):
            L, R, i = carry
            return ((logpost(L) > log_y) | (logpost(R) > log_y)) & (i < 16)

        L, R, _ = jax.lax.while_loop(expand_cond, expand, (L0, R0, 0))

        def shrink(carry):
            L, R, x, done, j = carry
            u = jax.random.uniform(
                jax.random.fold_in(r_shrink, j), (), self.dtype
            )
            x_prop = L + u * (R - L)
            ok = logpost(x_prop) > log_y
            x = jnp.where(~done & ok, x_prop, x)
            done_new = done | ok
            L = jnp.where(~done & ~ok & (x_prop < x0), x_prop, L)
            R = jnp.where(~done & ~ok & (x_prop >= x0), x_prop, R)
            return L, R, x, done_new, j + 1

        def shrink_cond(carry):
            _, _, _, done, j = carry
            return ~done & (j < 32)

        _, _, x_new, done, _ = jax.lax.while_loop(
            shrink_cond, shrink, (L, R, x0, jnp.asarray(False), 0)
        )
        x_new = jnp.where(done, x_new, x0)
        return q.at[off].set(x_new)

    @staticmethod
    def _walsh_signs(x, mask, dtype):
        """d = +-1 from the bit-parity of ``popcount(x & mask)`` — the
        Walsh-Hadamard sign pattern indexed by ``mask``, computed
        ELEMENTWISE (no table lookups / gathers; pure VPU int ops)."""
        v = x & mask
        v = v ^ (v >> 16)
        v = v ^ (v >> 8)
        v = v ^ (v >> 4)
        v = v ^ (v >> 2)
        v = v ^ (v >> 1)
        return (1 - 2 * (v & 1)).astype(dtype)

    def _leaf_gibbs_update(self, bart_state, bart_offset, latents, sigma,
                           rng, masks=None):
        """One exact conjugate draw of per-tree leaf shifts along random
        Walsh directions:

            leaf_value[t, leaf] += c_t * d_t[leaf],
            d_t[node] = Walsh(node, m_t),  m_t ~ U{1..2^ceil(log2 M) - 1}

        Restricted to this rank-T affine subspace the conditional over
        c = (c_1..c_T) is Gaussian: likelihood precision V V'/sigma^2 with
        V[t] = d_t[leaf_idx[t]] (a +-1 matrix, so the Gram is exact at
        default MXU precision), leaf-prior precision diag(L_t)/sigma_mu^2
        (|d|^2 = leaf count) with linear term -d'mu_t/sigma_mu^2.  The
        direction masks depend only on (structures, rng) — a valid
        random-scan directional-Gibbs kernel; posterior invariant.  The
        per-tree backfitting inside the sweep already refreshes each
        tree's leaves exactly given the others; this draw moves the
        cross-tree correlated directions it cannot."""
        cfg = self.bart_cfg
        hi = jax.lax.Precision.HIGHEST
        dtype = self.dtype
        T, M = cfg.num_trees, cfg.max_nodes
        y_stan = latents if self.is_binary else self.y
        r = y_stan - bart_state.allfit - bart_offset
        inv_s2 = 1.0 / (sigma * sigma)
        inv_smu2 = 1.0 / (bart_state.sigma_mu * bart_state.sigma_mu)

        rng_m, rng_z = jax.random.split(rng)
        nbits = max(int(M).bit_length(), 1)
        # masks: optional fixed direction masks (exactness tests condition
        # the draw distribution on a fixed subspace)
        m = (jnp.asarray(masks, dtype=jnp.int32) if masks is not None
             else jax.random.randint(rng_m, (T,), 1, 2**nbits,
                                     dtype=jnp.int32))
        node_ids = jnp.arange(M, dtype=jnp.int32)
        leaf_mask = (bart_state.feature == bart_ops.LEAF)
        d_leaf = jnp.where(
            leaf_mask, self._walsh_signs(node_ids[None, :], m[:, None],
                                         dtype), 0.0)
        V = self._walsh_signs(bart_state.leaf_idx, m[:, None], dtype)

        if self.weights is not None:
            G = jnp.dot(V * self.weights[None, :], V.T, precision=hi)
            h_lik = jnp.dot(V, self.weights * r, precision=hi) * inv_s2
        else:
            # +-1 entries are exact in bf16 and the f32-accumulated
            # integer sums stay < 2^24 — default precision is EXACT here
            G = jnp.dot(V, V.T)
            h_lik = jnp.dot(V, r, precision=hi) * inv_s2
        G, h_lik = self.pm._psum((G, h_lik))
        L_t = jnp.sum(leaf_mask, axis=1).astype(dtype)
        h = h_lik - jnp.sum(d_leaf * bart_state.leaf_value,
                            axis=1) * inv_smu2
        P = G * inv_s2 + jnp.diag(L_t * inv_smu2)
        Lm = jnp.linalg.cholesky(P)
        mean = jax.scipy.linalg.cho_solve((Lm, True), h)
        z = jax.random.normal(rng_z, (T,), dtype)
        c = mean + jax.scipy.linalg.solve_triangular(Lm.T, z, lower=False)

        return bart_state._replace(
            leaf_value=bart_state.leaf_value + c[:, None] * d_leaf,
            tree_fit=bart_state.tree_fit + c[:, None] * V,
            allfit=bart_state.allfit + jnp.dot(c, V, precision=hi),
        )

    def _leaf_block_update(self, bart_state, bart_offset, latents, sigma,
                           rng):
        """Full blocked draw of ALL trees' leaf values from their joint
        Gaussian conditional given the structures (see the ``leaf_block``
        constructor docstring).

        With W the (N, D) compacted leaf-membership matrix (row n has a 1
        in each tree's occupied leaf column), the conditional is

            mu ~ N(P^{-1} h, P^{-1}),
            P = W' diag(w) W / sigma^2 + I / sigma_mu^2,
            h = W' (w * r) / sigma^2,   r = y_stan - bart_offset.

        Active (t, leaf) slots are ranked into [0, D) by per-tree cumsum;
        the 0/1 Gram is exact at default MXU precision (co-membership
        counts < 2^24).  If the active-leaf count exceeds D the update is
        skipped (state-dependent selection among invariant kernels; the
        selector depends only on structures, which the draw never moves).
        """
        cfg = self.bart_cfg
        hi = jax.lax.Precision.HIGHEST
        dtype = self.dtype
        T, M, D = cfg.num_trees, cfg.max_nodes, self.leaf_block_dim
        y_stan = latents if self.is_binary else self.y
        r = y_stan - bart_offset
        inv_s2 = 1.0 / (sigma * sigma)
        inv_smu2 = 1.0 / (bart_state.sigma_mu * bart_state.sigma_mu)

        leaf_mask = bart_state.feature == bart_ops.LEAF          # (T, M)
        L_t = jnp.sum(leaf_mask, axis=1)
        base_t = jnp.cumsum(L_t) - L_t                           # (T,)
        within = jnp.cumsum(leaf_mask, axis=1) - 1
        compact = jnp.where(leaf_mask, base_t[:, None] + within, D)
        n_active = jnp.sum(L_t)
        ok = n_active <= D

        # per-obs compact ids, one per tree (leaf_idx always lands in a
        # LEAF slot, so every entry is a real leaf rank)
        comp = jnp.take_along_axis(compact, bart_state.leaf_idx, axis=1)

        # W built tree-at-a-time (a (T, N, D) broadcast would materialize
        # ~GBs across a chain batch); out-of-cap ids fall off the compare
        ids = jnp.arange(D, dtype=comp.dtype)

        def acc_w(t, W):
            return W + (comp[t][:, None] == ids[None, :]).astype(dtype)

        W = jax.lax.fori_loop(0, T, acc_w,
                              jnp.zeros((self.N, D), dtype))
        if self.weights is not None:
            G = jnp.dot(W.T * self.weights[None, :], W, precision=hi)
            h = jnp.dot(W.T, self.weights * r, precision=hi) * inv_s2
        else:
            G = jnp.dot(W.T, W)   # 0/1 entries: exact at default precision
            h = jnp.dot(W.T, r, precision=hi) * inv_s2
        G, h = self.pm._psum((G, h))
        P = G * inv_s2 + inv_smu2 * jnp.eye(D, dtype=dtype)
        Lm = jnp.linalg.cholesky(P)
        mean = jax.scipy.linalg.cho_solve((Lm, True), h)
        z = jax.random.normal(rng, (D,), dtype)
        mu = mean + jax.scipy.linalg.solve_triangular(Lm.T, z, lower=False)

        mu_pad = jnp.concatenate([mu, jnp.zeros((1,), dtype)])
        leaf_value = jnp.where(ok & leaf_mask,
                               mu_pad[jnp.minimum(compact, D)],
                               bart_state.leaf_value)
        tree_fit = jnp.where(ok, mu_pad[jnp.minimum(comp, D)],
                             bart_state.tree_fit)
        allfit = jnp.where(ok, jnp.sum(tree_fit, axis=0),
                           bart_state.allfit)
        return bart_state._replace(leaf_value=leaf_value,
                                   tree_fit=tree_fit, allfit=allfit)

    def _level_gibbs_update(self, nuts, bart_state, bart_offset, latents,
                            rng):
        """One conjugate draw of the additive-shift coordinates
        s = (c_1..c_T [, a_i per intercept ranef term] [, g]):

            leaf_value[t, leaves] += c_t   (=> f += sum c_t)
            b[term i, all levels, intercept col] += a_i
            gamma += g

        The restricted conditional is Gaussian: the likelihood sees only
        the total shift delta = sum(s) (precision sum(w)/sigma^2 rank-one
        block), the leaf prior N(0, sigma_mu^2) gives diag L_t/sigma_mu^2
        with linear term -S_t/sigma_mu^2, and the centered b prior gives
        diag l_i * Prec_i[j0,j0] with linear term -sum_lev (Prec_i
        b_lev)[j0].  Exact directional Gibbs; posterior invariant."""
        pm, cfg = self.pm, self.bart_cfg
        hi = jax.lax.Precision.HIGHEST
        y_stan = latents if self.is_binary else self.y
        c, _ = pm.layout.constrain(nuts.q)
        tp = pm.transformed(c)
        sigma = (jnp.asarray(1.0, self.dtype) if self.is_binary
                 else tp["aux"])
        inv_s2 = 1.0 / (sigma * sigma)

        r = y_stan - bart_state.allfit - bart_offset
        if self.weights is not None:
            sw = self.pm._psum(jnp.sum(self.weights))
            swr = self.pm._psum(jnp.dot(self.weights, r, precision=hi))
        else:
            sw = jnp.asarray(float(self.N_global), self.dtype)
            swr = self.pm._psum(jnp.sum(r))

        leaf_mask = (bart_state.feature == bart_ops.LEAF).astype(self.dtype)
        L_t = jnp.sum(leaf_mask, axis=1)                       # (T,)
        S_t = jnp.sum(bart_state.leaf_value * leaf_mask, axis=1)
        inv_smu2 = 1.0 / (bart_state.sigma_mu * bart_state.sigma_mu)
        diag = [L_t * inv_smu2]
        lin = [-S_t * inv_smu2]

        th = tp["theta_L"]
        b = tp["b"]
        # theta_L vech offsets per term (static)
        th_offs = []
        off = 0
        for nc in pm.cfg.p:
            th_offs.append(off)
            off += nc + (nc * (nc - 1)) // 2
        # per-term T^{-1} (scalar for nc == 1), for the non-centered
        # write-back z_b += a * T^{-1} e_j0 (the prior quadratic in the
        # shift is IDENTICAL in either parameterization: |T^{-1} e_j0|^2
        # = Prec[j0, j0])
        term_tinv = {}
        for ti, j0 in self._level_terms:
            nc, li = pm.cfg.p[ti], pm.cfg.l[ti]
            tm = th_offs[ti]
            if nc == 1:
                prec_jj = 1.0 / (th[tm] * th[tm])
                term_tinv[ti] = 1.0 / th[tm]
                b_seg = b[pm.b_offsets[ti] : pm.b_offsets[ti] + li]
                diag.append((li * prec_jj)[None])
                lin.append((-(prec_jj * jnp.sum(b_seg)))[None])
            else:
                rows, cols_, vals = [], [], []
                for ci in range(nc):
                    for ri in range(ci, nc):
                        rows.append(ri)
                        cols_.append(ci)
                        vals.append(th[tm])
                        tm += 1
                T = jnp.zeros((nc, nc), dtype=self.dtype)
                T = T.at[np.array(rows), np.array(cols_)].set(
                    jnp.stack(vals)
                )
                Tinv = jax.scipy.linalg.solve_triangular(
                    T, jnp.eye(nc, dtype=self.dtype), lower=True
                )
                term_tinv[ti] = Tinv
                prec = jnp.dot(Tinv.T, Tinv, precision=hi)
                b_mat = b[pm.b_offsets[ti] : pm.b_offsets[ti] + nc * li
                          ].reshape(li, nc)
                diag.append((li * prec[j0, j0])[None])
                lin.append(
                    (-jnp.sum(jnp.dot(b_mat, prec[j0], precision=hi)))[None]
                )
        include_gamma = (
            pm.cfg.has_intercept
            and pm.cfg.prior_dist_for_intercept in (0, 1)
        )
        if include_gamma:
            if pm.cfg.prior_dist_for_intercept == 1:
                s_g = pm.hyper["prior_scale_for_intercept"]
                m_g = pm.hyper["prior_mean_for_intercept"]
                pg = 1.0 / (s_g * s_g)
            else:
                pg = jnp.asarray(0.0, self.dtype)
                m_g = jnp.asarray(0.0, self.dtype)
            diag.append(pg[None] if hasattr(pg, "shape") else
                        jnp.asarray([pg], self.dtype))
            lin.append((-(pg * (c["gamma"][0] - m_g)))[None])

        d = jnp.concatenate([jnp.atleast_1d(x) for x in diag])
        h = jnp.concatenate([jnp.atleast_1d(x) for x in lin])
        h = h + swr * inv_s2
        dim = d.shape[0]
        M = sw * inv_s2 * jnp.ones((dim, dim), dtype=self.dtype) \
            + jnp.diag(d)
        Lm = jnp.linalg.cholesky(M)
        mean = jax.scipy.linalg.cho_solve((Lm, True), h)
        z = jax.random.normal(rng, (dim,), dtype=self.dtype)
        s = mean + jax.scipy.linalg.solve_triangular(Lm.T, z, lower=False)

        # apply: trees
        T_trees = cfg.num_trees
        c_t = s[:T_trees]
        bart_state = bart_state._replace(
            leaf_value=bart_state.leaf_value + c_t[:, None] * leaf_mask,
            tree_fit=bart_state.tree_fit + c_t[:, None],
            allfit=bart_state.allfit + jnp.sum(c_t),
        )
        # apply: ranef intercepts + gamma into the unconstrained vector
        q = nuts.q
        pos = T_trees
        if pm.cfg.q > 0:
            b_off0 = pm.layout.slices[
                "b_raw" if pm.cfg.centered else "z_b"][0]
        else:
            b_off0 = 0
        for ti, j0 in self._level_terms:
            nc, li = pm.cfg.p[ti], pm.cfg.l[ti]
            if pm.cfg.centered:
                idx = b_off0 + pm.b_offsets[ti] + np.arange(li) * nc + j0
                q = q.at[idx].add(s[pos])
            elif nc == 1:
                idx = b_off0 + pm.b_offsets[ti] + np.arange(li)
                q = q.at[idx].add(s[pos] * term_tinv[ti])
            else:
                # z_lev += a * T^{-1} e_j0 for every level
                w = term_tinv[ti][:, j0]
                idx = (b_off0 + pm.b_offsets[ti]
                       + np.arange(li * nc))
                q = q.at[idx].add(jnp.tile(w, li) * s[pos])
            pos += 1
        if include_gamma:
            q = q.at[pm.layout.slices["gamma"][0]].add(s[pos])
        return nuts._replace(q=q), bart_state

    def _pre_sweep(self, state: GibbsState, it, is_warmup: bool):
        """Everything before the BART sweep(s): NUTS/VI transition(s),
        optional sigma-Gibbs, parametric mean -> BART offset, warmup
        leaf-scale rescale.  Split out so ``step_batched`` can run it
        under vmap and hand ALL chains to one chain-blocked sweep
        kernel; ``step`` recomposes the identical per-chain sequence."""
        pm = self.pm
        rng, rng_stan, rng_bart, rng_lat = jax.random.split(state.rng, 4)

        # ---- (1) Stan/NUTS transitions on the current conditional ------
        y_stan = state.latents if self.is_binary else self.y
        stan_offset = state.stan_offset

        if self.use_gram:
            # anchored sufficient statistics: one O(N*D) pass here, then
            # every leapfrog in the transition(s) below is O(D^2)
            anchor = pm.gram_anchor(state.nuts.q, stan_offset, y_stan)

            def logp(u):
                return pm.log_prob_gram(u, anchor)
        else:
            def logp(u):
                return pm.log_prob(u, stan_offset, y_stan)

        vi = state.vi
        if self.parametric_method == "vi":
            nuts, info, vi = self._vi_update(state, logp, rng_stan)
        else:
            def one_transition(j, nuts):
                tr_idx = jnp.minimum(
                    it * self.skip_stan + j, self.n_sched - 1
                )
                if is_warmup:
                    flags = (self.sched_adapt[tr_idx],
                             self.sched_collect[tr_idx],
                             self.sched_window_end[tr_idx])
                else:
                    f = jnp.asarray(False)
                    flags = (f, f, f)
                return nuts_transition(
                    logp, nuts, jax.random.fold_in(rng_stan, j),
                    self.nuts_cfg, *flags,
                )

            nuts = state.nuts
            if self.skip_stan > 1:
                # thin internally, keeping the last transition
                # (interruptable_sampler.hpp:185-203)
                nuts = jax.lax.fori_loop(
                    0, self.skip_stan - 1,
                    lambda j, s: one_transition(j, s)[0], nuts,
                )
            nuts, info = one_transition(self.skip_stan - 1, nuts)

        # ---- (1b, optional) exact sigma conditional update --------------
        # its own Metropolis-within-Gibbs kernel after the parametric draw:
        # posterior unchanged; in VI mode it REPLACES the variational sigma
        # (which lags the moving conditional ~1.8x high) with an exact
        # conditional draw
        if self.sigma_gibbs:
            q_sg = self._sigma_gibbs_update(
                nuts.q, stan_offset, y_stan,
                jax.random.fold_in(rng, 0x516),
            )
            nuts = nuts._replace(q=q_sg)

        # ---- (1c, optional) exact conjugate linear-block refresh --------
        # one closed-form MVN draw of v = [gamma|beta|b] from its full
        # conditional (ParametricModel.linear_gibbs_refresh); lp telemetry
        # recomputed at the refreshed point so the stored row is coherent
        if self.linear_gibbs:
            q_lg = pm.linear_gibbs_refresh(
                nuts.q, stan_offset, y_stan,
                jax.random.fold_in(rng, 0x117),
            )
            nuts = nuts._replace(q=q_lg)
            info = info._replace(lp=logp(q_lg))

        # ---- (2) parametric mean -> BART offset -------------------------
        c, _ = pm.layout.constrain(nuts.q)
        tp = pm.transformed(c)
        bart_offset = self._bart_offset_from_draw(c, tp)
        sigma = (jnp.asarray(1.0, self.dtype) if self.is_binary
                 else tp["aux"])

        # ---- (3) warmup leaf-scale rescale (init.cpp:813-818) -----------
        bart_state = state.bart
        if is_warmup and not self.is_binary:
            do_rescale = self.rescale_sched[jnp.minimum(it, self.warmup - 1)]
            new_sigma_mu = self._sigma_mu(bart_offset, bart_state.k)
            bart_state = bart_state._replace(
                sigma_mu=jnp.where(do_rescale, new_sigma_mu,
                                   bart_state.sigma_mu)
            )

        return (nuts, info, vi, bart_state, bart_offset, sigma, rng,
                rng_bart)

    def step(self, state: GibbsState, it, is_warmup: bool):
        """One Gibbs iteration (init.cpp:752-917).  ``it`` is the iteration
        index within the phase; is_warmup is static."""
        cfg = self.bart_cfg
        (nuts, info, vi, bart_state, bart_offset, sigma, rng,
         rng_bart) = self._pre_sweep(state, it, is_warmup)

        # ---- (4) BART sweeps (probit: latents first) ---------------------
        latents = state.latents

        def bart_substep(j, carry):
            bart_state, latents, varcount = carry
            rng_j = jax.random.fold_in(rng_bart, j)
            if self.is_binary:
                rng_j, rng_z = jax.random.split(rng_j)
                latents = bart_ops.sample_probit_latents(
                    bart_state.allfit + bart_offset, self.y, rng_z,
                    self.dtype, u=self._probit_latent_u(rng_z),
                )
                y_target = latents - bart_offset
            else:
                y_target = self.y - bart_offset
            if self.sweep_consts is not None and self.sweep_single_ok:
                from .ops.bart_sweep_kernel import bart_sweep_fused

                bart_state, varcount = bart_sweep_fused(
                    cfg, bart_state, y_target, self.sweep_consts, sigma,
                    rng_j, weights=self.weights,
                    interpret=self.sweep_interpret,
                )
                bart_state, varcount = self._maybe_regrow(
                    bart_state, varcount, y_target, sigma, rng_j)
            else:
                bart_state, varcount = bart_ops.bart_sweep(
                    cfg, bart_state, y_target, self.ranks,
                    self.split_probs, sigma, rng_j, weights=self.weights,
                    axis_name=self.obs_axis,
                )
            return bart_state, latents, varcount

        varcount0 = jnp.zeros(self.ranks.shape[1], dtype=jnp.int32)
        bart_state, latents, varcount = jax.lax.fori_loop(
            0, self.skip_bart, bart_substep,
            (bart_state, latents, varcount0),
        )

        return self._post_sweep(nuts, info, vi, bart_state, bart_offset,
                                latents, varcount, rng, it)

    def _maybe_regrow(self, bart_state, varcount, y_target, sigma,
                      rng_j):
        """Compose the random-scan subtree-regrow refreshes with the
        fused sweep kernel: ops/bart.py:regrow_refresh runs as a
        post-sweep XLA pass on the kernel's output state (a valid
        Metropolis-within-Gibbs composition; with k_df > 0 the kernel's
        chi(df, scale) k update lands BEFORE the refresh instead of
        after, both valid kernel orderings).  Round-3 parity hole
        closed: structure-sensitive users (regrow_per_sweep) previously
        lost the megakernel (the XLA sweep is 3-5x slower)."""
        cfg = self.bart_cfg
        if cfg.regrow_per_sweep <= 0:
            return bart_state, varcount
        rng_rg = jax.random.fold_in(rng_j, 0x9e9)
        bart_state = bart_ops.regrow_refresh(
            cfg, bart_state, y_target, self.ranks, self.split_probs,
            sigma, rng_rg, weights=self.weights, axis_name=self.obs_axis,
        )
        varcount = bart_ops.count_variable_use(
            cfg, bart_state.feature, self.ranks.shape[1])
        return bart_state, varcount

    def _post_sweep(self, nuts, info, vi, bart_state, bart_offset,
                    latents, varcount, rng, it):
        """BART fit -> Stan offset, then draw packaging (per chain)."""
        pm, cfg = self.pm, self.bart_cfg

        # ---- (4a, optional) ensemble-wide conjugate leaf refresh ---------
        # leaf_gibbs exact directional draws over the joint leaf-value
        # space (random Walsh directions; _leaf_gibbs_update), re-mixing
        # the cross-tree fit-error directions that carry the lp/sigma ESS
        # floor.  lp telemetry is recomputed below.
        if self.leaf_gibbs > 0 or self.leaf_block > 0:
            if self.is_binary:
                sigma_lg = jnp.asarray(1.0, self.dtype)
            else:
                c_lg, _ = pm.layout.constrain(nuts.q)
                sigma_lg = pm.transformed(c_lg)["aux"]
        if self.leaf_gibbs > 0:
            for j in range(self.leaf_gibbs):
                bart_state = self._leaf_gibbs_update(
                    bart_state, bart_offset, latents, sigma_lg,
                    jax.random.fold_in(rng, 0x1eaf + j),
                )

        # ---- (4a', optional) FULL blocked leaf draw every k iterations --
        # (see _leaf_block_update).  The iteration predicate is a scalar
        # shared by every chain, so under vmap this stays a real lax.cond
        # (no both-branch select): off-iterations pay nothing.
        if self.leaf_block > 0:
            rng_lb = jax.random.fold_in(rng, 0xb10c)
            bart_state = jax.lax.cond(
                (it % self.leaf_block) == (self.leaf_block - 1),
                lambda bs: self._leaf_block_update(
                    bs, bart_offset, latents, sigma_lg, rng_lb),
                lambda bs: bs,
                bart_state,
            )

        # ---- (4b, optional) additive-level interweave --------------------
        # one conjugate draw over (per-tree leaf shifts, ranef-intercept
        # shifts): re-mixes the prior-identified global-level direction
        # the offset exchange random-walks (_level_gibbs_update).  lp
        # telemetry is recomputed below so the stored row stays coherent.
        if self.level_gibbs:
            nuts, bart_state = self._level_gibbs_update(
                nuts, bart_state, bart_offset, latents,
                jax.random.fold_in(rng, 0x1e7),
            )

        # ---- (5) BART fit -> Stan offset ---------------------------------
        bart_fit = bart_state.allfit
        stan_offset = self._stan_offset_from_fit(bart_fit)
        if self.level_gibbs or self.leaf_gibbs > 0 or self.leaf_block > 0:
            y_stan = latents if self.is_binary else self.y
            if self.use_gram:
                # one O(N*D) anchored pass — avoids the direct path's
                # (N, l) one-hot Z rebuild just for telemetry
                anchor = pm.gram_anchor(nuts.q, stan_offset, y_stan)
                lp_new = pm.log_prob_gram(nuts.q, anchor)
            else:
                lp_new = pm.log_prob(nuts.q, stan_offset, y_stan)
            info = info._replace(lp=lp_new)

        # ---- draw packaging ----------------------------------------------
        stan_row = jnp.concatenate([
            jnp.stack([
                info.lp, info.accept_stat, info.stepsize, info.treedepth,
                info.n_leapfrog, info.divergent, info.energy,
            ]),
            pm.constrained_draw(nuts.q),
        ])
        if self.has_test:
            bart_test = bart_ops.predict_trees(
                cfg, bart_state.feature, bart_state.cut,
                bart_state.leaf_value, self.ranks_test,
            )
        else:
            bart_test = jnp.zeros(self.n_test, dtype=self.dtype)

        new_state = GibbsState(
            nuts=nuts, bart=bart_state, bart_offset=bart_offset,
            stan_offset=stan_offset, latents=latents, rng=rng, vi=vi,
        )
        if self.keep_trees:
            draw = GibbsDraw(
                stan=stan_row, bart_train=bart_fit, bart_test=bart_test,
                varcount=varcount, k=bart_state.k,
                tree_feature=bart_state.feature,
                tree_cut=bart_state.cut,
                tree_leaf_value=bart_state.leaf_value,
            )
        else:
            draw = GibbsDraw(
                stan=stan_row, bart_train=bart_fit, bart_test=bart_test,
                varcount=varcount, k=bart_state.k,
                tree_leaf_value=jnp.zeros((0, 0), dtype=self.dtype),
            )
        return new_state, draw

    def step_batched(self, states: GibbsState, it, is_warmup: bool,
                     chain_block: int = 8):
        """Batch-explicit Gibbs iteration over ALL chains: the per-chain
        phases run under ``vmap`` (collectives over axis "chains" keep
        working), while the BART sweep runs as ONE chain-blocked fused
        kernel across the whole batch.

        Motivation (chip ablation, BENCH_NOTES): the per-(chain, tree)
        grid step of the vmapped sweep kernel costs ~4.6 us of which
        ~1.9 us is the block-DMA/grid floor and ~2.6 us is issue
        overhead of the many small (1, 128)/(1, NPAD) ops — compute is
        essentially free.  Processing ``chain_block`` chains per grid
        step amortizes both.

        Semantics are identical to ``vmap(step)``: the same per-chain
        RNG stream feeds the sweep via the variates contract.
        """
        if self.sweep_consts is None:
            raise ValueError("step_batched requires sweep_kernel=True")
        cfg = self.bart_cfg

        pre = jax.vmap(
            lambda s: self._pre_sweep(s, it, is_warmup),
            axis_name="chains",
        )
        (nuts, info, vi, bart_state, bart_offset, sigma, rng,
         rng_bart) = pre(states)

        from .ops.bart_sweep_kernel import (
            bart_sweep_fused_batch,
            bart_sweep_fused_batch_tiled,
        )

        # obs-tiled kernel past the single-pass whole-row VMEM ceiling
        sweep_fn = (bart_sweep_fused_batch_tiled if self.sweep_tiled
                    else bart_sweep_fused_batch)
        latents = states.latents
        varcount = None
        for j in range(self.skip_bart):
            rng_j = jax.vmap(lambda k: jax.random.fold_in(k, j))(rng_bart)
            if self.is_binary:
                rs = jax.vmap(jax.random.split)(rng_j)
                rng_j, rng_z = rs[:, 0], rs[:, 1]
                latents = jax.vmap(
                    lambda af, off, rz: bart_ops.sample_probit_latents(
                        af + off, self.y, rz, self.dtype)
                )(bart_state.allfit, bart_offset, rng_z)
                y_target = latents - bart_offset
            else:
                y_target = self.y[None, :] - bart_offset
            bart_state, varcount = sweep_fn(
                cfg, bart_state, y_target, self.sweep_consts, sigma,
                rng_j, chain_block=chain_block, weights=self.weights,
                interpret=self.sweep_interpret,
            )
            if cfg.regrow_per_sweep > 0:
                # same per-chain streams as vmap(step) (fold 0x9e9)
                bart_state, varcount = jax.vmap(
                    lambda bs, yt, sg, k, vc: self._maybe_regrow(
                        bs, vc, yt, sg, k)
                )(bart_state, y_target, sigma, rng_j, varcount)

        post = jax.vmap(self._post_sweep, axis_name="chains",
                        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None))
        return post(nuts, info, vi, bart_state, bart_offset, latents,
                    varcount, rng, it)

    # ------------------------------------------------------------------

    def _phase_body(self, is_warmup, callback=None):
        def body(state, it):
            state, draw = self.step(state, it, is_warmup)
            out = callback(draw) if callback is not None else draw
            return state, out
        return body

    def run_chain_warmup(self, rng, bart_offset_init=None,
                         sigma_init=1.0, callback=None):
        """Warmup phase of one chain (adaptation NOT yet disengaged).
        The sharded/multihost drivers jit this and ``run_chain_sample``
        as separate programs so per-phase wall clock is measured, not
        pro-rated (the reference's warm/sample_delta_t,
        interruptable_sampler.hpp:101-102)."""
        state = self.init_state(rng, bart_offset_init, sigma_init)
        return jax.lax.scan(self._phase_body(True, callback), state,
                            jnp.arange(self.warmup))

    def run_chain_sample(self, state, callback=None):
        """Sampling phase of one chain from a (disengaged) state."""
        return jax.lax.scan(self._phase_body(False, callback), state,
                            jnp.arange(self.iterations))

    def run_chain(self, rng, bart_offset_init=None, sigma_init=1.0,
                  keep_warmup: bool = True, callback=None):
        """Run one full chain: warmup scan + sampling scan.

        callback: optional jax-transformable ``f(draw) -> pytree`` stored in
        place of the raw draw (the reference's streaming callback,
        init.cpp:849-911 / keep_fits=FALSE).
        """
        state, warm_draws = self.run_chain_warmup(
            rng, bart_offset_init, sigma_init, callback)
        state = self._disengage(state)
        state, draws = self.run_chain_sample(state, callback)
        if keep_warmup:
            return state, jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=0),
                warm_draws, draws,
            )
        return state, draws

    def _vi_update(self, state: GibbsState, logp, rng):
        """Streaming VI on the current conditional posterior: a few
        reparameterized ELBO optimizer steps, then one draw from q —
        VI-within-Gibbs, the analog of dbarts' rbart_vi comparator
        (test-02-binary.R:75-78) generalized to the full model class.

        vi_method="rmsprop": slow-decay RMSProp that tracks the moving
        conditional (the ``algorithm="vi"`` surface).  vi_method="adagrad":
        stan::variational's update rule (rate = eta * k^-1/2 / (tau +
        sqrt(acc)), advi.hpp stochastic_gradient_ascent semantics) on
        meanfield or fullrank q (the ``algorithm="advi"`` surface;
        fullrank parameterizes theta = mu + L z with L = diag(exp(omega))
        + strict_tril(L_off), entropy sum(omega))."""
        from stan4bart_tpu.ops.nuts import NutsInfo

        P = self.pm.num_upars
        dtype = self.dtype
        vi = state.vi
        fullrank = self.vi_family == "fullrank"

        def unpack(v):
            mu, omega = v[:P], v[P : 2 * P]
            L_off = (v[2 * P :].reshape(P, P) if fullrank
                     else jnp.zeros((0, 0), dtype))
            return mu, omega, L_off

        def q_sample(v, z):
            mu, omega, L_off = unpack(v)
            th = mu + z * jnp.exp(omega)
            if fullrank:
                th = th + z @ jnp.tril(L_off, -1).T
            return th

        def neg_elbo(v, r):
            z = jax.random.normal(r, (self.vi_mc, P), dtype)
            lp = jax.vmap(logp)(q_sample(v, z))
            return -(jnp.mean(lp) + jnp.sum(v[P : 2 * P]))

        adagrad = self.vi_method == "adagrad"

        def body(j, carry):
            v, acc, cnt = carry
            g = jax.grad(neg_elbo)(v, jax.random.fold_in(rng, 101 + j))
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            if adagrad:
                # stan::variational adagrad (tau = 1); count persists
                # across Gibbs iterations (warm-started q)
                acc = jnp.where(cnt == 0.0, g * g, 0.9 * acc + 0.1 * g * g)
                rate = self.vi_eta * (cnt + 1.0) ** -0.5
            else:
                acc = jnp.where(cnt == 0.0, g * g, 0.9 * acc + 0.1 * g * g)
                # RMSProp with slow decay: the conditional target moves
                # every Gibbs iteration, so a constant rate oscillates and
                # a Stan-like k^-1/2 freezes too early
                rate = self.vi_eta * (1.0 + 0.02 * cnt) ** -0.5
            step = rate / (1.0 + jnp.sqrt(acc)) * g
            if fullrank:
                # the P^2 off-diagonal factor entries destabilize the
                # coupled Gibbs at the mu/omega rate (measured: sigma
                # diverges ~3e4 at eta=0.5, stable at 0.1) — damp them 5x
                step = step.at[2 * P :].set(0.2 * step[2 * P :])
            v = v - step
            # keep log-sds sane under the moving target
            v = v.at[P : 2 * P].set(jnp.clip(v[P : 2 * P], -12.0, 4.0))
            if fullrank:
                v = v.at[2 * P :].set(jnp.clip(v[2 * P :], -30.0, 30.0))
            return v, acc, cnt + 1.0

        v0 = jnp.concatenate([vi.mu, vi.omega]
                             + ([vi.L_off.ravel()] if fullrank else []))
        v, acc, cnt = jax.lax.fori_loop(
            0, self.vi_steps, body, (v0, vi.acc, vi.count)
        )
        mu, omega, L_off = unpack(v)
        u = q_sample(v, jax.random.normal(
            jax.random.fold_in(rng, 7), (1, P), dtype))[0]
        lp_u = logp(u)
        nuts = state.nuts._replace(q=u)
        info = NutsInfo(
            lp=lp_u,
            accept_stat=jnp.ones((), dtype),
            stepsize=jnp.asarray(self.vi_eta, dtype),
            treedepth=jnp.zeros((), dtype),
            n_leapfrog=jnp.asarray(
                float(self.vi_steps * self.vi_mc), dtype
            ),
            divergent=jnp.zeros((), dtype),
            energy=-lp_u,
        )
        return nuts, info, ViState(mu=mu, omega=omega, acc=acc, count=cnt,
                                   L_off=L_off)

    def _disengage(self, state: GibbsState) -> GibbsState:
        """Freeze the sampling stepsize (interruptable_sampler.hpp:206-210).
        freeze_rule selects bar (Stan), last, or the geometric midpoint —
        see NutsConfig.freeze_rule."""
        da = state.nuts.da
        rule = self.nuts_cfg.freeze_rule
        if rule == "last":
            frozen = da.log_eps
        elif rule == "mid":
            frozen = 0.5 * (da.log_eps + da.log_eps_bar)
        else:  # "bar"
            frozen = da.log_eps_bar
        frozen = jnp.where(da.count > 0, frozen, da.log_eps)
        # post-warmup transitions read log_eps_bar (adapt_stepsize=False
        # path in nuts_transition) — freeze must write BOTH iterates
        return state._replace(nuts=state.nuts._replace(
            da=da._replace(log_eps=frozen, log_eps_bar=frozen)
        ))

    def local_view(self, local: dict, axis: str = "data",
                   scale_y=None, inv_mass0=None,
                   n_global_pad: int | None = None):
        """Shard-local copy of this program for the explicit obs-sharded
        driver (parallel/mesh.run_obs_sharded): every obs-sized member is
        replaced by its LOCAL shard of the ``axis`` mesh dimension and
        ``obs_axis`` is set so all sufficient statistics psum over it.

        ``local`` keys (each leading-axis obs-local): y, ranks, X,
        z_structs (list of (lhs, gidx)), gram_A, gram_AW, and optionally
        weights / user_offset.  ``scale_y`` / ``inv_mass0`` are the
        precomputed GLOBAL init heuristics (host numpy over global data —
        they cannot be computed from a shard).  The fused Pallas sweep is
        disabled on the view: one kernel launch cannot host the per-tree
        cross-shard all-reduces, so the obs-sharded sweep composes XLA
        one-hot-matmul statistics with psums (ops/bart.bart_sweep
        axis_name) — at the large n this axis targets, the O(N) MXU work
        dominates the per-step launch overhead the kernel removes.

        Requires the Gram-compressed likelihood: JAX does not insert the
        grad-side all-reduce for a closed-over sharded operand under
        ``shard_map(check_vma=False)``, so every differentiated density
        must be the anchored O(D^2) form whose psums are forward-only
        (gram_anchor runs outside the trajectory)."""
        import copy

        if not self.use_gram:
            raise ValueError(
                "the obs-sharded driver requires the Gram-compressed "
                "likelihood (gram_lik=True): NUTS gradients may not "
                "cross the observation psum"
            )
        if getattr(self.nuts_cfg, "pooled_axis", None):
            raise ValueError(
                "pooled_adaptation is not supported obs-sharded (the "
                "chain pool would silently become per-device-group)"
            )
        lpm = copy.copy(self.pm)
        lpm.obs_axis = axis
        lpm.X = local["X"]
        lpm.z_structs = [tuple(zs) for zs in local["z_structs"]]
        if "weights" in local:
            import dataclasses

            lpm.weights = local["weights"]
            lpm.cfg = dataclasses.replace(lpm.cfg, has_weights=True)
        lpm.N_rows = local["y"].shape[0]
        lpm.gram_A = local["gram_A"]
        lpm.gram_AW = local["gram_AW"]

        lp = copy.copy(self)
        lp.pm = lpm
        lp.obs_axis = axis
        lp.y = local["y"]
        lp.ranks = local["ranks"]
        lp.weights = local.get("weights", None)
        if self.user_offset is not None:
            lp.user_offset = local["user_offset"]
        lp.N = int(local["y"].shape[0])
        lp.N_global_pad = int(n_global_pad if n_global_pad is not None
                              else local["y"].shape[0])
        lp._scale_y_global = scale_y
        lp._inv_mass0_global = inv_mass0
        lp.sweep_consts = None
        return lp

    def run_chains_chunked(self, keys, chunk_size: int,
                           bart_offset_init=None, sigma_init=1.0,
                           keep_warmup: bool = True, callback=None,
                           verbose: int = 0, refresh: int | None = None,
                           progress=None):
        """Host-driven chunked execution: same sampler as run_chain but each
        device execution covers <= chunk_size iterations.  Needed where
        single executions are time-capped (the axon TPU tunnel kills runs
        over ~60s); enables between-chunk progress reporting (the
        reference's refresh printing, init.cpp:746-754: phase banners at
        verbose > 0, per-``refresh`` iteration lines at verbose > 1),
        real per-phase wall-clock timing (interruptable_sampler.hpp:
        101-102 warm/sample_delta_t), and user interrupts between chunks
        (the reference honors R_CheckUserInterrupt every transition,
        stan_sampler.hpp:44-48) — a KeyboardInterrupt returns the draws
        completed so far as a valid partial fit.

        progress: optional ``f(phase, done, total)`` hook called after
        every chunk (also the interrupt injection point for tests).

        Returns ``(final_states, merged_draws, info)`` where info has
        real measured ``warmup_s`` / ``sample_s``, per-phase completed
        counts, and an ``interrupted`` flag."""
        import time

        import numpy as np

        chunk_size = int(chunk_size)

        def wrap(draw):
            return callback(draw) if callback is not None else draw

        def init_one(key):
            return self.init_state(key, bart_offset_init, sigma_init)

        def chunk(state, it0, n, is_warmup):
            def body(state, i):
                state, draw = self.step(state, it0 + i, is_warmup)
                return state, wrap(draw)

            return jax.lax.scan(body, state, jnp.arange(n))

        def chunk_batched(states, it0, n, is_warmup):
            # batch-explicit driver (chain-blocked fused sweep): draws
            # come out scan-stacked (n, C, ...) — swap to the (C, n, ...)
            # layout the vmapped path produces
            def body(states, i):
                states, draw = self.step_batched(states, it0 + i,
                                                 is_warmup)
                return states, draw

            states, draws = jax.lax.scan(body, states, jnp.arange(n))
            draws = jax.tree_util.tree_map(
                lambda a: jnp.swapaxes(a, 0, 1), draws)
            return states, draws

        # axis_name binds the chain axis for pooled-adaptation collectives
        # (NutsConfig.pooled_axis="chains"); harmless when unused
        init_fn = jax.jit(jax.vmap(init_one, axis_name="chains"))
        if self.sweep_consts is not None and callback is None:
            warm_fn = jax.jit(
                lambda s, it0, n: chunk_batched(s, it0, n, True),
                static_argnums=(2,))
            samp_fn = jax.jit(
                lambda s, it0, n: chunk_batched(s, it0, n, False),
                static_argnums=(2,))
        else:
            warm_fn = jax.jit(jax.vmap(
                lambda s, it0, n: chunk(s, it0, n, True),
                in_axes=(0, None, None), axis_name="chains"),
                static_argnums=(2,))
            samp_fn = jax.jit(jax.vmap(
                lambda s, it0, n: chunk(s, it0, n, False),
                in_axes=(0, None, None), axis_name="chains"),
                static_argnums=(2,))

        states = init_fn(keys)
        pieces = []
        info = {"warmup_s": 0.0, "sample_s": 0.0, "interrupted": False,
                "warmup_done": 0, "sample_done": 0}
        # closed-loop guard on the execution-time cap: _auto_chunk_size
        # is an open-loop estimate from a per-(obs x tree x chain)
        # constant measured on THIS chip class — a much slower backend
        # would still exceed the ~60 s kill.  If a measured steady-state
        # chunk (the 2nd of a phase onward: the 1st includes compile)
        # projects past exec_budget_s, shrink the remaining chunks once.
        exec_budget_s = float(os.environ.get("S4B_EXEC_BUDGET_S", "45"))
        try:
            for phase, fn, total in (("warmup", warm_fn, self.warmup),
                                     ("sample", samp_fn, self.iterations)):
                if phase == "sample":
                    states = self._disengage(states)
                if verbose > 0 and total > 0:
                    print(f"starting {phase}, {total} draws", flush=True)
                next_print = refresh if refresh else None
                it0, chunk_i, cur, shrunk = 0, 0, chunk_size, False
                while it0 < total:
                    n = min(cur, total - it0)
                    t0 = time.perf_counter()
                    states, draws = jax.block_until_ready(
                        fn(states, it0, n))
                    dt = time.perf_counter() - t0
                    info[f"{phase}_s"] += dt
                    info[f"{phase}_done"] = it0 + n
                    if phase == "sample" or keep_warmup:
                        pieces.append(
                            jax.tree_util.tree_map(np.asarray, draws))
                    if progress is not None:
                        progress(phase, it0 + n, total)
                    if verbose > 1 and next_print is not None:
                        while it0 + n >= next_print:
                            print(f"  iter {next_print} / {total}",
                                  flush=True)
                            next_print += refresh
                    elif verbose > 0:
                        print(f"  {phase} {it0 + n} / {total}", flush=True)
                    it0 += n
                    chunk_i += 1
                    if (not shrunk and chunk_i >= 2 and it0 < total
                            and dt > exec_budget_s and n > 1):
                        cur = max(1, int(n * exec_budget_s / (2.0 * dt)))
                        shrunk = True
                        if verbose >= 0:
                            print(
                                f"  chunk took {dt:.0f}s > budget "
                                f"{exec_budget_s:.0f}s: shrinking chunk "
                                f"size {n} -> {cur}", flush=True)
        except KeyboardInterrupt:
            if not pieces:
                raise
            info["interrupted"] = True
            import warnings

            warnings.warn(
                "sampling interrupted: returning the "
                f"{info['warmup_done']} warmup + {info['sample_done']} "
                "sampling draws completed so far as a partial fit"
            )
        merged = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs, axis=1), *pieces
        )
        return states, merged, info

    def continue_chunked(self, states, iterations: int,
                         chunk_size: int | None = None,
                         progress=None):
        """Sampling-phase continuation from an existing chain-batched
        state (the resume path of ``Stan4bartFit.continue_sampling``):
        the same driver ladder as ``run_chains_chunked`` — chain-blocked
        fused Pallas sweep when the program carries it, the vmapped
        per-chain step otherwise — with every device execution bounded
        by ``chunk_size`` iterations (the axon tunnel kills executions
        past ~60 s, so an unchunked long resume would die at chip
        scale) and KeyboardInterrupt between chunks returning the draws
        completed so far.  Returns (states, draws, info); draws are
        chain-major numpy, info carries measured wall clock."""
        import time

        import numpy as np

        iterations = int(iterations)
        if chunk_size is None:
            chunk_size = iterations

        def chunk(state, it0, n):
            def body(state, i):
                return self.step(state, it0 + i, False)

            return jax.lax.scan(body, state, jnp.arange(n))

        def chunk_batched(states, it0, n):
            def body(states, i):
                return self.step_batched(states, it0 + i, False)

            states, draws = jax.lax.scan(body, states, jnp.arange(n))
            return states, jax.tree_util.tree_map(
                lambda a: jnp.swapaxes(a, 0, 1), draws)

        if self.sweep_consts is not None:
            fn = jax.jit(chunk_batched, static_argnums=(2,))
        else:
            fn = jax.jit(jax.vmap(
                chunk, in_axes=(0, None, None), axis_name="chains"),
                static_argnums=(2,))

        pieces = []
        info = {"sample_s": 0.0, "sample_done": 0, "interrupted": False}
        try:
            for it0 in range(0, iterations, int(chunk_size)):
                n = min(int(chunk_size), iterations - it0)
                t0 = time.perf_counter()
                states, draws = jax.block_until_ready(fn(states, it0, n))
                info["sample_s"] += time.perf_counter() - t0
                info["sample_done"] = it0 + n
                pieces.append(jax.tree_util.tree_map(np.asarray, draws))
                if progress is not None:
                    progress("sample", it0 + n, iterations)
        except KeyboardInterrupt:
            if not pieces:
                raise
            info["interrupted"] = True
            import warnings

            warnings.warn(
                "continue_sampling interrupted: returning the "
                f"{info['sample_done']} draws completed so far"
            )
        merged = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs, axis=1), *pieces)
        return states, merged, info

    def run_batched_warmup(self, keys, bart_offset_init=None,
                           sigma_init=1.0, chain_block: int = 8):
        """Warmup phase of the batch-explicit driver (chain-blocked
        fused sweep); draws come back chain-major.  Adaptation NOT yet
        disengaged — phase counterpart of ``run_chain_warmup``."""
        states = jax.vmap(
            lambda k: self.init_state(k, bart_offset_init, sigma_init)
        )(keys)

        def body(states, it):
            return self.step_batched(states, it, True,
                                     chain_block=chain_block)

        states, warm = jax.lax.scan(body, states,
                                    jnp.arange(self.warmup))
        return states, jax.tree_util.tree_map(
            lambda a: jnp.swapaxes(a, 0, 1), warm)

    def run_batched_sample(self, states, chain_block: int = 8):
        """Sampling phase of the batch-explicit driver."""
        def body(states, it):
            return self.step_batched(states, it, False,
                                     chain_block=chain_block)

        states, draws = jax.lax.scan(body, states,
                                     jnp.arange(self.iterations))
        return states, jax.tree_util.tree_map(
            lambda a: jnp.swapaxes(a, 0, 1), draws)

    def run_chains_batched(self, keys, bart_offset_init=None,
                           sigma_init=1.0, keep_warmup: bool = True,
                           chain_block: int = 8):
        """All chains in one compiled program via the batch-explicit
        step (chain-blocked fused sweep).  Same semantics and RNG
        streams as ``vmap(run_chain)``; draws come back chain-major."""
        states, warm_draws = self.run_batched_warmup(
            keys, bart_offset_init, sigma_init, chain_block)
        states = self._disengage(states)
        states, draws = self.run_batched_sample(states, chain_block)
        if keep_warmup:
            return states, jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=1),
                warm_draws, draws,
            )
        return states, draws

    def stan_names(self) -> list[str]:
        return [
            "lp__", "accept_stat__", "stepsize__", "treedepth__",
            "n_leapfrog__", "divergent__", "energy__",
        ] + self.pm.constrained_names()
