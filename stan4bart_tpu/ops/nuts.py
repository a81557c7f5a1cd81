"""Iterative multinomial NUTS with Stan-style windowed diagonal-metric
adaptation — fully jittable, one transition per call.

TPU-native re-creation of the sampler the reference drives through
``stan::mcmc::adapt_diag_e_nuts`` (/root/reference/src/
interruptable_sampler.hpp:63-211; vendored stan/mcmc/hmc/nuts): recursion is
flattened into a checkpoint-stack iterative tree build (fixed ``max_depth``
buffers, data-dependent trip counts via ``lax.while_loop``), matching Stan's

* multinomial (biased-progressive) sampling over the trajectory,
* generalized U-turn criterion incl. the cross-subtree interface checks,
* divergence threshold ``H - H0 > 1000``,
* dual-averaging stepsize adaptation (gamma/delta/kappa/t0 defaults
  .05/.8/.75/10, stan_sampler.cpp:427-455),
* Stan's windowed (75/25/50) Welford variance adaptation with stepsize
  re-initialization at window boundaries,
* per-draw diagnostics row: accept_stat__, stepsize__, treedepth__,
  n_leapfrog__, divergent__, energy__ (stan_sampler.cpp:479-485).

The log-density callable is passed per transition so the Gibbs coupling can
re-close it over the current BART offset each iteration.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class NutsConfig(NamedTuple):
    max_treedepth: int = 10
    delta: float = 0.8       # adapt_delta (target accept stat)
    gamma: float = 0.05      # adapt_gamma
    kappa: float = 0.75      # adapt_kappa
    t0: float = 10.0         # adapt_t0
    max_delta_h: float = 1000.0
    # uniform stepsize jitter factor per transition in (1 +/- jitter)
    # (stan_sampler.cpp:452-455 stepsize_jitter; Stan base_hmc::sample_stepsize)
    stepsize_jitter: float = 0.0
    # skip Stan's init_stepsize re-search at metric-window boundaries and
    # anchor the dual-averaging restart at the current running stepsize —
    # against the Gibbs-moving conditional the one-leapfrog re-search can
    # return a far-off value that the averaged iterate never recovers from
    window_end_research: bool = True
    # what stepsize to freeze at when adaptation disengages: "bar" = the
    # dual-averaged iterate (Stan behavior), "last" = the final running
    # iterate, "mid" = geometric midpoint.  Against the Gibbs-moving
    # conditional the bar lags the (still-improving) optimum accumulated
    # over the term buffer — measured sampling accept 0.90 vs target 0.8,
    # i.e. frozen ~1.5-2x too small (BENCH_NOTES round-2 target #3)
    freeze_rule: str = "bar"
    # cross-chain pooled adaptation (TPU-native: chains are a vmapped /
    # mesh axis, so pooling is one pmean collective).  When set to the
    # chain axis name, the dual-averaging accept statistic and the
    # window-end metric estimate are averaged over all chains — 64 chains
    # give 64x the adaptation signal per window.  The reference adapts
    # each chain independently (one process per chain,
    # stan4bart_fit.R:495-558, so pooling was impossible there).
    # Requires the chain batch to be vmapped with
    # ``axis_name=cfg.pooled_axis``.
    pooled_axis: str | None = None
    # which adaptation signals pool: "metric" (window-end variance only,
    # the default), "stepsize" (dual-averaging accept signal only), or
    # "both".  Pooling the accept signal measured HARMFUL (CPU n=250
    # 8-chain A/B: 98 divergences vs 1 unpooled): chain conditionals
    # genuinely differ in curvature under Gibbs (each has its own BART
    # offset), and a pooled-MEAN accept target lets hard chains diverge
    # while easy chains compensate — per-chain dual averaging equalizes
    # accept per chain instead.  "metric" was benign (12 divergences,
    # posterior unbiased); "both"/"stepsize" remain for experiments.
    pooled_parts: str = "metric"
    # include the between-chain variance of window means in the pooled
    # metric.  Default False: each NUTS transition targets its chain's
    # Gibbs CONDITIONAL (its own BART offset), whose scale is the
    # within-chain variance; the between term adds Var[conditional mean]
    # — a marginal component that over-widens the metric.
    pooled_between: bool = False


class DualAveragingState(NamedTuple):
    log_eps: jnp.ndarray       # current log stepsize
    log_eps_bar: jnp.ndarray   # averaged log stepsize
    h_bar: jnp.ndarray
    mu: jnp.ndarray
    count: jnp.ndarray         # adaptation iteration within current window


class WelfordState(NamedTuple):
    count: jnp.ndarray
    mean: jnp.ndarray
    m2: jnp.ndarray


class NutsState(NamedTuple):
    q: jnp.ndarray             # unconstrained position (P,)
    inv_mass: jnp.ndarray      # diag inverse metric (P,)
    da: DualAveragingState
    welford: WelfordState


class NutsInfo(NamedTuple):
    lp: jnp.ndarray
    accept_stat: jnp.ndarray
    stepsize: jnp.ndarray
    treedepth: jnp.ndarray
    n_leapfrog: jnp.ndarray
    divergent: jnp.ndarray
    energy: jnp.ndarray


def _kinetic(p, inv_mass):
    return 0.5 * jnp.sum(p * p * inv_mass)


def welford_init(dim, dtype):
    z = jnp.zeros(dim, dtype=dtype)
    return WelfordState(jnp.zeros((), dtype), z, z)


def welford_update(w: WelfordState, x) -> WelfordState:
    count = w.count + 1.0
    delta = x - w.mean
    mean = w.mean + delta / count
    m2 = w.m2 + delta * (x - mean)
    return WelfordState(count, mean, m2)


def welford_variance(w: WelfordState):
    """Stan's regularized variance estimate
    (stan/mcmc/var_adaptation.hpp semantics)."""
    var = w.m2 / (w.count - 1.0)
    return (w.count / (w.count + 5.0)) * var + 1e-3 * (5.0 / (w.count + 5.0))


def pooled_welford_variance(w: WelfordState, axis_name: str,
                            include_between: bool = False):
    """Cross-chain pooled metric estimate (NutsConfig.pooled_axis).

    Within-chain variances are averaged over the chain axis, and Stan's
    count-based regularization (var_adaptation.hpp) uses the POOLED sample
    count n*chains — with 64 chains the estimate is ~64x less noisy, so it
    is shrunk correspondingly less toward the 1e-3 unit floor.  The
    between-chain variance of window means is opt-in: each transition
    targets its chain's own Gibbs conditional, and the between term
    estimates Var[conditional mean] across chains — a marginal component
    on top of the conditional scale the metric should match.
    """
    n = w.count
    c = jax.lax.psum(jnp.ones_like(n), axis_name)
    # geometric mean of per-chain variances: an arithmetic pmean is
    # dominated by outlier chains whose window mean is still DRIFTING
    # (drift inflates within-window m2), over-widening the metric for
    # every chain — measured on-chip as a 6x stepsize collapse at the
    # n=10k headline; the log-space mean is robust to those chains
    var = jnp.exp(jax.lax.pmean(
        jnp.log(jnp.maximum(w.m2 / (n - 1.0), 1e-30)), axis_name
    ))
    if include_between:
        gm = jax.lax.pmean(w.mean, axis_name)
        var = var + jax.lax.pmean((w.mean - gm) ** 2, axis_name) * (
            c / jnp.maximum(c - 1.0, 1.0)
        )
    pooled_n = n * c
    return (pooled_n / (pooled_n + 5.0)) * var + 1e-3 * (
        5.0 / (pooled_n + 5.0)
    )


def da_init(stepsize, dtype):
    log_eps = jnp.log(jnp.asarray(stepsize, dtype))
    return DualAveragingState(
        log_eps=log_eps,
        log_eps_bar=jnp.zeros((), dtype),
        h_bar=jnp.zeros((), dtype),
        mu=jnp.log(10.0) + log_eps,
        count=jnp.zeros((), dtype),
    )


def da_update(da: DualAveragingState, accept_stat, cfg: NutsConfig):
    """Nesterov dual averaging, Stan parameterization
    (stan/mcmc/stepsize_adaptation.hpp)."""
    count = da.count + 1.0
    eta = 1.0 / (count + cfg.t0)
    h_bar = (1.0 - eta) * da.h_bar + eta * (cfg.delta - accept_stat)
    log_eps = da.mu - jnp.sqrt(count) / cfg.gamma * h_bar
    x_eta = count ** (-cfg.kappa)
    log_eps_bar = x_eta * log_eps + (1.0 - x_eta) * da.log_eps_bar
    return DualAveragingState(log_eps, log_eps_bar, h_bar, da.mu, count)


def init_stepsize(logdensity_fn: Callable, q, inv_mass, stepsize0, rng,
                  max_iter: int = 100):
    """Stan's init_stepsize heuristic: double/halve until the one-step
    Metropolis log-ratio crosses log(0.5)
    (stan/mcmc/hmc/base_hmc.hpp init_stepsize)."""
    dtype = q.dtype
    logp0, grad0 = jax.value_and_grad(logdensity_fn)(q)
    p0 = jax.random.normal(rng, q.shape, dtype) / jnp.sqrt(inv_mass)
    h0 = -logp0 + _kinetic(p0, inv_mass)

    def delta_h(eps):
        p_half = p0 + 0.5 * eps * grad0
        q_new = q + eps * p_half * inv_mass
        logp_new, grad_new = jax.value_and_grad(logdensity_fn)(q_new)
        p_new = p_half + 0.5 * eps * grad_new
        h_new = -logp_new + _kinetic(p_new, inv_mass)
        return h0 - h_new  # log accept ratio

    log_half = jnp.log(jnp.asarray(0.5, dtype))
    dh = delta_h(jnp.asarray(stepsize0, dtype))
    direction = jnp.where(dh > log_half, 1.0, -1.0)

    def cond(carry):
        eps, it = carry
        dh = delta_h(eps)
        keep = jnp.where(
            direction > 0, dh > log_half, dh <= log_half
        )
        ok = jnp.isfinite(dh) | (direction < 0)
        return keep & (it < max_iter) & ok & (eps > 1e-10) & (eps < 1e7)

    def body(carry):
        eps, it = carry
        eps = jnp.where(direction > 0, eps * 2.0, eps * 0.5)
        return eps, it + 1

    eps, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(stepsize0, dtype), jnp.asarray(0))
    )
    return eps


def nuts_init(logdensity_fn, q0, stepsize: float = 1.0) -> NutsState:
    q0 = jnp.asarray(q0)
    dim = q0.shape[0]
    return NutsState(
        q=q0,
        inv_mass=jnp.ones(dim, dtype=q0.dtype),
        da=da_init(stepsize, q0.dtype),
        welford=welford_init(dim, q0.dtype),
    )


def make_adapt_schedule(num_warmup: int, init_buffer: int = 75,
                        term_buffer: int = 50, base_window: int = 25):
    """Stan's windowed_adaptation schedule as precomputed boolean arrays
    (stan/mcmc/windowed_adaptation.hpp semantics)."""
    if num_warmup < 20:
        # Stan disables adaptation windows entirely below 20 warmup draws
        return dict(
            adapt_stepsize=np.ones(max(num_warmup, 1), dtype=bool),
            collect=np.zeros(max(num_warmup, 1), dtype=bool),
            window_end=np.zeros(max(num_warmup, 1), dtype=bool),
        )
    if num_warmup < init_buffer + term_buffer + base_window:
        init_buffer = int(0.15 * num_warmup)
        term_buffer = int(0.10 * num_warmup)
        base_window = num_warmup - (init_buffer + term_buffer)

    collect = np.zeros(num_warmup, dtype=bool)
    window_end = np.zeros(num_warmup, dtype=bool)
    adapt_stepsize = np.ones(num_warmup, dtype=bool)

    window_start = init_buffer
    window_size = base_window
    while window_start < num_warmup - term_buffer:
        next_boundary = window_start + window_size
        if next_boundary + 2 * window_size > num_warmup - term_buffer:
            # last window extends to the end of the adaptation phase
            next_boundary = num_warmup - term_buffer
        next_boundary = min(next_boundary, num_warmup - term_buffer)
        collect[window_start:next_boundary] = True
        window_end[next_boundary - 1] = True
        window_start = next_boundary
        window_size *= 2
    return dict(adapt_stepsize=adapt_stepsize, collect=collect,
                window_end=window_end)


# ---------------------------------------------------------------------------
# the transition


def nuts_transition(
    logdensity_fn: Callable,
    state: NutsState,
    rng: jax.Array,
    cfg: NutsConfig,
    adapt_stepsize,
    collect,
    window_end,
):
    """One NUTS transition + adaptation bookkeeping.

    adapt_stepsize / collect / window_end are (traced) booleans for this
    iteration, read from the precomputed schedule; pass False, False, False
    after warmup (adaptation disengaged, stepsize frozen at exp(log_eps_bar)).
    """
    dtype = state.q.dtype
    P = state.q.shape[0]
    inv_mass = state.inv_mass
    max_depth = cfg.max_treedepth

    rng, rng_mom, rng_tree, rng_traj = jax.random.split(rng, 4)
    # pre-generate every per-leaf multinomial uniform and per-depth
    # direction/progressive uniforms in two draws (each on-the-fly RNG op
    # inside the trajectory loops is a separate ~13us kernel launch)
    max_leaps = 2**max_depth
    u_leaf_table = jax.random.uniform(rng_traj, (max_leaps + 1,), dtype)
    u_depth_table = jax.random.uniform(
        jax.random.fold_in(rng_traj, 1), (max_depth, 2), dtype
    )

    stepsize = jnp.where(
        adapt_stepsize, jnp.exp(state.da.log_eps),
        jnp.exp(state.da.log_eps_bar),
    )
    # during warmup before any da update, log_eps_bar is 0; fall back to
    # log_eps when the averaged value is still the initializer
    stepsize = jnp.where(
        adapt_stepsize | (state.da.count > 0),
        stepsize, jnp.exp(state.da.log_eps),
    )
    if cfg.stepsize_jitter:  # static; zero (the default) compiles away
        u_jit = jax.random.uniform(jax.random.fold_in(rng_traj, 2), (), dtype)
        stepsize = stepsize * (
            1.0 + cfg.stepsize_jitter * (2.0 * u_jit - 1.0)
        )

    logp0, grad0 = jax.value_and_grad(logdensity_fn)(state.q)
    p0 = jax.random.normal(rng_mom, (P,), dtype) / jnp.sqrt(inv_mass)
    h0 = -logp0 + _kinetic(p0, inv_mass)

    def leapfrog(q, p, grad, eps):
        p_half = p + 0.5 * eps * grad
        q_new = q + eps * p_half * inv_mass
        logp_new, grad_new = jax.value_and_grad(logdensity_fn)(q_new)
        p_new = p_half + 0.5 * eps * grad_new
        return q_new, p_new, logp_new, grad_new

    def criterion(p_sharp_m, p_sharp_p, rho):
        return (jnp.dot(p_sharp_m, rho) > 0) & (jnp.dot(p_sharp_p, rho) > 0)

    # trajectory state ------------------------------------------------------
    # edges: 0 = backward (minus), 1 = forward (plus); store (q, p, grad)
    edge_q = jnp.stack([state.q, state.q])
    edge_p = jnp.stack([p0, p0])
    edge_grad = jnp.stack([grad0, grad0])

    class Carry(NamedTuple):
        depth: jnp.ndarray
        edge_q: jnp.ndarray
        edge_p: jnp.ndarray
        edge_grad: jnp.ndarray
        rho: jnp.ndarray          # total momentum sum
        sample_q: jnp.ndarray
        sample_logp: jnp.ndarray
        sample_energy: jnp.ndarray
        log_sum_weight: jnp.ndarray
        sum_metro: jnp.ndarray
        n_leapfrog: jnp.ndarray
        divergent: jnp.ndarray
        turning: jnp.ndarray
        rng: jax.Array

    def build_subtree(depth, z0_q, z0_p, z0_grad, leap_offset):
        """Build 2^depth leapfrog states from z0 (exclusive), returning
        subtree candidate + edge data.  Iterative with checkpoint stacks.
        leap_offset: global leapfrog counter, indexes the pre-generated
        uniform table."""
        num_leaves = jnp.asarray(2, jnp.int32) ** depth

        class SubCarry(NamedTuple):
            leaf: jnp.ndarray
            q: jnp.ndarray
            p: jnp.ndarray
            grad: jnp.ndarray
            rho_cum: jnp.ndarray      # momentum sum over leaves so far
            cand_q: jnp.ndarray
            cand_logp: jnp.ndarray
            cand_energy: jnp.ndarray
            lsw: jnp.ndarray          # subtree log sum weight
            sum_metro: jnp.ndarray
            begin_p: jnp.ndarray      # momentum at first leaf
            ckpt_p: jnp.ndarray       # (max_depth, P) left-edge momenta
            ckpt_rho: jnp.ndarray     # (max_depth, P) rho before left edge
            turning: jnp.ndarray
            divergent: jnp.ndarray

        def popcount(x):
            return jax.lax.population_count(x.astype(jnp.uint32)).astype(
                jnp.int32
            )

        def sub_body(c: SubCarry) -> SubCarry:
            n = c.leaf
            u_mult = u_leaf_table[
                jnp.minimum(leap_offset + n, max_leaps)
            ]
            q, p, logp, grad = leapfrog(c.q, c.p, c.grad, stepsize)
            h = -logp + _kinetic(p, inv_mass)
            h = jnp.where(jnp.isnan(h), jnp.inf, h)
            divergent = (h - h0) > cfg.max_delta_h
            log_w = h0 - h  # leaf weight
            sum_metro = c.sum_metro + jnp.minimum(1.0, jnp.exp(h0 - h))

            # multinomial update of the subtree candidate
            lsw_new = jnp.logaddexp(c.lsw, log_w)
            accept_prob = jnp.exp(log_w - lsw_new)
            take = u_mult < accept_prob
            cand_q = jnp.where(take, q, c.cand_q)
            cand_logp = jnp.where(take, logp, c.cand_logp)
            cand_energy = jnp.where(take, h, c.cand_energy)

            is_first = n == 0
            begin_p = jnp.where(is_first, p, c.begin_p)

            # checkpoint store (even leaves are left edges)
            is_even = (n % 2) == 0
            slot_store = popcount(n)
            ckpt_p = jnp.where(
                is_even,
                c.ckpt_p.at[slot_store].set(p),
                c.ckpt_p,
            )
            ckpt_rho = jnp.where(
                is_even,
                c.ckpt_rho.at[slot_store].set(c.rho_cum),
                c.ckpt_rho,
            )
            rho_cum = c.rho_cum + p

            # u-turn checks for completed sub-subtrees (odd leaves)
            idx_max = popcount(jnp.maximum(n - 1, 0))
            idx_min = popcount(n + 1) - 1

            def check_body(i, turning):
                # subtree spanning ckpt i .. current leaf
                rho_span = rho_cum - ckpt_rho[i]
                p_sharp_l = ckpt_p[i] * inv_mass
                p_sharp_r = p * inv_mass
                return turning | ~criterion(p_sharp_l, p_sharp_r, rho_span)

            turning = jax.lax.cond(
                (n % 2) == 1,
                lambda t: jax.lax.fori_loop(idx_min, idx_max + 1,
                                            check_body, t),
                lambda t: t,
                c.turning,
            )

            return SubCarry(
                leaf=n + 1, q=q, p=p, grad=grad, rho_cum=rho_cum,
                cand_q=cand_q, cand_logp=cand_logp, cand_energy=cand_energy,
                lsw=lsw_new, sum_metro=sum_metro, begin_p=begin_p,
                ckpt_p=ckpt_p, ckpt_rho=ckpt_rho,
                turning=turning, divergent=c.divergent | divergent,
            )

        def sub_cond(c: SubCarry):
            return (c.leaf < num_leaves) & ~c.turning & ~c.divergent

        init = SubCarry(
            leaf=jnp.asarray(0, jnp.int32),
            q=z0_q, p=z0_p, grad=z0_grad,
            rho_cum=jnp.zeros(P, dtype),
            cand_q=z0_q,
            cand_logp=jnp.asarray(-jnp.inf, dtype),
            cand_energy=jnp.asarray(jnp.inf, dtype),
            lsw=jnp.asarray(-jnp.inf, dtype),
            sum_metro=jnp.zeros((), dtype),
            begin_p=z0_p,
            ckpt_p=jnp.zeros((max_depth + 1, P), dtype),
            ckpt_rho=jnp.zeros((max_depth + 1, P), dtype),
            turning=jnp.asarray(False),
            divergent=jnp.asarray(False),
        )
        # run one leaf unconditionally, then loop
        c = jax.lax.while_loop(sub_cond, sub_body, sub_body(init))
        return c

    def outer_body(t: Carry) -> Carry:
        u_pair = u_depth_table[jnp.minimum(t.depth, max_depth - 1)]
        go_fwd = u_pair[0] < 0.5
        edge_idx = jnp.where(go_fwd, 1, 0)
        sign = jnp.where(go_fwd, 1.0, -1.0).astype(dtype)

        z0_q = t.edge_q[edge_idx]
        z0_p = t.edge_p[edge_idx] * sign  # integrate in +eps with flipped p
        z0_grad = t.edge_grad[edge_idx]

        sub = build_subtree(t.depth, z0_q, z0_p, z0_grad, t.n_leapfrog)

        n_leapfrog = t.n_leapfrog + sub.leaf
        sum_metro = t.sum_metro + sub.sum_metro
        divergent = t.divergent | sub.divergent
        sub_invalid = sub.turning | sub.divergent

        # un-flip subtree quantities back to trajectory direction
        end_p = sub.p * sign
        begin_p = sub.begin_p * sign
        rho_sub = sub.rho_cum * sign

        new_edge_q = t.edge_q.at[edge_idx].set(sub.q)
        new_edge_p = t.edge_p.at[edge_idx].set(end_p)
        new_edge_grad = t.edge_grad.at[edge_idx].set(sub.grad)

        # biased progressive sampling (Stan base_nuts)
        take_sub = jnp.where(
            sub.lsw > t.log_sum_weight,
            True,
            u_pair[1] < jnp.exp(sub.lsw - t.log_sum_weight),
        )
        take_sub = take_sub & ~sub_invalid
        sample_q = jnp.where(take_sub, sub.cand_q, t.sample_q)
        sample_logp = jnp.where(take_sub, sub.cand_logp, t.sample_logp)
        sample_energy = jnp.where(take_sub, sub.cand_energy, t.sample_energy)
        log_sum_weight = jnp.logaddexp(t.log_sum_weight, sub.lsw)

        # generalized u-turn across merged trajectory (Stan 2.21+ checks)
        rho_total = t.rho + rho_sub
        p_sharp_minus = new_edge_p[0] * inv_mass
        p_sharp_plus = new_edge_p[1] * inv_mass
        persist = criterion(p_sharp_minus, p_sharp_plus, rho_total)
        # interface checks: old tree + new subtree boundary momenta
        old_edge_p = t.edge_p[edge_idx]          # interface momentum
        p_sharp_begin = begin_p * inv_mass       # new subtree near edge
        p_sharp_end = end_p * inv_mass           # new subtree far edge
        p_sharp_old_edge = old_edge_p * inv_mass
        rho_iface1 = rho_sub + old_edge_p
        rho_iface2 = t.rho + begin_p
        persist = persist & jnp.where(
            go_fwd,
            criterion(p_sharp_old_edge, p_sharp_end, rho_iface1)
            & criterion(p_sharp_minus, p_sharp_begin, rho_iface2),
            criterion(p_sharp_begin, p_sharp_plus, rho_iface2)
            & criterion(p_sharp_end, p_sharp_old_edge, rho_iface1),
        )

        turning = t.turning | ~persist | sub_invalid

        return Carry(
            # Stan counts only completed (valid) doublings in treedepth__
            depth=t.depth + jnp.where(sub_invalid, 0, 1),
            edge_q=new_edge_q, edge_p=new_edge_p, edge_grad=new_edge_grad,
            rho=rho_total,
            sample_q=sample_q, sample_logp=sample_logp,
            sample_energy=sample_energy,
            log_sum_weight=log_sum_weight,
            sum_metro=sum_metro, n_leapfrog=n_leapfrog,
            divergent=divergent, turning=turning,
            rng=t.rng,
        )

    def outer_cond(t: Carry):
        return (t.depth < max_depth) & ~t.turning & ~t.divergent

    init_carry = Carry(
        depth=jnp.asarray(0, jnp.int32),
        edge_q=edge_q, edge_p=edge_p, edge_grad=edge_grad,
        rho=p0,
        sample_q=state.q, sample_logp=logp0, sample_energy=h0,
        log_sum_weight=jnp.zeros((), dtype),  # initial point has weight 1
        sum_metro=jnp.zeros((), dtype),
        n_leapfrog=jnp.asarray(0, jnp.int32),
        divergent=jnp.asarray(False),
        turning=jnp.asarray(False),
        rng=rng_tree,
    )
    final = jax.lax.while_loop(outer_cond, outer_body, init_carry)

    accept_stat = jnp.where(
        final.n_leapfrog > 0,
        final.sum_metro / final.n_leapfrog.astype(dtype),
        jnp.ones((), dtype),
    )

    # adaptation ------------------------------------------------------------
    # pooled adaptation: chains share one accept signal (pmean over the
    # chain axis), collapsing dual-averaging noise by ~1/sqrt(chains)
    accept_for_da = (
        accept_stat
        if cfg.pooled_axis is None or cfg.pooled_parts == "metric"
        else jax.lax.pmean(accept_stat, cfg.pooled_axis)
    )
    da = jax.lax.cond(
        adapt_stepsize,
        lambda d: da_update(d, accept_for_da, cfg),
        lambda d: d,
        state.da,
    )
    welford = jax.tree_util.tree_map(
        lambda a, b: jnp.where(collect, a, b),
        welford_update(state.welford, final.sample_q),
        state.welford,
    )

    def on_window_end(args):
        da, welford, inv_mass = args
        if cfg.pooled_axis is None or cfg.pooled_parts == "stepsize":
            new_inv_mass = welford_variance(welford)
        else:
            new_inv_mass = pooled_welford_variance(
                welford, cfg.pooled_axis, cfg.pooled_between
            )
        if cfg.window_end_research:
            # re-init stepsize search then restart dual averaging (Stan
            # adapt_diag_e_nuts window-end behavior)
            eps = init_stepsize(
                logdensity_fn, final.sample_q, new_inv_mass,
                jnp.exp(da.log_eps), jax.random.fold_in(rng, 7),
            )
        else:
            eps = jnp.exp(da.log_eps)
        if cfg.pooled_axis is not None and cfg.pooled_parts != "metric":
            # geometric-mean consensus restart point across chains
            eps = jnp.exp(jax.lax.pmean(jnp.log(eps), cfg.pooled_axis))
        new_da = DualAveragingState(
            log_eps=jnp.log(eps),
            log_eps_bar=da.log_eps_bar,
            h_bar=jnp.zeros((), dtype),
            mu=jnp.log(10.0) + jnp.log(eps),
            count=jnp.zeros((), dtype),
        )
        return new_da, welford_init(P, dtype), new_inv_mass

    da, welford, inv_mass = jax.lax.cond(
        window_end,
        on_window_end,
        lambda args: args,
        (da, welford, inv_mass),
    )

    new_state = NutsState(
        q=final.sample_q, inv_mass=inv_mass, da=da, welford=welford
    )
    info = NutsInfo(
        lp=final.sample_logp,
        accept_stat=accept_stat,
        stepsize=stepsize,
        treedepth=final.depth.astype(dtype),
        n_leapfrog=final.n_leapfrog.astype(dtype),
        divergent=final.divergent.astype(dtype),
        energy=final.sample_energy,
    )
    return new_state, info
