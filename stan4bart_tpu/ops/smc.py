"""Tempered SMC sampler over any unconstrained log-density.

An extension backend with no counterpart in the reference (SMC is a
new-build target named in BASELINE.json's north star; the reference only
vendors ADVI/L-BFGS as alternative inference precedents).  Design: the
particle axis IS the chain axis — the same mesh dimension used to shard
Gibbs chains shards SMC particles, and all reductions (ESS, normalization,
resampling) are collectives over it.

Algorithm (Del Moral et al. 2006 adaptive-tempering flavor):

* geometric bridge  log pi_t(u) = (1 - t) log N(u; 0, I) + t logp(u);
* next temperature chosen by bisection so the incremental-weight ESS stays
  near ``target_ess_frac * n_particles``;
* systematic resampling;
* rejuvenation by a few HMC steps targeting pi_t with a stepsize scaled
  from the particle cloud's variance.

Fully jittable: the tempering loop is a ``lax.while_loop`` with a maximum
stage count; bisection is a fixed-iteration inner loop.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class SmcResult(NamedTuple):
    particles: jnp.ndarray     # (n_particles, P)
    log_evidence: jnp.ndarray  # estimate of log normalizing constant ratio
    n_stages: jnp.ndarray
    final_temp: jnp.ndarray


def _log_base(u):
    return -0.5 * jnp.sum(u * u, axis=-1)


def _ess_from_logw(logw):
    logw = logw - jax.scipy.special.logsumexp(logw)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * logw))


def _systematic_resample(rng, logw, n):
    logw = logw - jax.scipy.special.logsumexp(logw)
    w = jnp.exp(logw)
    positions = (jax.random.uniform(rng) + jnp.arange(n)) / n
    cum = jnp.cumsum(w)
    return jnp.searchsorted(cum, positions)


def smc_sample(
    logdensity_fn: Callable,
    num_params: int,
    n_particles: int,
    rng: jax.Array,
    max_stages: int = 100,
    target_ess_frac: float = 0.5,
    n_mcmc: int = 5,
    n_leapfrog: int = 10,
    bisect_iters: int = 26,
    dtype=jnp.float64,
) -> SmcResult:
    P = num_params
    rng, rng_init = jax.random.split(rng)
    u = jax.random.normal(rng_init, (n_particles, P), dtype)

    logp_fn = jax.vmap(logdensity_fn)
    grad_fn = jax.vmap(jax.grad(logdensity_fn))

    def bridge_logpdf(u, t):
        return (1.0 - t) * _log_base(u) + t * logp_fn(u)

    def bridge_grad(u, t):
        return (1.0 - t) * (-u) + t * grad_fn(u)

    def next_temp(u, t):
        """Bisection: largest t' in (t, 1] with incremental ESS >= target."""
        lp = logp_fn(u) - _log_base(u)

        def ess_at(t_new):
            return _ess_from_logw((t_new - t) * lp)

        target = target_ess_frac * n_particles

        def body(i, bounds):
            lo, hi = bounds
            mid = 0.5 * (lo + hi)
            ok = ess_at(mid) >= target
            return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

        full = ess_at(jnp.asarray(1.0, dtype)) >= target
        lo, hi = jax.lax.fori_loop(
            0, bisect_iters, body,
            (t, jnp.asarray(1.0, dtype)),
        )
        return jnp.where(full, 1.0, lo)

    def rejuvenate(u, t, rng):
        """n_mcmc HMC steps targeting pi_t."""
        scale = jnp.std(u, axis=0) + 1e-6
        eps = 0.3 * scale / n_leapfrog ** 0.5

        def one_step(u, rng):
            rng_p, rng_a = jax.random.split(rng)
            p0 = jax.random.normal(rng_p, u.shape, dtype)
            lp0 = bridge_logpdf(u, t)
            h0 = -lp0 + 0.5 * jnp.sum(p0 * p0, axis=-1)

            def leap(carry, _):
                q, p = carry
                p = p + 0.5 * eps * bridge_grad(q, t)
                q = q + eps * p
                p = p + 0.5 * eps * bridge_grad(q, t)
                return (q, p), None

            (q_new, p_new), _ = jax.lax.scan(leap, (u, p0), None,
                                             length=n_leapfrog)
            h_new = -bridge_logpdf(q_new, t) + 0.5 * jnp.sum(
                p_new * p_new, axis=-1
            )
            log_acc = h0 - h_new
            accept = (jnp.log(jax.random.uniform(
                rng_a, (u.shape[0],), dtype)) < log_acc)
            return jnp.where(accept[:, None], q_new, u)

        def body(carry, i):
            u, rng = carry
            rng, rng_s = jax.random.split(rng)
            return (one_step(u, rng_s), rng), None

        (u, _), _ = jax.lax.scan(body, (u, rng), jnp.arange(n_mcmc))
        return u

    class Carry(NamedTuple):
        u: jnp.ndarray
        t: jnp.ndarray
        log_Z: jnp.ndarray
        stage: jnp.ndarray
        rng: jax.Array

    def cond(c: Carry):
        return (c.t < 1.0) & (c.stage < max_stages)

    def body(c: Carry) -> Carry:
        rng, rng_r, rng_m = jax.random.split(c.rng, 3)
        t_new = next_temp(c.u, c.t)
        lw = (t_new - c.t) * (logp_fn(c.u) - _log_base(c.u))
        log_Z = c.log_Z + (
            jax.scipy.special.logsumexp(lw) - jnp.log(float(n_particles))
        )
        idx = _systematic_resample(rng_r, lw, n_particles)
        u = c.u[idx]
        u = rejuvenate(u, t_new, rng_m)
        return Carry(u=u, t=t_new, log_Z=log_Z, stage=c.stage + 1, rng=rng)

    init = Carry(
        u=u, t=jnp.asarray(0.0, dtype), log_Z=jnp.asarray(0.0, dtype),
        stage=jnp.asarray(0, jnp.int32), rng=rng,
    )
    final = jax.lax.while_loop(cond, body, init)
    return SmcResult(
        particles=final.u,
        log_evidence=final.log_Z,
        n_stages=final.stage,
        final_temp=final.t,
    )
