"""Standalone NUTS sampling driver (warmup with Stan's windowed adaptation,
then sampling) — used by tests and by the VI/diagnostic tooling; the Gibbs
loop drives ``nuts_transition`` directly instead."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from stan4bart_tpu.ops.nuts import (
    NutsConfig,
    init_stepsize,
    make_adapt_schedule,
    nuts_init,
    nuts_transition,
)


def nuts_sample(logdensity_fn, q0, rng, num_warmup: int, num_samples: int,
                cfg: NutsConfig = NutsConfig(), stepsize0: float = 1.0,
                tune_stepsize: bool = True):
    """-> (positions (num_samples, P), info pytree of (num_samples,) arrays)."""
    q0 = jnp.asarray(q0)
    sched = make_adapt_schedule(num_warmup)
    state = nuts_init(logdensity_fn, q0, stepsize=stepsize0)
    if tune_stepsize:
        rng, rng_eps = jax.random.split(rng)
        eps = init_stepsize(logdensity_fn, q0, state.inv_mass, stepsize0,
                            rng_eps)
        state = state._replace(da=state.da._replace(
            log_eps=jnp.log(eps), mu=jnp.log(10.0 * eps)))

    n_sched = len(sched["adapt_stepsize"])

    @jax.jit
    def warmup_step(carry, it):
        state, rng = carry
        rng, rng_t = jax.random.split(rng)
        state, info = nuts_transition(
            logdensity_fn, state, rng_t, cfg,
            adapt_stepsize=jnp.asarray(sched["adapt_stepsize"])[
                jnp.minimum(it, n_sched - 1)],
            collect=jnp.asarray(sched["collect"])[jnp.minimum(it, n_sched - 1)],
            window_end=jnp.asarray(sched["window_end"])[
                jnp.minimum(it, n_sched - 1)],
        )
        return (state, rng), info

    @jax.jit
    def sample_step(carry, _):
        state, rng = carry
        rng, rng_t = jax.random.split(rng)
        state, info = nuts_transition(
            logdensity_fn, state, rng_t, cfg,
            adapt_stepsize=jnp.asarray(False),
            collect=jnp.asarray(False),
            window_end=jnp.asarray(False),
        )
        return (state, rng), (state.q, info)

    carry = (state, rng)
    if num_warmup > 0:
        carry, _ = jax.lax.scan(warmup_step, carry,
                                jnp.arange(num_warmup))
    carry, (qs, infos) = jax.lax.scan(sample_step, carry, None,
                                      length=num_samples)
    return qs, infos, carry[0]
