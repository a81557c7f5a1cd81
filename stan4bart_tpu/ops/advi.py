"""ADVI: automatic differentiation variational inference over any
unconstrained log-density.

The reference vendors Stan's ADVI (/root/reference/src/include/stan/
variational/advi.hpp) but never exposes it; here it is a first-class backend
(BASELINE.json north star: "plus VI and SMC backends for the same models").
Same algorithm family as Kucukelbir et al. (2017): a Gaussian variational
family in the UNCONSTRAINED space (the same space our NUTS kernel samples),
reparameterized ELBO gradients, adagrad-style step sizes with Stan's eta
grid search, and a relative-ELBO-change stopping rule.

Families: "meanfield" N(mu, diag(exp(2 omega))) and "fullrank" N(mu, L L').
Draws from q map through the model's constrain() exactly like NUTS draws,
so the whole extract/fitted/predict surface works unchanged.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class AdviState(NamedTuple):
    mu: jnp.ndarray
    omega: jnp.ndarray       # meanfield: (P,) log-sd; fullrank: (P, P) L
    adagrad: jnp.ndarray     # accumulated squared gradients (pytree-flat)


def _sample_q(mu, omega, rng, n, fullrank):
    P = mu.shape[0]
    z = jax.random.normal(rng, (n, P), mu.dtype)
    if fullrank:
        return mu + z @ omega.T
    return mu + z * jnp.exp(omega)


def _entropy(omega, fullrank):
    if fullrank:
        return jnp.sum(jnp.log(jnp.abs(jnp.diag(omega))))
    return jnp.sum(omega)


def elbo(logdensity_fn, mu, omega, rng, n_mc, fullrank):
    u = _sample_q(mu, omega, rng, n_mc, fullrank)
    lp = jax.vmap(logdensity_fn)(u)
    return jnp.mean(lp) + _entropy(omega, fullrank)


def advi(
    logdensity_fn: Callable,
    num_params: int,
    rng: jax.Array,
    family: str = "meanfield",
    n_mc: int = 10,
    max_iters: int = 2000,
    eta_grid=(100.0, 10.0, 1.0, 0.1, 0.01),
    eta_adapt_iters: int = 40,
    tol_rel_obj: float = 0.01,
    eval_every: int = 50,
    dtype=jnp.float64,
):
    """Optimize the ELBO; returns (mu, omega, info dict).

    Mirrors stan::variational::advi semantics: eta grid search on short
    runs, adagrad updates ``eta / (tau + sqrt(acc))``, stop when the running
    median relative ELBO change < tol_rel_obj.
    """
    if family not in ("meanfield", "fullrank"):
        raise ValueError("family must be 'meanfield' or 'fullrank'")
    fullrank = family == "fullrank"
    P = num_params
    mu0 = jnp.zeros(P, dtype)
    omega0 = (jnp.eye(P, dtype=dtype) if fullrank
              else jnp.zeros(P, dtype))

    def flat(mu, omega):
        return jnp.concatenate([mu, omega.reshape(-1)])

    def unflat(v):
        mu = v[:P]
        omega = (v[P:].reshape(P, P) if fullrank else v[P:])
        return mu, omega

    def neg_elbo(v, rng):
        mu, omega = unflat(v)
        return -elbo(logdensity_fn, mu, omega, rng, n_mc, fullrank)

    grad_fn = jax.value_and_grad(neg_elbo)
    tau = 1.0

    def adagrad_run(eta, v0, n_iters, rng):
        def body(carry, i):
            v, acc = carry
            loss, g = grad_fn(v, jax.random.fold_in(rng, i))
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            # Stan's stepsize: EWMA second-moment + k^(-1/2) decay
            # (stan/variational/advi.hpp adapt semantics)
            acc = jnp.where(i == 0, g * g, 0.9 * acc + 0.1 * g * g)
            step = eta * (i + 1.0) ** -0.5 / (tau + jnp.sqrt(acc))
            v = v - step * g
            if fullrank:
                # keep L lower-triangular with positive-ish diagonal
                mu, L = unflat(v)
                L = jnp.tril(L)
                diag = jnp.diag(L)
                L = L + jnp.diag(jnp.maximum(diag, 1e-8) - diag)
                v = flat(mu, L)
            return (v, acc), loss

        (v, acc), losses = jax.lax.scan(
            body, (v0, jnp.zeros_like(v0)), jnp.arange(n_iters)
        )
        return v, losses

    run = jax.jit(adagrad_run, static_argnums=(2,))

    # Stan's eta grid search: short runs, pick the eta with best final ELBO
    v0 = flat(mu0, omega0)
    best_eta, best_obj = None, jnp.inf
    for i, eta in enumerate(eta_grid):
        rng, rng_try = jax.random.split(rng)
        v_try, losses = run(jnp.asarray(eta, dtype), v0, eta_adapt_iters,
                            rng_try)
        final = losses[-10:].mean()
        if np.isfinite(float(final)) and float(final) < float(best_obj):
            best_eta, best_obj = eta, final
    if best_eta is None:
        raise RuntimeError("ADVI eta search failed: all etas diverged")

    # main run with convergence checks every eval_every iters
    rng, rng_main = jax.random.split(rng)
    v = v0
    acc = jnp.zeros_like(v0)
    history = []
    run_block = jax.jit(
        lambda v, acc, rng, it0: _advi_block(
            grad_fn, v, acc, rng, best_eta, tau, eval_every, fullrank, P,
            it0,
        )
    )
    converged = False
    it = 0
    prev = None
    while it < max_iters:
        rng_main, rng_b = jax.random.split(rng_main)
        v, acc, mean_loss = run_block(v, acc, rng_b, float(it))
        cur = float(mean_loss)
        history.append(cur)
        if prev is not None and np.isfinite(cur) and np.isfinite(prev):
            rel = abs(cur - prev) / max(abs(prev), 1e-12)
            if rel < tol_rel_obj:
                converged = True
                it += eval_every
                break
        prev = cur
        it += eval_every

    mu, omega = unflat(v)
    return mu, omega, dict(
        eta=best_eta, converged=converged, iters=it,
        elbo=-history[-1] if history else np.nan, history=history,
        family=family,
    )


def _advi_block(grad_fn, v, acc, rng, eta, tau, n_iters, fullrank, P,
                it_offset):
    def body(carry, i):
        v, acc = carry
        loss, g = grad_fn(v, jax.random.fold_in(rng, i))
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        k = it_offset + i + 1.0
        acc = jnp.where(k == 1.0, g * g, 0.9 * acc + 0.1 * g * g)
        step = eta * k**-0.5 / (tau + jnp.sqrt(acc))
        v = v - step * g
        if fullrank:
            mu = v[:P]
            L = jnp.tril(v[P:].reshape(P, P))
            diag = jnp.diag(L)
            L = L + jnp.diag(jnp.maximum(diag, 1e-8) - diag)
            v = jnp.concatenate([mu, L.reshape(-1)])
        return (v, acc), loss

    (v, acc), losses = jax.lax.scan(body, (v, acc), jnp.arange(n_iters))
    return v, acc, jnp.mean(losses[-max(n_iters // 2, 1):])


def advi_draws(mu, omega, rng, n_draws, family="meanfield"):
    """Sample n_draws from the fitted variational family."""
    return _sample_q(mu, omega, rng, n_draws, family == "fullrank")
