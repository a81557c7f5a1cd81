"""First-class per-phase wall-clock profiling of the Gibbs hot loop.

The reference exposes only whole-phase wall-clock accumulators
(interruptable_sampler.hpp:101-102, warm/sample_delta_t); on TPU the
actionable breakdown is *which compiled region* dominates a Gibbs
iteration — the NUTS transition (whose vmapped cost is the max
trajectory over the chain batch, not the mean) or the sequential BART
sweep.  ``profile_phases`` times three separately-jitted scans on the
live device:

- ``full``  — the production ``GibbsProgram.step`` (post-warmup);
- ``nuts``  — the NUTS transition alone against a frozen offset;
- ``bart``  — the BART sweep alone against a frozen offset/sigma.

``nuts + bart`` < ``full`` indicates glue cost (constrain, offset
rebuild, test prediction); ``full`` >> either phase tells you where the
next kernel consolidation should go.  All numbers are steady-state
(one untimed compile+run precedes timing) and chunked to respect the
~60s single-execution ceiling of the axon tunnel.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from ..ops import bart as bart_ops
from ..ops.nuts import nuts_transition


def profile_phases(prog, states, n_iter: int = 25, repeats: int = 3):
    """Time the Gibbs phases on a batched (vmapped) chain state.

    Parameters
    ----------
    prog : GibbsProgram
    states : a chain-batched GibbsState (e.g. out of warmup)
    n_iter : iterations per timed scan (keep <= 25 on the axon tunnel)
    repeats : timed repetitions; the MIN is reported (steady-state)

    Returns a dict ``{phase: ms_per_iter}`` with keys ``full``,
    ``nuts``, ``bart``, plus ``glue`` (= full - nuts - bart, clamped
    at 0) and ``n_chains``.
    """
    n_chains = int(states.rng.shape[0])
    iters = jnp.arange(n_iter)

    def full_scan(state):
        def body(state, it):
            state, _ = prog.step(state, it, False)
            return state, None
        state, _ = jax.lax.scan(body, state, iters)
        return state

    def nuts_scan(state):
        y_stan = state.latents if prog.is_binary else prog.y
        offset = state.stan_offset

        if prog.use_gram:  # profile the same closure production runs
            anchor = prog.pm.gram_anchor(state.nuts.q, offset, y_stan)

            def logp(u):
                return prog.pm.log_prob_gram(u, anchor)
        else:
            def logp(u):
                return prog.pm.log_prob(u, offset, y_stan)

        f = jnp.asarray(False)

        def body(carry, it):
            nuts, rng = carry
            rng, sub = jax.random.split(rng)
            nuts, _ = nuts_transition(logp, nuts, sub, prog.nuts_cfg,
                                      f, f, f)
            return (nuts, rng), None

        (nuts, _), _ = jax.lax.scan(body, (state.nuts, state.rng), iters)
        return nuts

    def bart_scan(state):
        c, _ = prog.pm.layout.constrain(state.nuts.q)
        tp = prog.pm.transformed(c)
        sigma = (jnp.asarray(1.0, prog.dtype) if prog.is_binary
                 else tp["aux"])
        y_target = (state.latents if prog.is_binary
                    else prog.y) - state.bart_offset

        def body(carry, it):
            bart_state, rng = carry
            rng, sub = jax.random.split(rng)
            if prog.sweep_consts is not None:
                from ..ops.bart_sweep_kernel import bart_sweep_fused

                bart_state, _ = bart_sweep_fused(
                    prog.bart_cfg, bart_state, y_target,
                    prog.sweep_consts, sigma, sub,
                    interpret=prog.sweep_interpret,
                )
            else:
                bart_state, _ = bart_ops.bart_sweep(
                    prog.bart_cfg, bart_state, y_target, prog.ranks,
                    prog.split_probs, sigma, sub, weights=prog.weights,
                )
            return (bart_state, rng), None

        (bart_state, _), _ = jax.lax.scan(body, (state.bart, state.rng),
                                          iters)
        return bart_state

    fns = {
        "full": jax.jit(jax.vmap(full_scan, axis_name="chains")),
        "nuts": jax.jit(jax.vmap(nuts_scan, axis_name="chains")),
        "bart": jax.jit(jax.vmap(bart_scan, axis_name="chains")),
    }
    out = {"n_chains": n_chains, "n_iter": n_iter}
    for name, fn in fns.items():
        jax.block_until_ready(fn(states))  # compile + first run, untimed
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(states))
            best = min(best, time.perf_counter() - t0)
        out[name] = best / n_iter * 1e3  # ms / iteration (whole batch)
    out["glue"] = max(0.0, out["full"] - out["nuts"] - out["bart"])
    return out


def format_profile(p: dict) -> str:
    lines = [
        f"per-iteration wall clock, {p['n_chains']} vmapped chains, "
        f"{p['n_iter']}-iteration scans (ms):"
    ]
    for k in ("full", "nuts", "bart", "glue"):
        share = 100.0 * p[k] / p["full"] if p["full"] else 0.0
        lines.append(f"  {k:5s} {p[k]:8.2f}  ({share:5.1f}%)")
    return "\n".join(lines)
