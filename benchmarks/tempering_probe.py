"""Parallel-tempering probe for the lp/complexity ESS floor.

Round-3 decomposition (BENCH_NOTES): the lp floor survives three exact
local kernels (regrow, directional leaf, blocked leaf) — the slow mode
is the BART ensemble-complexity relaxation (ESS(n_leaves) ~ 5).  The
named escalation is replica exchange: hot rungs explore complexity at
prior-dominated speed and swaps teleport the cold chain.

For the GAUSSIAN family the power posterior [lik]^beta * prior is
EXACTLY the model with uniform likelihood weights w_i = beta (y_i ~
N(., sigma^2/beta)), which GibbsProgram already samples (the weighted
sweep + weighted parametric likelihood).  One GibbsProgram per rung;
swaps exchange the MODEL state between rung slots (q, BART state,
offsets, latents) while leaving each slot's adapted kernel (stepsize,
metric, rng) in place — a symmetric deterministic-exchange MH with
log-accept (beta_a - beta_b) * (l(x_b) - l(x_a)), l = the UNWEIGHTED
Gaussian log-likelihood (priors cancel; kernels per slot stay fixed, so
the composition remains pi-invariant on the product space).  Swaps run
post-warmup only (adjacent pairs, even/odd alternation).

Verdict metric: ESS(lp)/ESS(n_leaves) on the COLD rung vs an
equal-compute baseline (the probe costs R rungs per cold chain, so the
win condition is an ESS gain > R).

Env: EXP_N, EXP_TREES, EXP_WARMUP, EXP_DRAWS, EXP_RUNGS, EXP_BETA_MIN,
EXP_SWAP_EVERY, EXP_SEED.
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from stan4bart_tpu.formula import build_model_frame
from stan4bart_tpu.gibbs import GibbsProgram
from stan4bart_tpu.models.assemble import build_parametric_model
from stan4bart_tpu.ops.bart import BartConfig, LEAF
from stan4bart_tpu.ops.nuts import NutsConfig
from stan4bart_tpu.parallel.diagnostics import ess
from stan4bart_tpu.utils.friedman import (
    friedman_dataframe,
    generate_friedman_data,
)

N = int(os.environ.get("EXP_N", "2000"))
TREES = int(os.environ.get("EXP_TREES", "50"))
CHAINS = 4
WARMUP = int(os.environ.get("EXP_WARMUP", "400"))
DRAWS = int(os.environ.get("EXP_DRAWS", "1200"))
R = int(os.environ.get("EXP_RUNGS", "6"))
BETA_MIN = float(os.environ.get("EXP_BETA_MIN", "0.65"))
SWAP_EVERY = int(os.environ.get("EXP_SWAP_EVERY", "5"))
SEED = int(os.environ.get("EXP_SEED", "42"))

BETAS = np.geomspace(1.0, BETA_MIN, R)

d = generate_friedman_data(N, ranef=True, causal=True)
df = friedman_dataframe(d)
y = None
progs, steps, lls = [], [], []
for r, beta in enumerate(BETAS):
    mf = build_model_frame(
        "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 + X4 | g.1) "
        "+ (1 | g.2)", df,
        weights=np.full(N, beta),
    )
    pm, _, _ = build_parametric_model(mf, "gaussian",
                                      {"centered_ranef": True})
    prog = GibbsProgram(
        pm, BartConfig(num_trees=TREES), mf.y, mf.bart_X,
        weights=mf.weights,
        warmup=WARMUP, iterations=DRAWS,
        nuts_cfg=NutsConfig(freeze_rule="mid", max_treedepth=6),
        linear_gibbs=True, level_gibbs=True,
    )
    progs.append(prog)
    y = jnp.asarray(mf.y)

    def make_step(prog):
        def chunk(state, it0, k, is_warmup):
            def body(state, i):
                state, draw = prog.step(state, it0 + i, is_warmup)
                return state, draw.stan

            return jax.lax.scan(body, state, jnp.arange(k))

        warm = jax.jit(jax.vmap(
            lambda s, it0, k: chunk(s, it0, k, True),
            in_axes=(0, None, None), axis_name="chains"),
            static_argnums=(2,))
        samp = jax.jit(jax.vmap(
            lambda s, it0, k: chunk(s, it0, k, False),
            in_axes=(0, None, None), axis_name="chains"),
            static_argnums=(2,))
        return warm, samp

    steps.append(make_step(prog))

    def make_ll(prog, pm):
        def ll(state):
            c, _ = pm.layout.constrain(state.nuts.q)
            tp = pm.transformed(c)
            eta = pm.parametric_mean(c, tp) + state.bart.allfit
            sigma = tp["aux"]
            resid = prog.y - eta
            return (-0.5 * prog.N * jnp.log(2.0 * jnp.pi * sigma * sigma)
                    - jnp.dot(resid, resid) / (2.0 * sigma * sigma))

        return jax.jit(jax.vmap(ll))

    lls.append(make_ll(prog, pm))


def swap_state(sa, sb):
    """Exchange MODEL state between two single-chain slices; keep each
    slot's kernel (da, inv_mass, rng, vi)."""
    nuts_a = sa.nuts._replace(q=sb.nuts.q)
    nuts_b = sb.nuts._replace(q=sa.nuts.q)
    return (sa._replace(nuts=nuts_a, bart=sb.bart,
                        bart_offset=sb.bart_offset,
                        stan_offset=sb.stan_offset, latents=sb.latents),
            sb._replace(nuts=nuts_b, bart=sa.bart,
                        bart_offset=sa.bart_offset,
                        stan_offset=sa.stan_offset, latents=sa.latents))


def tree_get(tree, c):
    return jax.tree_util.tree_map(lambda a: a[c], tree)


def tree_set(tree, c, val):
    return jax.tree_util.tree_map(
        lambda a, v: a.at[c].set(v) if hasattr(a, "at")
        else np.asarray(a), tree, val)


def run(tempered: bool, seed):
    rng = np.random.default_rng(seed + 1)
    n_rungs = R if tempered else 1
    states = []
    for r in range(n_rungs):
        keys = jax.random.split(
            jax.random.PRNGKey(seed + 1000 * r), CHAINS)
        states.append(jax.jit(jax.vmap(progs[r].init_state,
                                       axis_name="chains"))(keys))
    # warmup each rung independently (no swaps during adaptation)
    for r in range(n_rungs):
        warm, _ = steps[r]
        s, _ = warm(states[r], 0, WARMUP)
        states[r] = progs[r]._disengage(s)

    cold_rows = []
    n_acc = n_try = 0
    it = 0
    while it < DRAWS:
        k = min(SWAP_EVERY, DRAWS - it)
        for r in range(n_rungs):
            _, samp = steps[r]
            states[r], rows = samp(states[r], it, k)
            if r == 0:
                cold_rows.append(np.asarray(rows))
        it += k
        if tempered:
            # adjacent swaps, alternating parity, chain-matched slots
            l_by = [np.array(lls[r](states[r])) for r in range(n_rungs)]
            start = (it // SWAP_EVERY) % 2
            for a in range(start, n_rungs - 1, 2):
                b = a + 1
                for c in range(CHAINS):
                    dlog = (BETAS[a] - BETAS[b]) * (l_by[b][c]
                                                    - l_by[a][c])
                    n_try += 1
                    if np.log(rng.uniform()) < dlog:
                        n_acc += 1
                        sa = tree_get(states[a], c)
                        sb = tree_get(states[b], c)
                        sa2, sb2 = swap_state(sa, sb)
                        states[a] = tree_set(states[a], c, sa2)
                        states[b] = tree_set(states[b], c, sb2)
                        l_by[a][c], l_by[b][c] = l_by[b][c], l_by[a][c]
    stan = np.concatenate(cold_rows, axis=1)   # (C, DRAWS, P)
    return stan, (n_acc / max(n_try, 1))


names = progs[0].stan_names()
i_sig = names.index("aux.1")


def report(label, stan, acc):
    lp = jnp.asarray(stan[:, :, 0])
    sig = jnp.asarray(stan[:, :, i_sig])
    print(f"{label}: ESS(lp)={float(ess(lp)):.0f} "
          f"ESS(sigma)={float(ess(sig)):.0f} "
          f"mean(sigma)={np.asarray(sig).mean():.4f} "
          f"mean(lp)={np.asarray(lp).mean():.1f} "
          f"swap_acc={acc:.2f}", flush=True)


import time

t0 = time.time()
stan_b, _ = run(False, SEED)
print(f"# baseline wall {time.time() - t0:.0f}s", flush=True)
report("baseline (1 rung)", stan_b, 0.0)
t0 = time.time()
stan_t, acc = run(True, SEED)
print(f"# tempered wall {time.time() - t0:.0f}s "
      f"(x{R} rungs; win condition: ESS gain > {R})", flush=True)
report(f"tempered ({R} rungs, beta_min {BETA_MIN})", stan_t, acc)
