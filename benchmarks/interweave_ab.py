"""Interweaving-kernel ESS A/B (docs/interweaving.md methodology).

Per-config watchlist ESS on the Friedman causal/multilevel headline:
lp, sigma, each beta, first b, first theta_L, plus posterior means.
Defaults: n=2000, 50 trees, 4 chains, 300 warmup + 600 draws, f64 CPU.
Env: EXP_N / EXP_TREES / EXP_WARMUP / EXP_DRAWS / EXP_CONFIGS
(comma-list from base, lg, lg+sg, lvl, lg+lvl, lg+sg+lvl).

Round-2 measured table lives in BENCH_NOTES.md ("Conjugate interweaving
pair"); re-run this to reproduce it.
"""
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from stan4bart_tpu.formula import build_model_frame
from stan4bart_tpu.gibbs import GibbsProgram
from stan4bart_tpu.models.assemble import build_parametric_model
from stan4bart_tpu.ops.bart import BartConfig
from stan4bart_tpu.ops.nuts import NutsConfig
from stan4bart_tpu.parallel.diagnostics import ess
from stan4bart_tpu.utils.friedman import (
    friedman_dataframe,
    generate_friedman_data,
)

N = int(os.environ.get("EXP_N", "2000"))
TREES = int(os.environ.get("EXP_TREES", "50"))
CHAINS = 4
WARMUP = int(os.environ.get("EXP_WARMUP", "300"))
DRAWS = int(os.environ.get("EXP_DRAWS", "600"))

d = generate_friedman_data(N, ranef=True, causal=True)
df = friedman_dataframe(d)
mf = build_model_frame(
    "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 + X4 | g.1) + (1 | g.2)",
    df,
)
pm, _, _ = build_parametric_model(mf, "gaussian", {"centered_ranef": True})

configs = {
    # pin the pair OFF: the package default is auto-on for eligible
    # models, which would silently turn "base" into lg+lvl
    "base": dict(linear_gibbs=False, level_gibbs=False),
    # single-kernel arms pin the partner OFF (an explicit True would
    # otherwise auto-activate the other half of the pair)
    "lg": dict(linear_gibbs=True, level_gibbs=False),
    "lg+sg": dict(linear_gibbs=True, level_gibbs=False,
                  sigma_gibbs=True),
    "lvl": dict(level_gibbs=True, linear_gibbs=False),
    "lg+lvl": dict(linear_gibbs=True, level_gibbs=True),
    "lg+sg+lvl": dict(linear_gibbs=True, sigma_gibbs=True,
                      level_gibbs=True),
    # ensemble-wide conjugate leaf refresh (GibbsProgram.leaf_gibbs):
    # N Walsh-direction rank-T draws per iteration on top of the pair
    "leaf1": dict(linear_gibbs=False, level_gibbs=False, leaf_gibbs=1),
    "lg+lvl+leaf1": dict(linear_gibbs=True, level_gibbs=True,
                         leaf_gibbs=1),
    "lg+lvl+leaf2": dict(linear_gibbs=True, level_gibbs=True,
                         leaf_gibbs=2),
    "lg+lvl+leaf4": dict(linear_gibbs=True, level_gibbs=True,
                         leaf_gibbs=4),
    # FULL blocked leaf draw every k iterations (GibbsProgram.leaf_block)
    "lg+lvl+lb1": dict(linear_gibbs=True, level_gibbs=True, leaf_block=1),
    "lg+lvl+lb2": dict(linear_gibbs=True, level_gibbs=True, leaf_block=2),
    "lg+lvl+lb5": dict(linear_gibbs=True, level_gibbs=True, leaf_block=5),
    "lb1": dict(linear_gibbs=False, level_gibbs=False, leaf_block=1),
}
sel = os.environ.get("EXP_CONFIGS")
if sel:
    configs = {k: v for k, v in configs.items() if k in sel.split(",")}

# EXP_REGROW: p_regrow for the subtree-regrow tree kernel (ops/bart.
# _subtree_regrow) — targets the lp/sigma ESS floor carried by the tree
# ensemble's structure relaxation.  Forces the XLA sweep path.
P_REGROW = float(os.environ.get("EXP_REGROW", "0"))
# EXP_RPS: random-scan single-tree regrow refreshes per sweep (the cheap
# production shape); EXP_SEED: chain-key seed for replication
RPS = int(os.environ.get("EXP_RPS", "0"))
SEED = int(os.environ.get("EXP_SEED", "42"))

for label, kw in configs.items():
    prog = GibbsProgram(
        pm, BartConfig(num_trees=TREES, p_regrow=P_REGROW,
                       regrow_per_sweep=RPS),
        mf.y, mf.bart_X,
        warmup=WARMUP, iterations=DRAWS,
        nuts_cfg=NutsConfig(freeze_rule="mid", max_treedepth=6),
        **kw,
    )
    names = prog.stan_names()
    rows = {"lp": 0, "sigma": names.index("aux.1")}
    for i, n_ in enumerate(names):
        if n_.startswith("beta"):
            rows[n_] = i
    rows["b.1"] = next(i for i, n_ in enumerate(names) if n_.startswith("b."))
    rows["theta_L.1"] = next(i for i, n_ in enumerate(names)
                             if n_.startswith("theta_L"))

    def chain(key):
        state = prog.init_state(key)

        def wbody(state, it):
            state, _ = prog.step(state, it, True)
            return state, None

        state, _ = jax.lax.scan(wbody, state, jnp.arange(WARMUP))
        state = prog._disengage(state)

        def sbody(state, it):
            state, draw = prog.step(state, it, False)
            return state, draw.stan

        _, stan = jax.lax.scan(sbody, state, jnp.arange(DRAWS))
        return stan  # (DRAWS, P)

    keys = jax.random.split(jax.random.PRNGKey(SEED), CHAINS)
    t0 = time.time()
    stan = jax.jit(jax.vmap(chain, axis_name="chains"))(keys)
    stan = np.asarray(jax.block_until_ready(stan))  # (C, DRAWS, P)
    dt = time.time() - t0
    out = [f"{label}: {dt:.0f}s"]
    for nm, i in rows.items():
        e = float(ess(jnp.asarray(stan[:, :, i])))
        out.append(f"ESS({nm})={e:.0f}")
    out.append(f"mean(sigma)={stan[:, :, rows['sigma']].mean():.3f}")
    for nm, i in rows.items():
        if nm.startswith("beta"):
            out.append(f"mean({nm})={stan[:, :, i].mean():.3f}")
    print(" ".join(out), flush=True)
