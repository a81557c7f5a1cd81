"""What carries lp's autocorrelation?  Decompose the stored lp into its
mechanical components and measure each one's ESS on the same chain:

    lp = -N/2 log(2 pi sigma^2) - RSS/(2 sigma^2) + prior terms
    RSS = |y - stan_offset - eta_param|^2   (stan_offset = BART allfit)

Components stored per draw: lp, sigma, RSS, mean(f), var(f), the
f-vector's lag correlation proxy <f, f_ref>, and eta_param stats.  If
ESS(RSS) ~ ESS(lp) the fit-error relaxation carries it; if ESS(RSS) is
high, the prior terms / sigma coupling carry it.

Env: EXP_N, EXP_TREES, EXP_WARMUP, EXP_DRAWS, EXP_SEED, EXP_LG/LVL/LEAF.
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
SEED = int(os.environ.get("EXP_SEED", "42"))

d = generate_friedman_data(N, ranef=True, causal=True)
df = friedman_dataframe(d)
mf = build_model_frame(
    "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 + X4 | g.1) + (1 | g.2)",
    df,
)
pm, _, _ = build_parametric_model(mf, "gaussian", {"centered_ranef": True})

prog = GibbsProgram(
    pm, BartConfig(num_trees=TREES), mf.y, mf.bart_X,
    warmup=WARMUP, iterations=DRAWS,
    nuts_cfg=NutsConfig(freeze_rule="mid", max_treedepth=6),
    linear_gibbs=os.environ.get("EXP_LG", "1") == "1",
    level_gibbs=os.environ.get("EXP_LVL", "1") == "1",
    leaf_gibbs=int(os.environ.get("EXP_LEAF", "0")),
    leaf_block=int(os.environ.get("EXP_LB", "0")),
)
names = prog.stan_names()
i_sigma = names.index("aux.1")
y = jnp.asarray(mf.y)
f_ref = None  # set after warmup of chain 0


def chain(key):
    state = prog.init_state(key)

    def wbody(state, it):
        state, _ = prog.step(state, it, True)
        return state, None

    state, _ = jax.lax.scan(wbody, state, jnp.arange(WARMUP))
    state = prog._disengage(state)
    fref = state.bart.allfit  # fixed reference fit for lag-correlation

    def sbody(state, it):
        state, draw = prog.step(state, it, False)
        f = draw.bart_train
        c, _ = pm.layout.constrain(state.nuts.q)
        tp = pm.transformed(c)
        eta = pm.parametric_mean(c, tp)
        resid = y - f - eta
        rss = jnp.dot(resid, resid)
        from stan4bart_tpu.ops import bart as bart_ops

        leaves = jnp.sum(state.bart.feature == bart_ops.LEAF, axis=1)
        out = dict(
            lp=draw.stan[0],
            sigma=draw.stan[i_sigma],
            rss=rss,
            f_mean=jnp.mean(f),
            f_var=jnp.var(f),
            f_dot_ref=jnp.dot(f - jnp.mean(f), fref - jnp.mean(fref))
            / len(f),
            eta_mean=jnp.mean(eta),
            n_leaves=jnp.sum(leaves).astype(jnp.float64),
            max_leaves=jnp.max(leaves).astype(jnp.float64),
            # prior-space magnitude of the leaf values (complexity cost)
            leaf_ssq=jnp.sum(jnp.where(
                state.bart.feature == bart_ops.LEAF,
                state.bart.leaf_value, 0.0) ** 2),
        )
        return state, out

    _, outs = jax.lax.scan(sbody, state, jnp.arange(DRAWS))
    return outs


keys = jax.random.split(jax.random.PRNGKey(SEED), CHAINS)
outs = jax.jit(jax.vmap(chain, axis_name="chains"))(keys)
outs = {k: np.asarray(v) for k, v in outs.items()}  # (C, DRAWS)

sig2 = outs["sigma"] ** 2
lp_like = -N / 2 * np.log(sig2) - outs["rss"] / (2 * sig2)
lp_prior = outs["lp"] - lp_like
rss_at_fixed_sigma = outs["rss"] / (2 * np.median(sig2))

series = dict(
    lp=outs["lp"], sigma=outs["sigma"], rss=outs["rss"],
    lp_like=lp_like, lp_prior=lp_prior,
    rss_fixed_sigma=rss_at_fixed_sigma,
    f_mean=outs["f_mean"], f_var=outs["f_var"],
    f_dot_ref=outs["f_dot_ref"], eta_mean=outs["eta_mean"],
    n_leaves=outs["n_leaves"], max_leaves=outs["max_leaves"],
    leaf_ssq=outs["leaf_ssq"],
)
for k, v in series.items():
    print(f"ESS({k}) = {float(ess(jnp.asarray(v))):.0f}   "
          f"mean={v.mean():.4g} sd={v.std():.4g}", flush=True)

# which slow covariate explains the RSS wander?  within-chain correlations
flat = {k: (v - v.mean(axis=1, keepdims=True)).ravel()
        for k, v in series.items()}
for k in ("n_leaves", "leaf_ssq", "f_var", "sigma", "f_dot_ref"):
    r = np.corrcoef(flat["rss"], flat[k])[0, 1]
    rl = np.corrcoef(flat["lp"], flat[k])[0, 1]
    print(f"corr(rss, {k}) = {r:+.3f}   corr(lp, {k}) = {rl:+.3f}",
          flush=True)
