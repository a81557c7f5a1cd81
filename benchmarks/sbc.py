"""Simulation-based calibration (SBC) of the COMPOSED sampler.

Certifies the full Gibbs kernel stack at once — the strongest in-image
substitute for the unverifiable "match R/stan4bart within MC error" north
star (BASELINE.md; the density certified is the reference's
continuous.stan:344-429 joint with the CGM tree prior):

    theta~ ~ p(theta);  y ~ p(y | theta~);  fit;  rank(theta~ | draws)

If and only if the sampler targets the exact posterior, ranks are uniform
over {0..L} (Talts et al. 2018).  Each cell of the model matrix
(continuous / probit, weights, QR, decov p=1 & p=2, lkj, interweave
on/off, the blocked-leaf kernel) runs R independent replications; ranks
are gated per quantity with a chi-square over B bins at alpha = 1e-3.

Requirements for validity, all handled here:
- the prior must be generative: sigma_mu_fixed pins the BART leaf prior
  (the default range(y)-scaled sigma_mu is data-dependent), priors are
  explicit with autoscale off, and theta~ is drawn by
  ParametricModel.prior_draw_unconstrained — the exact block-by-block
  complement of _prior_lp;
- posterior draws are thinned to ~independence (thin=5 at this model
  size; autocorrelation inflates rank clumping, biasing the gate
  CONSERVATIVELY toward failure, never toward a false pass);
- each rep jits ONE compiled program reused across reps (y enters as a
  traced argument via the program's y attribute).

Usage: python benchmarks/sbc.py [--reps 128] [--cells a,b,...] [--out SBC.json]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import pandas as pd

from stan4bart_tpu.formula import build_model_frame
from stan4bart_tpu.gibbs import GibbsProgram
from stan4bart_tpu.models import priors
from stan4bart_tpu.models.assemble import build_parametric_model
from stan4bart_tpu.ops import bart as bart_ops
from stan4bart_tpu.ops.bart import BartConfig

N_OBS = 100
WARMUP = 300
ITERS = 495
THIN = 5
L = ITERS // THIN  # 99 -> ranks in {0..99}, 10 exact bins
BINS = 10
SIGMA_MU = 0.3


def covariate_frame(n, seed):
    """Fixed covariates (shared by every rep of a cell; only y varies)."""
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "X1": rng.uniform(size=n),
        "X2": rng.uniform(size=n),
        "X4": rng.normal(size=n),
        "X5": rng.normal(size=n),
        "g": pd.Categorical(rng.integers(0, 8, size=n)),
        "y": np.zeros(n),
    })


def base_priors():
    return dict(
        prior=priors.normal(0.0, 2.5, autoscale=False),
        prior_aux=priors.exponential(1.0, autoscale=False),
        prior_covariance=priors.decov(regularization=1.0,
                                      concentration=1.0,
                                      shape=1.0, scale=0.5),
    )


def lkj_priors():
    pc = priors.lkj(regularization=1.0, df=3.0, scale=0.5, autoscale=False)
    return dict(
        prior=priors.normal(0.0, 2.5, autoscale=False),
        prior_aux=priors.exponential(1.0, autoscale=False),
        prior_covariance=pc,
    )


# formula with both a scalar-intercept term (p=1 decov) and a
# correlated-slope term (p=2: exercises zeta/rho onion ladder)
F_MULTI = "y ~ bart(X1 + X2) + X4 + (1 + X4 | g)"
F_SIMPLE = "y ~ bart(X1 + X2) + X4 + (1 | g)"

CELLS = {
    # reference-parity sampler class, multi-column decov
    "continuous": dict(formula=F_MULTI, binary=False, weights=False,
                       stan_args={"linear_gibbs": False,
                                  "level_gibbs": False}),
    "probit": dict(formula=F_MULTI, binary=True, weights=False,
                   stan_args={"linear_gibbs": False,
                              "level_gibbs": False}),
    "weights": dict(formula=F_SIMPLE, binary=False, weights=True,
                    stan_args={"linear_gibbs": False,
                               "level_gibbs": False}),
    # QR needs >= 2 fixed-effect predictors (stan4bart_fit.R:241-242)
    "qr": dict(formula="y ~ bart(X1 + X2) + X4 + X5 + (1 + X4 | g)",
               binary=False, weights=False,
               stan_args={"qr": True, "linear_gibbs": False,
                          "level_gibbs": False}),
    # lkj runs with the production interweave pair ON: with it off, the
    # ~10% of prior reps with sigma ~ exp(1) near 0 (near-noiseless data)
    # relax sigma too slowly for L=99 thinned ranks and pile up at rank 0
    # (a MIXING artifact at extreme SNR, conservative direction — the
    # decov cells certify the interweave-off stack; measured: min_p
    # 7.5e-4 off / passing on, aux.1 bin-0 spike 33/160 vs 16 expected)
    "lkj": dict(formula=F_MULTI, binary=False, weights=False,
                prior_cov="lkj",
                stan_args={"linear_gibbs": True, "level_gibbs": True}),
    # the full production kernel stack: conjugate interweaving pair on
    "interweave": dict(formula=F_MULTI, binary=False, weights=False,
                       stan_args={"linear_gibbs": True,
                                  "level_gibbs": True}),
    # the round-3 blocked-leaf kernel, applied every 2nd iteration
    "leaf_block": dict(formula=F_MULTI, binary=False, weights=False,
                       stan_args={"linear_gibbs": True,
                                  "level_gibbs": True, "leaf_block": 2}),
    # ---- round-5 cells: the f32 FUSED-KERNEL production stack --------
    # (the numeric stack that produces the chip headline: float32, the
    # Mosaic sweep bodies in their exact interpret mode, maxdepth
    # matching the production cap style).  Previously only the
    # f64/XLA-sweep stack was rank-calibrated; the chip path was gated
    # by correlation/ppd checks alone.
    "kernel_f32": dict(formula=F_MULTI, binary=False, weights=False,
                       dtype="float32", sweep_kernel=True,
                       stan_args={"linear_gibbs": True,
                                  "level_gibbs": True}),
    "kernel_f32_probit": dict(formula=F_MULTI, binary=True,
                              weights=False, dtype="float32",
                              sweep_kernel=True,
                              stan_args={"linear_gibbs": False,
                                         "level_gibbs": False}),
    # obs-tiled body via the chain-blocked batch driver (chain_block=1),
    # tiled threshold forced below n so the grid-over-observation-tiles
    # body is the one certified
    "kernel_f32_tiled": dict(formula=F_MULTI, binary=False,
                             weights=False, dtype="float32",
                             sweep_kernel=True, driver="batched",
                             env={"S4B_SWEEP_TILED_MIN_NPAD": "64"},
                             stan_args={"linear_gibbs": True,
                                        "level_gibbs": True}),
}


def build_cell(cell, seed=0):
    for k, v in cell.get("env", {}).items():
        os.environ[k] = v
    df = covariate_frame(N_OBS, seed)
    w = (np.linspace(0.5, 2.0, N_OBS) if cell["weights"] else None)
    mf = build_model_frame(cell["formula"], df, weights=w)
    family = "binomial" if cell["binary"] else "gaussian"
    sa = dict(base_priors() if cell.get("prior_cov") != "lkj"
              else lkj_priors())
    sa.update(cell.get("stan_args", {}))
    dtype = jnp.dtype(cell.get("dtype", "float64"))
    pm, resolved, _ = build_parametric_model(mf, family, sa, dtype=dtype)
    cfg = BartConfig(num_trees=8, max_depth=3, n_cuts=50,
                     node_scale=0.5, sigma_mu_fixed=SIGMA_MU)
    prog = GibbsProgram(
        pm, cfg, mf.y, mf.bart_X,
        weights=mf.weights if cell["weights"] else None,
        warmup=WARMUP, iterations=ITERS, dtype=dtype,
        sweep_kernel=cell.get("sweep_kernel", False),
        linear_gibbs=resolved.linear_gibbs,
        level_gibbs=resolved.level_gibbs,
        leaf_gibbs=resolved.leaf_gibbs,
        leaf_block=resolved.leaf_block,
        sigma_gibbs=resolved.sigma_gibbs,
    )
    if cell.get("sweep_kernel"):
        assert prog.sweep_interpret, "SBC kernel cells must run the " \
            "exact interpret mode (CPU)"
        if cell.get("driver") == "batched":
            assert prog.sweep_tiled, "tiled cell must select the " \
                "obs-tiled body (check S4B_SWEEP_TILED_MIN_NPAD)"
    return mf, pm, prog, cfg


def rank_quantities(pm, prog, cfg, binary):
    """Names ranked in this cell: sigma, the fixed effect, covariance
    entries, two ranef coords, plus BART-fit functionals."""
    cn = pm.constrained_names()
    names = []
    if not binary:
        names.append("aux.1")
    names += [n for n in cn if n.startswith("beta.")][:2]
    names += [n for n in cn if n.startswith("theta_L.")][:3]
    names += [n for n in cn if n.startswith("b.")][:2]
    return names


def make_rep_fn(mf, pm, prog, cfg, binary, driver=None):
    T, M = cfg.num_trees, cfg.max_nodes
    stan_cols = {n: i for i, n in enumerate(prog.stan_names())}
    cnames = pm.constrained_names()
    cidx = {n: i for i, n in enumerate(cnames)}
    rnames = rank_quantities(pm, prog, cfg, binary)
    keys_out = rnames + ["f.0", "f.1", "f.mean"]
    w = prog.weights

    def rep(key):
        kp, kt, kl, kn, kc = jax.random.split(key, 5)
        u_t = pm.prior_draw_unconstrained(kp)
        c, _ = pm.layout.constrain(u_t)
        tp = pm.transformed(c)
        mean = pm.parametric_mean(c, tp)
        bs = bart_ops.sample_trees_from_prior(
            cfg, kt, prog.ranks, prog.split_probs, dtype=prog.dtype)
        leaf_mask = (bs.feature == bart_ops.LEAF).astype(prog.dtype)
        lv = SIGMA_MU * jax.random.normal(kl, leaf_mask.shape,
                                          prog.dtype) * leaf_mask
        f = jnp.take_along_axis(lv, bs.leaf_idx, axis=1).sum(0)
        eta = mean + f
        eps = jax.random.normal(kn, (prog.N,), prog.dtype)
        if binary:
            y = (eta + eps > 0).astype(prog.dtype)
        else:
            sd = tp["aux"] / (jnp.sqrt(w) if w is not None else 1.0)
            y = eta + sd * eps
        prog.y = y  # traced argument via attribute capture
        if driver == "batched":
            # chain-blocked batch driver at chain_block=1: the obs-tiled
            # fused body (interpret mode = exact jax ops, vmappable)
            _, draws = prog.run_chains_batched(
                kc[None], keep_warmup=False, chain_block=1)
            stan = draws.stan[0, THIN - 1 :: THIN]
            ftr = draws.bart_train[0, THIN - 1 :: THIN]
        else:
            _, draws = prog.run_chain(kc, keep_warmup=False)
            stan = draws.stan[THIN - 1 :: THIN]
            ftr = draws.bart_train[THIN - 1 :: THIN]
        theta_vec = pm.constrained_draw(u_t)
        ranks = []
        for n in rnames:
            ranks.append(jnp.sum(
                stan[:, stan_cols[n]] < theta_vec[cidx[n]]))
        ranks.append(jnp.sum(ftr[:, 0] < f[0]))
        ranks.append(jnp.sum(ftr[:, 1] < f[1]))
        ranks.append(jnp.sum(ftr.mean(1) < f.mean()))
        return jnp.stack(ranks)

    return rep, keys_out


def chi2_pvalue(ranks, n_values=L + 1, bins=BINS):
    """Exact-expected-count chi-square over rank bins."""
    from scipy.stats import chi2

    edges = np.arange(n_values + 1) * bins // n_values
    # bin of rank r = r * bins // n_values; expected = width / n_values
    binned = np.asarray(ranks) * bins // n_values
    counts = np.bincount(binned, minlength=bins)
    widths = np.bincount(np.arange(n_values) * bins // n_values,
                         minlength=bins)
    exp = len(ranks) * widths / n_values
    stat = float(np.sum((counts - exp) ** 2 / exp))
    return stat, float(chi2.sf(stat, bins - 1)), counts.tolist(), edges is None


def run_cell(name, cell, n_reps, seed, batch=8, verbose=True):
    mf, pm, prog, cfg = build_cell(cell, seed=seed)
    rep, qnames = make_rep_fn(mf, pm, prog, cfg, cell["binary"],
                              driver=cell.get("driver"))
    rep_batch = jax.jit(jax.vmap(rep))
    all_ranks = []
    t0 = time.time()
    master = jax.random.PRNGKey(seed + 0x5BC)
    for b0 in range(0, n_reps, batch):
        nb = min(batch, n_reps - b0)
        keys = jax.random.split(jax.random.fold_in(master, b0), nb)
        all_ranks.append(np.asarray(rep_batch(keys)))
        if verbose:
            print(f"  [{name}] reps {b0 + nb}/{n_reps} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    ranks = np.concatenate(all_ranks)  # (R, Q)
    out = {"cell": name, "reps": int(n_reps), "L": L, "quantities": {}}
    worst = 1.0
    for qi, qn in enumerate(qnames):
        stat, p, counts, _ = chi2_pvalue(ranks[:, qi])
        out["quantities"][qn] = {
            "chi2": round(stat, 2), "p": p, "counts": counts,
        }
        worst = min(worst, p)
    out["min_p"] = worst
    out["pass"] = bool(worst > 1e-3)
    out["wall_s"] = round(time.time() - t0, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=128)
    ap.add_argument("--cells", type=str, default=",".join(CELLS))
    ap.add_argument("--seed", type=int, default=20260819)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", type=str, default="SBC_r03.json")
    args = ap.parse_args()

    results = []
    for name in args.cells.split(","):
        print(f"cell {name}: {args.reps} reps", flush=True)
        results.append(run_cell(name, CELLS[name], args.reps, args.seed,
                                batch=args.batch))
        print(f"  -> min_p = {results[-1]['min_p']:.4f} "
              f"pass = {results[-1]['pass']}", flush=True)
    summary = {
        "harness": "sbc", "reps": args.reps, "L": L, "bins": BINS,
        "alpha": 1e-3,
        "cells": results,
        "all_pass": all(r["pass"] for r in results),
    }
    with open(args.out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("harness", "reps", "all_pass")}))


if __name__ == "__main__":
    main()
