"""Statistical quality gates for the PRODUCTION TPU path (fused sweep +
chain-blocked batch driver) on the real chip.

Runs the reference's test-01 Friedman gates (cor(indiv.bart, truth) >=
0.95, cor(indiv.fixef) >= 0.99, cor(indiv.ranef) >= 0.68, sigma within
[0.8, 1.4], ppd noise calibration) through the public stan4bart() API
at n=250 / 50 trees / 3 chains x 1000 iters — the same budget as
tests/test_e2e_continuous.py, but in f32 on TPU with the Mosaic kernel
instead of f64 on CPU with the XLA scan.  Prints PASS/FAIL per gate and
exits nonzero on failure."""

import os
import sys

import jax
import numpy as np


def main():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    sys.path.insert(0, "/root/repo")
    import jax.numpy as jnp

    import stan4bart_tpu as s4b
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    d = generate_friedman_data(250, ranef=True, causal=True)
    df = friedman_dataframe(d)
    # QUALITY_IW=1: run the gates with the conjugate interweaving pair
    # (centered ranef + linear_gibbs + level_gibbs) — the candidate
    # production sampler config (docs/interweaving.md)
    iw = os.environ.get("QUALITY_IW", "0") == "1"
    stan_args = ({"centered_ranef": True, "linear_gibbs": True,
                  "level_gibbs": True} if iw else None)
    # QUALITY_WEIGHTED=1: heteroskedastic variant — noise sd 1/sqrt(w_i)
    # with w ~ U(0.5, 2) passed as likelihood weights, so the weighted
    # model is correctly specified and the same gates apply (sigma's
    # truth stays 1.0).  Exercises the round-4 weighted fused kernel on
    # the production path.
    weights = None
    if os.environ.get("QUALITY_WEIGHTED", "0") == "1":
        rng_w = np.random.default_rng(11)
        weights = rng_w.uniform(0.5, 2.0, len(df))
        mu_true = np.where(d["z"] == 1, d["mu_1"], d["mu_0"])
        eps = d["y"] - mu_true
        df = df.copy()
        df["y"] = mu_true + eps / np.sqrt(weights)
        print("# weighted gates: heteroskedastic noise sd 1/sqrt(w)",
              flush=True)
    fit = s4b.stan4bart(
        "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 + X4 | g.1) "
        "+ (1 | g.2)",
        df, treatment="z",
        weights=weights,
        chains=3, warmup=300, iter=1000, seed=7, verbose=-1,
        bart_args={"n.trees": 50, "sweep_kernel": True},
        stan_args=stan_args,
        dtype=jnp.float32,
        # respect the axon tunnel's ~60s single-execution cap
        chunk_size=100,
    )

    checks = []

    def gate(name, value, ok):
        checks.append((name, value, ok))
        print(f"# {'PASS' if ok else 'FAIL'} {name} = {value:.4f}",
              flush=True)

    bart_hat = fit.fitted("indiv.bart")
    bc = bart_hat - bart_hat.mean()
    tc = d["mu_bart"] - d["mu_bart"].mean()
    c = float(np.corrcoef(bc, tc)[0, 1])
    gate("cor(indiv.bart, truth)", c, c >= 0.95)

    fx = fit.fitted("indiv.fixef")
    mu_fx = np.where(d["z"] == 1, d["mu_fixef_1"], d["mu_fixef_0"])
    c = float(np.corrcoef(fx - fx.mean(), mu_fx - mu_fx.mean())[0, 1])
    gate("cor(indiv.fixef, truth)", c, c >= 0.99)

    rf = fit.fitted("indiv.ranef")
    c = float(np.corrcoef(rf, d["mu_ranef"])[0, 1])
    gate("cor(indiv.ranef, truth)", c, c >= 0.68)

    sig = float(fit.extract("sigma").mean())
    gate("sigma posterior mean", sig, 0.8 <= sig <= 1.4)

    ev = fit.extract("ev")
    ppd = fit.extract("ppd")
    ratio = float(np.std(ppd - ev)) / sig
    gate("ppd noise sd / sigma", ratio, 1 / 1.15 <= ratio <= 1.15)

    z = d["z"][:, None]
    icate = (ev - fit.extract("ev", sample="test")) * (2 * z - 1)
    sate = float(icate.mean(axis=0).mean())
    gate("SATE (truth tau=5)", sate, abs(sate - d["tau"]) <= 1.0)

    failed = [c for c in checks if not c[2]]
    print(f"# {len(checks) - len(failed)}/{len(checks)} gates passed",
          flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
