"""On-chip statistical quality gates for the PROBIT production path.

Companion to benchmarks/quality_chip.py (gaussian): fits the probit
flagship shape (Friedman n=10k, binary response, fused f32 sweep, the
same production defaults as the BENCH_FAMILY=binomial headline) through
the PUBLIC stan4bart() entry on the real chip, then gates the fit the
way test-02-binary.R does — deviance against the null model, and
correlation of the posterior-mean event probability with the true
generative probability (norm.cdf of the latent mean, known here by
construction).  Writes one JSON artifact.

Driver: python benchmarks/probit_quality_chip.py [--out FILE]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--chains", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=400)
    ap.add_argument("--iter", type=int, default=900)
    ap.add_argument("--out", default="PROBIT_QUALITY_r05.json")
    args = ap.parse_args()

    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import numpy as np
    from scipy.stats import norm

    import stan4bart_tpu as s4b
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    d = generate_friedman_data(args.n, ranef=True, binary=True)
    df = friedman_dataframe(d)
    t0 = time.time()
    fit = s4b.stan4bart(
        "y ~ bart(. - g.1 - g.2 - X4) + X4 + (1 + X4 | g.1) + (1 | g.2)",
        df, chains=args.chains, warmup=args.warmup, iter=args.iter,
        seed=11, verbose=0, dtype="float32",
        bart_args={"sweep_kernel": True},
        stan_args={"centered_ranef": True},
    )
    wall = time.time() - t0

    y = np.asarray(df["y"], dtype=np.float64)
    p_true = norm.cdf(d["mu"])
    ev = fit.extract("ev").mean(axis=-1)

    eps = 1e-12
    p = np.clip(ev, eps, 1 - eps)
    dev = -2.0 * float(np.sum(y * np.log(p) + (1 - y) * np.log1p(-p)))
    p0 = np.clip(np.mean(y), eps, 1 - eps)
    dev0 = -2.0 * float(args.n * (p0 * np.log(p0)
                                  + (1 - p0) * np.log1p(-p0)))
    cor = float(np.corrcoef(ev, p_true)[0, 1])
    ppd = fit.extract("ppd")
    ppd_gap = float(np.abs(ppd.mean(axis=-1) - ev).mean())

    gates = {
        "cor_ev_ptrue >= 0.90": cor >= 0.90,
        "deviance < 0.8 * null": dev < 0.8 * dev0,
        "ppd_mean_matches_ev < 0.05": ppd_gap < 0.05,
        "ev_in_unit_interval": bool(np.all((ev > 0) & (ev < 1))),
    }
    out = {
        "config": {"n": args.n, "chains": args.chains,
                   "warmup": args.warmup, "iter": args.iter,
                   "backend": jax.default_backend(),
                   "path": "public stan4bart(), f32 fused sweep, "
                           "auto-chunked default dispatch"},
        "cor_ev_ptrue": round(cor, 4),
        "deviance": round(dev, 1),
        "null_deviance": round(dev0, 1),
        "deviance_ratio": round(dev / dev0, 4),
        "ppd_gap": round(ppd_gap, 5),
        "timings": {k: round(v, 1) for k, v in fit.timings.items()
                    if isinstance(v, float)},
        "wall_s": round(wall, 1),
        "gates": gates,
        "all_pass": all(gates.values()),
    }
    print(json.dumps(out))
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
