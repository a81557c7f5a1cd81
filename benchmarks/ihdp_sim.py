"""IHDP causal simulation study (the reference's ihdp/runSimulations.R):
bias / coverage / CI length / PEHE / PEGSTE over replications, all
normalized by sd(y) exactly as runSimulations.R:115-123 does.

Default mode uses the REAL IHDP covariates (sim.data.gz parsed directly)
with the reference's response-surface-C design and the
``y ~ bart(. - g1) + z + (1 + z | g1)`` model (methods/stan4bart.R:5
fits ``y ~ . - g1 - (1 + z | g1)`` with treatment z).  ``--synthetic``
falls back to the round-1 synthetic-covariate generator.

Usage: python benchmarks/ihdp_sim.py [n_reps] [iter] [--synthetic]
Prints one JSON line per replication plus an aggregate summary.
"""

import json
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def run_real(n_reps: int, iters: int):
    import stan4bart_tpu as s4b
    from stan4bart_tpu.utils.ihdp import (
        generate_response_surface_c,
        load_ihdp_data,
        sample_sigma_b,
    )

    ihdp = load_ihdp_data()
    study_rng = np.random.default_rng(1)
    Sigma_b = sample_sigma_b(study_rng)  # once per study (runSim.R:40-56)
    covs = " + ".join(f"`{n}`" if "." in n else n
                      for n in ihdp["names"] if n != "momage")

    rows = []
    for rep in range(n_reps):
        rng = np.random.default_rng(565 + rep * 5)
        sim = generate_response_surface_c(ihdp, rng, Sigma_b)
        covs_flat = " + ".join(
            n.replace(".", "_") for n in ihdp["names"] if n != "momage"
        )
        data = {k.replace(".", "_"): v for k, v in sim["data"].items()}
        fit = s4b.stan4bart(
            f"y ~ bart({covs_flat}) + z + (1 + z | g1)", data,
            treatment="z", chains=4, iter=iters, warmup=iters // 2,
            seed=2000 + rep, verbose=-1,
        )
        m = _metrics_for_fit(fit, sim)
        m["rep"] = rep
        rows.append(m)
        print(json.dumps(m), flush=True)
    _aggregate(rows, "IHDP-real surface-C aggregate", n_reps)


def _metrics_for_fit(fit, sim):
    """The five runSimulations.R metrics, sd(y)-normalized (:115-123)."""
    from scipy.stats import norm as _norm

    ev_train = fit.extract("ev")
    ev_test = fit.extract("ev", sample="test")
    z = np.asarray(sim["z"]).astype(bool)
    zcol = np.asarray(sim["z"])[:, None]
    icate_draws = (ev_train - ev_test) * (2 * zcol - 1)

    truth = 4.0  # truthIsFour (runSimulations.R:38)
    sd_y = sim["sd_y"] if "sd_y" in sim else float(np.std(sim["y"], ddof=1))
    icatt_truth = sim["icate"][z]

    icatt_samples = icate_draws[z]                       # (n_t, draws)
    catt_samples = icatt_samples.mean(axis=0)            # (draws,)
    catt = float(catt_samples.mean())
    catt_se = float(catt_samples.std(ddof=1))
    lo = catt - _norm.ppf(0.975) * catt_se
    hi = catt + _norm.ppf(0.975) * catt_se
    icatt = icatt_samples.mean(axis=1)

    g = np.asarray(sim["g"])
    icate_est = icate_draws.mean(axis=1)
    gl = [j for j in np.unique(g) if ((g == j) & z).any()]
    gcatt_truth = np.array([sim["icate"][(g == j) & z].mean() for j in gl])
    gcatt_est = np.array([icate_est[(g == j) & z].mean() for j in gl])

    return dict(
        bias=float((catt - truth) / sd_y),
        covered=bool(lo <= truth <= hi),
        ci_length=float((hi - lo) / sd_y),
        pehe=float(np.sqrt(np.mean((icatt - icatt_truth) ** 2)) / sd_y),
        pegste=float(np.sqrt(np.mean((gcatt_est - gcatt_truth) ** 2))
                     / sd_y),
        satt_est=catt,
    )


def _aggregate(rows, label, n_reps):
    agg = dict(
        metric=label,
        n_reps=n_reps,
        bias=float(np.mean([r["bias"] for r in rows])),
        rmse_satt=float(np.sqrt(np.mean([r["bias"] ** 2 for r in rows]))),
        coverage=float(np.mean([r["covered"] for r in rows])),
        ci_length=float(np.mean([r["ci_length"] for r in rows])),
        pehe=float(np.mean([r["pehe"] for r in rows])),
        pegste=float(np.mean([r["pegste"] for r in rows])),
    )
    print(json.dumps(agg), flush=True)


def run_synthetic(n_reps: int, iters: int):
    import stan4bart_tpu as s4b
    from stan4bart_tpu.utils.ihdp import causal_metrics, generate_ihdp_sim

    rows = []
    for rep in range(n_reps):
        sim = generate_ihdp_sim(seed=rep)
        P = sim["X"].shape[1]
        xs = " + ".join(f"x{j + 1}" for j in range(P))
        fit = s4b.stan4bart(
            f"y ~ bart({xs}) + z + (1 + z | g)", sim["data"],
            treatment="z", chains=2, iter=iters, warmup=iters // 2,
            seed=1000 + rep, verbose=-1,
        )
        ev_train = fit.extract("ev")
        ev_test = fit.extract("ev", sample="test")
        zcol = sim["z"][:, None]
        icate = (ev_train - ev_test) * (2 * zcol - 1)
        m = causal_metrics(icate, sim)
        m["rep"] = rep
        rows.append(m)
        print(json.dumps(m), flush=True)
    _aggregate(rows, "IHDP-synthetic aggregate", n_reps)


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        # pin to CPU so long replication sweeps don't contend with chip
        # benches (env vars are latched by sitecustomize; the config
        # update is the reliable switch)
        import jax

        jax.config.update("jax_platforms", "cpu")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_reps = int(args[0]) if args else 50
    iters = int(args[1]) if len(args) > 1 else 1000
    if "--synthetic" in sys.argv:
        run_synthetic(n_reps, iters)
    else:
        run_real(n_reps, iters)
