"""IHDP-style causal simulation study (the reference's
ihdp/runSimulations.R): bias / coverage / CI length / PEHE / PEGSTE over
replications.

Usage: python benchmarks/ihdp_sim.py [n_reps] [iter]
Prints one JSON line per replication plus an aggregate summary.
"""

import json
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main(n_reps: int = 20, iters: int = 1000):
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

    agg = dict(
        metric="IHDP-sim aggregate",
        n_reps=n_reps,
        bias=float(np.mean([r["bias"] for r in rows])),
        rmse_satt=float(np.sqrt(np.mean([r["bias"] ** 2 for r in rows]))),
        coverage=float(np.mean([r["covered"] for r in rows])),
        ci_length=float(np.mean([r["ci_length"] for r in rows])),
        pehe=float(np.mean([r["pehe"] for r in rows])),
        pegste=float(np.mean([r["pegste"] for r in rows])),
    )
    print(json.dumps(agg), flush=True)


if __name__ == "__main__":
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    main(n_reps, iters)
