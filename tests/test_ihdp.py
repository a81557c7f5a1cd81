"""IHDP-style simulation smoke: the harness runs and the causal estimate is
in the right place (full study lives in benchmarks/ihdp_sim.py)."""

import numpy as np

import stan4bart_tpu as s4b
from stan4bart_tpu.utils.ihdp import causal_metrics, generate_ihdp_sim


def test_ihdp_generator_structure():
    sim = generate_ihdp_sim(n=400, seed=1)
    assert sim["X"].shape == (400, 15)
    assert set(np.unique(sim["z"])) == {0.0, 1.0}
    assert abs(sim["att"] - 4.0) < 1e-8  # omega calibrated to ATT target
    assert np.linalg.det(sim["Sigma_b"]) > 0


def test_ihdp_one_rep_metrics():
    sim = generate_ihdp_sim(n=400, seed=2)
    P = sim["X"].shape[1]
    xs = " + ".join(f"x{j + 1}" for j in range(P))
    fit = s4b.stan4bart(
        f"y ~ bart({xs}) + z + (1 + z | g)", sim["data"],
        treatment="z", chains=2, iter=400, warmup=200,
        seed=77, verbose=-1, bart_args={"n.trees": 40},
    )
    ev_train = fit.extract("ev")
    ev_test = fit.extract("ev", sample="test")
    icate = (ev_train - ev_test) * (2 * sim["z"][:, None] - 1)
    m = causal_metrics(icate, sim)
    assert abs(m["bias"]) < 1.5, m
    assert m["pehe"] < 4.0, m
    assert m["ci_length"] > 0
