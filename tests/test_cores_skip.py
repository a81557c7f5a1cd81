"""cores -> device-mesh chain sharding (test-05-rng.R:46-62 semantics:
multi-core runs are reproducible but a different stream is acceptable) and
skip thinning (stan4bart_fit.R:393-403)."""

import numpy as np

import stan4bart_tpu as s4b
from stan4bart_tpu.utils.friedman import friedman_dataframe, generate_friedman_data


def _df(n=100):
    return friedman_dataframe(generate_friedman_data(n, ranef=True))


def test_cores_shards_chains():
    df = _df()
    kw = dict(chains=4, warmup=20, iter=60, seed=7, verbose=-1,
              bart_args={"n.trees": 5})
    f1 = s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df, cores=4, **kw)
    assert f1.draws.stan.shape[0] == 4
    assert np.all(np.isfinite(f1.extract("ev")))
    # reproducible under the same core count
    f2 = s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df, cores=4, **kw)
    np.testing.assert_array_equal(f1.draws.stan, f2.draws.stan)


def test_cores_fused_sweep_dispatch():
    """cores > 1 with the fused f32 sweep kernel dispatches to the
    shard_map batched driver (fit.py) and matches the single-device
    batched run chain-for-chain."""
    df = _df()
    kw = dict(chains=4, warmup=12, iter=30, seed=11, verbose=-1,
              bart_args={"n.trees": 4, "sweep_kernel": True},
              dtype="float32")
    f_sharded = s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df,
                              cores=4, **kw)
    f_single = s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df,
                             **kw)
    assert f_sharded.prog.sweep_consts is not None
    # identical per-chain RNG streams, but the per-device batch size
    # changes XLA's f32 reduction rounding (a 1-chain vs 4-chain NUTS
    # gradient batch), and a rounding flip on an MH accept amplifies
    # chaotically — so compare the early window loosely; the strict
    # checks are reproducibility and finiteness
    np.testing.assert_allclose(
        np.asarray(f_sharded.draws.stan[:, :10]),
        np.asarray(f_single.draws.stan[:, :10]),
        rtol=2e-2, atol=2e-2,
    )
    assert np.all(np.isfinite(f_sharded.extract("ev")))
    # and the sharded dispatch is reproducible under the same seed
    f_again = s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df,
                            cores=4, **kw)
    np.testing.assert_array_equal(f_sharded.draws.stan, f_again.draws.stan)


def test_skip_thinning_runs():
    df = _df()
    fit = s4b.stan4bart(
        "y ~ bart(X1+X2) + X4 + (1 | g.2)", df,
        chains=1, warmup=15, iter=40, seed=3, verbose=-1,
        skip={"bart": 2, "stan": 3}, bart_args={"n.trees": 5},
    )
    assert fit.prog.skip_bart == 2 and fit.prog.skip_stan == 3
    # stored draws = iter regardless of thinning (the reference keeps one
    # draw per coordinator iteration)
    assert fit.draws.stan.shape[1] == 40
    assert np.all(np.isfinite(fit.extract("ev")))


def test_skip_tuple():
    df = _df()
    fit = s4b.stan4bart("y ~ bart(X1+X2) + X4", df, chains=1, warmup=10,
                        iter=30, seed=2, verbose=-1, skip=(2, 2),
                        bart_args={"n.trees": 4})
    assert fit.prog.skip_bart == 2 and fit.prog.skip_stan == 2


def test_cores_keep_fits_false_dispatch():
    """keep_fits=False installs a store-nothing callback, which must
    route multi-device dispatch to the per-chain vmapped driver (the
    batched shard_map driver cannot carry callbacks) and store nothing."""
    df = _df()
    fit = s4b.stan4bart(
        "y ~ bart(X1+X2) + X4 + (1 | g.2)", df,
        chains=4, cores=4, warmup=8, iter=20, seed=3, verbose=-1,
        keep_fits=False, dtype="float32",
        bart_args={"n.trees": 4, "sweep_kernel": True},
    )
    assert fit.draws is None  # reference stores nothing (init.cpp:691-720)
