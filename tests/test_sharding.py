"""Chain sharding over the virtual 8-device CPU mesh + the driver's
multichip dry-run path."""

import numpy as np
import jax
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    state, stan_row, bart_train = out
    assert np.all(np.isfinite(np.asarray(stan_row)))


def test_sharded_matches_single_device():
    """Same keys -> same draws whether sharded over 8 devices or run on 1
    (SPMD must not change numerics)."""
    import __graft_entry__ as ge
    from stan4bart_tpu.parallel.mesh import chain_mesh, run_chains_sharded

    prog = ge._tiny_program(n=48, num_trees=4, warmup=4, iterations=4)
    keys = jax.random.split(jax.random.PRNGKey(42), 8)

    _, draws_sharded = run_chains_sharded(prog, keys, mesh=chain_mesh(8))
    _, draws_single = run_chains_sharded(prog, keys, mesh=chain_mesh(1))

    np.testing.assert_allclose(
        np.asarray(draws_sharded.stan), np.asarray(draws_single.stan),
        rtol=1e-10,
    )
