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


def _f32_sweep_program(n=96, chains=8, num_trees=4, warmup=4, iterations=4):
    import jax.numpy as jnp

    from stan4bart_tpu.formula import build_model_frame
    from stan4bart_tpu.gibbs import GibbsProgram
    from stan4bart_tpu.models.assemble import build_parametric_model
    from stan4bart_tpu.ops.bart import BartConfig
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    d = generate_friedman_data(n, ranef=True, causal=False)
    df = friedman_dataframe(d)
    mf = build_model_frame(
        "y ~ bart(X1 + X2 + X3 + X5) + X4 + (1 | g.1)", df
    )
    pm, _, _ = build_parametric_model(mf, "gaussian", {}, dtype=jnp.float32)
    return GibbsProgram(
        pm, BartConfig(num_trees=num_trees, max_depth=4, n_cuts=16),
        mf.y, mf.bart_X, warmup=warmup, iterations=iterations,
        sweep_kernel=True, dtype=jnp.float32,
    )


def test_batched_sharded_matches_batched():
    """The shard_map fused-sweep driver (Pallas on every chip) must produce
    the same draws as the single-device batched driver: identical per-chain
    RNG streams, no cross-chain coupling."""
    from stan4bart_tpu.parallel.mesh import (
        chain_mesh,
        run_chains_batched_sharded,
    )

    prog = _f32_sweep_program()
    keys = jax.random.split(jax.random.PRNGKey(7), 8)

    _, draws_single = jax.jit(
        lambda ks: prog.run_chains_batched(ks, chain_block=4)
    )(keys)
    _, draws_sharded = run_chains_batched_sharded(
        prog, keys, mesh=chain_mesh(4), chain_block=2
    )

    np.testing.assert_allclose(
        np.asarray(draws_sharded.stan), np.asarray(draws_single.stan),
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(draws_sharded.bart_train),
        np.asarray(draws_single.bart_train), rtol=2e-4, atol=2e-4,
    )


def test_batched_sharded_rejects_pooled_and_xla_prog():
    from stan4bart_tpu.parallel.mesh import (
        chain_mesh,
        run_chains_batched_sharded,
    )
    import __graft_entry__ as ge

    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    xla_prog = ge._tiny_program(n=48, num_trees=3, warmup=2, iterations=2)
    if xla_prog.sweep_consts is None:  # x64 test config -> XLA sweep
        with pytest.raises(ValueError, match="sweep_kernel"):
            run_chains_batched_sharded(xla_prog, keys, mesh=chain_mesh(4))

    prog = _f32_sweep_program(warmup=2, iterations=2)
    prog.nuts_cfg = prog.nuts_cfg._replace(pooled_axis="chains")
    with pytest.raises(ValueError, match="pooled"):
        run_chains_batched_sharded(prog, keys, mesh=chain_mesh(4))


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
