"""Observation sharding: the full Gibbs step over a 2-D (chains x data)
mesh must compile, run, and match unsharded numerics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stan4bart_tpu.formula import build_model_frame
from stan4bart_tpu.gibbs import GibbsProgram
from stan4bart_tpu.models.assemble import build_parametric_model
from stan4bart_tpu.ops.bart import BartConfig
from stan4bart_tpu.parallel.mesh import chain_data_mesh, run_obs_sharded
from stan4bart_tpu.utils.friedman import friedman_dataframe, generate_friedman_data


@pytest.fixture(scope="module")
def prog():
    d = generate_friedman_data(64, ranef=True)
    df = friedman_dataframe(d)
    mf = build_model_frame("y ~ bart(X1 + X2 + X3) + X4 + (1 | g.2)", df)
    pm, _, _ = build_parametric_model(mf, "gaussian")
    return GibbsProgram(pm, BartConfig(num_trees=5, max_depth=4, n_cuts=16),
                        mf.y, mf.bart_X, warmup=4, iterations=4)


def test_obs_sharded_runs(prog):
    mesh = chain_data_mesh(2, 4)  # 2 chain groups x 4 data shards
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    state, draws = run_obs_sharded(prog, keys, mesh, n_iters=4)
    jax.block_until_ready(draws.stan)
    assert draws.stan.shape[:2] == (4, 2)  # (iters, chains, ...)
    assert np.all(np.isfinite(np.asarray(draws.stan)[..., 0]))


def test_obs_sharded_matches_unsharded(prog):
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    mesh_sharded = chain_data_mesh(2, 4)
    mesh_flat = chain_data_mesh(2, 1)
    _, d1 = run_obs_sharded(prog, keys, mesh_sharded, n_iters=3)
    _, d2 = run_obs_sharded(prog, keys, mesh_flat, n_iters=3)
    # few iterations on f64: reduction-order noise must stay tiny and no
    # accept decision may flip
    np.testing.assert_allclose(np.asarray(d1.stan), np.asarray(d2.stan),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(d1.bart_train),
                               np.asarray(d2.bart_train),
                               rtol=1e-6, atol=1e-8)
