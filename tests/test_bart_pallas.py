"""Pallas leaf-statistics kernels (ops/bart_pallas.py): numerical parity
with the XLA one-hot path and a full sweep equivalence check.  All
kernels run in interpreter mode here (tests force the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stan4bart_tpu.ops import bart as bart_ops
from stan4bart_tpu.ops.bart import BartConfig
from stan4bart_tpu.ops.bart_pallas import (
    leaf_stats_pallas,
    reference_stats,
    table_lookup_pallas,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_leaf_stats_matches_oracle(rng):
    N, M = 1500, 127  # padding path: N not a tile multiple
    leaf_idx = jnp.asarray(rng.integers(0, M, N), jnp.int32)
    wresid = jnp.asarray(rng.standard_normal(N), jnp.float32)
    counts, sums = leaf_stats_pallas(leaf_idx, wresid, M, interpret=True)
    c0, s0 = reference_stats(leaf_idx, wresid, M)
    np.testing.assert_allclose(np.asarray(counts), c0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sums), s0, atol=1e-3)


def test_leaf_stats_weighted(rng):
    N, M = 1024, 63
    leaf_idx = jnp.asarray(rng.integers(0, M, N), jnp.int32)
    wresid = jnp.asarray(rng.standard_normal(N), jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 2.0, N), jnp.float32)
    counts, sums = leaf_stats_pallas(
        leaf_idx, wresid, M, count_weights=w, interpret=True
    )
    c0, s0 = reference_stats(leaf_idx, wresid, M, count_weights=np.asarray(w))
    np.testing.assert_allclose(np.asarray(counts), c0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sums), s0, atol=1e-3)


def test_table_lookup_matches_gather(rng):
    N, M = 2050, 127
    leaf_idx = jnp.asarray(rng.integers(0, M, N), jnp.int32)
    table = jnp.asarray(rng.standard_normal(M), jnp.float32)
    out = table_lookup_pallas(leaf_idx, table, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(table)[np.asarray(leaf_idx)], rtol=1e-6
    )


def test_sweep_pallas_equivalence(rng):
    """Full bart_sweep with the Pallas kernels matches the XLA one-hot
    path: identical RNG stream, f32 both sides, so fits agree to f32
    summation-order tolerance."""
    N, P, T = 300, 5, 7
    X = rng.uniform(size=(N, P))
    y = np.sin(X[:, 0] * 6) + rng.standard_normal(N) * 0.3

    cfg_x = BartConfig(num_trees=T, max_depth=4, n_cuts=30)
    cfg_p = cfg_x._replace(use_pallas=True, pallas_interpret=True)
    cuts = bart_ops.make_cut_grid(X, cfg_x.n_cuts)
    ranks = jnp.asarray(bart_ops.compute_ranks(X, cuts))
    sp = jnp.full((P,), 1.0 / P, jnp.float32)
    y32 = jnp.asarray(y, jnp.float32)
    sigma = jnp.asarray(0.5, jnp.float32)

    def run(cfg):
        state = bart_ops.bart_init(cfg, N, dtype=jnp.float32)
        for it in range(5):
            state, _ = bart_ops.bart_sweep(
                cfg, state, y32, ranks, sp, sigma,
                jax.random.PRNGKey(it),
            )
        return state

    sx, sp_ = run(cfg_x), run(cfg_p)
    assert np.array_equal(np.asarray(sx.feature), np.asarray(sp_.feature))
    np.testing.assert_allclose(
        np.asarray(sx.allfit), np.asarray(sp_.allfit), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sx.leaf_value), np.asarray(sp_.leaf_value), atol=1e-4
    )
