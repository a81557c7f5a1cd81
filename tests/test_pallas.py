"""Pallas fused proposal-statistics kernel: parity with the XLA masked-sum
path (interpret mode on CPU) and full-sweep equivalence."""

import numpy as np
import jax
import jax.numpy as jnp

from stan4bart_tpu.ops import bart as bart_ops
from stan4bart_tpu.ops.bart import BartConfig
from stan4bart_tpu.ops.bart_pallas import proposal_stats
from stan4bart_tpu.utils.friedman import generate_friedman_data


def test_kernel_parity_both_moves():
    rng = np.random.default_rng(0)
    N = 777  # deliberately non-multiple of 128
    resid = jnp.asarray(rng.normal(size=N), dtype=jnp.float32)
    leaf_idx = jnp.asarray(rng.integers(0, 7, N), dtype=jnp.int32)
    rank_v = jnp.asarray(rng.integers(0, 100, N), dtype=jnp.int32)
    li, r, rk = map(np.asarray, (leaf_idx, resid, rank_v))
    for grow in (0, 1):
        out = proposal_stats(
            resid, leaf_idx, rank_v, jnp.int32(1), jnp.int32(3),
            jnp.int32(4), jnp.int32(50), jnp.int32(grow), interpret=True,
        )
        members = (li == 1) if grow else ((li == 3) | (li == 4))
        gl = rk <= 50
        exp = [members.sum(), r[members].sum(), (members & gl).sum(),
               r[members & gl].sum(), (li == 3).sum(), r[li == 3].sum()]
        np.testing.assert_allclose([float(x) for x in out], exp, atol=1e-3)


def test_sweep_pallas_matches_xla():
    """Identical RNG stream -> identical sweeps whichever stats path runs."""
    d = generate_friedman_data(300)
    y = jnp.asarray(d["y"] - d["y"].mean(), jnp.float32)
    results = {}
    for use_pallas in (False, True):
        cfg = BartConfig(num_trees=8, max_depth=4, n_cuts=32,
                         use_pallas=use_pallas)
        cuts = bart_ops.make_cut_grid(d["x"], cfg.n_cuts)
        ranks = jnp.asarray(bart_ops.compute_ranks(d["x"], cuts))
        sp = jnp.full(10, 0.1, jnp.float32)
        st = bart_ops.bart_init(cfg, 300, dtype=jnp.float32)
        st = st._replace(sigma_mu=jnp.asarray(0.9, jnp.float32))
        rng = jax.random.PRNGKey(0)
        for i in range(5):
            rng, r = jax.random.split(rng)
            st, _ = bart_ops.bart_sweep(cfg, st, y, ranks, sp,
                                        jnp.asarray(1.0, jnp.float32), r)
        results[use_pallas] = np.asarray(st.allfit)
    np.testing.assert_allclose(results[False], results[True],
                               rtol=1e-4, atol=1e-4)
