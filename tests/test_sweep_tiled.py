"""Obs-tiled fused sweep kernel vs the chain-blocked kernel and the XLA
scan sweep on identical randomness (the ``variates`` contract).

The tiled kernel re-derives the move/leaf math in pass form (stats pass
-> decision -> update pass -> leaf draw, with the previous tree's fit
applied lazily in the next tree's stats pass), so structural equality of
the sampled forests against the XLA path over chained sweeps is the
correctness pin.  A small lane-slice width forces a genuinely multi-tile
grid (nt > 1) at test size.  Interpreter mode (CPU); the Mosaic compile
path is exercised on the real chip by benchmarks/large_n_chip.py."""

import jax
import jax.numpy as jnp
import numpy as np

from stan4bart_tpu.ops import bart as bart_ops
from stan4bart_tpu.ops.bart import BartConfig
from stan4bart_tpu.ops.bart_sweep_kernel import (
    bart_sweep_fused_batch,
    bart_sweep_fused_batch_tiled,
    make_sweep_consts,
)

N, P, T, C = 300, 5, 8, 4


def _setup(seed=0, lane_slice=128):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(N, P))
    y = (np.sin(X[:, 0]) + X[:, 1] ** 2
         + rng.normal(scale=0.5, size=N)).astype(np.float32)
    cfg = BartConfig(num_trees=T)
    cuts = bart_ops.make_cut_grid(X, cfg.n_cuts)
    ranks = bart_ops.compute_ranks(X, cuts)
    split_probs = np.full(P, 1.0 / P, dtype=np.float32)
    state1 = bart_ops.bart_init(cfg, N, dtype=jnp.float32)
    state = jax.tree_util.tree_map(
        lambda a: (jnp.broadcast_to(a, (C,) + a.shape)
                   if a.ndim else jnp.broadcast_to(a, (C,))), state1)
    # force a multi-tile grid: NPAD = 384 -> nt = 3 tiles of 128 lanes
    consts = make_sweep_consts(cfg, ranks, split_probs,
                               lane_slice=lane_slice)
    assert consts.n_slices >= 3
    return cfg, state, jnp.asarray(y), jnp.asarray(ranks), \
        jnp.asarray(split_probs), consts


def _variates(key):
    def draw(k):
        ku, kz = jax.random.split(k)
        return (jax.random.uniform(ku, (T, 8), dtype=jnp.float32),
                jax.random.normal(kz, (T, 128), dtype=jnp.float32))

    return jax.vmap(draw)(jax.random.split(key, C))


def test_tiled_sweep_matches_xla_and_batch():
    cfg, state, y, ranks, split_probs, consts = _setup()
    sigma = jnp.full((C,), 0.7, jnp.float32)
    yb = jnp.broadcast_to(y, (C, N))
    key = jax.random.PRNGKey(7)
    rng_dummy = jax.random.split(jax.random.PRNGKey(0), C)

    s_xla, s_til, s_bat = state, state, state
    for i in range(4):
        key, sub = jax.random.split(key)
        var = _variates(sub)
        s_xla, vc_xla = jax.vmap(
            lambda st, v0, v1: bart_ops.bart_sweep(
                cfg, st, y, ranks, split_probs,
                jnp.asarray(0.7, jnp.float32),
                jax.random.PRNGKey(0), variates=(v0, v1)),
        )(s_xla, var[0], var[1])
        s_til, vc_til = bart_sweep_fused_batch_tiled(
            cfg, s_til, yb, consts, sigma, rng_dummy,
            chain_block=2, variates=var, interpret=True,
        )
        s_bat, vc_bat = bart_sweep_fused_batch(
            cfg, s_bat, yb, consts, sigma, rng_dummy,
            chain_block=2, variates=var, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(s_xla.feature), np.asarray(s_til.feature),
            err_msg=f"sweep {i}: tiled tree structures diverged vs XLA")
        np.testing.assert_array_equal(
            np.asarray(s_xla.cut), np.asarray(s_til.cut))
        np.testing.assert_array_equal(
            np.asarray(s_xla.leaf_idx), np.asarray(s_til.leaf_idx))
        np.testing.assert_array_equal(
            np.asarray(vc_xla), np.asarray(vc_til))
        np.testing.assert_allclose(
            np.asarray(s_xla.leaf_value), np.asarray(s_til.leaf_value),
            rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(s_xla.allfit), np.asarray(s_til.allfit),
            rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(s_xla.tree_fit), np.asarray(s_til.tree_fit),
            rtol=2e-3, atol=2e-3)
        # tiled == chain-blocked kernel bit-for-bit on structures
        np.testing.assert_array_equal(
            np.asarray(s_bat.feature), np.asarray(s_til.feature))
        # re-sync float state so divergence cannot accumulate across
        # sweeps (f32 vs f64 round-off)
        s_til = s_til._replace(allfit=s_xla.allfit,
                               tree_fit=s_xla.tree_fit,
                               leaf_value=s_xla.leaf_value)
        s_bat = s_bat._replace(allfit=s_xla.allfit,
                               tree_fit=s_xla.tree_fit,
                               leaf_value=s_xla.leaf_value)


def test_tiled_single_tile_degenerates_to_batch():
    """nt == 1 (n below the slice width): tiled == chain-blocked kernel
    exactly."""
    cfg, state, y, ranks, split_probs, _ = _setup()
    consts = make_sweep_consts(cfg, ranks, split_probs, lane_slice=512)
    assert consts.n_slices == 1
    sigma = jnp.full((C,), 0.7, jnp.float32)
    yb = jnp.broadcast_to(y, (C, N))
    var = _variates(jax.random.PRNGKey(3))
    rng_dummy = jax.random.split(jax.random.PRNGKey(0), C)
    s_til, vc_til = bart_sweep_fused_batch_tiled(
        cfg, state, yb, consts, sigma, rng_dummy,
        chain_block=2, variates=var, interpret=True)
    s_bat, vc_bat = bart_sweep_fused_batch(
        cfg, state, yb, consts, sigma, rng_dummy,
        chain_block=2, variates=var, interpret=True)
    np.testing.assert_array_equal(np.asarray(s_bat.feature),
                                  np.asarray(s_til.feature))
    np.testing.assert_array_equal(np.asarray(s_bat.leaf_idx),
                                  np.asarray(s_til.leaf_idx))
    np.testing.assert_allclose(np.asarray(s_bat.allfit),
                               np.asarray(s_til.allfit),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(vc_bat), np.asarray(vc_til))


def test_tiled_weighted_matches_xla():
    """Weighted sufficient statistics in the obs-tiled kernel (pass-A
    move stats AND pass-B leaf stats accumulate (sum w, sum w r) per
    tile): identical forests to the XLA weighted sweep."""
    cfg, state, y, ranks, split_probs, consts = _setup(seed=2)
    w = jnp.asarray(np.random.default_rng(11)
                    .uniform(0.5, 2.0, N).astype(np.float32))
    sigma = jnp.full((C,), 0.7, jnp.float32)
    yb = jnp.broadcast_to(y, (C, N))
    key = jax.random.PRNGKey(29)
    rng_dummy = jax.random.split(jax.random.PRNGKey(0), C)

    s_xla, s_til = state, state
    for i in range(3):
        key, sub = jax.random.split(key)
        var = _variates(sub)
        s_xla, vc_xla = jax.vmap(
            lambda st, v0, v1: bart_ops.bart_sweep(
                cfg, st, y, ranks, split_probs,
                jnp.asarray(0.7, jnp.float32),
                jax.random.PRNGKey(0), weights=w, variates=(v0, v1)),
        )(s_xla, var[0], var[1])
        s_til, vc_til = bart_sweep_fused_batch_tiled(
            cfg, s_til, yb, consts, sigma, rng_dummy,
            chain_block=2, weights=w, variates=var, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(s_xla.feature), np.asarray(s_til.feature),
            err_msg=f"weighted tiled sweep {i}: structures diverged")
        np.testing.assert_array_equal(
            np.asarray(s_xla.leaf_idx), np.asarray(s_til.leaf_idx))
        np.testing.assert_array_equal(
            np.asarray(vc_xla), np.asarray(vc_til))
        np.testing.assert_allclose(
            np.asarray(s_xla.allfit), np.asarray(s_til.allfit),
            rtol=2e-3, atol=2e-3)
        s_til = s_til._replace(allfit=s_xla.allfit,
                               tree_fit=s_xla.tree_fit,
                               leaf_value=s_xla.leaf_value)


def test_auto_tile_width_by_regime():
    """make_sweep_consts keeps the 10368 single-pass slice in the
    chain-block-8 regime (npad <= 10368) and switches to 5184-lane
    tiles above it — the tiled-regime config measured 1.2-1.5x the
    single-pass sliced body at n=15-50k and 3.0x the XLA path at
    n=200k.  GibbsProgram flips to the tiled engine on the same
    boundary."""
    import os

    import jax.numpy as jnp

    assert "S4B_SWEEP_SLICE" not in os.environ
    assert "S4B_SWEEP_TILED_MIN_NPAD" not in os.environ
    cfg = BartConfig(num_trees=4)
    rng = np.random.default_rng(0)

    def consts_for(n):
        X = rng.normal(size=(n, 2))
        ranks = bart_ops.compute_ranks(X, bart_ops.make_cut_grid(X, 10))
        return make_sweep_consts(cfg, ranks, np.full(2, 0.5))

    small = consts_for(2000)
    assert small.n_slices == 1
    mid = consts_for(15000)     # tiled band: 5184 -> ceil_to 5248 lanes
    ns = mid.npad // mid.n_slices
    assert ns == 5248 and mid.n_slices == 3
    big = consts_for(52000)
    ns = big.npad // big.n_slices
    assert ns == 5248 and big.n_slices >= 10

    # engine boundary: GibbsProgram picks tiled exactly when the
    # single-pass body cannot run chain block 8
    from stan4bart_tpu.formula import build_model_frame
    from stan4bart_tpu.gibbs import GibbsProgram
    from stan4bart_tpu.models.assemble import build_parametric_model
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    d = generate_friedman_data(120, ranef=True, causal=False)
    df = friedman_dataframe(d)
    mf = build_model_frame("y ~ bart(. - g.1 - g.2 - X4) + X4 + (1 | g.1)",
                           df)
    pm, _, _ = build_parametric_model(mf, "gaussian", {},
                                      dtype=jnp.float32)
    prog = GibbsProgram(pm, cfg, mf.y, mf.bart_X, warmup=2, iterations=2,
                        sweep_kernel=True, dtype=jnp.float32)
    assert not prog.sweep_tiled and prog.sweep_single_ok
