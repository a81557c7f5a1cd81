"""Fused Pallas sweep kernel vs the XLA scan sweep on identical randomness.

Both paths consume the same pre-drawn proposal uniforms and leaf
normals (the ``variates`` contract), so for a given starting forest one
sweep must produce the same grow/prune/change decisions and the same
leaf draws — the sampled forests should match structurally exactly and
numerically to f32 round-off.  Runs the kernel in interpreter mode
(tests are CPU-only; the Mosaic compile path is exercised on the real
chip by the benchmark)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stan4bart_tpu.ops import bart as bart_ops
from stan4bart_tpu.ops.bart import BartConfig
from stan4bart_tpu.ops.bart_sweep_kernel import (
    bart_sweep_fused,
    make_sweep_consts,
)

N, P, T = 200, 5, 10


def _setup(seed=0, n=N, trees=T, binary_resid=False):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, P))
    y = (np.sin(X[:, 0]) + X[:, 1] ** 2 + rng.normal(scale=0.5, size=n)
         ).astype(np.float32)
    cfg = BartConfig(num_trees=trees)
    cuts = bart_ops.make_cut_grid(X, cfg.n_cuts)
    ranks = bart_ops.compute_ranks(X, cuts)
    split_probs = np.full(P, 1.0 / P, dtype=np.float32)
    state = bart_ops.bart_init(cfg, n, dtype=jnp.float32)
    consts = make_sweep_consts(cfg, ranks, split_probs)
    return cfg, state, jnp.asarray(y), jnp.asarray(ranks), \
        jnp.asarray(split_probs), consts


def _draw_variates(key, trees=T):
    ku, kz = jax.random.split(key)
    u = jax.random.uniform(ku, (trees, 8), dtype=jnp.float32)
    zn = jax.random.normal(kz, (trees, 128), dtype=jnp.float32)
    return u, zn


def test_fused_sweep_matches_xla_on_same_variates():
    cfg, state, y, ranks, split_probs, consts = _setup()
    sigma = jnp.asarray(0.7, jnp.float32)
    key = jax.random.PRNGKey(42)

    s_xla, s_ker = state, state
    for i in range(5):
        key, sub = jax.random.split(key)
        var = _draw_variates(sub)
        s_xla, vc_xla = bart_ops.bart_sweep(
            cfg, s_xla, y, ranks, split_probs, sigma,
            jax.random.PRNGKey(0), variates=var,
        )
        s_ker, vc_ker = bart_sweep_fused(
            cfg, s_ker, y, consts, sigma, jax.random.PRNGKey(0),
            variates=var, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(s_xla.feature), np.asarray(s_ker.feature),
            err_msg=f"sweep {i}: tree structures diverged",
        )
        np.testing.assert_array_equal(
            np.asarray(s_xla.cut), np.asarray(s_ker.cut))
        np.testing.assert_array_equal(
            np.asarray(s_xla.leaf_idx), np.asarray(s_ker.leaf_idx))
        np.testing.assert_array_equal(
            np.asarray(vc_xla), np.asarray(vc_ker))
        np.testing.assert_allclose(
            np.asarray(s_xla.leaf_value), np.asarray(s_ker.leaf_value),
            rtol=2e-4, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(s_xla.allfit), np.asarray(s_ker.allfit),
            rtol=5e-4, atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(s_xla.tree_fit), np.asarray(s_ker.tree_fit),
            rtol=5e-4, atol=5e-4,
        )


def test_fused_sweep_moves_trees():
    """The kernel must actually accept moves (not a frozen forest)."""
    cfg, state, y, ranks, split_probs, consts = _setup(seed=3)
    sigma = jnp.asarray(0.7, jnp.float32)
    key = jax.random.PRNGKey(7)
    s = state
    for _ in range(10):
        key, sub = jax.random.split(key)
        s, _ = bart_sweep_fused(cfg, s, y, consts, sigma, sub,
                                interpret=True)
    n_internal = int(np.sum(np.asarray(s.feature) >= 0))
    assert n_internal >= 3
    # allfit invariant: sum of cached per-tree fits
    np.testing.assert_allclose(
        np.asarray(jnp.sum(s.tree_fit, axis=0)), np.asarray(s.allfit),
        rtol=1e-4, atol=1e-4,
    )


def test_fused_sweep_vmaps_over_chains():
    """vmap prepends a chain grid axis; per-chain carries must not mix."""
    cfg, state, y, ranks, split_probs, consts = _setup()
    sigma = jnp.asarray(0.7, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(11), 3)

    def one(key):
        var = _draw_variates(key)
        s, vc = bart_sweep_fused(cfg, state, y, consts, sigma, key,
                                 variates=var, interpret=True)
        return s, vc

    sv, vcv = jax.vmap(one)(keys)
    for c in range(3):
        s1, vc1 = one(keys[c])
        np.testing.assert_array_equal(np.asarray(sv.feature[c]),
                                      np.asarray(s1.feature))
        np.testing.assert_allclose(np.asarray(sv.allfit[c]),
                                   np.asarray(s1.allfit),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(vcv[c]), np.asarray(vc1))


def test_consts_reject_deep_trees():
    cfg, state, y, ranks, split_probs, consts = _setup()
    with pytest.raises(ValueError):
        make_sweep_consts(BartConfig(max_depth=7), np.asarray(ranks),
                          np.asarray(split_probs))


def test_gibbs_program_with_sweep_kernel_runs():
    """Full Gibbs wiring with the fused sweep (interpreted off-TPU):
    warmup + sampling steps execute and produce finite draws."""
    from stan4bart_tpu.formula import build_model_frame
    from stan4bart_tpu.gibbs import GibbsProgram
    from stan4bart_tpu.models.assemble import build_parametric_model
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    d = generate_friedman_data(120, ranef=True, causal=False)
    df = friedman_dataframe(d)
    mf = build_model_frame(
        "y ~ bart(. - g.1 - g.2 - X4) + X4 + (1 | g.1)", df
    )
    pm, _, _ = build_parametric_model(mf, "gaussian", {},
                                      dtype=jnp.float32)
    prog = GibbsProgram(
        pm, BartConfig(num_trees=4), mf.y, mf.bart_X,
        warmup=6, iterations=4, sweep_kernel=True, dtype=jnp.float32,
    )
    state = prog.init_state(jax.random.PRNGKey(0))
    for i in range(6):
        state, _ = prog.step(state, i, True)
    state = jax.tree.map(lambda x: x, state)
    draws = []
    for i in range(4):
        state, draw = prog.step(state, i, False)
        draws.append(draw)
    lp = np.asarray(draws[-1].stan[0])
    assert np.isfinite(lp)
    assert np.all(np.isfinite(np.asarray(state.bart.allfit)))
    # tree_fit invariant maintained by the kernel
    np.testing.assert_allclose(
        np.asarray(jnp.sum(state.bart.tree_fit, axis=0)),
        np.asarray(state.bart.allfit), rtol=1e-3, atol=1e-3,
    )


def test_weighted_fused_sweep_matches_xla_on_same_variates():
    """Weighted likelihoods in-kernel (round 4): identical forests to
    the XLA weighted sweep on shared variates — single-pass AND
    lane-sliced bodies."""
    cfg, state, y, ranks, split_probs, consts = _setup(seed=9)
    w = jnp.asarray(
        np.random.default_rng(5).uniform(0.5, 2.0, N).astype(np.float32))
    sigma = jnp.asarray(0.7, jnp.float32)
    consts_sliced = make_sweep_consts(cfg, np.asarray(ranks),
                                      np.asarray(split_probs),
                                      lane_slice=128)
    assert consts_sliced.n_slices > 1
    key = jax.random.PRNGKey(17)
    s_xla = s_ker = s_sli = state
    for i in range(4):
        key, sub = jax.random.split(key)
        var = _draw_variates(sub)
        s_xla, vc_xla = bart_ops.bart_sweep(
            cfg, s_xla, y, ranks, split_probs, sigma,
            jax.random.PRNGKey(0), weights=w, variates=var,
        )
        s_ker, vc_ker = bart_sweep_fused(
            cfg, s_ker, y, consts, sigma, jax.random.PRNGKey(0),
            weights=w, variates=var, interpret=True,
        )
        s_sli, vc_sli = bart_sweep_fused(
            cfg, s_sli, y, consts_sliced, sigma, jax.random.PRNGKey(0),
            weights=w, variates=var, interpret=True,
        )
        for s_k, vc_k, tag in ((s_ker, vc_ker, "single-pass"),
                               (s_sli, vc_sli, "sliced")):
            np.testing.assert_array_equal(
                np.asarray(s_xla.feature), np.asarray(s_k.feature),
                err_msg=f"weighted sweep {i} ({tag}): structures "
                        f"diverged")
            np.testing.assert_array_equal(
                np.asarray(s_xla.leaf_idx), np.asarray(s_k.leaf_idx))
            np.testing.assert_array_equal(np.asarray(vc_xla),
                                          np.asarray(vc_k))
            np.testing.assert_allclose(
                np.asarray(s_xla.allfit), np.asarray(s_k.allfit),
                rtol=5e-4, atol=5e-4)
    # weights must MATTER: unit weights give a different forest than
    # the 0.5-2.0 draw above after 4 sweeps (guards against the kernel
    # silently ignoring the weight operand)
    s_unw = state
    key = jax.random.PRNGKey(17)
    for i in range(4):
        key, sub = jax.random.split(key)
        var = _draw_variates(sub)
        s_unw, _ = bart_sweep_fused(
            cfg, s_unw, y, consts, sigma, jax.random.PRNGKey(0),
            variates=var, interpret=True,
        )
    assert not np.array_equal(np.asarray(s_unw.feature),
                              np.asarray(s_ker.feature))


def test_weighted_batch_kernel_matches_xla():
    """Chain-blocked weighted sweep (CB > 1 exercises the shared (1,
    NPAD) weight row against (CB, NPAD) residual rows)."""
    from stan4bart_tpu.ops.bart_sweep_kernel import bart_sweep_fused_batch

    cfg, state, y, ranks, split_probs, consts = _setup(seed=13)
    w = jnp.asarray(
        np.random.default_rng(7).uniform(0.25, 3.0, N).astype(np.float32))
    C = 4
    keys = jax.random.split(jax.random.PRNGKey(23), C)
    u = jax.vmap(lambda k: jax.random.uniform(
        k, (T, 8), dtype=jnp.float32))(keys)
    zn = jax.vmap(lambda k: jax.random.normal(
        k, (T, 128), dtype=jnp.float32))(keys)
    sb = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (C,) + a.shape), state)
    sig_b = jnp.full((C,), 0.7, jnp.float32)
    s_batch, vc_batch = bart_sweep_fused_batch(
        cfg, sb, jnp.broadcast_to(y, (C, N)), consts, sig_b, keys,
        chain_block=2, weights=w, variates=(u, zn), interpret=True,
    )
    for c in range(C):
        s1, vc1 = bart_ops.bart_sweep(
            cfg, state, y, ranks, split_probs,
            jnp.asarray(0.7, jnp.float32), jax.random.PRNGKey(0),
            weights=w, variates=(u[c], zn[c]),
        )
        np.testing.assert_array_equal(
            np.asarray(s_batch.feature[c]), np.asarray(s1.feature))
        np.testing.assert_array_equal(
            np.asarray(s_batch.leaf_idx[c]), np.asarray(s1.leaf_idx))
        np.testing.assert_array_equal(np.asarray(vc_batch[c]),
                                      np.asarray(vc1))
        np.testing.assert_allclose(
            np.asarray(s_batch.allfit[c]), np.asarray(s1.allfit),
            rtol=5e-4, atol=5e-4)


def test_gibbs_program_sweep_kernel_weighted_runs():
    """Weighted fits ride the fused kernel now (round 4) — the old
    ValueError gate is gone and draws stay finite."""
    from stan4bart_tpu.formula import build_model_frame
    from stan4bart_tpu.gibbs import GibbsProgram
    from stan4bart_tpu.models.assemble import build_parametric_model
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    d = generate_friedman_data(90, ranef=True, causal=False)
    df = friedman_dataframe(d)
    mf = build_model_frame("y ~ bart(. - g.1 - g.2 - X4) + X4 + (1 | g.1)",
                           df)
    pm, _, _ = build_parametric_model(mf, "gaussian", {},
                                      dtype=jnp.float32)
    w = np.random.default_rng(0).uniform(0.5, 2.0, 90)
    prog = GibbsProgram(pm, BartConfig(num_trees=4), mf.y, mf.bart_X,
                        weights=w, warmup=4, iterations=3,
                        sweep_kernel=True, dtype=jnp.float32)
    state = prog.init_state(jax.random.PRNGKey(0))
    for i in range(4):
        state, _ = prog.step(state, i, True)
    for i in range(3):
        state, draw = prog.step(state, i, False)
    assert np.isfinite(float(draw.stan[0]))
    assert np.all(np.isfinite(np.asarray(state.bart.allfit)))


def test_gibbs_program_sweep_kernel_regrow_composes():
    """regrow_per_sweep no longer forces the XLA sweep: the fused
    kernel runs and the post-sweep regrow refresh keeps the forest
    invariants (allfit = sum tree_fit; varcount counts the refreshed
    structures)."""
    from stan4bart_tpu.formula import build_model_frame
    from stan4bart_tpu.gibbs import GibbsProgram
    from stan4bart_tpu.models.assemble import build_parametric_model
    from stan4bart_tpu.ops.bart import count_variable_use
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
    cfg = BartConfig(num_trees=4, regrow_per_sweep=2)
    prog = GibbsProgram(pm, cfg, mf.y, mf.bart_X,
                        warmup=5, iterations=4, sweep_kernel=True,
                        dtype=jnp.float32)
    state = prog.init_state(jax.random.PRNGKey(1))
    for i in range(5):
        state, _ = prog.step(state, i, True)
    for i in range(4):
        state, draw = prog.step(state, i, False)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(state.bart.tree_fit, axis=0)),
        np.asarray(state.bart.allfit), rtol=1e-3, atol=1e-3)
    vc = count_variable_use(cfg, state.bart.feature,
                            mf.bart_X.shape[1])
    np.testing.assert_array_equal(np.asarray(draw.varcount),
                                  np.asarray(vc))
    assert np.isfinite(float(draw.stan[0]))


def test_gibbs_program_sweep_kernel_rejects_f64():
    from stan4bart_tpu.formula import build_model_frame
    from stan4bart_tpu.gibbs import GibbsProgram
    from stan4bart_tpu.models.assemble import build_parametric_model
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    d = generate_friedman_data(60, ranef=True, causal=False)
    df = friedman_dataframe(d)
    mf = build_model_frame("y ~ bart(. - g.1 - g.2 - X4) + X4 + (1 | g.1)",
                           df)
    pm, _, _ = build_parametric_model(mf, "gaussian", {},
                                      dtype=jnp.float64)
    with pytest.raises(ValueError, match="float32"):
        GibbsProgram(pm, BartConfig(num_trees=3), mf.y, mf.bart_X,
                     warmup=2, iterations=2, sweep_kernel=True,
                     dtype=jnp.float64)
    # the in-sweep p_regrow form stays XLA-only
    pm32, _, _ = build_parametric_model(mf, "gaussian", {},
                                        dtype=jnp.float32)
    with pytest.raises(ValueError, match="p_regrow"):
        GibbsProgram(pm32, BartConfig(num_trees=3, p_regrow=0.3),
                     mf.y, mf.bart_X, warmup=2, iterations=2,
                     sweep_kernel=True, dtype=jnp.float32)


def test_gibbs_program_sweep_kernel_probit():
    """Binary/probit flow through the fused sweep: latents feed y_target
    each substep and draws stay finite."""
    from stan4bart_tpu.formula import build_model_frame
    from stan4bart_tpu.gibbs import GibbsProgram
    from stan4bart_tpu.models.assemble import build_parametric_model
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    d = generate_friedman_data(120, ranef=True, causal=False, binary=True)
    df = friedman_dataframe(d)
    mf = build_model_frame(
        "y ~ bart(. - g.1 - g.2 - X4) + X4 + (1 | g.1)", df
    )
    pm, _, _ = build_parametric_model(mf, "binomial", {},
                                      dtype=jnp.float32)
    prog = GibbsProgram(
        pm, BartConfig(num_trees=4, node_scale=3.0), mf.y, mf.bart_X,
        warmup=5, iterations=3, sweep_kernel=True, dtype=jnp.float32,
    )
    state = prog.init_state(jax.random.PRNGKey(0))
    for i in range(5):
        state, _ = prog.step(state, i, True)
    for i in range(3):
        state, draw = prog.step(state, i, False)
    assert np.all(np.isfinite(np.asarray(state.bart.allfit)))
    assert np.all(np.isfinite(np.asarray(state.latents)))
    assert np.isfinite(float(draw.stan[0]))


def test_batch_kernel_matches_vmapped_kernel():
    """Chain-blocked sweep == vmapped per-chain sweep on identical
    variates (chain-for-chain), including non-divisor chain counts."""
    from stan4bart_tpu.ops.bart_sweep_kernel import bart_sweep_fused_batch

    cfg, state, y, ranks, split_probs, consts = _setup()
    sigma = jnp.asarray(0.7, jnp.float32)
    C = 6
    keys = jax.random.split(jax.random.PRNGKey(5), C)
    u = jax.vmap(lambda k: jax.random.uniform(
        k, (T, 8), dtype=jnp.float32))(keys)
    zn = jax.vmap(lambda k: jax.random.normal(
        k, (T, 128), dtype=jnp.float32))(keys)

    def one(k, uu, zz):
        s, vc = bart_sweep_fused(cfg, state, y, consts, sigma, k,
                                 variates=(uu, zz), interpret=True)
        return s, vc

    sv, vcv = jax.vmap(one)(keys, u, zn)

    sb = jax.tree.map(lambda x: jnp.broadcast_to(x, (C,) + x.shape),
                      state)
    sigmas = jnp.full((C,), 0.7, jnp.float32)
    # chain_block=4 does not divide 6 -> picker falls back to 3
    s2, vc2 = bart_sweep_fused_batch(
        cfg, sb, jnp.broadcast_to(y, (C,) + y.shape), consts, sigmas,
        keys, chain_block=4, variates=(u, zn), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(sv.feature),
                                  np.asarray(s2.feature))
    np.testing.assert_array_equal(np.asarray(sv.cut), np.asarray(s2.cut))
    np.testing.assert_array_equal(np.asarray(sv.leaf_idx),
                                  np.asarray(s2.leaf_idx))
    np.testing.assert_array_equal(np.asarray(vcv), np.asarray(vc2))
    np.testing.assert_allclose(np.asarray(sv.leaf_value),
                               np.asarray(s2.leaf_value),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sv.allfit),
                               np.asarray(s2.allfit),
                               rtol=5e-4, atol=5e-4)


def test_step_batched_matches_vmapped_step():
    """GibbsProgram.step_batched == vmap(GibbsProgram.step) given the
    same chain states (identical RNG streams feed the sweep)."""
    from stan4bart_tpu.formula import build_model_frame
    from stan4bart_tpu.gibbs import GibbsProgram
    from stan4bart_tpu.models.assemble import build_parametric_model
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    d = generate_friedman_data(120, ranef=True, causal=False)
    df = friedman_dataframe(d)
    mf = build_model_frame(
        "y ~ bart(. - g.1 - g.2 - X4) + X4 + (1 | g.1)", df
    )
    pm, _, _ = build_parametric_model(mf, "gaussian", {},
                                      dtype=jnp.float32)
    prog = GibbsProgram(
        pm, BartConfig(num_trees=4), mf.y, mf.bart_X,
        warmup=4, iterations=3, sweep_kernel=True, dtype=jnp.float32,
    )
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    states = jax.vmap(prog.init_state)(keys)

    sv = states
    sb = states
    for i in range(3):
        sv, dv = jax.vmap(lambda s: prog.step(s, i, True),
                          axis_name="chains")(sv)
        sb, db = prog.step_batched(sb, i, True, chain_block=2)
        np.testing.assert_array_equal(np.asarray(sv.bart.feature),
                                      np.asarray(sb.bart.feature))
        np.testing.assert_allclose(np.asarray(dv.stan),
                                   np.asarray(db.stan),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(sv.bart.allfit),
                                   np.asarray(sb.bart.allfit),
                                   rtol=1e-3, atol=1e-3)


def test_step_batched_matches_vmapped_step_weighted_regrow():
    """The RNG-stream contract holds for the round-4 surfaces too:
    step_batched == vmap(step) with weighted likelihoods AND the
    post-sweep regrow refresh composed with the kernel."""
    from stan4bart_tpu.formula import build_model_frame
    from stan4bart_tpu.gibbs import GibbsProgram
    from stan4bart_tpu.models.assemble import build_parametric_model
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    d = generate_friedman_data(120, ranef=True, causal=False)
    df = friedman_dataframe(d)
    mf = build_model_frame(
        "y ~ bart(. - g.1 - g.2 - X4) + X4 + (1 | g.1)", df
    )
    pm, _, _ = build_parametric_model(mf, "gaussian", {},
                                      dtype=jnp.float32)
    w = np.random.default_rng(3).uniform(0.5, 2.0, 120)
    prog = GibbsProgram(
        pm, BartConfig(num_trees=4, regrow_per_sweep=2), mf.y,
        mf.bart_X, weights=w, warmup=4, iterations=3,
        sweep_kernel=True, dtype=jnp.float32,
    )
    keys = jax.random.split(jax.random.PRNGKey(5), 4)
    states = jax.vmap(prog.init_state)(keys)

    sv = states
    sb = states
    for i in range(3):
        sv, dv = jax.vmap(lambda s: prog.step(s, i, True),
                          axis_name="chains")(sv)
        sb, db = prog.step_batched(sb, i, True, chain_block=2)
        np.testing.assert_array_equal(np.asarray(sv.bart.feature),
                                      np.asarray(sb.bart.feature))
        np.testing.assert_array_equal(np.asarray(dv.varcount),
                                      np.asarray(db.varcount))
        np.testing.assert_allclose(np.asarray(sv.bart.allfit),
                                   np.asarray(sb.bart.allfit),
                                   rtol=1e-3, atol=1e-3)


def test_step_batched_keep_trees_and_skip_bart():
    """Batched driver with keep_trees draws and skip_bart=2 substeps."""
    from stan4bart_tpu.formula import build_model_frame
    from stan4bart_tpu.gibbs import GibbsProgram
    from stan4bart_tpu.models.assemble import build_parametric_model
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    d = generate_friedman_data(100, ranef=True, causal=False)
    df = friedman_dataframe(d)
    mf = build_model_frame(
        "y ~ bart(. - g.1 - g.2 - X4) + X4 + (1 | g.1)", df
    )
    pm, _, _ = build_parametric_model(mf, "gaussian", {},
                                      dtype=jnp.float32)
    prog = GibbsProgram(
        pm, BartConfig(num_trees=3), mf.y, mf.bart_X,
        warmup=3, iterations=2, skip_bart=2, keep_trees=True,
        sweep_kernel=True, dtype=jnp.float32,
    )
    keys = jax.random.split(jax.random.PRNGKey(9), 4)
    states, draws = prog.run_chains_batched(keys, keep_warmup=False,
                                            chain_block=2)
    # chain-major draws incl. tree arrays
    assert draws.stan.shape[0] == 4 and draws.stan.shape[1] == 2
    assert draws.tree_feature.shape == (4, 2, 3, 127)
    assert np.all(np.isfinite(np.asarray(draws.bart_train)))

    # vmapped reference with identical keys must agree
    def one(key):
        return prog.run_chain(key, keep_warmup=False)

    _, dv = jax.vmap(one, axis_name="chains")(keys)
    np.testing.assert_array_equal(np.asarray(dv.tree_feature),
                                  np.asarray(draws.tree_feature))
    np.testing.assert_allclose(np.asarray(dv.stan),
                               np.asarray(draws.stan),
                               rtol=3e-4, atol=3e-4)


def test_sliced_sweep_matches_xla_on_same_variates():
    """Lane-sliced kernel body (n_slices > 1, the large-n VMEM path)
    samples the same forests as the XLA sweep on shared variates —
    per-chain and chain-blocked variants."""
    from stan4bart_tpu.ops.bart_sweep_kernel import bart_sweep_fused_batch

    n = 600
    rng = np.random.default_rng(4)
    X = rng.normal(size=(n, P))
    y = (np.sin(X[:, 0]) + X[:, 1] ** 2
         + rng.normal(scale=0.5, size=n)).astype(np.float32)
    cfg = BartConfig(num_trees=T)
    cuts = bart_ops.make_cut_grid(X, cfg.n_cuts)
    ranks = bart_ops.compute_ranks(X, cuts)
    split_probs = np.full(P, 1.0 / P, dtype=np.float32)
    consts = make_sweep_consts(cfg, ranks, split_probs, lane_slice=256)
    assert consts.n_slices == 3, consts  # 640 -> npad 768, three slices
    state = bart_ops.bart_init(cfg, n, dtype=jnp.float32)
    yj = jnp.asarray(y)
    rj = jnp.asarray(ranks)
    sj = jnp.asarray(split_probs)
    sigma = jnp.asarray(0.7, jnp.float32)

    key = jax.random.PRNGKey(21)
    s_xla, s_ker = state, state
    for i in range(4):
        key, sub = jax.random.split(key)
        var = _draw_variates(sub)
        s_xla, vc_xla = bart_ops.bart_sweep(
            cfg, s_xla, yj, rj, sj, sigma, jax.random.PRNGKey(0),
            variates=var,
        )
        s_ker, vc_ker = bart_sweep_fused(
            cfg, s_ker, yj, consts, sigma, jax.random.PRNGKey(0),
            variates=var, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(s_xla.feature), np.asarray(s_ker.feature),
            err_msg=f"sliced sweep {i}: tree structures diverged",
        )
        np.testing.assert_array_equal(
            np.asarray(s_xla.leaf_idx), np.asarray(s_ker.leaf_idx))
        np.testing.assert_array_equal(np.asarray(vc_xla),
                                      np.asarray(vc_ker))
        np.testing.assert_allclose(
            np.asarray(s_xla.allfit), np.asarray(s_ker.allfit),
            rtol=5e-4, atol=5e-4,
        )

    # chain-blocked batch kernel over the sliced body
    C = 4
    keys = jax.random.split(jax.random.PRNGKey(5), C)
    u = jax.vmap(lambda k: jax.random.uniform(
        k, (T, 8), dtype=jnp.float32))(keys)
    zn = jax.vmap(lambda k: jax.random.normal(
        k, (T, 128), dtype=jnp.float32))(keys)
    sb = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (C,) + a.shape), state)
    sig_b = jnp.full((C,), 0.7, jnp.float32)
    s_batch, vc_batch = bart_sweep_fused_batch(
        cfg, sb, jnp.broadcast_to(yj, (C, n)), consts, sig_b, keys,
        chain_block=2, variates=(u, zn), interpret=True,
    )
    for c in range(C):
        s1, vc1 = bart_sweep_fused(
            cfg, state, yj, consts, sigma, keys[c],
            variates=(u[c], zn[c]), interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(s_batch.feature[c]), np.asarray(s1.feature))
        np.testing.assert_array_equal(np.asarray(vc_batch[c]),
                                      np.asarray(vc1))
        np.testing.assert_allclose(
            np.asarray(s_batch.allfit[c]), np.asarray(s1.allfit),
            rtol=5e-4, atol=5e-4,
        )


@pytest.mark.parametrize("tb", [2, 3])
def test_tree_blocked_batch_kernel_matches_unblocked(tb, monkeypatch):
    """S4B_SWEEP_TB > 1 (tree-blocked grid) samples bit-identical
    forests to the per-tree grid, including tree counts the block size
    does not divide (T=10 with tb=3 exercises the pl.when tail gate)
    and over CHAINED sweeps (the carried residual crosses block
    boundaries)."""
    from stan4bart_tpu.ops.bart_sweep_kernel import bart_sweep_fused_batch

    # the tb interpret programs are the largest in the suite (tb tree
    # bodies unrolled per grid step); compiling them on top of this
    # module's accumulated executables intermittently aborts/segfaults
    # XLA:CPU at full-suite scale — shed the cache first
    jax.clear_caches()

    cfg, state, y, ranks, split_probs, consts = _setup()
    C = 4
    keys = jax.random.split(jax.random.PRNGKey(9), C)
    sb = jax.tree.map(lambda x: jnp.broadcast_to(x, (C,) + x.shape),
                      state)
    yb = jnp.broadcast_to(y, (C,) + y.shape)
    sigmas = jnp.full((C,), 0.7, jnp.float32)

    def two_sweeps(tb_val):
        monkeypatch.setenv("S4B_SWEEP_TB", str(tb_val))
        s = sb
        for i in range(2):
            ks = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
            u = jax.vmap(lambda k: jax.random.uniform(
                k, (T, 8), dtype=jnp.float32))(ks)
            zn = jax.vmap(lambda k: jax.random.normal(
                k, (T, 128), dtype=jnp.float32))(ks)
            s, vc = bart_sweep_fused_batch(
                cfg, s, yb, consts, sigmas, ks, chain_block=2,
                variates=(u, zn), interpret=True)
        return s, vc

    s1, vc1 = two_sweeps(1)
    s2, vc2 = two_sweeps(tb)
    np.testing.assert_array_equal(np.asarray(s1.feature),
                                  np.asarray(s2.feature))
    np.testing.assert_array_equal(np.asarray(s1.cut), np.asarray(s2.cut))
    np.testing.assert_array_equal(np.asarray(s1.leaf_idx),
                                  np.asarray(s2.leaf_idx))
    np.testing.assert_array_equal(np.asarray(vc1), np.asarray(vc2))
    np.testing.assert_array_equal(np.asarray(s1.leaf_value),
                                  np.asarray(s2.leaf_value))
    np.testing.assert_array_equal(np.asarray(s1.allfit),
                                  np.asarray(s2.allfit))
