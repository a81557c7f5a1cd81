"""Observation sharding: the full Gibbs step over a 2-D (chains x data)
mesh — an explicit shard_map with hand-placed psums on every sufficient
statistic (parallel/mesh.run_obs_sharded) — must compile, run, and match
unsharded numerics at any shard count, including the padded,
probit-latent, and weighted paths."""

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


def test_obs_sharded_matches_vmapped_driver(prog):
    """The shard_map program samples the same chains as the plain
    single-device vmapped driver (same keys, same XLA sweep)."""
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    mesh_flat = chain_data_mesh(2, 1)
    _, d1 = run_obs_sharded(prog, keys, mesh_flat, n_iters=3)

    def run_one(key):
        state = prog.init_state(key)

        def body(st, it):
            return prog.step(st, it, False)

        return jax.lax.scan(body, state, jnp.arange(3))[1]

    d2 = jax.jit(jax.vmap(run_one))(keys)
    # same RNG stream; only the stepsize-search density differs in form
    # (anchored Gram vs direct — identical in real arithmetic)
    np.testing.assert_allclose(
        np.asarray(d1.stan), np.swapaxes(np.asarray(d2.stan), 0, 1),
        rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(d1.bart_train),
        np.swapaxes(np.asarray(d2.bart_train), 0, 1),
        rtol=1e-6, atol=1e-8)


def _make_prog(n, binary=False, weights=None, n_trees=5):
    d = generate_friedman_data(n, ranef=True, binary=binary)
    df = friedman_dataframe(d)
    mf = build_model_frame("y ~ bart(X1 + X2 + X3) + X4 + (1 | g.2)", df,
                           weights=weights)
    pm, _, _ = build_parametric_model(
        mf, "binomial" if binary else "gaussian")
    return GibbsProgram(
        pm, BartConfig(num_trees=n_trees, max_depth=4, n_cuts=16),
        mf.y, mf.bart_X, weights=mf.weights, warmup=4, iterations=4)


def test_obs_sharded_padding_exact():
    """N not divisible by the data mesh: weight-0 row-0 replicas must be
    EXACTLY equivalent — the padded 4-shard run matches the unpadded
    1-shard run on the real rows."""
    p = _make_prog(66)  # 66 % 4 = 2 -> pad 2
    keys = jax.random.split(jax.random.PRNGKey(2), 2)
    _, d1 = run_obs_sharded(p, keys, chain_data_mesh(2, 4), n_iters=3)
    _, d2 = run_obs_sharded(p, keys, chain_data_mesh(2, 1), n_iters=3)
    assert d1.bart_train.shape == d2.bart_train.shape == (3, 2, 66)
    np.testing.assert_allclose(np.asarray(d1.stan), np.asarray(d2.stan),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(d1.bart_train),
                               np.asarray(d2.bart_train),
                               rtol=1e-6, atol=1e-8)


def test_obs_sharded_probit_parity():
    """Probit latents are drawn from the GLOBAL stream and sliced, so
    the latent chain is identical at any shard count."""
    p = _make_prog(64, binary=True)
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    _, d1 = run_obs_sharded(p, keys, chain_data_mesh(2, 4), n_iters=3)
    _, d2 = run_obs_sharded(p, keys, chain_data_mesh(2, 1), n_iters=3)
    np.testing.assert_allclose(np.asarray(d1.stan), np.asarray(d2.stan),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(d1.bart_train),
                               np.asarray(d2.bart_train),
                               rtol=1e-6, atol=1e-8)


def test_obs_sharded_weighted_parity():
    rng = np.random.default_rng(0)
    w = rng.uniform(0.5, 2.0, size=64)
    p = _make_prog(64, weights=w)
    keys = jax.random.split(jax.random.PRNGKey(4), 2)
    _, d1 = run_obs_sharded(p, keys, chain_data_mesh(2, 4), n_iters=3)
    _, d2 = run_obs_sharded(p, keys, chain_data_mesh(2, 1), n_iters=3)
    np.testing.assert_allclose(np.asarray(d1.stan), np.asarray(d2.stan),
                               rtol=1e-6, atol=1e-8)


def test_obs_sharded_state_threading(prog):
    """Passing the returned (padded) state back in continues the chain:
    2 + 2 iterations == 4 iterations in one call."""
    keys = jax.random.split(jax.random.PRNGKey(6), 2)
    mesh = chain_data_mesh(2, 4)
    st, da = run_obs_sharded(prog, keys, mesh, n_iters=2)
    _, db = run_obs_sharded(prog, keys, mesh, n_iters=2, state=st)
    _, dc = run_obs_sharded(prog, keys, mesh, n_iters=4)
    got = np.concatenate([np.asarray(da.stan), np.asarray(db.stan)])
    np.testing.assert_allclose(got, np.asarray(dc.stan),
                               rtol=1e-12, atol=1e-12)


def test_obs_sharded_e2e_api():
    """stan_args={'obs_shards': 4} through the public stan4bart() entry:
    the fit dispatches to run_chains_obs_sharded on a chains x data mesh,
    is reproducible under the same seed, and the returned final state is
    unpadded (continue_sampling runs the global step on it)."""
    import stan4bart_tpu as s4b

    d = generate_friedman_data(66, ranef=True)  # 66 % 4 != 0 -> padding
    df = friedman_dataframe(d)
    kw = dict(chains=4, warmup=12, iter=30, seed=7, verbose=-1,
              bart_args={"n.trees": 4},
              stan_args={"obs_shards": 4})
    f1 = s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df, **kw)
    assert f1.draws.stan.shape[0] == 4
    assert np.all(np.isfinite(f1.extract("ev")))
    assert f1.extract("ev").shape[0] == 66
    f2 = s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df, **kw)
    np.testing.assert_array_equal(f1.draws.stan, f2.draws.stan)
    # final state was unpadded -> the global continue path runs
    more = f1.continue_sampling(iterations=4)
    assert more.draws.stan.shape[1] == f1.draws.stan.shape[1] + 4


def test_obs_shards_requires_gram():
    import stan4bart_tpu as s4b

    d = generate_friedman_data(64, ranef=True)
    df = friedman_dataframe(d)
    with pytest.raises(ValueError, match="[Gg]ram"):
        s4b.stan4bart(
            "y ~ bart(X1+X2) + X4 + (1 | g.2)", df, chains=2,
            warmup=4, iter=8, seed=1, verbose=-1,
            bart_args={"n.trees": 3},
            stan_args={"obs_shards": 4, "gram_lik": False},
        )


def test_single_psum_per_tree_update(prog):
    """The obs-sharded sweep must issue exactly ONE collective per tree
    update (round-5 demand: the naive form needs two — move scalars,
    then leaf statistics — and on real ICI the sweep's sequential
    dependency makes per-tree collective LATENCY the scaling floor).
    Pinned on the traced program: the per-tree scan body of bart_sweep
    under an obs axis contains a single psum site."""
    import jax
    from jax.sharding import PartitionSpec as P

    from stan4bart_tpu.ops import bart as B

    mesh = chain_data_mesh(1, 2)
    cfg = prog.bart_cfg
    N = prog.N // 2  # local shard
    state = B.bart_init(cfg, N)
    sp = jnp.full(prog.ranks.shape[1], 1.0 / prog.ranks.shape[1])

    def local_sweep(y, ranks):
        st, _ = B.bart_sweep(
            cfg, state, y, ranks, sp, jnp.asarray(1.0),
            jax.random.PRNGKey(0), axis_name="data")
        return st.allfit

    f = jax.shard_map(
        local_sweep, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=P("data"), check_vma=False)
    txt = str(jax.make_jaxpr(f)(
        jnp.zeros(prog.N), jnp.zeros((prog.N, prog.ranks.shape[1]),
                                     dtype=jnp.int32)))
    assert txt.count("psum") == 1, (
        f"expected exactly 1 psum site in the per-tree sweep body, "
        f"found {txt.count('psum')}")


def test_obs_sharded_chunked_equals_whole():
    """chunk_size through the public API on the obs-sharded dispatch:
    chunked execution threads the padded state between device
    executions (round-5, for time-capped backends) and must not change
    the draws."""
    import stan4bart_tpu as s4b

    d = generate_friedman_data(64, ranef=True)
    df = friedman_dataframe(d)
    kw = dict(chains=2, warmup=8, iter=20, seed=9, verbose=-1,
              bart_args={"n.trees": 3}, stan_args={"obs_shards": 4})
    f1 = s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df, **kw)
    f2 = s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df,
                       chunk_size=5, **kw)
    np.testing.assert_array_equal(np.asarray(f1.draws.stan),
                                  np.asarray(f2.draws.stan))
    assert f2.timings["warmup"] > 0 and f2.timings["sample"] > 0
