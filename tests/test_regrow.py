"""Exactness of the subtree-regrow MH kernel (ops/bart._subtree_regrow).

The kernel's stationary distribution over single-tree STRUCTURES (leaf
values marginalized out) is pi(T) ∝ prior(T) * prod_leaves m_leaf(T) —
brute-force enumerable at max_depth=2, V=2 features, 2 cutpoints.  A
regrow-only chain's empirical structure frequencies must match the
enumerated posterior (the same adjudication style as the interweaving
kernels' autodiff moment pins).  No reference counterpart: the regrow
move is a beyond-reference kernel; the grow/prune/change set it composes
with follows dbarts' sampler semantics (SURVEY.md section 2.4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stan4bart_tpu.ops import bart as B

LEAF, INACTIVE = B.LEAF, B.INACTIVE


def _setup(n=12, seed=3):
    rs = np.random.RandomState(seed)
    X = rs.uniform(size=(n, 2))
    y = np.where(X[:, 0] > 0.5, 1.2, -0.8) + 0.3 * rs.normal(size=n)
    cfg = B.BartConfig(num_trees=1, max_depth=2, n_cuts=2,
                       p_regrow=1.0)
    cuts = B.make_cut_grid(X, cfg.n_cuts)
    ranks = np.asarray(B.compute_ranks(X, cuts))
    return cfg, X, y, ranks


def _leaf_marginal_np(n, s, sigma2, tau2):
    denom = sigma2 + n * tau2
    return 0.5 * np.log(sigma2 / denom) + tau2 * s * s / (
        2.0 * sigma2 * denom)


def _encode(feature, cut):
    """Unique int code of (feature, cut): per node (feature+2)*2 + cut
    in [0, 8), base-8 over the 7 heap slots."""
    f = np.asarray(feature) + 2
    c = np.asarray(cut)
    digits = f * 2 + c
    return int(np.dot(digits, 8 ** np.arange(7)))


def _enumerate_posterior(cfg, y, ranks, sigma2, tau2):
    """All depth<=2 structures with non-empty leaves -> {code: prob}."""
    V, C = 2, cfg.n_cuts
    p_split = B.split_prob_by_depth(cfg)  # indexed by depth

    def leaf_assign(feature, cut):
        node = np.zeros(len(y), dtype=int)
        for _ in range(cfg.max_depth):
            f = feature[node]
            internal = f >= 0
            go_left = np.zeros(len(y), dtype=bool)
            for i in range(len(y)):
                if internal[i]:
                    go_left[i] = ranks[i, f[i]] <= cut[node[i]]
            child = 2 * node + np.where(go_left, 1, 2)
            node = np.where(internal, child, node)
        return node

    options = [None] + [(v, c) for v in range(V) for c in range(C)]
    log_post = {}
    for root in options:
        if root is None:
            cand = [(np.array([LEAF] + [INACTIVE] * 6),
                     np.zeros(7, dtype=int),
                     np.log(1 - p_split[0]))]
        else:
            cand = []
            lp_root = np.log(p_split[0]) - np.log(V * C)
            for left in options:
                for right in options:
                    feature = np.full(7, INACTIVE)
                    cut = np.zeros(7, dtype=int)
                    feature[0], cut[0] = root[0], root[1]
                    lp = lp_root
                    for slot, spec, kids in ((1, left, (3, 4)),
                                             (2, right, (5, 6))):
                        if spec is None:
                            feature[slot] = LEAF
                            lp += np.log(1 - p_split[1])
                        else:
                            feature[slot], cut[slot] = spec
                            feature[kids[0]] = feature[kids[1]] = LEAF
                            lp += np.log(p_split[1]) - np.log(V * C)
                            # depth-2 leaves: p_split = 0, factor 1
                    cand.append((feature, cut, lp))
        for feature, cut, lp in cand:
            node = leaf_assign(feature, cut)
            leaves = np.where(feature == LEAF)[0]
            counts = np.array([np.sum(node == j) for j in leaves])
            if np.any(counts == 0):
                continue  # outside the sampler's support
            sums = np.array([np.sum(y[node == j]) for j in leaves])
            m = np.sum(_leaf_marginal_np(counts, sums, sigma2, tau2))
            log_post[_encode(feature, cut)] = lp + m
    mx = max(log_post.values())
    z = sum(np.exp(v - mx) for v in log_post.values())
    return {k: np.exp(v - mx) / z for k, v in log_post.items()}


def test_regrow_matches_enumerated_posterior():
    cfg, X, y, ranks = _setup()
    sigma2, tau2 = 0.5, 0.4
    exact = _enumerate_posterior(cfg, y, ranks, sigma2, tau2)
    assert len(exact) > 20

    depths = jnp.asarray(B.node_depths(cfg))
    p_split = jnp.asarray(B.split_prob_by_depth(cfg), jnp.float64)
    sp = jnp.asarray(np.full(2, 0.5), jnp.float64)
    ranks_j = jnp.asarray(ranks)
    y_j = jnp.asarray(y)
    w8 = jnp.asarray(8 ** np.arange(7), jnp.int64)

    def step(tree, key):
        feature, cut, leaf_idx, _ = B._subtree_regrow(
            cfg, tree, y_j, ranks_j, sp,
            jnp.asarray(sigma2, jnp.float64),
            jnp.asarray(tau2, jnp.float64),
            key, depths, p_split, jnp.float64,
        )
        tree = (feature, cut, leaf_idx)
        code = jnp.sum(((feature + 2) * 2 + cut).astype(jnp.int64) * w8)
        return tree, code

    feature0 = jnp.asarray(
        np.array([LEAF] + [INACTIVE] * 6, dtype=np.int32))
    cut0 = jnp.zeros(7, dtype=jnp.int32)
    leaf0 = jnp.zeros(len(y), dtype=jnp.int32)
    n_steps, burn = 200_000, 2_000
    keys = jax.random.split(jax.random.PRNGKey(11), n_steps + burn)
    _, codes = jax.lax.scan(step, (feature0, cut0, leaf0), keys)
    codes = np.asarray(codes)[burn:]

    # every visited structure is in the enumerated support
    uniq, cnt = np.unique(codes, return_counts=True)
    assert set(uniq.tolist()) <= set(exact.keys())
    emp = dict(zip(uniq.tolist(), cnt / len(codes)))

    tv = 0.5 * sum(abs(emp.get(k, 0.0) - p) for k, p in exact.items())
    assert tv < 0.025, f"total variation {tv:.4f}"
    worst = max(abs(emp.get(k, 0.0) - p) for k, p in exact.items())
    assert worst < 0.015, f"worst structure prob gap {worst:.4f}"


def test_regrow_guards():
    cfg, X, y, ranks = _setup()
    state = B.bart_init(cfg, len(y))
    u = jnp.zeros((1, 6)); zn = jnp.zeros((1, cfg.max_nodes))
    with pytest.raises(ValueError, match="regrow"):
        B.bart_sweep(cfg, state, jnp.asarray(y), jnp.asarray(ranks),
                     np.full(2, 0.5), jnp.asarray(1.0),
                     jax.random.PRNGKey(0), variates=(u, zn))


def test_regrow_sweep_smoke_and_sanity():
    """bart_sweep with p_regrow>0 runs, keeps the tree_fit/allfit
    invariants, and fits signal comparably to the reference move set."""
    rs = np.random.RandomState(0)
    n = 150
    X = rs.uniform(size=(n, 3))
    y = np.sin(4 * X[:, 0]) + X[:, 1] + 0.2 * rs.normal(size=n)
    cfg = B.BartConfig(num_trees=20, max_depth=3, n_cuts=16,
                       p_regrow=0.3)
    cuts = B.make_cut_grid(X, cfg.n_cuts)
    ranks = jnp.asarray(np.asarray(B.compute_ranks(X, cuts)))
    sp = np.full(3, 1.0 / 3.0)
    state = B.bart_init(cfg, n)
    y_j = jnp.asarray(y - y.mean())

    @jax.jit
    def many(state, key):
        def body(st, k):
            st, _ = B.bart_sweep(cfg, st, y_j, ranks, sp,
                                 jnp.asarray(0.3), k)
            return st, None
        st, _ = jax.lax.scan(body, state, jax.random.split(key, 60))
        return st

    state = many(state, jax.random.PRNGKey(1))
    fit = np.asarray(state.allfit)
    assert np.all(np.isfinite(fit))
    # tree_fit invariant: allfit == sum of per-tree fits
    assert np.allclose(fit, np.asarray(state.tree_fit).sum(0), atol=1e-8)
    assert np.corrcoef(fit, y - y.mean())[0, 1] > 0.8


def test_regrow_per_sweep_smoke_and_sanity():
    """The cheap random-scan shape (regrow_per_sweep) keeps the same
    invariants and fit quality."""
    rs = np.random.RandomState(2)
    n = 150
    X = rs.uniform(size=(n, 3))
    y = np.sin(4 * X[:, 0]) + X[:, 1] + 0.2 * rs.normal(size=n)
    cfg = B.BartConfig(num_trees=20, max_depth=3, n_cuts=16,
                       regrow_per_sweep=3)
    cuts = B.make_cut_grid(X, cfg.n_cuts)
    ranks = jnp.asarray(np.asarray(B.compute_ranks(X, cuts)))
    sp = np.full(3, 1.0 / 3.0)
    state = B.bart_init(cfg, n)
    y_j = jnp.asarray(y - y.mean())

    @jax.jit
    def many(state, key):
        def body(st, k):
            st, _ = B.bart_sweep(cfg, st, y_j, ranks, sp,
                                 jnp.asarray(0.3), k)
            return st, None
        st, _ = jax.lax.scan(body, state, jax.random.split(key, 60))
        return st

    state = many(state, jax.random.PRNGKey(1))
    fit = np.asarray(state.allfit)
    assert np.all(np.isfinite(fit))
    assert np.allclose(fit, np.asarray(state.tree_fit).sum(0), atol=1e-8)
    # per-tree fit cache consistent with leaf_value[leaf_idx]
    lv = np.asarray(state.leaf_value)
    li = np.asarray(state.leaf_idx)
    rebuilt = np.take_along_axis(lv, li, axis=1)
    assert np.allclose(rebuilt, np.asarray(state.tree_fit), atol=1e-8)
    assert np.corrcoef(fit, y - y.mean())[0, 1] > 0.8
