"""Vectorized BART sum-of-trees Gibbs sweep over flattened tree arrays.

TPU-native re-creation of the dbarts MCMC engine the reference binds at load
time (/root/reference/src/init.cpp:54-80, 1113-1147; capability surface in
SURVEY.md section 2.4).  Same statistical model — CGM'98 tree prior
``p(split at depth d) = base * (1 + d)^-power`` with ``split.probs`` variable
weights and uniform cutpoint selection over a precomputed grid; conjugate
normal leaf prior ``mu ~ N(0, sigma_mu^2)`` with
``sigma_mu = node_scale * range / (k * sqrt(T))`` and an optional
``chi(df, scale)`` hyperprior on ``k``; grow/prune/change Metropolis-Hastings
with integrated-likelihood ratios; truncated-normal latent sampling for
probit — but a different machine:

* pointer trees become fixed-shape heap arrays ``(T, MAXN)`` where node ``i``
  has children ``2i+1`` / ``2i+2``; ``feature == -1`` marks a leaf, ``-2`` an
  inactive node;
* observations carry precomputed integer cut ranks ``rank[n, v] =
  searchsorted(cuts[v], x[n, v])`` so every tree walk and split test is an
  int32 compare (no float gathers);
* per-leaf sufficient statistics are one-hot matmuls onto the MXU;
* the sequential-over-trees dependency runs as a ``lax.scan``; chains
  vectorize with ``vmap`` one level up.

Design deltas from dbarts (documented; statistically equivalent):
* trees operate in ORIGINAL response units — dbarts' [-0.5, 0.5] internal
  rescale (init.cpp:316-330) only affects the leaf prior scale, which we fold
  into ``sigma_mu`` directly; the warmup rescale schedule updates
  ``sigma_mu`` from the current ``range(y - offset)`` instead;
* tree depth is capped at ``max_depth`` (prior truncated: p_split = 0 at the
  cap) — with base .95 / power 2 the prior mass beyond depth 6 is negligible;
* grow/change proposals that would create an empty child are rejected
  (a restricted-kernel variant that preserves detailed balance).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BartConfig(NamedTuple):
    num_trees: int = 75
    max_depth: int = 6
    n_cuts: int = 100
    power: float = 2.0
    base: float = 0.95
    p_grow: float = 0.25
    p_prune: float = 0.25
    # p_change = 1 - p_grow - p_prune
    node_scale: float = 0.5      # 3.0 for binary (stan4bart_fit.R:478)
    k_init: float = 2.0
    # chi(df, scale) hyperprior on k; k_df = 0 means k fixed at k_init.
    # Default fixed (classic BART / dbarts sampler default k = 2): with the
    # Gibbs-coupled chain the sampled-k variant can settle in a
    # weak-shrinkage regime during early warmup (measured: sigma 1.13 vs
    # 1.05, cor .970 vs .979 on Friedman n=250), so chi is opt-in via
    # bart_args k = chi(df, scale) like the reference (stan4bart.R:202-210).
    k_df: float = 0.0
    k_scale: float = float("inf")
    # probability of attempting a subtree-regrow MH move per tree update
    # (beyond-reference tree-structure kernel, _subtree_regrow; 0 = off =
    # reference-parity move set).  XLA sweep path only for now.
    p_regrow: float = 0.0
    # cheap production shape of the same kernel: this many random
    # single-tree regrow + leaf-redraw updates appended per sweep
    # (random-scan composition; ~1 tree-move cost each instead of the
    # ~3x per-tree overhead of p_regrow).  0 = off.
    regrow_per_sweep: int = 0
    # fix the leaf-prior sd at this value and disable the data-dependent
    # range(y - offset) scaling + warmup decay schedule entirely.  Makes
    # the joint model a well-defined generative prior — required for
    # simulation-based calibration (benchmarks/sbc.py), where a
    # data-dependent prior would break rank uniformity by construction.
    # None = the default dbarts-parity data-driven sigma_mu.
    sigma_mu_fixed: float | None = None

    @property
    def max_nodes(self) -> int:
        return 2 ** (self.max_depth + 1) - 1


LEAF = -1
INACTIVE = -2


class BartState(NamedTuple):
    feature: jnp.ndarray     # (T, MAXN) int32: var index | LEAF | INACTIVE
    cut: jnp.ndarray         # (T, MAXN) int32 cut index
    leaf_value: jnp.ndarray  # (T, MAXN) float
    leaf_idx: jnp.ndarray    # (T, N) int32 node each obs lands in
    allfit: jnp.ndarray      # (N,) float: sum of tree fits (no offset)
    k: jnp.ndarray           # scalar: node-prior k
    sigma_mu: jnp.ndarray    # scalar: current leaf prior sd
    # (T, N) cached per-tree fitted values (= leaf_value[leaf_idx] of each
    # tree).  Carrying this across sweeps removes one full (N, MAXN)
    # one-hot build + MXU read per tree step — the sweep's dominant
    # memory traffic (BENCH_NOTES round-2 phase profile: the BART sweep
    # is 56% of iteration time).  Invariant: updated whenever leaf_value /
    # leaf_idx change (only inside bart_sweep).
    tree_fit: jnp.ndarray


def make_cut_grid(X: np.ndarray, n_cuts: int) -> np.ndarray:
    """Per-feature uniform cut grids over the observed range (dbarts
    'uniform' rule, numcut = n.cuts; stan4bart_fit.R:446-451)."""
    P = X.shape[1]
    cuts = np.zeros((P, n_cuts))
    for j in range(P):
        lo, hi = float(np.min(X[:, j])), float(np.max(X[:, j]))
        if hi <= lo:
            hi = lo + 1.0
        # interior cut points (exclusive of endpoints)
        cuts[j] = lo + (hi - lo) * (np.arange(1, n_cuts + 1) / (n_cuts + 1))
    return cuts


def compute_ranks(X: np.ndarray, cuts: np.ndarray) -> np.ndarray:
    """rank[n, v] = first cut index with cuts[v, c] >= x[n, v]; an obs goes
    left of split (v, c) iff rank[n, v] <= c.  Dispatches to the native
    C++ kernel when built (stan4bart_tpu/native.py)."""
    from stan4bart_tpu.native import rank_matrix

    return rank_matrix(X, cuts)


def bart_init(cfg: BartConfig, n_obs: int, dtype=jnp.float64) -> BartState:
    """All trees start as stumps (root leaf, value 0)."""
    T, M = cfg.num_trees, cfg.max_nodes
    feature = jnp.full((T, M), INACTIVE, dtype=jnp.int32)
    feature = feature.at[:, 0].set(LEAF)
    return BartState(
        feature=feature,
        cut=jnp.zeros((T, M), dtype=jnp.int32),
        leaf_value=jnp.zeros((T, M), dtype=dtype),
        leaf_idx=jnp.zeros((T, n_obs), dtype=jnp.int32),
        allfit=jnp.zeros(n_obs, dtype=dtype),
        k=jnp.asarray(cfg.k_init, dtype=dtype),
        sigma_mu=jnp.asarray(
            cfg.sigma_mu_fixed if cfg.sigma_mu_fixed is not None
            else cfg.node_scale / (cfg.k_init * np.sqrt(cfg.num_trees)),
            dtype=dtype,
        ),
        tree_fit=jnp.zeros((T, n_obs), dtype=dtype),
    )


def sample_trees_from_prior(cfg: BartConfig, rng, ranks, split_probs,
                            dtype=jnp.float64) -> BartState:
    """Draw tree STRUCTURES from the CGM prior (the reference's
    ``sampleTreesFromPrior`` chain init, init.cpp:261): level by level,
    each active leaf splits with probability base (1+d)^-power, variable ~
    split.probs, cutpoint uniform.  Leaf values start at 0 (sampled by the
    first sweep)."""
    T, M = cfg.num_trees, cfg.max_nodes
    n_obs = ranks.shape[0]
    p_split = jnp.asarray(split_prob_by_depth(cfg), dtype)
    depths = jnp.asarray(node_depths(cfg))
    sp_cum = jnp.cumsum(jnp.asarray(split_probs, dtype))

    u = jax.random.uniform(rng, (3, T, M), dtype)
    want_split = u[0] < p_split[depths][None, :]
    v = jnp.minimum(
        jnp.searchsorted(sp_cum, u[1].reshape(-1), side="right")
        .reshape(T, M).astype(jnp.int32),
        len(np.asarray(split_probs)) - 1,
    )
    c = jnp.minimum((u[2] * cfg.n_cuts).astype(jnp.int32), cfg.n_cuts - 1)

    # propagate activity down the heap: a node is active iff its parent
    # split; root always active
    feature = jnp.full((T, M), INACTIVE, dtype=jnp.int32)
    active = jnp.zeros((T, M), dtype=bool).at[:, 0].set(True)
    for i in range((M - 1) // 2):
        is_internal = active[:, i] & want_split[:, i]
        active = active.at[:, 2 * i + 1].set(is_internal)
        active = active.at[:, 2 * i + 2].set(is_internal)
        feature = feature.at[:, i].set(
            jnp.where(is_internal, v[:, i],
                      jnp.where(active[:, i], LEAF, INACTIVE))
        )
    # bottom level: any remaining active nodes are leaves
    bottom = (M - 1) // 2
    feature = feature.at[:, bottom:].set(
        jnp.where(active[:, bottom:], LEAF, INACTIVE)
    )
    cut = jnp.where(feature >= 0, c, 0)

    leaf_idx = jax.vmap(
        lambda f, ct: walk_tree(f, ct, ranks, cfg.max_depth)
    )(feature, cut)
    return BartState(
        feature=feature, cut=cut,
        leaf_value=jnp.zeros((T, M), dtype=dtype),
        leaf_idx=leaf_idx.astype(jnp.int32),
        allfit=jnp.zeros(n_obs, dtype=dtype),
        k=jnp.asarray(cfg.k_init, dtype=dtype),
        sigma_mu=jnp.asarray(
            cfg.sigma_mu_fixed if cfg.sigma_mu_fixed is not None
            else cfg.node_scale / (cfg.k_init * np.sqrt(cfg.num_trees)),
            dtype,
        ),
        tree_fit=jnp.zeros((T, n_obs), dtype=dtype),
    )


def node_depths(cfg: BartConfig) -> np.ndarray:
    return np.floor(np.log2(np.arange(cfg.max_nodes) + 1)).astype(np.int32)


def split_prob_by_depth(cfg: BartConfig) -> np.ndarray:
    """p_split(d) = base (1+d)^-power, truncated to 0 at max_depth."""
    d = np.arange(cfg.max_depth + 2, dtype=np.float64)
    p = cfg.base * (1.0 + d) ** (-cfg.power)
    p[cfg.max_depth :] = 0.0
    return p


def _pick_marked(mask, count, u):
    """Uniformly pick the index of one True entry of ``mask`` (count>0);
    ``u`` is a uniform(0,1) variate (drawn in the per-tree batch)."""
    target = jnp.floor(u * count).astype(jnp.int32)
    target = jnp.minimum(target, count.astype(jnp.int32) - 1)
    csum = jnp.cumsum(mask.astype(jnp.int32))
    return jnp.argmax(csum > target).astype(jnp.int32)


def _leaf_marginal_terms(n, s, sigma2, tau2, dtype):
    """Integrated-likelihood pieces that don't cancel in MH ratios:
    0.5 log(sigma2/(sigma2 + n tau2)) + tau2 s^2 / (2 sigma2 (sigma2+n tau2))."""
    denom = sigma2 + n * tau2
    return (0.5 * jnp.log(sigma2 / denom)
            + tau2 * s * s / (2.0 * sigma2 * denom)).astype(dtype)


def node_onehot(leaf_idx, max_nodes, dtype):
    """(N, MAXN) one-hot of node membership.  Built explicitly and shared:
    a fancy-index gather ``table[leaf_idx]`` compiles to a kCustom
    serialized gather on TPU (profiled at 0.4 ms per call at N=10k — it was
    the dominant cost of the whole sweep, 2 calls/tree); every table lookup
    in the hot path is instead an MXU matmul against this one-hot."""
    return (
        leaf_idx[:, None] == jnp.arange(max_nodes, dtype=jnp.int32)[None, :]
    ).astype(dtype)


def table_lookup(onehot, table):
    """values[n] = table[leaf_idx[n]] via (N, M) @ (M,) on the MXU."""
    return jnp.dot(onehot, table, precision=jax.lax.Precision.HIGHEST)


def leaf_stats(leaf_idx, resid, max_nodes, count_weights=None, onehot=None,
               axis_name=None):
    """Per-node (count, resid-sum) via a one-hot matmul (MXU-friendly:
    N x MAXN with MAXN padded near 128).  Full f32 accumulation — the MXU
    bf16 default loses ~3 digits on 10k-obs sufficient statistics.
    count_weights: per-obs likelihood weights replacing unit counts.
    axis_name: observation-sharded mode — the inputs are the local obs
    shard and the (2, MAXN) statistics are all-reduced over the mesh axis
    (the psum'd sufficient statistics of the obs-sharded sweep)."""
    if onehot is None:
        onehot = node_onehot(leaf_idx, max_nodes, resid.dtype)
    ones = (jnp.ones_like(resid) if count_weights is None
            else count_weights.astype(resid.dtype))
    stacked = jnp.stack([ones, resid])  # (2, N)
    out = jnp.dot(stacked, onehot, precision=jax.lax.Precision.HIGHEST)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out[0], out[1]


def walk_tree(feature, cut, ranks, max_depth):
    """Recompute leaf membership for one tree: (N,) node indices.

    All table lookups are one-hot matmuls (fancy-index gathers serialize on
    TPU — see node_onehot); this runs per draw for test-set predictions, so
    it is hot in causal fits."""
    N, P = ranks.shape
    M = feature.shape[0]
    dtype = jnp.float32
    node = jnp.zeros(N, dtype=jnp.int32)
    ranks_f = ranks.astype(dtype)
    feat_f = feature.astype(dtype)
    cut_f = cut.astype(dtype)
    for _ in range(max_depth):
        onehot = node_onehot(node, M, dtype)
        f = table_lookup(onehot, feat_f)
        is_internal = f >= 0
        v = jnp.maximum(f, 0.0).astype(jnp.int32)
        c = table_lookup(onehot, cut_f)
        onehot_v = (
            v[:, None] == jnp.arange(P, dtype=jnp.int32)[None, :]
        ).astype(dtype)
        rank_v = jnp.sum(ranks_f * onehot_v, axis=1)
        go_left = rank_v <= c
        child = 2 * node + jnp.where(go_left, 1, 2)
        node = jnp.where(is_internal, child, node)
    return node


def _tree_move(cfg, tree, resid, ranks, split_probs, sigma2, tau2, rng,
               depths, p_split, dtype, count_weights=None, u6=None,
               axis_name=None):
    """One grow/prune/change MH step for a single tree.

    tree = (feature (M,), cut (M,), leaf_idx (N,)).  Returns
    (feature, cut, leaf_idx, stats) where stats is None on the local
    path and the accepted per-node sufficient statistics
    (counts (M,), sums (M,)) on the obs-sharded path (so the caller's
    conjugate leaf draw needs no second reduction).

    The three moves share one unified data path (chains are vmapped, so a
    lax.switch would execute every branch per chain anyway): one member
    mask, three masked sufficient-statistic pairs, five shared
    integrated-likelihood terms, and move-selected accept/update logic.

    u6: optional (6,) pre-drawn uniforms replacing the internal draw —
    lets the fused Pallas sweep kernel and this XLA path be compared on
    identical randomness (see ops/bart_sweep_kernel.py).

    axis_name: observation-sharded mode (parallel/mesh.run_obs_sharded):
    resid/ranks/leaf_idx are the LOCAL obs shard and ONE psum over the
    mesh axis carries the entire per-node sufficient-statistic set for
    BOTH the current and the proposed partitions (the proposed partition
    ``new_leaf_idx`` depends only on replicated structure + RNG + local
    ranks, so it is computable before any reduction).  The six move
    scalars are derived from the per-node stats and the post-accept leaf
    statistics are a select between the two — one collective per tree
    update total, where the naive form needs two (measured eff(4 proxy
    shards) 0.55 -> see OBS_SCALING_r05).  Everything downstream is
    replicated-consistent because every shard sees identical proposal
    RNG and identical global statistics.
    """
    feature, cut, leaf_idx = tree
    M = cfg.max_nodes
    node_ids = jnp.arange(M, dtype=jnp.int32)
    left_ids = jnp.minimum(2 * node_ids + 1, M - 1)
    right_ids = jnp.minimum(2 * node_ids + 2, M - 1)

    # ONE batched uniform draw supplies every proposal variate (each extra
    # RNG op is a separate ~13us kernel launch on TPU)
    u = jax.random.uniform(rng, (6,), dtype=dtype) if u6 is None else u6
    u_move, u_leaf, u_nog, u_var, u_cut, u_acc = (
        u[0], u[1], u[2], u[3], u[4], u[5]
    )

    is_leaf = feature == LEAF
    is_internal = feature >= 0
    is_nog = (is_internal
              & (feature[left_ids] == LEAF) & (feature[right_ids] == LEAF))
    n_leaf = jnp.sum(is_leaf)
    n_nog = jnp.sum(is_nog)

    do_grow = u_move < cfg.p_grow
    do_prune = (~do_grow) & (u_move < cfg.p_grow + cfg.p_prune)

    # proposal draws ---------------------------------------------------
    # categorical via inverse CDF on the (static) split-prob cumsum
    v_new = jnp.searchsorted(
        jnp.cumsum(split_probs), u_var, side="right"
    ).astype(jnp.int32)
    v_new = jnp.minimum(v_new, split_probs.shape[0] - 1)
    c_new = jnp.minimum(
        jnp.floor(u_cut * cfg.n_cuts).astype(jnp.int32), cfg.n_cuts - 1
    )
    # column select as a one-hot matmul: dynamic-index column gathers also
    # hit the slow kCustom gather path (ranks values <= n_cuts are exact in
    # f32; the f32 cast is loop-invariant and hoisted out of the tree scan)
    onehot_v = (
        jnp.arange(ranks.shape[1], dtype=jnp.int32) == v_new
    ).astype(dtype)
    rank_v = jnp.dot(ranks.astype(dtype), onehot_v,
                     precision=jax.lax.Precision.HIGHEST)  # (N,)
    go_left_new = rank_v <= c_new.astype(dtype)
    log_u = jnp.log(u_acc)

    # node selection: a leaf for grow, a NOG node for prune/change
    eta_grow = _pick_marked(is_leaf, n_leaf, u_leaf)
    eta_pc = _pick_marked(is_nog, jnp.maximum(n_nog, 1), u_nog)
    eta = jnp.where(do_grow, eta_grow, eta_pc)
    lft = jnp.minimum(2 * eta + 1, M - 1)
    rgt = jnp.minimum(2 * eta + 2, M - 1)

    # unified masks & sufficient statistics -----------------------------
    is_lft = leaf_idx == lft
    members = jnp.where(do_grow, leaf_idx == eta, is_lft | (leaf_idx == rgt))
    # the PROPOSED partition — computable before any cross-shard
    # reduction (members/dest depend only on replicated structure + RNG
    # + local ranks), which is what lets the sharded path do one psum
    dest = jnp.where(do_prune, eta, jnp.where(go_left_new, lft, rgt))
    new_leaf_idx = jnp.where(members, dest, leaf_idx)

    stats_acc = None
    if axis_name is None:
        # NOTE on Pallas: a fused-stats kernel for these six masked sums
        # was built and measured NEUTRAL on-chip in round 1 (BENCH_NOTES
        # negative results) — at the 64-chain headline the per-kernel
        # launch overhead is amortized across the vmapped chain batch
        # (launch count is independent of the batch), so XLA's fusions
        # already sit at the bandwidth floor here; the kernel was removed
        # rather than shipped dead (round-1 verdict: win or delete).
        def masked_stats(mask):
            cw = (mask.astype(dtype) if count_weights is None
                  else jnp.where(mask, count_weights, 0.0))
            n = jnp.sum(cw)
            s = jnp.sum(jnp.where(mask, resid, 0.0))
            return n, s

        n_all, s_all = masked_stats(members)
        n_ln, s_ln = masked_stats(members & go_left_new)  # proposed left
        n_lo, s_lo = masked_stats(is_lft)                  # current left
    else:
        # obs-sharded: ONE psum per tree update (the collective-latency
        # floor of the sequential sweep) carrying [per-node sufficient
        # statistics of the CURRENT partition | the 2 proposed-left
        # scalars].  Everything else is derived: the remaining move
        # scalars fall out of the current-partition per-node stats, and
        # the ACCEPTED per-node stats (for the conjugate leaf draw) are
        # the current ones corrected at the only 3 nodes whose
        # membership changes (eta, lft, rgt) — corrections computable
        # from the psum'd scalars, so no second reduction and no extra
        # one-hot matmul over the proposed partition.
        cw = (jnp.ones_like(resid) if count_weights is None
              else count_weights.astype(dtype))
        oh_old = node_onehot(leaf_idx, M, dtype)
        mask_ln = members & go_left_new
        cw_ln = jnp.where(mask_ln, cw, 0.0)
        s_ln_loc = jnp.sum(jnp.where(mask_ln, resid, 0.0))
        C = jnp.concatenate([
            jnp.dot(jnp.stack([cw, resid]), oh_old,
                    precision=jax.lax.Precision.HIGHEST),   # (2, M)
            jnp.stack([jnp.sum(cw_ln), s_ln_loc])[:, None],
        ], axis=1)
        C = jax.lax.psum(C, axis_name)                      # (2, M+1)
        counts_old, sums_old = C[0, :M], C[1, :M]
        n_ln, s_ln = C[0, M], C[1, M]
        # eta/lft/rgt picks as a (3, M) one-hot matmul (scalar gathers
        # serialize on TPU)
        sel = (node_ids[None, :]
               == jnp.stack([eta, lft, rgt])[:, None]).astype(dtype)
        v = jnp.dot(sel, C[:, :M].T,
                    precision=jax.lax.Precision.HIGHEST)    # (3, 2)
        n_all = jnp.where(do_grow, v[0, 0], v[1, 0] + v[2, 0])
        s_all = jnp.where(do_grow, v[0, 1], v[1, 1] + v[2, 1])
        n_lo, s_lo = v[1, 0], v[1, 1]
    n_rn, s_rn = n_all - n_ln, s_all - s_ln
    n_ro, s_ro = n_all - n_lo, s_all - s_lo

    m_all = _leaf_marginal_terms(n_all, s_all, sigma2, tau2, dtype)
    m_ln = _leaf_marginal_terms(n_ln, s_ln, sigma2, tau2, dtype)
    m_rn = _leaf_marginal_terms(n_rn, s_rn, sigma2, tau2, dtype)
    m_lo = _leaf_marginal_terms(n_lo, s_lo, sigma2, tau2, dtype)
    m_ro = _leaf_marginal_terms(n_ro, s_ro, sigma2, tau2, dtype)

    # structure-prior and transition terms --------------------------------
    d = depths[eta]
    split_term = (
        jnp.log(p_split[d])
        + 2.0 * jnp.log1p(-p_split[jnp.minimum(d + 1, cfg.max_depth + 1)])
        - jnp.log1p(-p_split[d])
    )
    p_grow_move = jnp.asarray(cfg.p_grow, dtype)
    p_prune_move = jnp.asarray(cfg.p_prune, dtype)
    # grow: NOG count after the move (parent may stop being NOG)
    parent = jnp.maximum((eta - 1) // 2, 0)
    parent_was_nog = jnp.where(eta == 0, False, is_nog[parent])
    n_nog_grow = n_nog + 1 - parent_was_nog.astype(jnp.int32)
    log_trans_grow = (
        jnp.log(p_prune_move) - jnp.log(p_grow_move)
        + jnp.log(n_leaf.astype(dtype)) - jnp.log(n_nog_grow.astype(dtype))
    )
    log_trans_prune = (
        jnp.log(p_grow_move) - jnp.log(p_prune_move)
        + jnp.log(n_nog.astype(dtype))
        - jnp.log(jnp.maximum(n_leaf - 1, 1).astype(dtype))
    )

    log_accept = jnp.where(
        do_grow,
        split_term + log_trans_grow + (m_ln + m_rn - m_all),
        jnp.where(
            do_prune,
            -split_term + log_trans_prune + (m_all - m_lo - m_ro),
            m_ln + m_rn - m_lo - m_ro,  # change: symmetric proposal
        ),
    )
    valid = jnp.where(
        do_grow,
        (depths[eta] < cfg.max_depth) & (n_ln > 0) & (n_rn > 0),
        jnp.where(do_prune, n_nog > 0,
                  (n_nog > 0) & (n_ln > 0) & (n_rn > 0)),
    )
    accept = valid & (log_u < log_accept)

    # unified updates -------------------------------------------------------
    f_eta = jnp.where(do_prune, LEAF, v_new)
    f_child = jnp.where(do_prune, INACTIVE, LEAF)
    new_feature = feature.at[eta].set(f_eta)
    # change keeps children as leaves; grow creates them; prune removes
    new_feature = new_feature.at[lft].set(f_child).at[rgt].set(f_child)
    new_cut = cut.at[eta].set(jnp.where(do_prune, cut[eta], c_new))

    pick = lambda new, old: jnp.where(accept, new, old)  # noqa: E731
    if axis_name is not None:
        # accepted per-node stats = current-partition stats plus a
        # 3-node correction (only eta/lft/rgt change membership),
        # gated to zero on rejection — all terms already global
        hi = jax.lax.Precision.HIGHEST
        zero = jnp.zeros((), dtype)
        d_n = jnp.stack([
            jnp.where(do_prune, n_all, zero) - v[0, 0],
            jnp.where(do_prune, zero, n_ln) - v[1, 0],
            jnp.where(do_prune, zero, n_rn) - v[2, 0],
        ])
        d_s = jnp.stack([
            jnp.where(do_prune, s_all, zero) - v[0, 1],
            jnp.where(do_prune, zero, s_ln) - v[1, 1],
            jnp.where(do_prune, zero, s_rn) - v[2, 1],
        ])
        gate = accept.astype(dtype)
        stats_acc = (
            counts_old + gate * jnp.dot(d_n, sel, precision=hi),
            sums_old + gate * jnp.dot(d_s, sel, precision=hi),
        )
    return (pick(new_feature, feature), pick(new_cut, cut),
            pick(new_leaf_idx, leaf_idx), stats_acc)


def _subtree_regrow(cfg, tree, resid, ranks, split_probs, sigma2, tau2,
                    rng, depths, p_split, dtype, count_weights=None,
                    axis_name=None):
    """Subtree-regrow MH move (beyond-reference kernel; opt-in via
    ``cfg.p_regrow``): pick an active node eta uniformly, propose
    replacing the whole subtree rooted at eta with a fresh draw from the
    CGM structure prior (at eta's absolute depth), and accept with

        min(1, m(T') / m(T) * n_active(T) / n_active(T'))

    where m() is the integrated likelihood restricted to eta's subtree
    (everything outside it is identical and cancels).  The proposal
    density below eta IS the structure prior, so the prior terms cancel
    exactly — this is the independence-proposal analog of grow/prune/
    change that can teleport a whole subtree in one step, targeting the
    tree-structure relaxation timescale that carries the lp/sigma ESS
    floor (BENCH_NOTES).  Proposals with an empty active leaf are
    rejected (the same support convention as the grow move, matching
    dbarts' non-empty-leaf invariant).  Exactness is pinned against a
    brute-force enumerated posterior in tests/test_regrow.py.
    """
    feature, cut, leaf_idx = tree
    M = cfg.max_nodes
    node_ids = jnp.arange(M, dtype=jnp.int32)
    parent_ids = jnp.maximum((node_ids - 1) // 2, 0)

    rng_g, rng_u = jax.random.split(rng)
    g = jax.random.uniform(rng_g, (3,), dtype=dtype)
    u3 = jax.random.uniform(rng_u, (3, M), dtype=dtype)
    u_gate, u_sel, u_acc = g[0], g[1], g[2]

    active = feature != INACTIVE
    n_act = jnp.sum(active.astype(jnp.int32))
    eta = _pick_marked(active, n_act, u_sel)

    # heap mask of eta's subtree (eta included): walk each node's
    # ancestor chain up max_depth+1 steps
    anc = node_ids
    in_sub = jnp.zeros(M, dtype=bool)
    for _ in range(cfg.max_depth + 1):
        in_sub = in_sub | (anc == eta)
        anc = jnp.maximum((anc - 1) // 2, 0)

    # prior draw over the subtree: split decisions at ABSOLUTE depth
    # (the CGM prior is depth-from-root), activity propagated down from
    # eta only.  p_split is 0 at max_depth, so bottom slots stay leaves.
    want_split = u3[0] < p_split[depths]
    v_prop = jnp.minimum(
        jnp.searchsorted(jnp.cumsum(split_probs), u3[1], side="right")
        .astype(jnp.int32),
        split_probs.shape[0] - 1,
    )
    c_prop = jnp.minimum((u3[2] * cfg.n_cuts).astype(jnp.int32),
                         cfg.n_cuts - 1)
    act_new = jnp.zeros(M, dtype=bool).at[eta].set(True)
    for _ in range(cfg.max_depth):
        from_parent = (act_new[parent_ids] & want_split[parent_ids]
                       & (node_ids != 0))
        act_new = act_new | from_parent
    feat_prop = jnp.where(
        act_new & want_split, v_prop,
        jnp.where(act_new, LEAF, INACTIVE),
    ).astype(feature.dtype)
    cut_prop = jnp.where(feat_prop >= 0, c_prop, 0).astype(cut.dtype)

    new_feature = jnp.where(in_sub, feat_prop, feature)
    new_cut = jnp.where(in_sub, cut_prop, cut)
    new_leaf_idx = walk_tree(new_feature, new_cut, ranks, cfg.max_depth)

    counts_old, sums_old = leaf_stats(leaf_idx, resid, M,
                                      count_weights=count_weights)
    counts_new, sums_new = leaf_stats(new_leaf_idx, resid, M,
                                      count_weights=count_weights)
    if axis_name is not None:
        # one fused allreduce for both partitions' per-node statistics
        counts_old, sums_old, counts_new, sums_new = jax.lax.psum(
            jnp.stack([counts_old, sums_old, counts_new, sums_new]),
            axis_name)
    leaf_old = (feature == LEAF) & in_sub
    leaf_new = (new_feature == LEAF) & in_sub
    m_old = jnp.sum(jnp.where(
        leaf_old,
        _leaf_marginal_terms(counts_old, sums_old, sigma2, tau2, dtype),
        0.0))
    m_new = jnp.sum(jnp.where(
        leaf_new,
        _leaf_marginal_terms(counts_new, sums_new, sigma2, tau2, dtype),
        0.0))
    n_act_new = jnp.sum((new_feature != INACTIVE).astype(jnp.int32))

    log_accept = (m_new - m_old
                  + jnp.log(n_act.astype(dtype))
                  - jnp.log(n_act_new.astype(dtype)))
    valid = ~jnp.any(leaf_new & (counts_new <= 0))
    accept = ((u_gate < cfg.p_regrow) & valid
              & (jnp.log(u_acc) < log_accept))

    pick = lambda new, old: jnp.where(accept, new, old)  # noqa: E731
    # accepted per-node stats ride along so callers' conjugate leaf
    # draws need no further reduction (same contract as _tree_move)
    stats_acc = (pick(counts_new, counts_old), pick(sums_new, sums_old))
    return (pick(new_feature, feature), pick(new_cut, cut),
            pick(new_leaf_idx, leaf_idx), stats_acc)


def regrow_refresh(cfg: BartConfig, state: BartState, y_target, ranks,
                   split_probs, sigma, rng, weights=None, axis_name=None):
    """Random-scan subtree-regrow refreshes on a full forest state: pick
    a tree uniformly, attempt ONE whole-subtree regrow (exact MH,
    _subtree_regrow), then redraw its leaves from the conjugate
    conditional — repeated ``cfg.regrow_per_sweep`` times.  ~1 extra
    tree-update cost per refresh — the cheap production shape of the
    regrow kernel (the per-tree p_regrow form costs ~3x the whole
    sweep), against its measured ~10x faster structure mixing in
    isolation (tests/test_regrow.py, BENCH_NOTES round-2 regrow
    experiment).

    Standalone so it composes with BOTH sweep engines: ``bart_sweep``
    calls it in-line, and the fused Pallas kernel path
    (gibbs.GibbsProgram._maybe_regrow) runs it as a post-sweep XLA pass
    on the kernel's output state — a valid Metropolis-within-Gibbs
    composition either way.  k / sigma_mu are carried through
    unchanged.  Returns the refreshed BartState.
    """
    dtype = state.allfit.dtype
    sigma2 = (sigma * sigma).astype(dtype)
    tau2 = (state.sigma_mu * state.sigma_mu).astype(dtype)
    depths = jnp.asarray(node_depths(cfg))
    p_split = jnp.asarray(split_prob_by_depth(cfg), dtype=dtype)
    split_probs = jnp.asarray(split_probs, dtype=dtype)
    M = cfg.max_nodes
    w = None if weights is None else jnp.asarray(weights, dtype)
    cfg_on = cfg._replace(p_regrow=1.0)
    hi = jax.lax.Precision.HIGHEST
    t_ids = jnp.arange(cfg.num_trees, dtype=jnp.int32)

    def one_regrow(carry, key):
        feature, cut, leaf_value, leaf_idx, tree_fit, allfit = carry
        kj, kmv, kmu = jax.random.split(key, 3)
        j = jax.random.randint(kj, (), 0, cfg.num_trees)
        # row extraction as one-hot matmuls (gathers serialize on
        # TPU; all values are small ints, exact in f32)
        oh_j = (t_ids == j).astype(dtype)
        f_j = jnp.dot(oh_j, feature.astype(dtype),
                      precision=hi).astype(feature.dtype)
        c_j = jnp.dot(oh_j, cut.astype(dtype),
                      precision=hi).astype(cut.dtype)
        li_j = jnp.dot(oh_j, leaf_idx.astype(dtype),
                       precision=hi).astype(leaf_idx.dtype)
        fit_j = jnp.dot(oh_j, tree_fit, precision=hi)
        resid = y_target - allfit + fit_j
        wres = resid if w is None else w * resid
        f2, c2, li2, (counts, sums) = _subtree_regrow(
            cfg_on, (f_j, c_j, li_j), wres, ranks, split_probs,
            sigma2, tau2, kmv, depths, p_split, dtype,
            count_weights=w, axis_name=axis_name,
        )
        onehot_new = node_onehot(li2, M, dtype)
        post_var = 1.0 / (counts / sigma2 + 1.0 / tau2)
        post_mean = post_var * sums / sigma2
        mu = post_mean + jnp.sqrt(post_var) * jax.random.normal(
            kmu, (M,), dtype)
        lv2 = jnp.where(f2 == LEAF, mu, 0.0)
        new_fit = table_lookup(onehot_new, lv2)
        sel = (t_ids == j)[:, None]
        carry = (
            jnp.where(sel, f2[None, :], feature),
            jnp.where(sel, c2[None, :], cut),
            jnp.where(sel, lv2[None, :], leaf_value),
            jnp.where(sel, li2[None, :], leaf_idx),
            jnp.where(sel, new_fit[None, :], tree_fit),
            allfit + new_fit - fit_j,
        )
        return carry, None

    carry = (state.feature, state.cut, state.leaf_value, state.leaf_idx,
             state.tree_fit, state.allfit)
    carry, _ = jax.lax.scan(
        one_regrow, carry, jax.random.split(rng, cfg.regrow_per_sweep))
    feature, cut, leaf_value, leaf_idx, tree_fit, allfit = carry
    return state._replace(
        feature=feature, cut=cut, leaf_value=leaf_value,
        leaf_idx=leaf_idx, tree_fit=tree_fit, allfit=allfit,
    )


def bart_sweep(cfg: BartConfig, state: BartState, y_target, ranks,
               split_probs, sigma, rng, weights=None, variates=None,
               axis_name=None):
    """One full Gibbs sweep over all trees (the reference's
    ``runSamplerWithResults`` with numSamples=1, init.cpp:821-824).

    y_target: response minus the parametric offset (original units; for
    probit, the latent z minus the offset).  sigma: residual sd (1 for
    probit).  weights: optional per-observation likelihood weights —
    y_i ~ N(fit_i, sigma^2 / w_i), entering every sufficient statistic as
    (sum w, sum w r) exactly as dbarts' weighted sampler does
    (data.bart@weights, stan4bart_fit.R:436).  Returns (state, varcount).

    variates: optional pre-drawn ``(u (T, >=6), zn (T, >=M))`` proposal
    uniforms / leaf normals replacing the per-tree RNG — the
    same-randomness contract shared with the fused Pallas sweep
    (ops/bart_sweep_kernel.py), used to verify the two paths sample the
    same forests.

    axis_name: observation-sharded mode — every obs-sized input
    (y_target, ranks, weights, state.{leaf_idx, allfit, tree_fit}) is the
    LOCAL shard of a 'data' mesh axis and every sufficient statistic is
    all-reduced over it (see _tree_move / leaf_stats).  Tree structures,
    leaf values, and the RNG stream are replicated across the axis by
    construction, so the updated forest is identical on every shard.
    This is the distributed form of the sweep (the reference's only
    big-axis answer is single-core CSR, continuous.hpp:1176-1197); the
    fused Pallas kernel cannot host per-tree collectives inside one
    kernel launch, so the obs-sharded path composes XLA one-hot-matmul
    statistics with psums instead.
    """
    if (cfg.p_regrow > 0 or cfg.regrow_per_sweep > 0) \
            and variates is not None:
        raise ValueError(
            "the regrow kernels are not supported on the "
            "pre-drawn-variates path (fused sweep kernel) yet — use the "
            "XLA sweep"
        )
    dtype = state.allfit.dtype
    sigma2 = (sigma * sigma).astype(dtype)
    tau2 = (state.sigma_mu * state.sigma_mu).astype(dtype)
    depths = jnp.asarray(node_depths(cfg))
    p_split = jnp.asarray(split_prob_by_depth(cfg), dtype=dtype)
    split_probs = jnp.asarray(split_probs, dtype=dtype)
    M = cfg.max_nodes

    w = None if weights is None else jnp.asarray(weights, dtype)

    def per_tree(carry, inputs):
        allfit, rng = carry
        if variates is None:
            feature_j, cut_j, leaf_value_j, leaf_idx_j, fit_j = inputs
            u6_j = zn_j = None
            if cfg.p_regrow > 0:
                rng, rng_move, rng_regrow, rng_mu = (
                    jax.random.split(rng, 4))
            else:
                rng, rng_move, rng_mu = jax.random.split(rng, 3)
        else:
            (feature_j, cut_j, leaf_value_j, leaf_idx_j, fit_j,
             u6_j, zn_j) = inputs
            rng_move = rng_mu = rng

        # fit_j is the cached leaf_value[leaf_idx] of this tree (the
        # BartState.tree_fit invariant) — no one-hot rebuild needed here
        resid = y_target - allfit + fit_j
        # weighted sufficient statistics: (sum w, sum w r) with w = 1 o.w.
        wresid = resid if w is None else w * resid

        feature_j, cut_j, leaf_idx_j, stats = _tree_move(
            cfg, (feature_j, cut_j, leaf_idx_j), wresid, ranks,
            split_probs, sigma2, tau2, rng_move, depths, p_split, dtype,
            count_weights=w, u6=u6_j, axis_name=axis_name,
        )
        if cfg.p_regrow > 0 and variates is None:
            # composed second MH kernel per tree update (valid
            # Metropolis-within-Gibbs composition)
            feature_j, cut_j, leaf_idx_j, stats = _subtree_regrow(
                cfg, (feature_j, cut_j, leaf_idx_j), wresid, ranks,
                split_probs, sigma2, tau2, rng_regrow, depths, p_split,
                dtype, count_weights=w, axis_name=axis_name,
            )

        # conjugate leaf-mean draws for all leaves of this tree.
        # NOTE: a Pallas VMEM-only kernel pair for these two one-hot
        # consumers was built and measured 5x SLOWER on-chip (149.7 vs
        # 764.4 draws/s at the 64-chain headline, round 2): XLA fuses the
        # one-hot generation into the MXU matmul (it is never
        # materialized in HBM), while a (TILE_N, 1) column layout wastes
        # 127/128 VPU lanes.  Keep the one-hot matmul formulation.
        onehot_new = node_onehot(leaf_idx_j, M, dtype)
        if stats is None:
            counts, sums = leaf_stats(leaf_idx_j, wresid, M,
                                      count_weights=w, onehot=onehot_new)
        else:
            # the move kernel already carries the accepted (possibly
            # psum'd) per-node statistics — no second reduction
            counts, sums = stats
        post_var = 1.0 / (counts / sigma2 + 1.0 / tau2)
        post_mean = post_var * sums / sigma2
        noise = (jax.random.normal(rng_mu, (M,), dtype)
                 if variates is None else zn_j[:M].astype(dtype))
        mu = post_mean + jnp.sqrt(post_var) * noise
        leaf_value_j = jnp.where(feature_j == LEAF, mu, 0.0)

        new_fit_j = table_lookup(onehot_new, leaf_value_j)
        allfit = allfit + new_fit_j - fit_j
        return (allfit, rng), (feature_j, cut_j, leaf_value_j, leaf_idx_j,
                               new_fit_j)

    scan_xs = (state.feature, state.cut, state.leaf_value, state.leaf_idx,
               state.tree_fit)
    if variates is not None:
        u_all, zn_all = variates
        scan_xs = scan_xs + (u_all[:, :6].astype(dtype),
                             zn_all.astype(dtype))
    (allfit, rng), (feature, cut, leaf_value, leaf_idx, tree_fit) = (
        jax.lax.scan(per_tree, (state.allfit, rng), scan_xs)
    )

    if cfg.regrow_per_sweep > 0 and variates is None:
        rng, rng_rg = jax.random.split(rng)
        tmp = state._replace(
            feature=feature, cut=cut, leaf_value=leaf_value,
            leaf_idx=leaf_idx, tree_fit=tree_fit, allfit=allfit,
        )
        tmp = regrow_refresh(cfg, tmp, y_target, ranks, split_probs,
                             sigma, rng_rg, weights=weights,
                             axis_name=axis_name)
        feature, cut, leaf_value, leaf_idx, tree_fit, allfit = (
            tmp.feature, tmp.cut, tmp.leaf_value, tmp.leaf_idx,
            tmp.tree_fit, tmp.allfit,
        )

    # optional chi(df, scale) hyperprior draw for k (dbarts normal-prior
    # hyperprior; SURVEY.md section 2.4)
    k = state.k
    sigma_mu = state.sigma_mu
    if cfg.k_df > 0:
        rng, rng_k = jax.random.split(rng)
        is_leaf_all = feature == LEAF
        m = jnp.sum(is_leaf_all.astype(dtype))
        # leaf values ~ N(0, (A/k)^2) with A = k * sigma_mu (current)
        A = state.k * state.sigma_mu
        ssq = jnp.sum(jnp.where(is_leaf_all, leaf_value, 0.0) ** 2)
        rate = ssq / (2.0 * A * A)
        if np.isfinite(cfg.k_scale):
            rate = rate + 1.0 / (2.0 * cfg.k_scale**2)
        shape = (cfg.k_df + m) / 2.0
        g = jax.random.gamma(rng_k, shape, dtype=dtype) / rate
        k = jnp.sqrt(g)
        sigma_mu = A / k

    new_state = BartState(
        feature=feature, cut=cut, leaf_value=leaf_value,
        leaf_idx=leaf_idx, allfit=allfit, k=k, sigma_mu=sigma_mu,
        tree_fit=tree_fit,
    )
    varcount = count_variable_use(cfg, feature, split_probs.shape[0])
    return new_state, varcount


def count_variable_use(cfg: BartConfig, feature, n_vars):
    """varcount: number of splits per variable across all trees."""
    internal = feature >= 0
    onehot = (
        jnp.where(internal, feature, n_vars)[..., None]
        == jnp.arange(n_vars, dtype=jnp.int32)
    )
    return jnp.sum(onehot, axis=(0, 1)).astype(jnp.int32)


def sample_probit_latents(allfit_plus_offset, y, rng, dtype, u=None):
    """z_i ~ TruncNormal(mean_i, 1) on the side implied by y_i (dbarts
    probit latent flow; init.cpp:289, 843-847).

    u: optional pre-drawn uniforms in (0, 1) replacing the internal draw
    — the obs-sharded driver draws them from the GLOBAL-shape stream and
    slices the local shard, so every observation sees the same variate
    at any shard count (shard-local draws from a replicated key would be
    identical across shards — correlated latents — and per-shard folded
    keys would break cross-shard-count reproducibility).

    Small-tail inverse-CDF form: sampling u' in (p0, 1) overflows to
    exactly 1.0 in f32 whenever the constraint probability is tiny
    (ndtri(1) = inf -> NaN cascade, observed at n=10k on TPU).  Instead
    draw within the allowed tail measured from ITS OWN side —
    v = u * P(allowed side) stays far from 1 and ndtri is accurate near 0:

        y=1:  z = mean - ndtri(u * Phi(mean))   (> 0 by construction)
        y=0:  z = mean + ndtri(u * Phi(-mean))  (<= 0 by construction)
    """
    from jax.scipy.special import ndtri
    from jax.scipy.stats import norm as jnorm

    mean = allfit_plus_offset
    if u is None:
        u = jax.random.uniform(rng, mean.shape, dtype=dtype,
                               minval=1e-7, maxval=1.0 - 1e-7)
    side_prob = jnp.where(y > 0, jnorm.cdf(mean), jnorm.cdf(-mean))
    v = jnp.clip(u * side_prob, 1e-30, 1.0 - 1e-7)
    q = ndtri(v)
    z = jnp.where(y > 0, mean - q, mean + q)
    # guard the extreme-underflow corner (|mean| > ~11 in f32)
    return jnp.clip(z, -30.0, 30.0)


def predict_trees(cfg: BartConfig, feature, cut, leaf_value, ranks_new):
    """Evaluate a stored tree ensemble on new data (the reference's
    ``stan4bart_predictBART``, init.cpp:354-416): sum over trees of the leaf
    value each row lands in."""
    def one_tree(tree):
        f, c, lv = tree
        node = walk_tree(f, c, ranks_new, cfg.max_depth)
        onehot = node_onehot(node, cfg.max_nodes, lv.dtype)
        return table_lookup(onehot, lv)

    fits = jax.vmap(one_tree)((feature, cut, leaf_value))
    return jnp.sum(fits, axis=0)
