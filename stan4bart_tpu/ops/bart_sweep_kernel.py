"""Whole-sweep fused BART Gibbs kernel (Pallas/Mosaic TPU).

The XLA sweep (ops/bart.py:bart_sweep) is a 75-step ``lax.scan`` whose
per-tree body compiles to ~8-12 fused kernels; on this chip+tunnel each
scan step carries a fixed runtime overhead that is independent of the
vmapped chain count, and the measured cost is ~0.9 ms/tree for the whole
64-chain batch — 66.7 of the 83.6 ms Gibbs iteration (80%;
benchmarks/profile_phases.py, BENCH_NOTES round-2).  Per-op surgery
never moved that number (round-1/2 negative results); the remaining
lever named in BENCH_NOTES is whole-phase consolidation.  This module
implements it: ONE ``pallas_call`` executes the entire sequential
sweep — grid ``(trees,)`` per chain, batched by ``vmap`` into a
``(chains, trees)`` grid (chains outer, trees minor: jax prepends the
batch axis, pallas_call.py:714) — with the running residual carried in
a VMEM scratch accumulator across the tree dimension.

Statistical semantics are IDENTICAL to ops/bart.py (same CGM prior,
restricted grow/change kernel, conjugate leaf draws; reference behavior
at /root/reference/src/init.cpp:821-824 via dbarts): both paths consume
the same pre-drawn uniform/normal variates, so they can be compared on
identical randomness (tests/test_sweep_kernel.py asserts structural
equality of the sampled forests).

TPU-native design notes (the layout rules that make Mosaic happy here):

* every per-observation array is a ``(1, NPAD)`` row (obs in lanes);
  every per-node array is a ``(1, 128)`` row (heap nodes in lanes,
  ``max_nodes`` <= 128 padded with INACTIVE);
* NO gathers and NO dynamic slicing anywhere: heap child lookups,
  cut-column selection, depth/prior lookups and node picks are all
  one-hot contractions against in-kernel ``broadcasted_iota`` masks
  (the same one-hot-matmul rule the XLA path established — gathers
  serialize on TPU);
* the node-membership one-hot ``M[node, obs]`` is generated ONCE per
  tree as a (128, NPAD) compare, reduced along lanes for the leaf
  sufficient statistics, and reused as the matmul operand for the
  fitted-value lookup ``fit = leaf_values @ M``;
* inclusive cumulative sums (uniform node picks) ride the MXU against a
  constant upper-triangular matrix — Mosaic has no native lane scan;
* all move logic is arithmetic blending over f32 0/1 masks (no
  scalar-predicated vector selects — Mosaic lowering restriction), with
  every ``log`` argument clamped so invalid-move branches stay finite
  (a NaN would poison the blend);
* scalars (sigma^2, tau^2, the six proposal uniforms) live in SMEM as
  full arrays (Mosaic requires SMEM blocks to equal the array shape)
  indexed by ``pl.program_id(0)`` — which is vmap-safe: Mosaic's
  ``user_grid_indices`` excludes vmap-batched grid dimensions, so axis 0
  remains the tree axis after chain batching.

Padded observations (N..NPAD) carry ``leaf_idx = 127`` — a heap slot
that can never be a real leaf (``max_nodes`` <= 127 for ``max_depth``
<= 6) — and residual 0, so they fall through every mask and statistic.

Weighted likelihoods (y_i ~ N(f_i, sigma^2 / w_i), dbarts'
data.bart@weights semantics) ride the kernel too: pass ``weights=`` and
every sufficient statistic becomes (sum w, sum w r) — an extra (1, NPAD)
lane row input, only wired in when weighted so the unweighted op
sequence is untouched.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bart import (
    INACTIVE,
    LEAF,
    BartConfig,
    BartState,
    count_variable_use,
    node_depths,
    split_prob_by_depth,
)

NODE_PAD = 128  # heap rows padded to one full lane register


class SweepConsts(NamedTuple):
    """Model-static kernel operands, built once per GibbsProgram."""
    ranks_f: jnp.ndarray   # (P, NPAD) f32 — cut ranks, obs in lanes
    spcum: jnp.ndarray     # (1, P) f32 — split-prob inclusive cumsum
    psplit: jnp.ndarray    # (1, 128) f32 — p_split by depth (idx = depth)
    depths: jnp.ndarray    # (1, 128) f32 — node depth by heap index
    n_obs: int
    npad: int
    # lane-slice count for the per-tree obs loops: 1 keeps the original
    # single-pass body (n <= the slice width); > 1 bounds the live
    # (128, NS) membership one-hot so large-n fits in scoped VMEM
    n_slices: int = 1


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# default lane-slice width: the live (128, NS) one-hot is 512*NS bytes —
# 8192 lanes = 4 MB, leaving room for the (CB, NPAD) rows at large n
DEFAULT_LANE_SLICE = 10_368


def make_sweep_consts(cfg: BartConfig, ranks, split_probs,
                      lane_slice: int | None = None) -> SweepConsts:
    """Precompute the static kernel operands from the model data.

    lane_slice: max observation lanes processed per slice of the
    per-tree loops (None = $S4B_SWEEP_SLICE or DEFAULT_LANE_SLICE).
    n <= lane_slice compiles the original single-pass body.
    """
    if cfg.max_nodes > NODE_PAD - 1:
        raise ValueError(
            f"fused sweep kernel supports max_depth <= 6 "
            f"(max_nodes {cfg.max_nodes} > {NODE_PAD - 1})"
        )
    if lane_slice is None:
        env = os.environ.get("S4B_SWEEP_SLICE")
        if env is not None:
            lane_slice = int(env)
        else:
            # npad <= 10368: single-pass body at chain block 8 (the
            # headline regime).  Above it the batch driver defaults to
            # the obs-tiled kernel (GibbsProgram.sweep_tiled) with
            # 5184-lane tiles: narrower tiles both fit the Mosaic
            # scoped-VMEM stack at CB=8 (10368-lane tiles hard-fail the
            # compile at n=50k) and waste less lane padding.  Measured
            # round 4 (64 chains, draws/s, sweep phase): tiled-5184
            # beats the single-pass sliced default 1.47x at n=15k
            # (2172 vs 1482), 1.21x at n=30k, 1.26x at n=50k; round 3
            # measured 3.0x vs the XLA scan at n=200k.
            n_est = np.asarray(ranks).shape[0]
            lane_slice = (DEFAULT_LANE_SLICE if n_est <= 10368
                          else 5184)
    ranks = np.asarray(ranks)
    n, p = ranks.shape
    npad = _ceil_to(max(n, 128), 128)
    ns = min(npad, _ceil_to(lane_slice, 128))
    npad = _ceil_to(npad, ns)          # slices tile NPAD exactly
    n_slices = npad // ns
    ranks_f = np.zeros((p, npad), dtype=np.float32)
    ranks_f[:, :n] = ranks.T.astype(np.float32)
    spcum = np.cumsum(np.asarray(split_probs, np.float32))[None, :]
    psplit = np.zeros((1, NODE_PAD), dtype=np.float32)
    ps = split_prob_by_depth(cfg)
    psplit[0, : ps.shape[0]] = ps
    depths = np.zeros((1, NODE_PAD), dtype=np.float32)
    depths[0, : cfg.max_nodes] = node_depths(cfg)
    depths[0, cfg.max_nodes:] = cfg.max_depth + 1
    return SweepConsts(
        ranks_f=jnp.asarray(ranks_f), spcum=jnp.asarray(spcum),
        psplit=jnp.asarray(psplit), depths=jnp.asarray(depths),
        n_obs=n, npad=npad, n_slices=n_slices,
    )


def _tree_step_math(cfg: BartConfig, p_feat: int,
                    featf, cutf, lidx, r,
                    sigma2, tau2, u_move, u_leaf, u_nog, u_var, u_cut,
                    u_acc, zn, ranks, spcum, psplit_row, depths_row,
                    n_slices: int = 1, wrow=None):
    """One grow/prune/change MH step + conjugate leaf draws, vectorized
    over a leading chain dimension CB (CB = 1 for the vmapped per-chain
    kernel, CB = chain_block for the batch kernel).

    featf/cutf: (CB, 128) f32; lidx: (CB, NPAD) int32; r: (CB, NPAD)
    partial residual; sigma2/tau2/u_*: scalar or (CB, 1); zn: (CB, 128).
    wrow: optional (1, NPAD) per-observation likelihood weights (shared
    across chains; zero on padded lanes) — every sufficient statistic
    becomes (sum w, sum w r), the dbarts weighted-sampler semantics the
    XLA path implements (ops/bart.py:bart_sweep).  ``wrow is None``
    emits the EXACT unweighted op sequence (rules 8-9 in
    docs/sweep_kernel.md pin that order to measured scheduler
    behavior).
    Returns (featf', cutf', lidx_slices, lv_new, fit_slices) — the
    per-observation outputs come back as length-n_slices lists of
    (CB, NS) arrays; the caller writes each slice to its output ref
    (Mosaic cannot lane-concatenate computed slices whose sublane
    offsets differ, so the slices must never be reassembled as one
    value inside the kernel).

    n_slices > 1 runs every per-observation block (membership stats,
    leaf-index update, leaf sufficient statistics, fit lookup) in
    NPAD/n_slices-lane slices so only one (128, NS) one-hot and
    (CB, NS) temporaries are live at a time — large n never
    materializes an O(128*N) buffer.  n_slices == 1 emits the original
    single-pass op sequence (per-obs masks computed once and reused).
    """
    f32 = jnp.float32
    n_cuts = float(cfg.n_cuts)
    p_grow = float(cfg.p_grow)
    p_prune = float(cfg.p_prune)
    max_depth = float(cfg.max_depth)
    eps = 1e-12
    cb = featf.shape[0]

    iota_r = jax.lax.broadcasted_iota(jnp.int32, (NODE_PAD, NODE_PAD), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (NODE_PAD, NODE_PAD), 1)
    iota_row = jax.lax.broadcasted_iota(
        jnp.int32, (1, NODE_PAD), 1).astype(f32)

    # heap child values via one-hot contraction (no gathers on TPU):
    # GL[j, i] = [j == 2i+1]  =>  (featf @ GL)[i] = feature[2i+1]
    GL = (iota_r == 2 * iota_c + 1).astype(f32)
    GR = (iota_r == 2 * iota_c + 2).astype(f32)
    TRI = (iota_r <= iota_c).astype(f32)     # inclusive-cumsum operand
    fl = jnp.dot(featf, GL, preferred_element_type=f32)
    fr = jnp.dot(featf, GR, preferred_element_type=f32)

    is_leaf = (featf == float(LEAF)).astype(f32)
    is_internal = (featf >= 0.0).astype(f32)
    is_nog = is_internal * (fl == float(LEAF)).astype(f32) \
        * (fr == float(LEAF)).astype(f32)
    n_leaf = jnp.sum(is_leaf, axis=1, keepdims=True)     # (CB, 1)
    n_nog = jnp.sum(is_nog, axis=1, keepdims=True)

    one = jnp.ones_like(u_move)
    gf = jnp.where(u_move < p_grow, one, 0.0 * one)
    pf = jnp.where(
        (u_move >= p_grow) & (u_move < p_grow + p_prune), one, 0.0 * one)
    cf = 1.0 - gf - pf

    # proposal draws ------------------------------------------------
    v_new = jnp.minimum(
        jnp.sum((spcum <= u_var).astype(f32), axis=1, keepdims=True),
        float(p_feat - 1),
    )                                                    # (CB, 1)
    c_new = jnp.minimum(jnp.floor(u_cut * n_cuts), n_cuts - 1.0)
    iota_p = jax.lax.broadcasted_iota(
        jnp.int32, (1, p_feat), 1).astype(f32)
    vone = (iota_p == v_new).astype(f32)                 # (CB, P)
    log_u = jnp.log(jnp.maximum(u_acc, 1e-30))

    # node picks: uniform over marked entries via MXU cumsum --------
    def pick(mask_f, count, u):
        target = jnp.minimum(jnp.floor(u * count),
                             jnp.maximum(count - 1.0, 0.0))
        csum = jnp.dot(mask_f, TRI, preferred_element_type=f32)
        return jnp.sum((csum <= target).astype(f32), axis=1,
                       keepdims=True)                    # (CB, 1)

    eta_grow = pick(is_leaf, n_leaf, u_leaf)
    eta_pc = pick(is_nog, jnp.maximum(n_nog, 1.0), u_nog)
    eta = gf * eta_grow + (1.0 - gf) * eta_pc            # (CB, 1)
    lft = jnp.minimum(2.0 * eta + 1.0, float(NODE_PAD - 1))
    rgt = jnp.minimum(2.0 * eta + 2.0, float(NODE_PAD - 1))

    d_eta = (iota_row == eta).astype(f32)                # (CB, 128)
    d_lft = (iota_row == lft).astype(f32)
    d_rgt = (iota_row == rgt).astype(f32)

    d = jnp.sum(depths_row * d_eta, axis=1, keepdims=True)
    # p_split at depth d and d+1 (psplit_row is indexed BY DEPTH)
    dd = jnp.minimum(d + 1.0, max_depth + 1.0)
    ps_d = jnp.sum(psplit_row * (iota_row == d).astype(f32),
                   axis=1, keepdims=True)
    ps_d1 = jnp.sum(psplit_row * (iota_row == dd).astype(f32),
                    axis=1, keepdims=True)

    # membership & masked sufficient statistics --------------------
    # sliced along lanes: one (CB, NS) set of masks live at a time.
    # n_slices == 1 (the n <= lane-slice case) computes each mask once
    # and reuses it in the update pass — the original op sequence.
    eta_i = eta.astype(jnp.int32)
    lft_i = lft.astype(jnp.int32)
    rgt_i = rgt.astype(jnp.int32)
    npad_ = lidx.shape[1]
    assert npad_ % n_slices == 0
    ns = npad_ // n_slices

    # Mosaic cannot sublane-broadcast a lane-OFFSET slice of a wide row
    # (vector.broadcast of value[:, s*NS:] fails to lower); reshaping to
    # (…, n_slices, NS) and indexing the middle axis gives every slice
    # an offset-0 lane layout (verified on-chip).  n_slices == 1 skips
    # the reshape entirely — the original arrays flow through untouched.
    if n_slices == 1:
        take = lambda x, s: x                         # noqa: E731
        lidx3, r3, ranks3 = lidx, r, ranks
        w3 = wrow
    else:
        take = lambda x, s: x[:, s, :]                # noqa: E731
        lidx3 = lidx.reshape(cb, n_slices, ns)
        r3 = r.reshape(cb, n_slices, ns)
        ranks3 = ranks.reshape(ranks.shape[0], n_slices, ns)
        w3 = None if wrow is None else wrow.reshape(1, n_slices, ns)

    def obs_slice(s):
        """Membership masks for lane slice s of the CURRENT tree."""
        lidx_s = take(lidx3, s)
        rank_v_s = jnp.dot(vone, take(ranks3, s),
                           preferred_element_type=f32)   # (CB, NS)
        gl_s = (rank_v_s <= c_new).astype(f32)
        me = (lidx_s == eta_i).astype(f32)
        ml = (lidx_s == lft_i).astype(f32)
        mr = (lidx_s == rgt_i).astype(f32)
        members_s = gf * me + (1.0 - gf) * (ml + mr)
        return lidx_s, gl_s, ml, members_s

    cached = ([obs_slice(0)] if n_slices == 1 else None)

    zero = jnp.zeros((cb, 1), f32)
    n_all = s_all = n_ln = s_ln = n_lo = s_lo = zero
    for s in range(n_slices):
        lidx_s, gl_s, ml, members_s = (cached[s] if cached is not None
                                       else obs_slice(s))
        r_s = take(r3, s)
        mln = members_s * gl_s
        if w3 is None:
            # unweighted: counts are the raw masks, sums use r as-is —
            # the original op sequence, bit-for-bit
            cm, cmln, cml, wr_s = members_s, mln, ml, r_s
        else:
            w_s = take(w3, s)
            wr_s = w_s * r_s
            cm, cmln, cml = members_s * w_s, mln * w_s, ml * w_s
        n_all = n_all + jnp.sum(cm, axis=1, keepdims=True)
        s_all = s_all + jnp.sum(members_s * wr_s, axis=1, keepdims=True)
        n_ln = n_ln + jnp.sum(cmln, axis=1, keepdims=True)
        s_ln = s_ln + jnp.sum(mln * wr_s, axis=1, keepdims=True)
        n_lo = n_lo + jnp.sum(cml, axis=1, keepdims=True)
        s_lo = s_lo + jnp.sum(ml * wr_s, axis=1, keepdims=True)
    n_rn = n_all - n_ln
    s_rn = s_all - s_ln
    n_ro = n_all - n_lo
    s_ro = s_all - s_lo

    def marg(n, s):
        denom = sigma2 + n * tau2
        return (0.5 * jnp.log(sigma2 / denom)
                + tau2 * s * s / (2.0 * sigma2 * denom))

    m_all = marg(n_all, s_all)
    m_ln = marg(n_ln, s_ln)
    m_rn = marg(n_rn, s_rn)
    m_lo = marg(n_lo, s_lo)
    m_ro = marg(n_ro, s_ro)

    # structure prior + transition terms (all log args clamped >0
    # so invalid branches stay FINITE — they blend with weight 0) --
    split_term = (jnp.log(jnp.maximum(ps_d, eps))
                  + 2.0 * jnp.log1p(-ps_d1)
                  - jnp.log1p(-jnp.minimum(ps_d, 1.0 - eps)))
    parent = jnp.maximum(jnp.floor((eta - 1.0) / 2.0), 0.0)
    d_par = (iota_row == parent).astype(f32)
    parent_was_nog = jnp.sum(is_nog * d_par, axis=1, keepdims=True) \
        * (eta > 0.0).astype(f32)
    n_nog_grow = jnp.maximum(n_nog + 1.0 - parent_was_nog, 1.0)
    log_trans_grow = (np.log(p_prune) - np.log(p_grow)
                      + jnp.log(jnp.maximum(n_leaf, 1.0))
                      - jnp.log(n_nog_grow))
    log_trans_prune = (np.log(p_grow) - np.log(p_prune)
                       + jnp.log(jnp.maximum(n_nog, 1.0))
                       - jnp.log(jnp.maximum(n_leaf - 1.0, 1.0)))

    la_grow = split_term + log_trans_grow + (m_ln + m_rn - m_all)
    la_prune = -split_term + log_trans_prune + (m_all - m_lo - m_ro)
    la_change = m_ln + m_rn - m_lo - m_ro
    log_accept = gf * la_grow + pf * la_prune + cf * la_change

    valid_grow = ((d < max_depth).astype(f32)
                  * (n_ln > 0.0).astype(f32)
                  * (n_rn > 0.0).astype(f32))
    valid_prune = (n_nog > 0.0).astype(f32)
    valid_change = (valid_prune * (n_ln > 0.0).astype(f32)
                    * (n_rn > 0.0).astype(f32))
    valid = gf * valid_grow + pf * valid_prune + cf * valid_change
    acc = valid * (log_u < log_accept).astype(f32)       # (CB, 1)

    # blended tree update ------------------------------------------
    f_eta_new = pf * float(LEAF) + (1.0 - pf) * v_new
    f_child_new = pf * float(INACTIVE) + (1.0 - pf) * float(LEAF)
    new_feat = (featf * (1.0 - d_eta - d_lft - d_rgt)
                + f_eta_new * d_eta + f_child_new * (d_lft + d_rgt))
    c_eta_cur = jnp.sum(cutf * d_eta, axis=1, keepdims=True)
    c_eta_new = pf * c_eta_cur + (1.0 - pf) * c_new
    new_cut = cutf * (1.0 - d_eta) + c_eta_new * d_eta

    featf = acc * new_feat + (1.0 - acc) * featf
    cutf = acc * new_cut + (1.0 - acc) * cutf

    # leaf-index update, sliced (reuses the cached masks at 1 slice) --
    new_lidx_slices = []
    for s in range(n_slices):
        lidx_s, gl_s, ml, members_s = (cached[s] if cached is not None
                                       else obs_slice(s))
        lidx_f_s = lidx_s.astype(f32)
        dest_s = (pf * eta
                  + (1.0 - pf) * (gl_s * lft + (1.0 - gl_s) * rgt))
        new_lidx_f_s = members_s * dest_s + (1.0 - members_s) * lidx_f_s
        lidx_f_s = acc * new_lidx_f_s + (1.0 - acc) * lidx_f_s
        new_lidx_slices.append(lidx_f_s.astype(jnp.int32))

    # conjugate leaf draws + fitted values -------------------------
    # Per-chain loop, one chain's (128, NPAD) membership one-hot live
    # at a time: generated once, lane-reduced for the sufficient
    # statistics, reused as the MXU operand for the fit lookup.
    # (A two-loop version kept all CB one-hots alive and OOM'd Mosaic's
    # 16M scoped VMEM.  A hi/lo-factored variant — node = hi*8+lo,
    # (16, NPAD) x (8, NPAD) operands, ~5x less generated traffic —
    # was built TWICE and measured SLOWER both times: 4.77 vs 4.60
    # us/chain/tree in the overhead-dominated vmapped regime, and 3292
    # vs 3623 draws/s in the chain-blocked regime where the stats loop
    # dominates; the extra permutation matmuls, skinny transposes, and
    # row<->grid conversions cost more than the generation they save.
    # Do not retry; source in git history.)
    sig2 = jnp.broadcast_to(jnp.asarray(sigma2, f32).reshape(-1, 1),
                            (cb, 1))
    tau2r = jnp.broadcast_to(jnp.asarray(tau2, f32).reshape(-1, 1),
                             (cb, 1))
    lv_rows = []
    fit_rows = []
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (NODE_PAD, 1), 0)
    for j in range(cb):
        # per-slice leaf sufficient statistics from the UPDATED indices;
        # at n_slices == 1 the single (128, NPAD) one-hot is cached and
        # reused for the fit lookup (the original structure)
        mm_cache = []
        counts_j = jnp.zeros((1, NODE_PAD), f32)
        sums_j = jnp.zeros((1, NODE_PAD), f32)
        for s in range(n_slices):
            lidx_js = new_lidx_slices[s][j:j + 1, :]
            if s > 0:
                # serialize the unrolled slices with an arithmetic
                # dependency (a dynamic zero from the accumulator):
                # without it Mosaic schedules every slice's (128, NS)
                # one-hot generation before the first reduction and the
                # scoped stack holds n_slices of them at once (measured
                # 26.6M at n=50k — exactly five live one-hots).
                # lax.optimization_barrier has no Pallas TPU lowering.
                dep = (counts_j[0:1, 0:1] * 0.0).astype(jnp.int32)
                lidx_js = lidx_js + dep
            Mm_js = (iota_col == lidx_js).astype(f32)
            if n_slices == 1:
                mm_cache.append(Mm_js)
            # both leaf statistics in ONE MXU contraction over the lane
            # axis: (2, NS) x (128, NS) -> (2, 128).  The lane-reduce +
            # transpose formulation this replaces read the (128, NS)
            # one-hot twice on the VPU; measured on-chip (ablation
            # harness, BENCH_NOTES round 4) the dot form runs the whole
            # per-chain obs pass at ~1.0 us/chain vs ~1.9 us/chain
            # marginal for the reduce form.
            r_js = take(r3, s)[j:j + 1, :]
            if w3 is None:
                stacked_j = jnp.concatenate(
                    [jnp.ones((1, r_js.shape[1]), f32), r_js], axis=0)
            else:
                w_s = take(w3, s)
                stacked_j = jnp.concatenate([w_s, w_s * r_js], axis=0)
            st_j = jax.lax.dot_general(
                stacked_j, Mm_js, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)                 # (2, 128)
            counts_j = counts_j + st_j[0:1]
            sums_j = sums_j + st_j[1:2]
        pv_j = 1.0 / (counts_j / sig2[j:j + 1] + 1.0 / tau2r[j:j + 1])
        pm_j = pv_j * sums_j / sig2[j:j + 1]
        mu_j = pm_j + jnp.sqrt(pv_j) * zn[j:j + 1, :]
        lv_j = jnp.where(featf[j:j + 1, :] == float(LEAF), mu_j, 0.0)
        fit_js = []
        for s in range(n_slices):
            if mm_cache:
                Mm_js = mm_cache[s]
            else:
                lidx_js = new_lidx_slices[s][j:j + 1, :]
                if s > 0:  # bound one-hot liveness (see stats pass)
                    dep = (fit_js[-1][0:1, 0:1] * 0.0).astype(jnp.int32)
                    lidx_js = lidx_js + dep
                Mm_js = (iota_col == lidx_js).astype(f32)
            fit_js.append(jnp.dot(lv_j, Mm_js,
                                  preferred_element_type=f32))
        fit_rows.append(fit_js)
        lv_rows.append(lv_j)
    # assemble per-SLICE outputs (concat over chains only — sublane
    # concat of freshly computed rows, the original op; never over lanes)
    fit_slices = [
        (fit_rows[0][s] if cb == 1
         else jnp.concatenate([fit_rows[j][s] for j in range(cb)],
                              axis=0))
        for s in range(n_slices)
    ]
    lv_new = (lv_rows[0] if cb == 1
              else jnp.concatenate(lv_rows, axis=0))        # (CB, 128)
    return featf, cutf, new_lidx_slices, lv_new, fit_slices


def _make_kernel(cfg: BartConfig, npad: int, p_feat: int,
                 n_slices: int = 1, weighted: bool = False):
    f32 = jnp.float32

    def kernel(scal_ref, u_ref,
               feature_ref, cut_ref, lv_ref, lidx_ref, tfit_ref,
               resid0_ref, ranks_ref, spcum_ref, psplit_ref, depths_ref,
               zn_ref, *rest):
        if weighted:
            w_ref, rest = rest[0], rest[1:]
        else:
            w_ref = None
        (feature_o, cut_o, lv_o, lidx_o, tfit_o, resid_o,
         resid_s) = rest
        # user-grid axis 0 = trees (Mosaic's user_grid_indices excludes
        # vmap-batched grid dims, so this is vmap-safe)
        t = pl.program_id(0)

        # reset the carried full residual at the first tree of each chain
        @pl.when(t == 0)
        def _():
            resid_s[:, :] = resid0_ref[:, :]

        R = resid_s[:, :]                       # (1, NPAD) full residual
        old_fit = tfit_ref[0]                   # (1, NPAD) this tree's fit
        r = R + old_fit                         # partial residual

        featf, cutf, lidx_slices, lv_new, fit_slices = _tree_step_math(
            cfg, p_feat,
            feature_ref[0].astype(f32), cut_ref[0].astype(f32),
            lidx_ref[0], r,
            scal_ref[0, 0], scal_ref[0, 1],
            u_ref[t, 0], u_ref[t, 1], u_ref[t, 2], u_ref[t, 3],
            u_ref[t, 4], u_ref[t, 5],
            zn_ref[0], ranks_ref[:, :], spcum_ref[:, :],
            psplit_ref[:, :], depths_ref[:, :],
            n_slices=n_slices,
            wrow=None if w_ref is None else w_ref[:, :],
        )

        feature_o[0] = featf.astype(jnp.int32)
        cut_o[0] = cutf.astype(jnp.int32)
        lv_o[0] = lv_new
        if n_slices == 1:
            new_fit = fit_slices[0]
            R_new = R + old_fit - new_fit
            resid_s[:, :] = R_new
            resid_o[:, :] = R_new
            lidx_o[0] = lidx_slices[0]
            tfit_o[0] = new_fit
        else:
            # per-slice ref writes: Mosaic cannot lane-concatenate the
            # computed slices back into one (1, NPAD) value
            ns_k = npad // n_slices
            for s in range(n_slices):
                sl = slice(s * ns_k, (s + 1) * ns_k)
                new_fit_s = fit_slices[s]
                R_new_s = (resid_s[:, sl] + tfit_ref[0, :, sl]
                           - new_fit_s)
                resid_s[:, sl] = R_new_s
                resid_o[:, sl] = R_new_s
                lidx_o[0, :, sl] = lidx_slices[s]
                tfit_o[0, :, sl] = new_fit_s

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_obs", "npad", "n_slices", "weighted",
                     "interpret"),
)
def _sweep_call(cfg: BartConfig, featp, cutp, lvp, lidxp, tfitp, resid0,
                ranks_f, spcum, psplit, depths, u, zn, scal, wpad,
                n_obs: int, npad: int, n_slices: int, weighted: bool,
                interpret: bool):
    T = cfg.num_trees
    P = ranks_f.shape[0]
    f32 = jnp.float32

    # per-tree arrays are (T, 1, X) so the Mosaic block-shape rule
    # ("last two dims divisible by (8, 128) or equal to the array dims")
    # is satisfied by (1, 1, X) blocks
    tree3 = lambda x: x[:, None, :]   # noqa: E731
    row_t = lambda t: (t, 0, 0)       # noqa: E731
    row_0 = lambda t: (0, 0)          # noqa: E731

    kernel = _make_kernel(cfg, npad, P, n_slices, weighted)
    in_specs = [
            pl.BlockSpec((1, 2), row_0, memory_space=pltpu.SMEM),     # scal
            pl.BlockSpec((T, 8), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),                    # u
            pl.BlockSpec((1, 1, NODE_PAD), row_t),                    # feature
            pl.BlockSpec((1, 1, NODE_PAD), row_t),                    # cut
            pl.BlockSpec((1, 1, NODE_PAD), row_t),                    # lv
            pl.BlockSpec((1, 1, npad), row_t),                        # lidx
            pl.BlockSpec((1, 1, npad), row_t),                        # tfit
            pl.BlockSpec((1, npad), row_0),                           # resid0
            pl.BlockSpec((P, npad), row_0),                           # ranks
            pl.BlockSpec((1, P), row_0),                              # spcum
            pl.BlockSpec((1, NODE_PAD), row_0),                       # psplit
            pl.BlockSpec((1, NODE_PAD), row_0),                       # depths
            pl.BlockSpec((1, 1, NODE_PAD), row_t),                    # zn
    ]
    if weighted:
        in_specs.append(pl.BlockSpec((1, npad), row_0))               # w
    outs = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, NODE_PAD), row_t),
            pl.BlockSpec((1, 1, NODE_PAD), row_t),
            pl.BlockSpec((1, 1, NODE_PAD), row_t),
            pl.BlockSpec((1, 1, npad), row_t),
            pl.BlockSpec((1, 1, npad), row_t),
            pl.BlockSpec((1, npad), row_0),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 1, NODE_PAD), jnp.int32),
            jax.ShapeDtypeStruct((T, 1, NODE_PAD), jnp.int32),
            jax.ShapeDtypeStruct((T, 1, NODE_PAD), f32),
            jax.ShapeDtypeStruct((T, 1, npad), jnp.int32),
            jax.ShapeDtypeStruct((T, 1, npad), f32),
            jax.ShapeDtypeStruct((1, npad), f32),
        ],
        scratch_shapes=[pltpu.VMEM((1, npad), f32)],
        interpret=interpret,
    )(scal, u, tree3(featp), tree3(cutp), tree3(lvp), tree3(lidxp),
      tree3(tfitp), resid0, ranks_f, spcum, psplit, depths, tree3(zn),
      *((wpad,) if weighted else ()))
    feato, cuto, lvo, lidxo, tfito, resido = outs
    return (feato[:, 0], cuto[:, 0], lvo[:, 0], lidxo[:, 0], tfito[:, 0],
            resido)


def bart_sweep_fused(cfg: BartConfig, state: BartState, y_target,
                     consts: SweepConsts, sigma, rng, *,
                     weights=None, variates=None,
                     interpret: bool = False):
    """One full Gibbs sweep over all trees in a single fused kernel.

    Drop-in for ops/bart.py:bart_sweep.  Returns ``(state, varcount)``.
    weights: optional (N,) per-observation likelihood weights — the
    dbarts weighted-sampler semantics (sum w, sum w r) in every
    sufficient statistic, matching the XLA path exactly.

    variates: optional pre-drawn ``(u (T, 8), zn (T, 128))`` for
    same-randomness comparison against the XLA path.
    """
    T, M = cfg.num_trees, cfg.max_nodes
    N, NPAD = consts.n_obs, consts.npad
    f32 = jnp.float32

    if variates is None:
        rng_u, rng_z = jax.random.split(rng)
        u = jax.random.uniform(rng_u, (T, 8), dtype=f32)
        zn = jax.random.normal(rng_z, (T, NODE_PAD), dtype=f32)
    else:
        u, zn = variates

    pad_nodes = ((0, 0), (0, NODE_PAD - M))
    featp = jnp.pad(state.feature, pad_nodes, constant_values=INACTIVE)
    cutp = jnp.pad(state.cut, pad_nodes)
    lvp = jnp.pad(state.leaf_value.astype(f32), pad_nodes)
    pad_obs = ((0, 0), (0, NPAD - N))
    lidxp = jnp.pad(state.leaf_idx, pad_obs,
                    constant_values=NODE_PAD - 1)
    tfitp = jnp.pad(state.tree_fit.astype(f32), pad_obs)
    resid0 = jnp.pad((y_target - state.allfit).astype(f32)[None, :],
                     pad_obs)
    scal = jnp.stack([(sigma * sigma).astype(f32),
                      (state.sigma_mu * state.sigma_mu).astype(f32)]
                     )[None, :]
    weighted = weights is not None
    wpad = (jnp.zeros((1, 128), f32) if not weighted
            else jnp.pad(jnp.asarray(weights, f32)[None, :],
                         ((0, 0), (0, NPAD - N))))

    feato, cuto, lvo, lidxo, tfito, resido = _sweep_call(
        cfg, featp, cutp, lvp, lidxp, tfitp, resid0,
        consts.ranks_f, consts.spcum, consts.psplit, consts.depths,
        u, zn, scal, wpad, n_obs=N, npad=NPAD,
        n_slices=consts.n_slices, weighted=weighted,
        interpret=interpret,
    )

    dtype = state.allfit.dtype
    feature = feato[:, :M]
    cut = cuto[:, :M]
    leaf_value = lvo[:, :M].astype(dtype)
    leaf_idx = lidxo[:, :N]
    tree_fit = tfito[:, :N].astype(dtype)
    allfit = (y_target.astype(f32) - resido[0, :N]).astype(dtype)

    # chi(df, scale) hyperprior on k — same post-sweep update as the
    # XLA path (ops/bart.py:bart_sweep)
    k = state.k
    sigma_mu = state.sigma_mu
    if cfg.k_df > 0:
        rng_k = jax.random.fold_in(rng, 0x6B)
        is_leaf_all = feature == LEAF
        m = jnp.sum(is_leaf_all.astype(dtype))
        A = state.k * state.sigma_mu
        ssq = jnp.sum(jnp.where(is_leaf_all, leaf_value, 0.0) ** 2)
        rate = ssq / (2.0 * A * A)
        if np.isfinite(cfg.k_scale):
            rate = rate + 1.0 / (2.0 * cfg.k_scale ** 2)
        shape = (cfg.k_df + m) / 2.0
        g = jax.random.gamma(rng_k, shape, dtype=dtype) / rate
        k = jnp.sqrt(g)
        sigma_mu = A / k

    new_state = BartState(
        feature=feature, cut=cut, leaf_value=leaf_value,
        leaf_idx=leaf_idx, allfit=allfit, k=k, sigma_mu=sigma_mu,
        tree_fit=tree_fit,
    )
    varcount = count_variable_use(cfg, feature, consts.spcum.shape[1])
    return new_state, varcount


def _make_batch_kernel(cfg: BartConfig, npad: int, p_feat: int, cb: int,
                       n_slices: int = 1, weighted: bool = False,
                       tb: int = 1, n_trees_real: int | None = None):
    """tb > 1 = TREE-BLOCKED grid: each grid step processes ``tb``
    consecutive trees from (1, tb, cb, X) blocks, amortizing the
    per-grid-step fixed cost (block-DMA issue + grid machinery, measured
    ~7.2 us/step copy-through at CB=8/npad=10368 — benchmarks/
    ablate_batch_kernel.py) over tb trees.  The tree count is padded to
    a multiple of tb host-side; dummy tail slots are skipped by a
    ``pl.when(t_global < T)`` whole-tree gate so the carried residual
    and the final resid_o are untouched by them."""
    f32 = jnp.float32
    T_real = cfg.num_trees if n_trees_real is None else n_trees_real

    def kernel(scal_ref, u_ref,
               feature_ref, cut_ref, lv_ref, lidx_ref, tfit_ref,
               resid0_ref, ranks_ref, spcum_ref, psplit_ref, depths_ref,
               zn_ref, *rest):
        if weighted:
            w_ref, rest = rest[0], rest[1:]
        else:
            w_ref = None
        (feature_o, cut_o, lv_o, lidx_o, tfit_o, resid_o,
         resid_s) = rest
        # grid = (chain_blocks, tree_blocks); tree blocks iterate fastest
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            resid_s[:, :] = resid0_ref[0]

        scal = scal_ref[0]                       # (CB, 2)

        def tree_body(j):
            u = u_ref[0, j]                      # (CB, 8)
            R = resid_s[:, :]                    # (CB, NPAD)
            old_fit = tfit_ref[0, j]             # (CB, NPAD)
            lidx_in = lidx_ref[0, j]
            if j > 0:
                # serialize the unrolled trees through the residual
                # scratch (rule 9, docs/sweep_kernel.md): without this
                # Mosaic hoists every tree's input-only membership masks
                # ahead of the first tree and keeps tb sets live at once
                # (CB, 1) so the lidx broadcast is lanes-only — Mosaic
                # cannot broadcast (1, 1) across both sublanes and lanes
                dep = (R[:, 0:1] * 0.0).astype(jnp.int32)
                lidx_in = lidx_in + dep
            r = R + old_fit

            featf, cutf, lidx_slices, lv_new, fit_slices = \
                _tree_step_math(
                    cfg, p_feat,
                    feature_ref[0, j].astype(f32),
                    cut_ref[0, j].astype(f32),
                    lidx_in, r,
                    scal[:, 0:1], scal[:, 1:2],
                    u[:, 0:1], u[:, 1:2], u[:, 2:3], u[:, 3:4],
                    u[:, 4:5], u[:, 5:6],
                    zn_ref[0, j], ranks_ref[:, :], spcum_ref[:, :],
                    psplit_ref[:, :], depths_ref[:, :],
                    n_slices=n_slices,
                    wrow=None if w_ref is None else w_ref[:, :],
                )

            feature_o[0, j] = featf.astype(jnp.int32)
            cut_o[0, j] = cutf.astype(jnp.int32)
            lv_o[0, j] = lv_new
            if n_slices == 1:
                new_fit = fit_slices[0]
                R_new = R + old_fit - new_fit
                resid_s[:, :] = R_new
                resid_o[0] = R_new
                lidx_o[0, j] = lidx_slices[0]
                tfit_o[0, j] = new_fit
            else:
                ns_k = npad // n_slices
                for s in range(n_slices):
                    sl = slice(s * ns_k, (s + 1) * ns_k)
                    new_fit_s = fit_slices[s]
                    R_new_s = (resid_s[:, sl] + tfit_ref[0, j, :, sl]
                               - new_fit_s)
                    resid_s[:, sl] = R_new_s
                    resid_o[0, :, sl] = R_new_s
                    lidx_o[0, j, :, sl] = lidx_slices[s]
                    tfit_o[0, j, :, sl] = new_fit_s

        for j in range(tb):
            if T_real % tb == 0 or j == 0:
                tree_body(j)
            else:
                # tail block: dummy tree slots past the true tree count
                # are skipped entirely (their output blocks hold garbage
                # that the host slices off)
                @pl.when(t * tb + j < T_real)
                def _run(j=j):
                    tree_body(j)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_obs", "npad", "cb", "n_slices",
                     "weighted", "tb", "interpret"),
)
def _sweep_call_batch(cfg: BartConfig, featp, cutp, lvp, lidxp, tfitp,
                      resid0, ranks_f, spcum, psplit, depths, u, zn,
                      scal, wpad, n_obs: int, npad: int, cb: int,
                      n_slices: int, weighted: bool, interpret: bool,
                      tb: int = 1):
    T = cfg.num_trees
    P = ranks_f.shape[0]
    cblk = featp.shape[0]
    f32 = jnp.float32
    # tree blocking: pad the tree axis to a tb multiple; dummy tail
    # slots are gated off in-kernel and sliced off below
    T_pad = -(-T // tb) * tb
    if T_pad != T:
        pad_t = ((0, 0), (0, T_pad - T), (0, 0), (0, 0))
        featp, cutp, lvp = (jnp.pad(x, pad_t, constant_values=INACTIVE)
                            for x in (featp, cutp, lvp))
        lidxp, tfitp, u, zn = (jnp.pad(x, pad_t)
                               for x in (lidxp, tfitp, u, zn))

    tree4 = lambda c, t: (c, t, 0, 0)   # noqa: E731
    chain3 = lambda c, t: (c, 0, 0)     # noqa: E731
    const2 = lambda c, t: (0, 0)        # noqa: E731

    kernel = _make_batch_kernel(cfg, npad, P, cb, n_slices, weighted,
                                tb=tb, n_trees_real=T)
    in_specs = [
            pl.BlockSpec((1, cb, 2), chain3),                    # scal
            pl.BlockSpec((1, tb, cb, 8), tree4),                 # u
            pl.BlockSpec((1, tb, cb, NODE_PAD), tree4),          # feature
            pl.BlockSpec((1, tb, cb, NODE_PAD), tree4),          # cut
            pl.BlockSpec((1, tb, cb, NODE_PAD), tree4),          # lv
            pl.BlockSpec((1, tb, cb, npad), tree4),              # lidx
            pl.BlockSpec((1, tb, cb, npad), tree4),              # tfit
            pl.BlockSpec((1, cb, npad), chain3),                 # resid0
            pl.BlockSpec((P, npad), const2),                     # ranks
            pl.BlockSpec((1, P), const2),                        # spcum
            pl.BlockSpec((1, NODE_PAD), const2),                 # psplit
            pl.BlockSpec((1, NODE_PAD), const2),                 # depths
            pl.BlockSpec((1, tb, cb, NODE_PAD), tree4),          # zn
    ]
    if weighted:
        in_specs.append(pl.BlockSpec((1, npad), const2))         # w
    outs = pl.pallas_call(
        kernel,
        grid=(cblk, T_pad // tb),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tb, cb, NODE_PAD), tree4),
            pl.BlockSpec((1, tb, cb, NODE_PAD), tree4),
            pl.BlockSpec((1, tb, cb, NODE_PAD), tree4),
            pl.BlockSpec((1, tb, cb, npad), tree4),
            pl.BlockSpec((1, tb, cb, npad), tree4),
            pl.BlockSpec((1, cb, npad), chain3),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cblk, T_pad, cb, NODE_PAD), jnp.int32),
            jax.ShapeDtypeStruct((cblk, T_pad, cb, NODE_PAD), jnp.int32),
            jax.ShapeDtypeStruct((cblk, T_pad, cb, NODE_PAD), f32),
            jax.ShapeDtypeStruct((cblk, T_pad, cb, npad), jnp.int32),
            jax.ShapeDtypeStruct((cblk, T_pad, cb, npad), f32),
            jax.ShapeDtypeStruct((cblk, cb, npad), f32),
        ],
        scratch_shapes=[pltpu.VMEM((cb, npad), f32)],
        interpret=interpret,
    )(scal, u, featp, cutp, lvp, lidxp, tfitp, resid0,
      ranks_f, spcum, psplit, depths, zn,
      *((wpad,) if weighted else ()))
    if T_pad != T:
        outs = [o[:, :T] for o in outs[:5]] + [outs[5]]
    return outs


def _pick_chain_block(n_chains: int, chain_block: int) -> int:
    cb = min(chain_block, n_chains)
    while n_chains % cb:
        cb -= 1
    return cb


def bart_sweep_fused_batch(cfg: BartConfig, state: BartState, y_target,
                           consts: SweepConsts, sigma, rng, *,
                           chain_block: int = 8, weights=None,
                           variates=None, interpret: bool = False):
    """Chain-blocked fused sweep over a BATCHED BartState (leading chain
    axis): grid = (chains/CB, trees), CB chains per grid step.

    Chip ablation (BENCH_NOTES): the per-(chain, tree) grid step of the
    vmapped kernel costs ~4.6 us, of which ~1.9 us is the block-DMA/grid
    floor and ~2.6 us is small-op issue overhead — compute is free.
    Processing CB chains per step amortizes both: the same op count
    drives CB x the lanes.

    Same per-chain RNG streams as ``vmap(bart_sweep_fused)`` (the
    variates are drawn with identical key splits), so results are
    chain-for-chain comparable.  Returns (batched state, (C, P)
    varcounts).
    """
    T, M = cfg.num_trees, cfg.max_nodes
    N, NPAD = consts.n_obs, consts.npad
    f32 = jnp.float32
    C = state.feature.shape[0]
    # VMEM budget: Mosaic keeps ~10 (CB, NPAD) f32 row buffers live per
    # grid step (residual carries, lidx/fit blocks, slice reshapes,
    # concat results — measured: 36.6M scoped at CB=4, NPAD=51840).
    # Cap CB*NPAD at 82944 lanes (= the headline CB=8 x NPAD=10368) so
    # large-n runs shrink the chain block instead of blowing the 16M
    # scoped-VMEM stack; n=50k lands at CB=1 (~9M), which the 5x-wider
    # lanes amortize instead of the chain block
    lane_budget = int(os.environ.get("S4B_SWEEP_CB_LANES", "82944"))
    cb_cap = max(1, lane_budget // NPAD)
    cb = _pick_chain_block(C, min(chain_block, cb_cap))
    cblk = C // cb

    if variates is None:
        def draw(k):
            ku, kz = jax.random.split(k)
            return (jax.random.uniform(ku, (T, 8), dtype=f32),
                    jax.random.normal(kz, (T, NODE_PAD), dtype=f32))

        u, zn = jax.vmap(draw)(rng)              # (C, T, 8), (C, T, 128)
    else:
        u, zn = variates

    def to_blocks(x):
        # (C, T, X) -> (CBLK, T, CB, X)
        return jnp.transpose(
            x.reshape(cblk, cb, T, x.shape[-1]), (0, 2, 1, 3))

    def from_blocks(x):
        # (CBLK, T, CB, X) -> (C, T, X)
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(
            C, T, x.shape[-1])

    pad_nodes = ((0, 0), (0, 0), (0, NODE_PAD - M))
    pad_obs = ((0, 0), (0, 0), (0, NPAD - N))
    featp = to_blocks(jnp.pad(state.feature, pad_nodes,
                              constant_values=INACTIVE))
    cutp = to_blocks(jnp.pad(state.cut, pad_nodes))
    lvp = to_blocks(jnp.pad(state.leaf_value.astype(f32), pad_nodes))
    lidxp = to_blocks(jnp.pad(state.leaf_idx, pad_obs,
                              constant_values=NODE_PAD - 1))
    tfitp = to_blocks(jnp.pad(state.tree_fit.astype(f32), pad_obs))
    resid0 = jnp.pad((y_target - state.allfit).astype(f32),
                     ((0, 0), (0, NPAD - N))).reshape(cblk, cb, NPAD)
    scal = jnp.stack([
        (sigma * sigma).astype(f32),
        (state.sigma_mu * state.sigma_mu).astype(f32),
    ], axis=-1).reshape(cblk, cb, 2)
    ub = to_blocks(u.astype(f32))
    znb = to_blocks(zn.astype(f32))
    weighted = weights is not None
    wpad = (jnp.zeros((1, 128), f32) if not weighted
            else jnp.pad(jnp.asarray(weights, f32)[None, :],
                         ((0, 0), (0, NPAD - N))))

    # tree blocking (S4B_SWEEP_TB): amortizes the measured ~7 us fixed
    # grid/DMA-issue cost per grid step over tb trees.  Single-pass body
    # only — the sliced body's per-slice temporaries already crowd the
    # scoped-VMEM stack — and capped so the tb*(cb*npad) lidx/tfit
    # blocks keep total VMEM under Mosaic's 16M scoped stack
    # (double-buffered in+out pairs ~ 16*tb*cb*npad bytes next to the
    # ~7M body live set).
    tb = int(os.environ.get("S4B_SWEEP_TB", "1"))
    if consts.n_slices > 1 or cb * NPAD > 82944 or tb < 1:
        tb = 1
    # enforce the stated VMEM budget rather than trusting the env value:
    # the tb-blocked lidx/tfit in+out pairs cost ~16*tb*cb*NPAD bytes
    # double-buffered beside the ~7M fixed body live set; keep them
    # under ~8M of the 16M scoped stack
    tb = max(1, min(tb, 8_000_000 // (16 * cb * NPAD)))

    feato, cuto, lvo, lidxo, tfito, resido = _sweep_call_batch(
        cfg, featp, cutp, lvp, lidxp, tfitp, resid0,
        consts.ranks_f, consts.spcum, consts.psplit, consts.depths,
        ub, znb, scal, wpad, n_obs=N, npad=NPAD, cb=cb,
        n_slices=consts.n_slices, weighted=weighted,
        interpret=interpret, tb=tb,
    )

    dtype = state.allfit.dtype
    feature = from_blocks(feato)[:, :, :M]
    cut = from_blocks(cuto)[:, :, :M]
    leaf_value = from_blocks(lvo)[:, :, :M].astype(dtype)
    leaf_idx = from_blocks(lidxo)[:, :, :N]
    tree_fit = from_blocks(tfito)[:, :, :N].astype(dtype)
    allfit = (y_target.astype(f32)
              - resido.reshape(C, NPAD)[:, :N]).astype(dtype)

    k = state.k
    sigma_mu = state.sigma_mu
    if cfg.k_df > 0:
        def k_update(rng_c, feature_c, leaf_value_c, k_c, sigma_mu_c):
            rng_k = jax.random.fold_in(rng_c, 0x6B)
            is_leaf_all = feature_c == LEAF
            m = jnp.sum(is_leaf_all.astype(dtype))
            A = k_c * sigma_mu_c
            ssq = jnp.sum(jnp.where(is_leaf_all, leaf_value_c, 0.0) ** 2)
            rate = ssq / (2.0 * A * A)
            if np.isfinite(cfg.k_scale):
                rate = rate + 1.0 / (2.0 * cfg.k_scale ** 2)
            shape = (cfg.k_df + m) / 2.0
            g = jax.random.gamma(rng_k, shape, dtype=dtype) / rate
            k_new = jnp.sqrt(g)
            return k_new, A / k_new

        k, sigma_mu = jax.vmap(k_update)(rng, feature, leaf_value,
                                         state.k, state.sigma_mu)

    new_state = BartState(
        feature=feature, cut=cut, leaf_value=leaf_value,
        leaf_idx=leaf_idx, allfit=allfit, k=k, sigma_mu=sigma_mu,
        tree_fit=tree_fit,
    )
    varcount = jax.vmap(
        lambda f: count_variable_use(cfg, f, consts.spcum.shape[1])
    )(feature)
    return new_state, varcount


# ---------------------------------------------------------------------------
# Obs-tiled batch kernel: large n beyond the whole-row VMEM ceiling.
#
# The kernels above hold (CB, NPAD) whole-observation rows (residual
# carry, lidx/fit blocks, the (P, NPAD) ranks operand) live per grid
# step; past NPAD ~ 52k that exceeds Mosaic's 16M scoped-VMEM stack even
# at CB=1 (measured 56.7M at n=200k — BENCH_NOTES round 3).  This
# variant tiles the OBSERVATION axis into the grid:
#
#   grid = (chain_blocks, T+1, 2, OT)   (trees, phase, obs tile)
#
#   pass A (ph=0), per tile: apply the PREVIOUS tree's new fit
#     (lv_prev @ onehot(lidx_prev tile), both from scratch), roll the
#     carried residual to this tree's partial residual, and accumulate
#     the grow/prune/change sufficient statistics; the MH decision runs
#     once at the last tile.
#   pass B (ph=1), per tile: apply the accepted move to the leaf
#     indices, write them out, and accumulate per-node leaf sufficient
#     statistics over the NEW membership; the conjugate leaf draw runs
#     once at the last tile.
#   t = T is a flush pass: applies tree T-1's fit and writes the final
#     full residual.
#
# Only two full-width buffers remain, both VMEM scratch that scales as
# O(N * CB) with no (128, N) term: the carried residual and the previous
# tree's updated leaf indices.  Everything else is tile-sized, so n is
# bounded by HBM, not VMEM.  Outputs whose producer runs in a different
# phase than their (tree, tile) home use phase-gated index maps with a
# TRASH row (row T / tile OT): steps that have nothing to write park the
# window there, keeping every real block's visit sequence contiguous
# (Mosaic stores an output block when the window leaves it — a
# non-contiguous revisit would clobber earlier writes with an
# uninitialized buffer).
#
# The move/leaf math is duplicated from _tree_step_math in pass form
# rather than shared: the single-pass kernel's exact op order encodes
# measured scheduler behavior (docs/sweep_kernel.md rules 8-9) and is
# left untouched; tests/test_sweep_kernel.py pins both paths to the XLA
# sweep on shared variates.


def _make_tiled_kernel(cfg: BartConfig, p_feat: int, cb: int, nt: int,
                       ns: int, weighted: bool = False):
    f32 = jnp.float32
    T = cfg.num_trees
    n_cuts = float(cfg.n_cuts)
    p_grow = float(cfg.p_grow)
    p_prune = float(cfg.p_prune)
    max_depth = float(cfg.max_depth)
    eps = 1e-12

    def kernel(scal_ref, u_ref,
               feature_ref, cut_ref, lv_ref, lidx_ref, tfit_ref,
               resid0_ref, ranks_ref, spcum_ref, psplit_ref, depths_ref,
               zn_ref, *rest):
        if weighted:
            w_ref, rest = rest[0], rest[1:]
        else:
            w_ref = None
        (feature_o, cut_o, lv_o, lidx_o, tfit_o, resid_o,
         R_s, lidxp_s, prop_s, vone_s, stats_s,
         featf_s, cutf_s, lvp_s, cnt_s, sum_s) = rest
        t = pl.program_id(1)
        ph = pl.program_id(2)
        ot = pl.program_id(3)

        scal = scal_ref[0]                        # (CB, 2)
        sigma2 = scal[:, 0:1]
        tau2 = scal[:, 1:2]
        u = u_ref[0, 0]                           # (CB, 8)

        iota_r = jax.lax.broadcasted_iota(jnp.int32,
                                          (NODE_PAD, NODE_PAD), 0)
        iota_c = jax.lax.broadcasted_iota(jnp.int32,
                                          (NODE_PAD, NODE_PAD), 1)
        iota_row = jax.lax.broadcasted_iota(
            jnp.int32, (1, NODE_PAD), 1).astype(f32)
        iota_col = jax.lax.broadcasted_iota(jnp.int32, (NODE_PAD, 1), 0)

        # ---------------- pass A ---------------------------------------
        @pl.when(ph == 0)
        def _pass_a():
            # -- proposal + stats reset at the first tile of a real tree
            @pl.when((ot == 0) & (t < T))
            def _proposal():
                featf = feature_ref[0, 0].astype(f32)
                GL = (iota_r == 2 * iota_c + 1).astype(f32)
                GR = (iota_r == 2 * iota_c + 2).astype(f32)
                TRI = (iota_r <= iota_c).astype(f32)
                fl = jnp.dot(featf, GL, preferred_element_type=f32)
                fr = jnp.dot(featf, GR, preferred_element_type=f32)
                is_leaf = (featf == float(LEAF)).astype(f32)
                is_internal = (featf >= 0.0).astype(f32)
                is_nog = is_internal * (fl == float(LEAF)).astype(f32) \
                    * (fr == float(LEAF)).astype(f32)
                n_leaf = jnp.sum(is_leaf, axis=1, keepdims=True)
                n_nog = jnp.sum(is_nog, axis=1, keepdims=True)

                one = jnp.ones((cb, 1), f32)
                u_move = u[:, 0:1]
                gf = jnp.where(u_move < p_grow, one, 0.0 * one)
                pf = jnp.where(
                    (u_move >= p_grow) & (u_move < p_grow + p_prune),
                    one, 0.0 * one)
                cf = 1.0 - gf - pf

                v_new = jnp.minimum(
                    jnp.sum((spcum_ref[:, :] <= u[:, 3:4]).astype(f32),
                            axis=1, keepdims=True),
                    float(p_feat - 1))
                c_new = jnp.minimum(jnp.floor(u[:, 4:5] * n_cuts),
                                    n_cuts - 1.0)
                iota_p = jax.lax.broadcasted_iota(
                    jnp.int32, (1, p_feat), 1).astype(f32)
                vone = (iota_p == v_new).astype(f32)        # (CB, P)

                def pick(mask_f, count, uu):
                    target = jnp.minimum(
                        jnp.floor(uu * count),
                        jnp.maximum(count - 1.0, 0.0))
                    csum = jnp.dot(mask_f, TRI,
                                   preferred_element_type=f32)
                    return jnp.sum((csum <= target).astype(f32),
                                   axis=1, keepdims=True)

                eta_grow = pick(is_leaf, n_leaf, u[:, 1:2])
                eta_pc = pick(is_nog, jnp.maximum(n_nog, 1.0), u[:, 2:3])
                eta = gf * eta_grow + (1.0 - gf) * eta_pc
                lft = jnp.minimum(2.0 * eta + 1.0, float(NODE_PAD - 1))
                rgt = jnp.minimum(2.0 * eta + 2.0, float(NODE_PAD - 1))

                d_eta = (iota_row == eta).astype(f32)
                d = jnp.sum(depths_ref[:, :] * d_eta, axis=1,
                            keepdims=True)
                dd = jnp.minimum(d + 1.0, max_depth + 1.0)
                ps_d = jnp.sum(psplit_ref[:, :]
                               * (iota_row == d).astype(f32),
                               axis=1, keepdims=True)
                ps_d1 = jnp.sum(psplit_ref[:, :]
                                * (iota_row == dd).astype(f32),
                                axis=1, keepdims=True)
                split_term = (jnp.log(jnp.maximum(ps_d, eps))
                              + 2.0 * jnp.log1p(-ps_d1)
                              - jnp.log1p(-jnp.minimum(ps_d, 1.0 - eps)))
                parent = jnp.maximum(jnp.floor((eta - 1.0) / 2.0), 0.0)
                d_par = (iota_row == parent).astype(f32)
                parent_was_nog = jnp.sum(is_nog * d_par, axis=1,
                                         keepdims=True) \
                    * (eta > 0.0).astype(f32)
                n_nog_grow = jnp.maximum(n_nog + 1.0 - parent_was_nog,
                                         1.0)
                # np.log returns a STRONG f64 scalar; keep the stores f32
                ltg = (np.float32(np.log(p_prune) - np.log(p_grow))
                       + jnp.log(jnp.maximum(n_leaf, 1.0))
                       - jnp.log(n_nog_grow))
                ltp = (np.float32(np.log(p_grow) - np.log(p_prune))
                       + jnp.log(jnp.maximum(n_nog, 1.0))
                       - jnp.log(jnp.maximum(n_leaf - 1.0, 1.0)))

                prop_s[:, 0:1] = eta
                prop_s[:, 1:2] = lft
                prop_s[:, 2:3] = rgt
                prop_s[:, 3:4] = gf
                prop_s[:, 4:5] = pf
                prop_s[:, 5:6] = cf
                prop_s[:, 6:7] = c_new
                prop_s[:, 7:8] = split_term
                prop_s[:, 8:9] = ltg
                prop_s[:, 9:10] = ltp
                prop_s[:, 10:11] = n_nog
                prop_s[:, 11:12] = d
                vone_s[:, :] = jnp.pad(
                    vone, ((0, 0), (0, NODE_PAD - p_feat)))
                stats_s[:, :] = jnp.zeros((cb, NODE_PAD), f32)

            # -- first-tree init: the fit/residual carry scratches are
            #    uninitialized VMEM; zero them before any blend touches
            #    them (0 * NaN would poison the arithmetic blending)
            @pl.when((t == 0) & (ot == 0))
            def _init_rows():
                lvp_s[:, :] = jnp.zeros((cb, NODE_PAD), f32)

            @pl.when(t == 0)
            def _init_tile():
                R_s[ot] = jnp.zeros((cb, ns), f32)
                lidxp_s[ot] = jnp.full((cb, ns), NODE_PAD - 1,
                                       jnp.int32)

            # -- residual roll: apply tree t-1's new fit, add tree t's
            #    old fit (pass A runs for EVERY t incl. the t = T flush)
            tfit_tile = tfit_ref[0, 0, 0]                 # (CB, NS)
            in_flush = (t == T).astype(jnp.int32)
            first_tree = (t == 0).astype(jnp.int32)

            r_prev = R_s[ot]                              # (CB, NS)
            resid0_tile = resid0_ref[0, 0]
            # previous tree's new fit on this tile (lv_prev, lidx_prev
            # from scratch); per-chain one-hot, one live at a time
            lidxp_tile = lidxp_s[ot]                      # (CB, NS) int32
            fit_rows = []
            for j in range(cb):
                lidx_j = lidxp_tile[j:j + 1, :]
                if j > 0:
                    dep = (fit_rows[-1][0:1, 0:1] * 0.0).astype(jnp.int32)
                    lidx_j = lidx_j + dep
                Mm_j = (iota_col == lidx_j).astype(f32)
                fit_rows.append(jnp.dot(lvp_s[j:j + 1, :], Mm_j,
                                        preferred_element_type=f32))
            fit_prev = (fit_rows[0] if cb == 1
                        else jnp.concatenate(fit_rows, axis=0))

            ft = f32(1.0) * first_tree.astype(f32)
            fl_ = f32(1.0) * in_flush.astype(f32)
            # full residual after trees < t: resid0 at t=0, else carried
            full_res = ft * resid0_tile + (1.0 - ft) * (r_prev - fit_prev)
            # partial residual for tree t (flush: stays the full residual)
            r_t = full_res + (1.0 - fl_) * tfit_tile
            R_s[ot] = r_t
            # row t-1 (trash at t = 0)
            tfit_o[0, 0, 0] = fit_prev
            resid_o[0, 0] = full_res         # real home only at t = T

            # -- move sufficient statistics over this tile -------------
            @pl.when(t < T)
            def _stats():
                eta = prop_s[:, 0:1]
                lft = prop_s[:, 1:2]
                rgt = prop_s[:, 2:3]
                gf = prop_s[:, 3:4]
                c_new = prop_s[:, 6:7]
                lidx_tile = lidx_ref[0, 0, 0]            # (CB, NS)
                lidx_f = lidx_tile.astype(f32)
                rank_v = jnp.dot(vone_s[:, :p_feat], ranks_ref[0],
                                 preferred_element_type=f32)
                gl = (rank_v <= c_new).astype(f32)
                me = (lidx_f == eta).astype(f32)
                ml = (lidx_f == lft).astype(f32)
                mr = (lidx_f == rgt).astype(f32)
                members = gf * me + (1.0 - gf) * (ml + mr)
                mln = members * gl
                if weighted:
                    # weighted sufficient statistics (sum w, sum w r);
                    # the unweighted branch keeps the original ops
                    w_t = w_ref[0]                       # (1, NS)
                    wr_t = w_t * r_t
                    cm, cmln, cml = members * w_t, mln * w_t, ml * w_t
                else:
                    wr_t = r_t
                    cm, cmln, cml = members, mln, ml
                stats_s[:, 0:1] = stats_s[:, 0:1] + jnp.sum(
                    cm, axis=1, keepdims=True)
                stats_s[:, 1:2] = stats_s[:, 1:2] + jnp.sum(
                    members * wr_t, axis=1, keepdims=True)
                stats_s[:, 2:3] = stats_s[:, 2:3] + jnp.sum(
                    cmln, axis=1, keepdims=True)
                stats_s[:, 3:4] = stats_s[:, 3:4] + jnp.sum(
                    mln * wr_t, axis=1, keepdims=True)
                stats_s[:, 4:5] = stats_s[:, 4:5] + jnp.sum(
                    cml, axis=1, keepdims=True)
                stats_s[:, 5:6] = stats_s[:, 5:6] + jnp.sum(
                    ml * wr_t, axis=1, keepdims=True)

            # -- decision at the last tile ------------------------------
            @pl.when((ot == nt - 1) & (t < T))
            def _decide():
                featf = feature_ref[0, 0].astype(f32)
                cutf = cut_ref[0, 0].astype(f32)
                eta = prop_s[:, 0:1]
                lft = prop_s[:, 1:2]
                rgt = prop_s[:, 2:3]
                gf = prop_s[:, 3:4]
                pf = prop_s[:, 4:5]
                cf = prop_s[:, 5:6]
                c_new = prop_s[:, 6:7]
                split_term = prop_s[:, 7:8]
                ltg = prop_s[:, 8:9]
                ltp = prop_s[:, 9:10]
                n_nog = prop_s[:, 10:11]
                d = prop_s[:, 11:12]
                n_all = stats_s[:, 0:1]
                s_all = stats_s[:, 1:2]
                n_ln = stats_s[:, 2:3]
                s_ln = stats_s[:, 3:4]
                n_lo = stats_s[:, 4:5]
                s_lo = stats_s[:, 5:6]
                n_rn = n_all - n_ln
                s_rn = s_all - s_ln
                n_ro = n_all - n_lo
                s_ro = s_all - s_lo

                def marg(n, s):
                    denom = sigma2 + n * tau2
                    return (0.5 * jnp.log(sigma2 / denom)
                            + tau2 * s * s / (2.0 * sigma2 * denom))

                m_all = marg(n_all, s_all)
                m_ln = marg(n_ln, s_ln)
                m_rn = marg(n_rn, s_rn)
                m_lo = marg(n_lo, s_lo)
                m_ro = marg(n_ro, s_ro)
                la_grow = split_term + ltg + (m_ln + m_rn - m_all)
                la_prune = -split_term + ltp + (m_all - m_lo - m_ro)
                la_change = m_ln + m_rn - m_lo - m_ro
                log_accept = (gf * la_grow + pf * la_prune
                              + cf * la_change)
                valid_grow = ((d < max_depth).astype(f32)
                              * (n_ln > 0.0).astype(f32)
                              * (n_rn > 0.0).astype(f32))
                valid_prune = (n_nog > 0.0).astype(f32)
                valid_change = (valid_prune
                                * (n_ln > 0.0).astype(f32)
                                * (n_rn > 0.0).astype(f32))
                valid = gf * valid_grow + pf * valid_prune \
                    + cf * valid_change
                log_u = jnp.log(jnp.maximum(u[:, 5:6], 1e-30))
                acc = valid * (log_u < log_accept).astype(f32)

                v_new = jnp.sum(
                    vone_s[:, :] * iota_row, axis=1, keepdims=True)
                d_eta = (iota_row == eta).astype(f32)
                d_lft = (iota_row == lft).astype(f32)
                d_rgt = (iota_row == rgt).astype(f32)
                f_eta_new = pf * float(LEAF) + (1.0 - pf) * v_new
                f_child_new = (pf * float(INACTIVE)
                               + (1.0 - pf) * float(LEAF))
                new_feat = (featf * (1.0 - d_eta - d_lft - d_rgt)
                            + f_eta_new * d_eta
                            + f_child_new * (d_lft + d_rgt))
                c_eta_cur = jnp.sum(cutf * d_eta, axis=1, keepdims=True)
                c_eta_new = pf * c_eta_cur + (1.0 - pf) * c_new
                new_cut = cutf * (1.0 - d_eta) + c_eta_new * d_eta
                featf_new = acc * new_feat + (1.0 - acc) * featf
                cutf_new = acc * new_cut + (1.0 - acc) * cutf
                featf_s[:, :] = featf_new
                cutf_s[:, :] = cutf_new
                prop_s[:, 12:13] = acc
                feature_o[0, 0] = featf_new.astype(jnp.int32)
                cut_o[0, 0] = cutf_new.astype(jnp.int32)

        # ---------------- pass B ---------------------------------------
        @pl.when((ph == 1) & (t < T))
        def _pass_b():
            @pl.when(ot == 0)
            def _reset():
                cnt_s[:, :] = jnp.zeros((cb, NODE_PAD), f32)
                sum_s[:, :] = jnp.zeros((cb, NODE_PAD), f32)

            eta = prop_s[:, 0:1]
            lft = prop_s[:, 1:2]
            rgt = prop_s[:, 2:3]
            gf = prop_s[:, 3:4]
            pf = prop_s[:, 4:5]
            c_new = prop_s[:, 6:7]
            acc = prop_s[:, 12:13]

            lidx_tile = lidx_ref[0, 0, 0]
            lidx_f = lidx_tile.astype(f32)
            rank_v = jnp.dot(vone_s[:, :p_feat], ranks_ref[0],
                             preferred_element_type=f32)
            gl = (rank_v <= c_new).astype(f32)
            me = (lidx_f == eta).astype(f32)
            ml = (lidx_f == lft).astype(f32)
            mr = (lidx_f == rgt).astype(f32)
            members = gf * me + (1.0 - gf) * (ml + mr)
            dest = pf * eta + (1.0 - pf) * (gl * lft + (1.0 - gl) * rgt)
            new_lidx_f = members * dest + (1.0 - members) * lidx_f
            new_lidx_f = acc * new_lidx_f + (1.0 - acc) * lidx_f
            new_lidx = new_lidx_f.astype(jnp.int32)
            lidxp_s[ot] = new_lidx
            lidx_o[0, 0, 0] = new_lidx

            r_t = R_s[ot]
            for j in range(cb):
                lidx_j = new_lidx[j:j + 1, :]
                if j > 0:
                    dep = (cnt_s[0:1, 0:1] * 0.0).astype(jnp.int32)
                    lidx_j = lidx_j + dep
                Mm_j = (iota_col == lidx_j).astype(f32)
                # both leaf statistics in one MXU contraction (see
                # _tree_step_math — measured ~2x the VPU reduce form)
                r_j = r_t[j:j + 1, :]
                if weighted:
                    w_t = w_ref[0]
                    stacked_j = jnp.concatenate([w_t, w_t * r_j], axis=0)
                else:
                    stacked_j = jnp.concatenate(
                        [jnp.ones((1, r_j.shape[1]), f32), r_j], axis=0)
                st_j = jax.lax.dot_general(
                    stacked_j, Mm_j, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)             # (2, 128)
                cnt_s[j:j + 1, :] = cnt_s[j:j + 1, :] + st_j[0:1]
                sum_s[j:j + 1, :] = sum_s[j:j + 1, :] + st_j[1:2]

            @pl.when(ot == nt - 1)
            def _leaf_draw():
                pv = 1.0 / (cnt_s[:, :] / sigma2 + 1.0 / tau2)
                pm = pv * sum_s[:, :] / sigma2
                mu = pm + jnp.sqrt(pv) * zn_ref[0, 0]
                lv = jnp.where(featf_s[:, :] == float(LEAF), mu, 0.0)
                lvp_s[:, :] = lv
                lv_o[0, 0] = lv

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_obs", "npad", "cb", "nt", "weighted",
                     "interpret"),
)
def _sweep_call_tiled(cfg: BartConfig, featp, cutp, lvp, lidxp, tfitp,
                      resid0, ranks_f, spcum, psplit, depths, u, zn,
                      scal, wpad, n_obs: int, npad: int, cb: int,
                      nt: int, weighted: bool, interpret: bool):
    T = cfg.num_trees
    P = ranks_f.shape[0]
    cblk = featp.shape[0]
    ns = npad // nt
    f32 = jnp.float32

    # tile the obs-axis arrays with the TILE axis ahead of (cb, ns): the
    # Mosaic block-shape rule needs the last two block dims divisible by
    # (8, 128) or equal to the array dims, so blocks must be full
    # (cb, ns) planes indexed by (tree, tile)
    lidxp4 = lidxp.reshape(cblk, T, cb, nt, ns).swapaxes(2, 3)
    tfitp4 = tfitp.reshape(cblk, T, cb, nt, ns).swapaxes(2, 3)
    resid04 = resid0.reshape(cblk, cb, nt, ns).swapaxes(1, 2)
    ranks3 = jnp.swapaxes(ranks_f.reshape(P, nt, ns), 0, 1)  # (NT, P, NS)

    def tmin(t):
        return jnp.minimum(t, T - 1)

    row_tree = lambda c, t, ph, ot: (c, tmin(t), 0, 0)        # noqa: E731
    tile_tree = lambda c, t, ph, ot: (c, tmin(t), ot, 0, 0)   # noqa: E731
    const2 = lambda c, t, ph, ot: (0, 0)                      # noqa: E731

    kernel = _make_tiled_kernel(cfg, P, cb, nt, ns, weighted)
    in_specs = [
            pl.BlockSpec((1, cb, 2), lambda c, t, ph, ot: (c, 0, 0)),
            pl.BlockSpec((1, 1, cb, 8), row_tree),                # u
            pl.BlockSpec((1, 1, cb, NODE_PAD), row_tree),         # feature
            pl.BlockSpec((1, 1, cb, NODE_PAD), row_tree),         # cut
            pl.BlockSpec((1, 1, cb, NODE_PAD), row_tree),         # lv
            pl.BlockSpec((1, 1, 1, cb, ns), tile_tree),           # lidx
            pl.BlockSpec((1, 1, 1, cb, ns), tile_tree),           # tfit
            # resid0 is only read at t == 0; park on tile 0 afterwards
            pl.BlockSpec((1, 1, cb, ns),
                         lambda c, t, ph, ot: (
                             c, jnp.where(t == 0, ot, 0), 0, 0)),
            pl.BlockSpec((1, P, ns),
                         lambda c, t, ph, ot: (ot, 0, 0)),        # ranks
            pl.BlockSpec((1, P), const2),                         # spcum
            pl.BlockSpec((1, NODE_PAD), const2),                  # psplit
            pl.BlockSpec((1, NODE_PAD), const2),                  # depths
            pl.BlockSpec((1, 1, cb, NODE_PAD), row_tree),         # zn
    ]
    if weighted:
        in_specs.append(pl.BlockSpec(
            (1, 1, ns), lambda c, t, ph, ot: (ot, 0, 0)))         # w
    outs = pl.pallas_call(
        kernel,
        grid=(cblk, T + 1, 2, nt),
        in_specs=in_specs,
        out_specs=[
            # feature/cut: written during pass A of tree t (trash row T
            # otherwise); lv during pass B of tree t
            pl.BlockSpec((1, 1, cb, NODE_PAD),
                         lambda c, t, ph, ot: (
                             c, jnp.where((ph == 0) & (t < T), t, T),
                             0, 0)),
            pl.BlockSpec((1, 1, cb, NODE_PAD),
                         lambda c, t, ph, ot: (
                             c, jnp.where((ph == 0) & (t < T), t, T),
                             0, 0)),
            pl.BlockSpec((1, 1, cb, NODE_PAD),
                         lambda c, t, ph, ot: (
                             c, jnp.where((ph == 1) & (t < T), t, T),
                             0, 0)),
            # lidx: written per tile during pass B of tree t
            pl.BlockSpec((1, 1, 1, cb, ns),
                         lambda c, t, ph, ot: (
                             c, jnp.where((ph == 1) & (t < T), t, T),
                             jnp.where((ph == 1) & (t < T), ot, 0),
                             0, 0)),
            # tfit of tree t-1: written per tile during pass A of tree t
            pl.BlockSpec((1, 1, 1, cb, ns),
                         lambda c, t, ph, ot: (
                             c, jnp.where((ph == 0) & (t > 0), t - 1, T),
                             jnp.where((ph == 0) & (t > 0), ot, 0),
                             0, 0)),
            # final full residual: written per tile during the flush pass
            pl.BlockSpec((1, 1, cb, ns),
                         lambda c, t, ph, ot: (
                             c,
                             jnp.where((ph == 0) & (t == T), ot, nt),
                             0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cblk, T + 1, cb, NODE_PAD), jnp.int32),
            jax.ShapeDtypeStruct((cblk, T + 1, cb, NODE_PAD), jnp.int32),
            jax.ShapeDtypeStruct((cblk, T + 1, cb, NODE_PAD), f32),
            jax.ShapeDtypeStruct((cblk, T + 1, nt, cb, ns), jnp.int32),
            jax.ShapeDtypeStruct((cblk, T + 1, nt, cb, ns), f32),
            jax.ShapeDtypeStruct((cblk, nt + 1, cb, ns), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nt, cb, ns), f32),          # R carry
            pltpu.VMEM((nt, cb, ns), jnp.int32),    # prev tree's new lidx
            pltpu.VMEM((cb, NODE_PAD), f32),        # proposal lanes
            pltpu.VMEM((cb, NODE_PAD), f32),        # vone
            pltpu.VMEM((cb, NODE_PAD), f32),        # move stats lanes
            pltpu.VMEM((cb, NODE_PAD), f32),        # featf (post-move)
            pltpu.VMEM((cb, NODE_PAD), f32),        # cutf (post-move)
            pltpu.VMEM((cb, NODE_PAD), f32),        # lv_prev
            pltpu.VMEM((cb, NODE_PAD), f32),        # leaf counts
            pltpu.VMEM((cb, NODE_PAD), f32),        # leaf sums
        ],
        interpret=interpret,
    )(scal, u, featp, cutp, lvp, lidxp4, tfitp4,
      resid04, ranks3, spcum, psplit, depths, zn,
      *((wpad.reshape(nt, 1, ns),) if weighted else ()))
    feato, cuto, lvo, lidxo, tfito, resido = outs
    return (feato[:, :T], cuto[:, :T], lvo[:, :T],
            lidxo[:, :T].swapaxes(2, 3).reshape(cblk, T, cb, npad),
            tfito[:, :T].swapaxes(2, 3).reshape(cblk, T, cb, npad),
            resido[:, :nt].swapaxes(1, 2).reshape(cblk, cb, npad))


def bart_sweep_fused_batch_tiled(cfg: BartConfig, state: BartState,
                                 y_target, consts: SweepConsts, sigma,
                                 rng, *, chain_block: int = 8,
                                 weights=None, variates=None,
                                 interpret: bool = False):
    """Obs-tiled chain-blocked fused sweep (see the tiled-kernel comment
    block): same semantics and RNG contract as ``bart_sweep_fused_batch``
    but VMEM-bounded at any n — the only full-width live state is the
    O(N * CB) residual/lidx scratch pair, so the chain block is capped by
    ``S4B_SWEEP_TILED_CB_LANES`` (default 1M lanes ~ 8M scratch bytes)
    instead of the single-pass kernel's 82944."""
    T, M = cfg.num_trees, cfg.max_nodes
    N, NPAD = consts.n_obs, consts.npad
    nt = consts.n_slices
    f32 = jnp.float32
    C = state.feature.shape[0]
    lane_budget = int(os.environ.get("S4B_SWEEP_TILED_CB_LANES",
                                     "1000000"))
    cb_cap = max(1, lane_budget // NPAD)
    cb = _pick_chain_block(C, min(chain_block, cb_cap))
    cblk = C // cb

    if variates is None:
        def draw(k):
            ku, kz = jax.random.split(k)
            return (jax.random.uniform(ku, (T, 8), dtype=f32),
                    jax.random.normal(kz, (T, NODE_PAD), dtype=f32))

        u, zn = jax.vmap(draw)(rng)
    else:
        u, zn = variates

    def to_blocks(x):
        return jnp.transpose(
            x.reshape(cblk, cb, T, x.shape[-1]), (0, 2, 1, 3))

    def from_blocks(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(C, T, x.shape[-1])

    pad_nodes = ((0, 0), (0, 0), (0, NODE_PAD - M))
    pad_obs = ((0, 0), (0, 0), (0, NPAD - N))
    featp = to_blocks(jnp.pad(state.feature, pad_nodes,
                              constant_values=INACTIVE))
    cutp = to_blocks(jnp.pad(state.cut, pad_nodes))
    lvp = to_blocks(jnp.pad(state.leaf_value.astype(f32), pad_nodes))
    lidxp = to_blocks(jnp.pad(state.leaf_idx, pad_obs,
                              constant_values=NODE_PAD - 1))
    tfitp = to_blocks(jnp.pad(state.tree_fit.astype(f32), pad_obs))
    resid0 = jnp.pad((y_target - state.allfit).astype(f32),
                     ((0, 0), (0, NPAD - N))).reshape(cblk, cb, NPAD)
    scal = jnp.stack([
        (sigma * sigma).astype(f32),
        (state.sigma_mu * state.sigma_mu).astype(f32),
    ], axis=-1).reshape(cblk, cb, 2)
    ub = to_blocks(u.astype(f32))
    znb = to_blocks(zn.astype(f32))
    weighted = weights is not None
    wpad = (jnp.zeros((1, 128), f32) if not weighted
            else jnp.pad(jnp.asarray(weights, f32)[None, :],
                         ((0, 0), (0, NPAD - N))))

    feato, cuto, lvo, lidxo, tfito, resido = _sweep_call_tiled(
        cfg, featp, cutp, lvp, lidxp, tfitp, resid0,
        consts.ranks_f, consts.spcum, consts.psplit, consts.depths,
        ub, znb, scal, wpad, n_obs=N, npad=NPAD, cb=cb, nt=nt,
        weighted=weighted, interpret=interpret,
    )

    dtype = state.allfit.dtype
    feature = from_blocks(feato)[:, :, :M]
    cut = from_blocks(cuto)[:, :, :M]
    leaf_value = from_blocks(lvo)[:, :, :M].astype(dtype)
    leaf_idx = from_blocks(lidxo)[:, :, :N]
    tree_fit = from_blocks(tfito)[:, :, :N].astype(dtype)
    allfit = (y_target.astype(f32)
              - resido.reshape(C, NPAD)[:, :N]).astype(dtype)

    k = state.k
    sigma_mu = state.sigma_mu
    if cfg.k_df > 0:
        def k_update(rng_c, feature_c, leaf_value_c, k_c, sigma_mu_c):
            rng_k = jax.random.fold_in(rng_c, 0x6B)
            is_leaf_all = feature_c == LEAF
            m = jnp.sum(is_leaf_all.astype(dtype))
            A = k_c * sigma_mu_c
            ssq = jnp.sum(jnp.where(is_leaf_all, leaf_value_c, 0.0) ** 2)
            rate = ssq / (2.0 * A * A)
            if np.isfinite(cfg.k_scale):
                rate = rate + 1.0 / (2.0 * cfg.k_scale ** 2)
            shape = (cfg.k_df + m) / 2.0
            g = jax.random.gamma(rng_k, shape, dtype=dtype) / rate
            k_new = jnp.sqrt(g)
            return k_new, A / k_new

        k, sigma_mu = jax.vmap(k_update)(rng, feature, leaf_value,
                                         state.k, state.sigma_mu)

    new_state = BartState(
        feature=feature, cut=cut, leaf_value=leaf_value,
        leaf_idx=leaf_idx, allfit=allfit, k=k, sigma_mu=sigma_mu,
        tree_fit=tree_fit,
    )
    varcount = jax.vmap(
        lambda f: count_variable_use(cfg, f, consts.spcum.shape[1])
    )(feature)
    return new_state, varcount
