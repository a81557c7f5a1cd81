"""Stub-ablation of the chain-blocked fused sweep kernel (chip only).

Decomposes the measured ~25 us per grid step (CB=8, npad=10368;
sweep_microbench CB sweep -> fixed ~10us + ~1.9us/chain) into:

  copy    — identical grid + BlockSpecs + scratch, body only copies
            inputs to outputs (the block-DMA/grid floor)
  obs     — copy + the per-chain obs-sized compute (membership one-hot,
            leaf stats reduction, fit lookup, residual roll) with NO
            node/move math
  full    — the real kernel (run sweep_microbench mode=batch)

full - obs  = per-tree node math (NOT amortized by tree-blocking)
obs - copy  = per-chain obs compute (scales with CB; irreducible)
copy        = what a TB-tree-blocked grid would amortize

Usage: ABLATE_MODE={copy,obs} python benchmarks/ablate_batch_kernel.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    sys.path.insert(0, "/root/repo")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from stan4bart_tpu.ops import bart as bart_ops
    from stan4bart_tpu.ops.bart import BartConfig
    from stan4bart_tpu.ops.bart_sweep_kernel import (
        NODE_PAD,
        make_sweep_consts,
    )

    mode = os.environ.get("ABLATE_MODE", "copy")
    C = int(os.environ.get("SWEEP_CHAINS", "64"))
    N = int(os.environ.get("SWEEP_N", "10000"))
    T = int(os.environ.get("SWEEP_TREES", "75"))
    REPS = int(os.environ.get("SWEEP_REPS", "10"))
    cb = int(os.environ.get("SWEEP_CB", "8"))

    rng = np.random.default_rng(0)
    X = rng.normal(size=(N, 9))
    cfg = BartConfig(num_trees=T)
    cuts = bart_ops.make_cut_grid(X, cfg.n_cuts)
    ranks = bart_ops.compute_ranks(X, cuts)
    sp = np.full(9, 1.0 / 9, np.float32)
    consts = make_sweep_consts(cfg, ranks, sp)
    NPAD = consts.npad
    P = consts.ranks_f.shape[0]
    f32 = jnp.float32
    cblk = C // cb

    def kernel(scal_ref, u_ref,
               feature_ref, cut_ref, lv_ref, lidx_ref, tfit_ref,
               resid0_ref, ranks_ref, spcum_ref, psplit_ref, depths_ref,
               zn_ref,
               feature_o, cut_o, lv_o, lidx_o, tfit_o, resid_o,
               resid_s):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            resid_s[:, :] = resid0_ref[0]

        feature_o[0, 0] = feature_ref[0, 0]
        cut_o[0, 0] = cut_ref[0, 0]
        R = resid_s[:, :]
        old_fit = tfit_ref[0, 0]
        lidx = lidx_ref[0, 0]
        lv = lv_ref[0, 0]
        if mode == "obs":
            # per-chain obs-sized compute only: one-hot, leaf stats,
            # fit lookup, residual roll — no proposal / node math
            r = R + old_fit
            sums_rows = []
            cnt_rows = []
            fit_rows = []
            for c in range(cb):
                onehot = (lidx[c][None, :]
                          == jax.lax.broadcasted_iota(
                              jnp.int32, (NODE_PAD, NPAD), 0)).astype(f32)
                stacked = jnp.stack([jnp.ones((NPAD,), f32), r[c]])
                st = jax.lax.dot_general(
                    stacked, onehot,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)          # (2, 128)
                cnt_rows.append(st[0:1])
                sums_rows.append(st[1:2])
                fit_rows.append(
                    jax.lax.dot_general(
                        lv[c][None, :], onehot,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32))      # (1, NPAD)
            cnt = jnp.concatenate(cnt_rows, axis=0)
            sums = jnp.concatenate(sums_rows, axis=0)
            new_fit = jnp.concatenate(fit_rows, axis=0)
            lv_o[0, 0] = lv + 0.0 * (cnt + sums)
            R_new = R + old_fit - new_fit
            resid_s[:, :] = R_new
            resid_o[0] = R_new
            lidx_o[0, 0] = lidx
            tfit_o[0, 0] = new_fit
        else:
            lv_o[0, 0] = lv
            lidx_o[0, 0] = lidx
            tfit_o[0, 0] = old_fit
            resid_s[:, :] = R + 0.0 * old_fit[0, 0]
            resid_o[0] = resid_s[:, :]

    tree4 = lambda c, t: (c, t, 0, 0)   # noqa: E731
    chain3 = lambda c, t: (c, 0, 0)     # noqa: E731
    const2 = lambda c, t: (0, 0)        # noqa: E731

    call = pl.pallas_call(
        kernel,
        grid=(cblk, T),
        in_specs=[
            pl.BlockSpec((1, cb, 2), chain3),
            pl.BlockSpec((1, 1, cb, 8), tree4),
            pl.BlockSpec((1, 1, cb, NODE_PAD), tree4),
            pl.BlockSpec((1, 1, cb, NODE_PAD), tree4),
            pl.BlockSpec((1, 1, cb, NODE_PAD), tree4),
            pl.BlockSpec((1, 1, cb, NPAD), tree4),
            pl.BlockSpec((1, 1, cb, NPAD), tree4),
            pl.BlockSpec((1, cb, NPAD), chain3),
            pl.BlockSpec((P, NPAD), const2),
            pl.BlockSpec((1, P), const2),
            pl.BlockSpec((1, NODE_PAD), const2),
            pl.BlockSpec((1, NODE_PAD), const2),
            pl.BlockSpec((1, 1, cb, NODE_PAD), tree4),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, cb, NODE_PAD), tree4),
            pl.BlockSpec((1, 1, cb, NODE_PAD), tree4),
            pl.BlockSpec((1, 1, cb, NODE_PAD), tree4),
            pl.BlockSpec((1, 1, cb, NPAD), tree4),
            pl.BlockSpec((1, 1, cb, NPAD), tree4),
            pl.BlockSpec((1, cb, NPAD), chain3),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cblk, T, cb, NODE_PAD), jnp.int32),
            jax.ShapeDtypeStruct((cblk, T, cb, NODE_PAD), jnp.int32),
            jax.ShapeDtypeStruct((cblk, T, cb, NODE_PAD), f32),
            jax.ShapeDtypeStruct((cblk, T, cb, NPAD), jnp.int32),
            jax.ShapeDtypeStruct((cblk, T, cb, NPAD), f32),
            jax.ShapeDtypeStruct((cblk, cb, NPAD), f32),
        ],
        scratch_shapes=[pltpu.VMEM((cb, NPAD), f32)],
    )

    featp = jnp.full((cblk, T, cb, NODE_PAD), 127, jnp.int32)
    cutp = jnp.zeros((cblk, T, cb, NODE_PAD), jnp.int32)
    lvp = jnp.zeros((cblk, T, cb, NODE_PAD), f32)
    lidxp = jnp.full((cblk, T, cb, NPAD), NODE_PAD - 1, jnp.int32)
    tfitp = jnp.zeros((cblk, T, cb, NPAD), f32)
    resid0 = jnp.zeros((cblk, cb, NPAD), f32)
    scal = jnp.ones((cblk, cb, 2), f32)
    u = jnp.zeros((cblk, T, cb, 8), f32)
    zn = jnp.zeros((cblk, T, cb, NODE_PAD), f32)

    def run(resid0):
        def body(r0, _):
            outs = call(scal, u, featp, cutp, lvp, lidxp, tfitp, r0,
                        consts.ranks_f, consts.spcum, consts.psplit,
                        consts.depths, zn)
            return outs[5], None

        r, _ = jax.lax.scan(body, resid0, jnp.arange(REPS))
        return r

    fn = jax.jit(run)
    t0 = time.time()
    jax.block_until_ready(fn(resid0))
    print(f"# compile+run {time.time() - t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(fn(resid0))
        best = min(best, time.time() - t0)
    step = best / REPS / (cblk * T)
    print(f"mode={mode} C={C} N={N} T={T} CB={cb}: "
          f"{best / REPS * 1e3:.2f} ms/sweep -> "
          f"{step * 1e6:.2f} us/grid-step "
          f"({step / cb * 1e6:.2f} us/chain/tree)")


if __name__ == "__main__":
    main()
