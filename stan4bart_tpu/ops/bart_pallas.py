"""Pallas TPU kernels for the BART sweep hot path.

The per-tree grow/prune/change step needs six masked reductions over all N
observations (member counts/sums for the node, the proposed split, and the
current split).  As XLA ops that is ~12 kernel launches per tree x 75 trees
x every Gibbs iteration — pure launch latency.  This module fuses them into
ONE Pallas pass over VMEM-resident blocks (BASELINE.json north star:
"vectorized Pallas kernel over flattened tree arrays with on-device
sufficient-statistic scans").

Layout: inputs are reshaped to (rows, 128) lanes; a 1-D grid accumulates
block partial sums into an SMEM (8,) output:

    out = [n_all, s_all, n_ln, s_ln, n_lo, s_lo, 0, 0]

Scalars (eta, lft, rgt, c_new, grow flag) ride in SMEM via scalar prefetch.
Padding rows carry leaf_idx = -7 (matches no node) so they contribute
nothing.  Used on the TPU backend; interpret mode covers CPU tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
PAD_LEAF = -7


def _stats_kernel(scal_ref, resid_ref, leaf_ref, rank_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        zero = jnp.zeros((), out_ref.dtype)
        for j in range(8):
            out_ref[0, j] = zero

    eta = scal_ref[0, 0]
    lft = scal_ref[0, 1]
    rgt = scal_ref[0, 2]
    c_new = scal_ref[0, 3]
    grow = scal_ref[0, 4]

    li = leaf_ref[...]
    r = resid_ref[...]
    # scalar-pred select of i1 vectors doesn't legalize in Mosaic; blend
    # the grow/prune-change member masks arithmetically instead
    mf_grow = (li == eta).astype(r.dtype)
    mlo = (li == lft).astype(r.dtype)
    mf_pc = mlo + (li == rgt).astype(r.dtype)
    gf = (grow == 1).astype(r.dtype)
    mf = gf * mf_grow + (1.0 - gf) * mf_pc
    mln = mf * (rank_ref[...] <= c_new).astype(r.dtype)

    out_ref[0, 0] += jnp.sum(mf)
    out_ref[0, 1] += jnp.sum(r * mf)
    out_ref[0, 2] += jnp.sum(mln)
    out_ref[0, 3] += jnp.sum(r * mln)
    out_ref[0, 4] += jnp.sum(mlo)
    out_ref[0, 5] += jnp.sum(r * mlo)


@partial(jax.jit, static_argnames=("interpret", "block_rows"))
def proposal_stats(resid, leaf_idx, rank_v, eta, lft, rgt, c_new, do_grow,
                   interpret: bool = False, block_rows: int = 64):
    """Fused masked statistics for one tree proposal.

    resid (N,) float32/float64, leaf_idx (N,) int32, rank_v (N,) int32.
    Returns (n_all, s_all, n_ln, s_ln, n_lo, s_lo) as dtype scalars.
    """
    n = resid.shape[0]
    rows = -(-n // LANES)
    rows = -(-rows // block_rows) * block_rows  # pad to grid multiple
    padded = rows * LANES

    def pad_to(x, fill):
        return jnp.pad(x, (0, padded - n), constant_values=fill)

    resid2 = pad_to(resid, 0).reshape(rows, LANES)
    leaf2 = pad_to(leaf_idx, PAD_LEAF).reshape(rows, LANES)
    rank2 = pad_to(rank_v, np.int32(2**30)).reshape(rows, LANES)
    scal = jnp.stack([
        eta.astype(jnp.int32), lft.astype(jnp.int32),
        rgt.astype(jnp.int32), c_new.astype(jnp.int32),
        do_grow.astype(jnp.int32),
    ])[None, :]  # (1, 5) SMEM block

    grid = rows // block_rows
    out = pl.pallas_call(
        _stats_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 5), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8), resid.dtype),
        interpret=interpret,
    )(scal, resid2, leaf2, rank2)
    o = out[0]
    return o[0], o[1], o[2], o[3], o[4], o[5]
