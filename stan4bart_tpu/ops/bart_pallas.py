"""Pallas TPU kernels for the BART sweep's leaf-statistic path.

The XLA path materializes an (N, max_nodes) float one-hot in HBM per
tree step to get MXU-friendly segment sums and leaf-value lookups
(ops/bart.py node_onehot — fancy-index gathers serialize on TPU).  At
the n=10k / 64-chain headline that one-hot is ~5 MB per chain per tree:
the dominant HBM traffic of the whole Gibbs iteration (BENCH_NOTES
round-2 phase profile: BART sweep = 56%).

These kernels keep the one-hot VMEM-only: each (TILE_N, 128) tile is
generated in registers from the int32 leaf index, consumed by a VPU
masked reduction (stats) or lane reduction (lookup), and never written
back.  HBM traffic per tree drops from ~3 x N x 128 floats to ~3 x N
(the index/resid/fit vectors themselves) — a ~100x reduction on the
path this replaces.

Two kernels rather than one because of a data dependency: the conjugate
leaf means mu are sampled FROM the (counts, sums) statistics, and the
new tree fit is the lookup of those mu — so stats must complete before
the lookup pass.  The mu draw itself is M-sized and stays in XLA.

Layout notes (Mosaic): all operands are (N_pad, 1) columns so the
one-hot broadcast (leaf_idx == iota over lanes) is a natural
(sublane, lane) op; per-tile partial stats are emitted as (n_tiles, M)
rows and reduced in XLA instead of accumulating across grid steps,
which keeps the kernel body free of pl.program_id (its meaning shifts
under vmap's prepended batch grid dimension).  Statistical parity with
the XLA path is exact up to f32 summation order.

Validated statistically (identical posteriors) and numerically
(stats/lookup equality tests, tests/test_bart_pallas.py) against the
XLA one-hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE_N = 1024
PARTIAL_ROWS = 8  # min Mosaic sublane granularity for f32 output blocks


def _cdiv(a, b):
    return -(-a // b)


def _stats_kernel(li_ref, cw_ref, wr_ref, counts_ref, sums_ref):
    # one-hot tile generated in VMEM/registers, never written to HBM
    oh = (
        li_ref[:]
        == jax.lax.broadcasted_iota(jnp.int32, (TILE_N, LANES), 1)
    ).astype(jnp.float32)
    # Mosaic requires output blocks with sublane dim divisible by 8, so
    # each tile's partial occupies an 8-row block: row 0 carries the
    # stats, rows 1-7 are zeroed via an arithmetic blend (scalar-pred
    # selects over i1 vectors don't lower — see CLAUDE.md).
    row0 = (
        jax.lax.broadcasted_iota(jnp.int32, (PARTIAL_ROWS, LANES), 0) == 0
    ).astype(jnp.float32)
    counts_ref[:] = row0 * jnp.sum(oh * cw_ref[:], axis=0, keepdims=True)
    sums_ref[:] = row0 * jnp.sum(oh * wr_ref[:], axis=0, keepdims=True)


def _lookup_kernel(li_ref, table_ref, out_ref):
    oh = (
        li_ref[:]
        == jax.lax.broadcasted_iota(jnp.int32, (TILE_N, LANES), 1)
    ).astype(jnp.float32)
    # lane reduction: out[r] = table[leaf_idx[r]]
    out_ref[:] = jnp.sum(oh * table_ref[:], axis=1, keepdims=True)


def _pad_col(x, n_pad, fill):
    N = x.shape[0]
    return jnp.pad(x[:, None], ((0, n_pad - N), (0, 0)),
                   constant_values=fill)


@functools.partial(jax.jit, static_argnames=("max_nodes", "interpret"))
def leaf_stats_pallas(leaf_idx, wresid, max_nodes, count_weights=None,
                      interpret=False):
    """Per-node (weighted count, weighted resid sum) over <= 128 nodes.

    Drop-in for ops.bart.leaf_stats on the TPU f32 path.  leaf_idx (N,)
    int32 in [0, max_nodes); wresid (N,) float; count_weights (N,) or
    None (unit counts).  Returns (counts, sums) of shape (max_nodes,).
    """
    if max_nodes > LANES:
        raise ValueError(f"leaf_stats_pallas supports <= {LANES} nodes")
    N = leaf_idx.shape[0]
    n_pad = _cdiv(N, TILE_N) * TILE_N
    n_tiles = n_pad // TILE_N

    li = _pad_col(leaf_idx.astype(jnp.int32), n_pad, LANES - 1)
    cw = (jnp.ones((N,), jnp.float32) if count_weights is None
          else count_weights.astype(jnp.float32))
    cw = _pad_col(cw, n_pad, 0.0)  # zero-weight padding rows drop out
    wr = _pad_col(wresid.astype(jnp.float32), n_pad, 0.0)

    counts, sums = pl.pallas_call(
        _stats_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((PARTIAL_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PARTIAL_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * PARTIAL_ROWS, LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * PARTIAL_ROWS, LANES),
                                 jnp.float32),
        ],
        interpret=interpret,
    )(li, cw, wr)
    # per-tile 8-row partial blocks (rows 1-7 zero) -> totals
    # (tiny: n_tiles x 8 x 128)
    return counts.sum(axis=0)[:max_nodes], sums.sum(axis=0)[:max_nodes]


@functools.partial(jax.jit, static_argnames=("interpret",))
def table_lookup_pallas(leaf_idx, table, interpret=False):
    """values[n] = table[leaf_idx[n]] for a <= 128-entry table, with the
    one-hot kept VMEM-only.  Drop-in for ops.bart.table_lookup on the
    TPU f32 path.  Returns (N,) float32."""
    M = table.shape[0]
    if M > LANES:
        raise ValueError(f"table_lookup_pallas supports <= {LANES} entries")
    N = leaf_idx.shape[0]
    n_pad = _cdiv(N, TILE_N) * TILE_N
    n_tiles = n_pad // TILE_N

    li = _pad_col(leaf_idx.astype(jnp.int32), n_pad, LANES - 1)
    tab = jnp.zeros((1, LANES), jnp.float32)
    tab = tab.at[0, :M].set(table.astype(jnp.float32))

    out = pl.pallas_call(
        _lookup_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        interpret=interpret,
    )(li, tab)
    return out[:N, 0]


def reference_stats(leaf_idx, wresid, max_nodes, count_weights=None):
    """Numpy oracle for the tests."""
    counts = np.zeros(max_nodes)
    sums = np.zeros(max_nodes)
    cw = np.ones(len(leaf_idx)) if count_weights is None else count_weights
    for i, m in enumerate(np.asarray(leaf_idx)):
        counts[m] += cw[i]
        sums[m] += np.asarray(wresid)[i]
    return counts, sums
