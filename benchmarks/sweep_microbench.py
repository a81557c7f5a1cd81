"""Standalone BART-sweep micro-benchmarks at the headline shape.

Times just the sweep (no NUTS) at n=10k / 75 trees / 64 chains on the
live backend — the fast-turnaround harness behind the BENCH_NOTES
round-2 part-4/6 tables (full bench.py runs take ~15-20 min on the
tunnel; this takes ~3).

Modes (SWEEP_MODE env):
  xla     — the lax.scan sweep (ops/bart.py), vmapped over chains
  kernel  — the fused Pallas sweep (vmapped, grid (chains, trees))
  batch   — the chain-blocked batch kernel (SWEEP_CB chains/grid step)

Other knobs: SWEEP_CHAINS (64), SWEEP_N (10000), SWEEP_TREES (75),
SWEEP_REPS (10 sweeps per timed call).
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
    from stan4bart_tpu.ops import bart as bart_ops
    from stan4bart_tpu.ops.bart import BartConfig
    from stan4bart_tpu.ops.bart_sweep_kernel import (
        bart_sweep_fused,
        bart_sweep_fused_batch,
        make_sweep_consts,
    )

    mode = os.environ.get("SWEEP_MODE", "batch")
    C = int(os.environ.get("SWEEP_CHAINS", "64"))
    N = int(os.environ.get("SWEEP_N", "10000"))
    T = int(os.environ.get("SWEEP_TREES", "75"))
    REPS = int(os.environ.get("SWEEP_REPS", "10"))
    CB = int(os.environ.get("SWEEP_CB", "8"))

    rng = np.random.default_rng(0)
    X = rng.normal(size=(N, 9))
    y = (np.sin(X[:, 0]) + X[:, 1] ** 2
         + rng.normal(scale=0.5, size=N)).astype(np.float32)
    cfg = BartConfig(num_trees=T)
    cuts = bart_ops.make_cut_grid(X, cfg.n_cuts)
    ranks = bart_ops.compute_ranks(X, cuts)
    sp = np.full(9, 1.0 / 9, np.float32)
    state0 = bart_ops.bart_init(cfg, N, dtype=jnp.float32)
    consts = make_sweep_consts(cfg, ranks, sp)
    yj = jnp.asarray(y)
    sigma = jnp.asarray(0.7, jnp.float32)
    ranks_j = jnp.asarray(ranks)
    sp_j = jnp.asarray(sp)

    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (C,) + x.shape), state0)
    keys = jax.random.split(jax.random.PRNGKey(0), C)

    if mode == "batch":
        yb = jnp.broadcast_to(yj, (C, N))
        sigmas = jnp.full((C,), 0.7, jnp.float32)

        def sweeps(states, ks):
            def body(carry, i):
                s, k = carry
                k2 = jax.vmap(lambda kk: jax.random.fold_in(kk, i))(k)
                s, _ = bart_sweep_fused_batch(
                    cfg, s, yb, consts, sigmas, k2, chain_block=CB)
                return (s, k), None

            (s, _), _ = jax.lax.scan(body, (states, ks),
                                     jnp.arange(REPS))
            return s

        fn = jax.jit(sweeps)
    else:
        def chain_sweeps(state, key):
            def body(carry, i):
                s, k = carry
                k, sub = jax.random.split(k)
                if mode == "kernel":
                    s, _ = bart_sweep_fused(cfg, s, yj, consts, sigma,
                                            sub)
                else:
                    s, _ = bart_ops.bart_sweep(cfg, s, yj, ranks_j,
                                               sp_j, sigma, sub)
                return (s, k), None

            (s, _), _ = jax.lax.scan(body, (state, key),
                                     jnp.arange(REPS))
            return s

        fn = jax.jit(jax.vmap(chain_sweeps))

    t0 = time.time()
    jax.block_until_ready(fn(states, keys))
    print(f"# compile+run {time.time() - t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(fn(states, keys))
        best = min(best, time.time() - t0)
    print(f"mode={mode} C={C} N={N} T={T}"
          + (f" CB={CB}" if mode == "batch" else "")
          + f": {best / REPS * 1e3:.2f} ms/sweep"
          f" -> {best / REPS / T / C * 1e6:.2f} us/chain/tree")


if __name__ == "__main__":
    main()
