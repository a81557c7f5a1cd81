"""Large-n sweep timing on the real chip: sliced fused kernel vs XLA scan.

The reference handles big n not at all (single-core sweeps; SURVEY.md
section 5 long-context note).  This harness measures the two TPU paths at
n >> the fused kernel's single-slice VMEM ceiling:

* sliced fused kernel (ops/bart_sweep_kernel.py lane-sliced body,
  chain block capped by S4B_SWEEP_CB_LANES);
* the XLA scan sweep (any n, ~8-12 fused kernels per tree).

Env: BENCH_N (default 50000), BENCH_CHAINS (64), BENCH_ITERS (25),
BENCH_TREES (75).  Prints ms/iter and aggregate draws/s for both paths.
"""

import os
import sys
import time


def main():
    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    sys.path.insert(0, "/root/repo")

    import jax.numpy as jnp

    from stan4bart_tpu.formula import build_model_frame
    from stan4bart_tpu.gibbs import GibbsProgram
    from stan4bart_tpu.models.assemble import build_parametric_model
    from stan4bart_tpu.ops.bart import BartConfig
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    N = int(os.environ.get("BENCH_N", "50000"))
    CHAINS = int(os.environ.get("BENCH_CHAINS", "64"))
    ITERS = int(os.environ.get("BENCH_ITERS", "25"))
    TREES = int(os.environ.get("BENCH_TREES", "75"))
    # BENCH_WEIGHTED=1: per-obs likelihood weights ~ U(0.5, 2) on BOTH
    # paths — measures the round-4 weighted kernel vs the weighted XLA
    # sweep (the only path weighted fits had before)
    WEIGHTED = os.environ.get("BENCH_WEIGHTED", "0") == "1"

    d = generate_friedman_data(N, ranef=True, causal=True)
    df = friedman_dataframe(d)
    mf = build_model_frame(
        "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 + X4 | g.1) "
        "+ (1 | g.2)", df,
    )
    pm, _, _ = build_parametric_model(
        mf, "gaussian", {"centered_ranef": True}, dtype=jnp.float32
    )

    weights = None
    if WEIGHTED:
        import numpy as np
        weights = np.random.default_rng(0).uniform(0.5, 2.0, N)
        print("# weighted likelihoods on both paths", flush=True)

    def timeit(sweep_kernel):
        prog = GibbsProgram(
            pm, BartConfig(num_trees=TREES), mf.y, mf.bart_X,
            warmup=4, iterations=ITERS, dtype=jnp.float32,
            sweep_kernel=sweep_kernel, weights=weights,
            # sweep-phase timing only: keep the (auto-on) interweaving
            # kernels out of both paths
            linear_gibbs=False, level_gibbs=False,
        )
        label = "xla-scan"
        if sweep_kernel:
            label = ("fused-tiled" if prog.sweep_tiled
                     else "fused-sliced")
            print(f"# {label}: n_slices={prog.sweep_consts.n_slices} "
                  f"npad={prog.sweep_consts.npad}", flush=True)
        keys = jax.random.split(jax.random.PRNGKey(0), CHAINS)
        states = jax.jit(jax.vmap(prog.init_state,
                                  axis_name="chains"))(keys)

        def chunk(states):
            def body(states, i):
                if sweep_kernel:
                    states, _ = prog.step_batched(states, i, False)
                else:
                    states, _ = jax.vmap(
                        lambda s, j: prog.step(s, j, False),
                        in_axes=(0, None), axis_name="chains",
                    )(states, i)
                return states, None

            states, _ = jax.lax.scan(body, states, jnp.arange(ITERS))
            return states

        f = jax.jit(chunk)
        states = jax.block_until_ready(f(states))   # compile + warm
        t0 = time.perf_counter()
        states = jax.block_until_ready(f(states))
        dt = time.perf_counter() - t0
        print(f"{label}: {1000 * dt / ITERS:.1f} ms/iter, "
              f"{CHAINS * ITERS / dt:.0f} draws/s", flush=True)
        return dt

    try:
        timeit(True)
    except Exception as e:  # scoped-VMEM OOM past the kernel's n ceiling
        print(f"fused-sliced: FAILED ({type(e).__name__}: "
              f"{str(e)[:200]})", flush=True)
    timeit(False)


if __name__ == "__main__":
    main()
