"""Measure the single-core CPU baseline denominator for bench.py.

BASELINE.md instructs measuring the reference-equivalent single-core
baseline empirically (the reference publishes no throughput numbers and R
is not in this image).  This runs THIS sampler — the same algorithm class
the reference runs per chain: NUTS over the parametric conditional + one
75-tree BART sweep per Gibbs iteration, Friedman n=10k — as 1 chain on 1
CPU thread, and records post-warmup draws/s to BASELINE_CPU.json at the
repo root.  bench.py uses that measured number as its vs_baseline
denominator when present (VERDICT round-1 Weak #4).

Run:  python benchmarks/baseline_cpu.py  [--n 10000] [--iters 60]
(re-executes itself with single-thread XLA flags before importing jax).
"""

import argparse
import json
import os
import sys
import time

_FLAGS = ("--xla_cpu_multi_thread_eigen=false "
          "intra_op_parallelism_threads=1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--warmup", type=int, default=60)
    ap.add_argument("--trees", type=int, default=75)
    args = ap.parse_args()

    if os.environ.get("_BASELINE_CPU_CHILD") != "1":
        # re-exec with single-thread XLA before anything imports jax
        env = dict(os.environ)
        env["_BASELINE_CPU_CHILD"] = "1"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + _FLAGS).strip()
        env["JAX_PLATFORMS"] = "cpu"
        env["OMP_NUM_THREADS"] = "1"
        os.execve(sys.executable, [sys.executable] + sys.argv, env)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)  # match the f32 chip bench

    import jax.numpy as jnp
    import numpy as np

    from stan4bart_tpu.formula.design import build_model_frame
    from stan4bart_tpu.gibbs import GibbsProgram
    from stan4bart_tpu.models.assemble import build_parametric_model
    from stan4bart_tpu.ops.bart import BartConfig
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    df = friedman_dataframe(
        generate_friedman_data(args.n, ranef=True, causal=True)
    )
    mf = build_model_frame(
        "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 + X4 | g.1) "
        "+ (1 | g.2)", df,
    )
    pm, _, _ = build_parametric_model(
        mf, "gaussian", {"centered_ranef": True}, dtype=jnp.float32
    )
    prog = GibbsProgram(
        pm, BartConfig(num_trees=args.trees), mf.y, mf.bart_X,
        warmup=args.warmup, iterations=args.iters, dtype=jnp.float32,
        # the denominator is the REFERENCE-equivalent sampler: keep the
        # (auto-on) interweaving kernels out — the reference has none
        linear_gibbs=False, level_gibbs=False,
    )

    key = jax.random.PRNGKey(0)
    state = jax.jit(prog.init_state)(key)

    @jax.jit
    def run_warm(state):
        def body(s, it):
            s, _ = prog.step(s, it, True)
            return s, ()

        return jax.lax.scan(body, state, jnp.arange(args.warmup))[0]

    @jax.jit
    def run_sample(state):
        def body(s, it):
            s, d = prog.step(s, it, False)
            return s, d.stan[..., 0]

        return jax.lax.scan(body, state, jnp.arange(args.iters))

    state = run_warm(state)
    state = prog._disengage(state)
    # compile sampling phase before timing
    s2, lp = run_sample(state)
    jax.block_until_ready(lp)
    t0 = time.perf_counter()
    s3, lp = run_sample(s2)
    jax.block_until_ready(lp)
    dt = time.perf_counter() - t0
    draws_per_s = args.iters / dt

    out = dict(
        metric="single_core_draws_per_s",
        value=round(draws_per_s, 4),
        unit="draws/s",
        config=dict(n=args.n, trees=args.trees, chains=1, threads=1,
                    iters=args.iters, dtype="float32"),
        note=("measured single-thread CPU run of this sampler (same "
              "algorithm class as one reference chain: NUTS + 75-tree "
              "BART sweep per Gibbs iteration, Friedman n=10k); R itself "
              "is not in this image"),
        host=os.uname().nodename,
    )
    path = os.path.join(repo, "BASELINE_CPU.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
