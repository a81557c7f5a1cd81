"""Per-phase Gibbs profile at the headline bench config (real chip).

Prints the full/nuts/bart/glue ms-per-iteration breakdown from
stan4bart_tpu.utils.profiling at 64 vmapped chains, Friedman n=10k,
75 trees — the measurement that decides where the next kernel
consolidation goes (BENCH_NOTES round-2 A/Bs).
"""

import os
import sys

import jax
import jax.numpy as jnp


def main():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    sys.path.insert(0, "/root/repo")
    from stan4bart_tpu.formula import build_model_frame
    from stan4bart_tpu.gibbs import GibbsProgram
    from stan4bart_tpu.models.assemble import build_parametric_model
    from stan4bart_tpu.ops.bart import BartConfig
    from stan4bart_tpu.ops.nuts import NutsConfig
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )
    from stan4bart_tpu.utils.profiling import format_profile, profile_phases

    chains = int(os.environ.get("BENCH_CHAINS", "64"))
    warmup = int(os.environ.get("BENCH_WARMUP", "200"))
    maxdepth = int(os.environ.get("BENCH_MAXDEPTH", "10"))
    n_obs = int(os.environ.get("BENCH_N", "10000"))
    chunk = 25

    d = generate_friedman_data(n_obs, ranef=True, causal=True)
    df = friedman_dataframe(d)
    mf = build_model_frame(
        "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 + X4 | g.1) "
        "+ (1 | g.2)",
        df,
    )
    pm, _, _ = build_parametric_model(
        mf, "gaussian", {"centered_ranef": True}, dtype=jnp.float32
    )
    prog = GibbsProgram(
        pm, BartConfig(num_trees=75), mf.y, mf.bart_X,
        warmup=warmup, iterations=chunk, dtype=jnp.float32,
        nuts_cfg=NutsConfig(freeze_rule="mid", max_treedepth=maxdepth),
        sweep_kernel=os.environ.get("BENCH_SWEEP_KERNEL", "0") == "1",
        # phase attribution stays comparable to the recorded NUTS/BART
        # split: keep the (auto-on) interweaving kernels out
        linear_gibbs=False, level_gibbs=False,
    )

    def warmup_chunk(state, it0):
        def body(state, i):
            state, _ = prog.step(state, it0 + i, True)
            return state, None
        state, _ = jax.lax.scan(body, state, jnp.arange(chunk))
        return state

    keys = jax.random.split(jax.random.PRNGKey(0), chains)
    states = jax.block_until_ready(
        jax.jit(jax.vmap(prog.init_state, axis_name="chains"))(keys)
    )
    warm = jax.jit(jax.vmap(warmup_chunk, in_axes=(0, None),
                            axis_name="chains"))
    for w0 in range(0, warmup, chunk):
        states = jax.block_until_ready(warm(states, w0))
        print(f"# warmup {w0 + chunk}/{warmup}", file=sys.stderr, flush=True)
    states = prog._disengage(states)

    prof = profile_phases(prog, states, n_iter=chunk)
    print(format_profile(prof), flush=True)


if __name__ == "__main__":
    main()
