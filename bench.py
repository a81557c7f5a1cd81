"""Headline benchmark: aggregate draws/s on Friedman n=10k (BASELINE.json).

Runs the flagship hybrid model — y ~ bart(x1..x10) + X4 + z +
(1 + X4 | g.1) + (1 | g.2), continuous, 4 chains, 75 trees — on the default
JAX backend (the real TPU chip under axon; CPU otherwise), timing the
post-compile sampling phase only, and prints ONE JSON line.

vs_baseline: the reference publishes no throughput numbers
(BASELINE.md: "published: {}") and R/stan4bart cannot run in this image.
The denominator is the MEASURED single-thread CPU draws/s of this sampler
on the same config (benchmarks/baseline_cpu.py writes BASELINE_CPU.json —
same algorithm class as one reference chain: NUTS + 75-tree BART sweep per
Gibbs iteration at n=10k), falling back to the round-1 documented estimate
of 5 draws/s/core when the measurement file is absent.
"""

import json
import os
import sys
import time

REFERENCE_DRAWS_PER_S_EST = 5.0  # fallback estimate, see module docstring


def _baseline_denominator():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_CPU.json")
    try:
        with open(path) as f:
            rec = json.load(f)
        return float(rec["value"]), f"measured ({rec['config']})"
    except Exception:
        return REFERENCE_DRAWS_PER_S_EST, "estimate"

N = 10_000
# BENCH_FAMILY=binomial: the probit headline (test-02-binary.R is half
# the reference's e2e surface; per-iteration cost differs — a truncated
# -normal latent draw per observation per sweep, sigma pinned at 1).
# The sigma watchlist coordinate does not exist there; node_scale
# follows the reference's binary default 3.0 (stan4bart_fit.R:478)
FAMILY = os.environ.get("BENCH_FAMILY", "gaussian")
IS_BINARY = FAMILY == "binomial"
# chains amortize fixed per-step cost (the NUTS while_loop is max-padded —
# constant in the chain count); with the gram likelihood the sweep
# dominates and the knee moved out: 64 -> 4277, 128 -> 4476, 256 -> 4625,
# 512 -> 4634 draws/s (flat) — 256 is the committed headline config,
# override with BENCH_CHAINS
CHAINS = int(os.environ.get("BENCH_CHAINS", "256"))
# warmup 400: at 200 the 64-chain ensemble had not converged and the DA
# stepsize undershot 2x (chip A/B, BENCH_NOTES round-2 part 2)
WARMUP = int(os.environ.get("BENCH_WARMUP", "400"))
# NUTS disengage stepsize rule (NutsConfig.freeze_rule): the dual-averaged
# bar lags the moving Gibbs conditional (sampling accept 0.90 vs target
# 0.8 measured in round 1); BENCH_FREEZE selects bar/mid/last for A-B runs
FREEZE = os.environ.get("BENCH_FREEZE", "mid")
# NUTS treedepth cap: under vmap the per-iteration cost is the MAX
# trajectory over the chain batch (padded while_loop), so the cap — not
# the mean leapfrog count — sets the NUTS share of iteration time.
# against the Gibbs-moving conditional each halving of the cap won on
# every metric down to 6 (2676 draws/s, ESS(sigma)/s 28.8); depth 5
# still gains draws/s (2902) but ESS(sigma)/s falls to 17.6 — depth 6
# is the min-ESS/s optimum (chip A/Bs, BENCH_NOTES parts 2/5)
MAXDEPTH = int(os.environ.get("BENCH_MAXDEPTH", "6"))
# opt-in exact sigma conditional Gibbs kernel (decouples sigma mixing from
# NUTS drift; BENCH_SIGMA_GIBBS=1 for A/B runs)
SIGMA_GIBBS = os.environ.get("BENCH_SIGMA_GIBBS", "0") == "1"
# exact conjugate refresh of [gamma|beta|b] + additive-level interweave
# (GibbsProgram.linear_gibbs / level_gibbs) — the package's auto-on
# production default for eligible models.  Chip A/B at this headline
# config (256 chains, 300-draw window): min-ESS/s 7.74 (beta) -> 13.77
# (lp) with the old floor coordinates transformed (ESS/s beta 7.7->227,
# b 9->202, theta_L ->71.7, sigma 36.7->62.1) for -9% draws/s
# (4625->4219); either kernel alone is much weaker (lvl alone lets the
# beta<->slope ridge wander; lg alone leaves the level random walk).
# BENCH_LG=0/BENCH_LVL=0 for baseline A/Bs.
LINEAR_GIBBS = os.environ.get("BENCH_LG", "1") == "1"
LEVEL_GIBBS = os.environ.get("BENCH_LVL", "1") == "1"
# ensemble-wide conjugate leaf refresh rounds (GibbsProgram.leaf_gibbs):
# random Walsh-direction rank-T conjugate draws over per-tree leaf-value
# shifts, targeting the lp/sigma ESS floor (the ensemble fit-error
# relaxation).  BENCH_LEAF=N for N rounds/iteration; 0 = off.
LEAF_GIBBS = int(os.environ.get("BENCH_LEAF", "0"))
# cross-chain pooled NUTS adaptation over the 64-chain axis:
# BENCH_POOLED=1/metric (window-end metric only), stepsize, or both.
# Accept-signal pooling measured harmful (NutsConfig.pooled_parts note).
_pooled_env = os.environ.get("BENCH_POOLED", "0")
POOLED = _pooled_env != "0"
POOLED_PARTS = "metric" if _pooled_env == "1" else _pooled_env
# iterations per compiled call: sized for the axon tunnel's ~60s
# single-execution kill.  At the round-2 17.9 ms/iter, 100 iterations =
# 1.8 s/call — raising this cuts host<->tunnel round trips per draw
CHUNK = int(os.environ.get("BENCH_CHUNK", "100"))
# timed chunks sized so the ESS window stays 300 draws/chain
# regardless of CHUNK: lp's integrated autocorrelation time is ~370
# draws and shorter windows inflate measured ESS 2-3x (BENCH_NOTES
# round-2 part 2; cross-window ESS comparisons are invalid)
N_CHUNKS = int(os.environ.get("BENCH_CHUNKS",
                              str(max(1, 300 // CHUNK))))
NUM_TREES = 75
# Gibbs thinning (reference skip semantics: extra NUTS transitions / BART
# sweeps per stored draw — reduces per-draw autocorrelation at per-draw
# cost; draws/s headline counts STORED draws)
SKIP_STAN = int(os.environ.get("BENCH_SKIP_STAN", "1"))
SKIP_BART = int(os.environ.get("BENCH_SKIP_BART", "1"))
# fused whole-sweep Pallas kernel for the BART phase: one kernel launch
# per sweep instead of a 75-step XLA scan (which was 80% of iteration
# wall clock).  Measured 764 -> 1740 draws/s, ESS(sigma)/s 5.5 -> 14.9,
# ESS(lp)/s 2.0 -> 4.9 at the 64-chain headline (ops/bart_sweep_kernel)
SWEEP_KERNEL = os.environ.get("BENCH_SWEEP_KERNEL", "1") == "1"
# Gram-compressed Gaussian likelihood (exact O(D^2)-per-leapfrog
# reformulation; GibbsProgram.gram_lik): unset = auto (on), 0/1 for A/B
GRAM = (None if "BENCH_GRAM" not in os.environ
        else os.environ["BENCH_GRAM"] == "1")
# chain-blocked batch driver: run the Gibbs step batch-explicitly
# (GibbsProgram.step_batched) with BENCH_CHAIN_BLOCK chains per sweep
# grid step — amortizes the ~1.9us DMA floor + ~2.6us small-op issue
# overhead that dominate the per-(chain, tree) grid step (ablation,
# BENCH_NOTES).  8 measured 2674 -> 3623 draws/s; 0 = vmapped driver.
CHAIN_BLOCK = int(os.environ.get("BENCH_CHAIN_BLOCK", "8"))


def main():
    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "/root/repo")
    from stan4bart_tpu.formula import build_model_frame
    from stan4bart_tpu.gibbs import GibbsProgram
    from stan4bart_tpu.models.assemble import build_parametric_model
    from stan4bart_tpu.ops.bart import BartConfig
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    dtype = jnp.float32  # TPU-native precision for the bench
    d = generate_friedman_data(N, ranef=True, causal=not IS_BINARY,
                               binary=IS_BINARY)
    df = friedman_dataframe(d)
    mf = build_model_frame(
        "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 + X4 | g.1) "
        "+ (1 | g.2)" if not IS_BINARY else
        "y ~ bart(. - g.1 - g.2 - X4) + X4 + (1 + X4 | g.1) + (1 | g.2)",
        df,
    )
    # centered ranef: identical posterior (pure reparameterization,
    # adjudicated against the non-centered chain and SMC), much better
    # NUTS geometry in the data-dominated n=10k regime
    pm, _, _ = build_parametric_model(
        mf, FAMILY, {"centered_ranef": True}, dtype=dtype
    )
    from stan4bart_tpu.ops.nuts import NutsConfig

    bart_cfg = BartConfig(num_trees=NUM_TREES,
                          node_scale=3.0 if IS_BINARY else 0.5)
    prog = GibbsProgram(
        pm, bart_cfg, mf.y, mf.bart_X,
        warmup=WARMUP, iterations=CHUNK, dtype=dtype,
        skip_stan=SKIP_STAN, skip_bart=SKIP_BART,
        nuts_cfg=NutsConfig(freeze_rule=FREEZE, max_treedepth=MAXDEPTH,
                            pooled_axis="chains" if POOLED else None,
                            pooled_parts=POOLED_PARTS if POOLED
                            else "metric"),
        sigma_gibbs=SIGMA_GIBBS,
        linear_gibbs=LINEAR_GIBBS,
        level_gibbs=LEVEL_GIBBS,
        leaf_gibbs=LEAF_GIBBS,
        sweep_kernel=SWEEP_KERNEL,
        gram_lik=GRAM,
    )

    # NOTE: the axon tunnel kills single device executions longer than
    # ~60s with UNAVAILABLE, so every phase runs in <= CHUNK-iteration
    # compiled calls driven from the host.
    def warmup_chunk(state, it0):
        def body(state, i):
            state, _ = prog.step(state, it0 + i, True)
            return state, None

        state, _ = jax.lax.scan(body, state, jnp.arange(CHUNK))
        return state

    names = prog.stan_names()
    # probit has no residual-sd coordinate; reuse lp in its telemetry
    # slot so the chunk output shape is family-independent
    sigma_row = names.index("aux.1") if not IS_BINARY else 0
    # slow-coordinate watchlist for min-ESS/s: a fixef, a ranef scale
    # (first theta_L diagonal), and a ranef coefficient — aggressive
    # treedepth caps must not hide a slow hierarchical coordinate
    beta_row = next(i for i, n in enumerate(names) if n.startswith("beta"))
    theta_row = next(i for i, n in enumerate(names)
                     if n.startswith("theta_L"))
    b_row = next(i for i, n in enumerate(names) if n.startswith("b."))

    def sample(state):
        def body(state, it):
            state, draw = prog.step(state, it, False)
            # lp, stepsize, treedepth, n_leapfrog, watchlist (telemetry)
            return state, (draw.stan[0], draw.stan[2], draw.stan[3],
                           draw.stan[4], draw.stan[sigma_row],
                           draw.stan[beta_row], draw.stan[theta_row],
                           draw.stan[b_row])

        return jax.lax.scan(body, state, jnp.arange(CHUNK))

    keys = jax.random.split(jax.random.PRNGKey(0), CHAINS)
    init_fn = jax.jit(jax.vmap(prog.init_state, axis_name="chains"))
    if CHAIN_BLOCK and SWEEP_KERNEL:
        # batch-explicit driver: per-chain phases vmapped inside
        # step_batched, the sweep chain-blocked across the whole batch
        def warmup_chunk_b(states, it0):
            def body(states, i):
                states, _ = prog.step_batched(states, it0 + i, True,
                                              chain_block=CHAIN_BLOCK)
                return states, None

            states, _ = jax.lax.scan(body, states, jnp.arange(CHUNK))
            return states

        def sample_b(states):
            def body(states, it):
                states, draw = prog.step_batched(states, it, False,
                                                 chain_block=CHAIN_BLOCK)
                return states, (draw.stan[:, 0], draw.stan[:, 2],
                                draw.stan[:, 3], draw.stan[:, 4],
                                draw.stan[:, sigma_row],
                                draw.stan[:, beta_row],
                                draw.stan[:, theta_row],
                                draw.stan[:, b_row])

            states, outs = jax.lax.scan(body, states, jnp.arange(CHUNK))
            # scan stacks draws as (CHUNK, C); telemetry wants (C, CHUNK)
            return states, tuple(jnp.transpose(o) for o in outs)

        warm_fn = jax.jit(warmup_chunk_b)
        sample_fn = jax.jit(sample_b)
    else:
        warm_fn = jax.jit(jax.vmap(warmup_chunk, in_axes=(0, None),
                                   axis_name="chains"))
        sample_fn = jax.jit(jax.vmap(sample, axis_name="chains"))

    def with_retry(fn, *args, tries=3, label="", timeout_s=600):
        # the axon tunnel can LOSE an RPC response (observed once this
        # round: a bench process slept forever inside one blocking
        # call, while a fresh process's calls worked fine) — so each
        # attempt runs under a watchdog thread and a hung call is
        # abandoned and retried rather than wedging the whole bench
        import threading

        for attempt in range(tries):
            result = {}

            def call():
                try:
                    result["value"] = jax.block_until_ready(fn(*args))
                except Exception as e:
                    result["error"] = e

            th = threading.Thread(target=call, daemon=True)
            th.start()
            th.join(timeout_s)
            if th.is_alive():
                print(f"# {label} attempt {attempt + 1} timed out "
                      f"after {timeout_s}s (lost tunnel RPC?); "
                      "abandoning the call and retrying",
                      file=sys.stderr)
                continue
            if "error" in result:  # remote-compile infra can be flaky
                print(f"# {label} attempt {attempt + 1} failed: "
                      f"{result['error']}", file=sys.stderr)
                if attempt == tries - 1:
                    raise result["error"]
                time.sleep(5)
                continue
            return result["value"]
        raise RuntimeError(
            f"{label}: all {tries} attempts hung or failed")

    states = with_retry(init_fn, keys, label="init")
    for w0 in range(0, WARMUP, CHUNK):
        states = with_retry(warm_fn, states, w0, label=f"warmup@{w0}")
    states = prog._disengage(states)
    states, _ = with_retry(sample_fn, states, label="sample-compile")

    t0 = time.perf_counter()
    pieces = []
    for _ in range(N_CHUNKS):
        states, out = jax.block_until_ready(sample_fn(states))
        pieces.append(out)
    elapsed = time.perf_counter() - t0
    last = pieces[-1]

    draws_per_s = CHAINS * CHUNK * N_CHUNKS / elapsed
    lp = np.asarray(last[0])
    assert np.all(np.isfinite(lp)), "non-finite lp in bench draws"

    # min-ESS/s telemetry (BASELINE.json metric) on sigma and lp draws
    from stan4bart_tpu.parallel.diagnostics import ess

    ess_jit = jax.jit(ess)  # eager ops dispatch per-op through the tunnel
    watch = {"lp": 0, "sigma": 4, "beta": 5, "theta_L": 6, "b": 7}
    if IS_BINARY:
        watch.pop("sigma")
    ess_by = {
        k: float(ess_jit(np.concatenate(
            [np.asarray(p[i]) for p in pieces], axis=1).astype(np.float32)))
        for k, i in watch.items()
    }
    min_name = min(ess_by, key=ess_by.get)
    print(
        f"# sampling stepsize={np.asarray(last[1]).mean():.2e} "
        f"treedepth={np.asarray(last[2]).mean():.2f} "
        f"n_leapfrog={np.asarray(last[3]).mean():.0f} "
        + " ".join(f"ESS({k})/s={v / elapsed:.2f}"
                   for k, v in ess_by.items())
        + f" min-ESS/s={ess_by[min_name] / elapsed:.2f} ({min_name})",
        file=sys.stderr,
    )

    denom, denom_kind = _baseline_denominator()
    print(f"# vs_baseline denominator: {denom} draws/s ({denom_kind})",
          file=sys.stderr)
    fam_tag = "" if not IS_BINARY else " probit"
    print(json.dumps({
        "metric": f"aggregate draws/s, Friedman n=10k{fam_tag}, "
                  f"{CHAINS} chains, {NUM_TREES} trees",
        "value": round(draws_per_s, 3),
        "unit": "draws/s",
        "vs_baseline": round(draws_per_s / denom, 3),
        # BASELINE.json's other north-star metric, over the watchlist
        "min_ess_per_s": round(ess_by[min_name] / elapsed, 3),
        "min_ess_coord": min_name,
        # active kernel/config flags so recorded results are
        # self-describing (historical A/Bs were recorded under different
        # defaults; cross-config comparisons need these)
        "config": {
            "family": FAMILY,
            "chains": CHAINS, "warmup": WARMUP, "maxdepth": MAXDEPTH,
            "freeze": FREEZE, "linear_gibbs": LINEAR_GIBBS,
            "level_gibbs": LEVEL_GIBBS, "leaf_gibbs": LEAF_GIBBS,
            "sigma_gibbs": SIGMA_GIBBS, "sweep_kernel": SWEEP_KERNEL,
            "gram_lik": GRAM, "chain_block": CHAIN_BLOCK,
            "skip_stan": SKIP_STAN, "skip_bart": SKIP_BART,
            "pooled": POOLED, "chunk": CHUNK, "n_chunks": N_CHUNKS,
        },
    }))


if __name__ == "__main__":
    main()
