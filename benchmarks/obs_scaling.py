"""Observation-sharding scaling proxy (CPU virtual devices).

Measures the explicit obs-sharded Gibbs program
(parallel/mesh.run_obs_sharded: shard_map over a chains x data mesh,
hand-placed psums on every sufficient statistic) at fixed chains and
fixed n while the data-mesh size k grows; reports t(k) per Gibbs
iteration and speedup(k) = t(1)/t(k).

CAVEAT: virtual CPU devices share one host's physical cores (4 in this
image) and memory bus, so speedup(k) is bounded by the core count, not
by the program — at k=4 the mesh spans 8 virtual devices on 4 cores.
The measured speedups are therefore a LOWER bound on what disjoint
chips would give; correctness at any shard count is certified
separately (tests/test_obs_sharding.py bit-parity incl. padding /
probit / weights), and the communication volume per iteration is
analytic (docs/multihost.md: ~6 scalars + 2 max_nodes rows per tree
update plus one (D+1)-vector for the NUTS anchor — O(trees * nodes),
independent of n).

Driver: python benchmarks/obs_scaling.py [--n 49152] [--out FILE]
"""

import argparse
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from stan4bart_tpu.formula import build_model_frame  # noqa: E402
from stan4bart_tpu.gibbs import GibbsProgram  # noqa: E402
from stan4bart_tpu.models.assemble import build_parametric_model  # noqa: E402
from stan4bart_tpu.ops.bart import BartConfig  # noqa: E402
from stan4bart_tpu.parallel.mesh import (  # noqa: E402
    chain_data_mesh,
    run_obs_sharded,
)
from stan4bart_tpu.utils.friedman import (  # noqa: E402
    friedman_dataframe,
    generate_friedman_data,
)


def build_prog(n, trees, iters):
    d = generate_friedman_data(n, ranef=True)
    df = friedman_dataframe(d)
    mf = build_model_frame("y ~ bart(X1 + X2 + X3) + X4 + (1 | g.2)", df)
    pm, _, _ = build_parametric_model(mf, "gaussian")
    return GibbsProgram(
        pm, BartConfig(num_trees=trees, max_depth=5, n_cuts=32),
        mf.y, mf.bart_X, warmup=iters, iterations=iters,
    )


def time_obs(prog, chains, k, iters, reps=3):
    """t per iteration on a (chains, k) mesh, compile excluded; best of
    ``reps`` timed runs (virtual CPU devices share cores with everything
    else on the host, so single measurements are noisy)."""
    mesh = chain_data_mesh(chains, k)
    keys = jax.random.split(jax.random.PRNGKey(0), chains)
    # warm: compile + first run
    st, dr = run_obs_sharded(prog, keys, mesh, n_iters=iters)
    jax.block_until_ready(dr.stan)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        st, dr = run_obs_sharded(prog, keys, mesh, n_iters=iters,
                                 state=st)
        jax.block_until_ready(dr.stan)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def count_collective_sites(prog, trees):
    """psum SITES in the traced obs-sharded per-tree update (executed
    once per tree, so executed collectives per Gibbs iteration =
    sites_per_tree * trees + fixed): the structural quantity that sets
    the ICI-latency floor of the sequential sweep on real multi-chip
    hardware.  Round 5 merged the move-scalar and leaf-statistic
    reductions into ONE psum per tree (ops/bart._tree_move), halving
    the executed collective count; tests/test_obs_sharding pins it."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from stan4bart_tpu.ops import bart as B

    mesh = chain_data_mesh(1, 2)
    cfg = prog.bart_cfg
    state = B.bart_init(cfg, prog.N // 2)
    sp = jnp.full(prog.ranks.shape[1], 1.0 / prog.ranks.shape[1])

    def local_sweep(y, ranks):
        st, _ = B.bart_sweep(cfg, state, y, ranks, sp, jnp.asarray(1.0),
                             jax.random.PRNGKey(0), axis_name="data")
        return st.allfit

    f = jax.shard_map(local_sweep, mesh=mesh,
                      in_specs=(P("data"), P("data")),
                      out_specs=P("data"), check_vma=False)
    txt = str(jax.make_jaxpr(f)(
        jnp.zeros(prog.N),
        jnp.zeros((prog.N, prog.ranks.shape[1]), dtype=jnp.int32)))
    sites = txt.count("psum")
    return {
        "psum_sites_per_tree_update": sites,
        "executed_allreduces_per_sweep": sites * trees,
        "naive_form": {"psum_sites_per_tree_update": 2,
                       "executed_allreduces_per_sweep": 2 * trees},
    }


def run_multiproc_cell(n, trees, iters, port=12731):
    """Spawn the 2-process x 2-obs-shard timing cell (see
    benchmarks/_obs_mp_worker.py); returns its row dict (or error)."""
    import subprocess
    import tempfile

    out = os.path.join(tempfile.mkdtemp(), "mp_obs.json")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get(
        "PYTHONPATH", "")
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_obs_mp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), out,
             str(n), str(trees), str(iters)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=1800)
        logs.append(stdout.decode())
    if any(p.returncode != 0 for p in procs):
        return {"error": "worker failure", "logs": logs}
    with open(out) as fh:
        return json.load(fh)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=49152)
    ap.add_argument("--trees", type=int, default=20)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--chains", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--multiproc", action="store_true",
                    help="append the 2-process x 2-obs-shard global-"
                         "mesh timing row")
    args = ap.parse_args()

    prog = build_prog(args.n, args.trees, args.iters)
    rows = []
    t1 = None
    for k in (1, 2, 4):
        t = time_obs(prog, args.chains, k, args.iters)
        if t1 is None:
            t1 = t
        rows.append({
            "data_shards": k,
            "devices": args.chains * k,
            "ms_per_iter": round(t * 1e3, 2),
            "speedup_vs_k1": round(t1 / t, 3),
        })
        print(f"# obs k={k}: {t*1e3:.1f} ms/iter, "
              f"speedup {t1/t:.2f}", flush=True)
    result = {
        "config": {"n": args.n, "trees": args.trees,
                   "chains": args.chains, "iters": args.iters,
                   "backend": "cpu-proxy (8 virtual devices, x64)"},
        "obs_sharded": rows,
        "collectives": count_collective_sites(prog, args.trees),
        "multiproc_2x2": (run_multiproc_cell(args.n, args.trees,
                                             args.iters)
                          if args.multiproc else None),
        "note": (
            "WALL-CLOCK CONFOUND, measured: XLA:CPU virtual devices "
            "share ONE intra-op thread pool spanning all 4 physical "
            "cores (a (4096,4096) matmul on 1 of 8 virtual devices "
            "times identically to 1 of 1), so the k=1 baseline is "
            "already 4-core-parallel and the speedup column only "
            "prices sharding OVERHEAD, not the data-parallel win; "
            "collective LATENCY (the real-ICI cost this path "
            "restructures) is ~0 in shared-memory psums.  The "
            "structural result is the 'collectives' block: ONE psum "
            "per tree update (was 2)."
        ),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
