"""Multi-process scaling-efficiency measurement (CPU proxy for the
multi-host pod plan, docs/multihost.md).

eff(H) = draws_per_s(H procs, H*C chains) / (H * draws_per_s(1 proc, C))
at fixed compute per process: each process is pinned (taskset) to a
disjoint set of cores and runs C local chains, so the 1-proc baseline and
the H-proc run see identical per-process resources — eff isolates the
jax.distributed coordination cost (launch scatter, lockstep dispatch,
end gather), which is what transfers to a real pod (where DCN replaces
localhost gloo).  North star: >= 80% at >= 2 hosts (BASELINE.md).

Timing excludes compilation: the timed section is a second call of the
same jitted program (same shapes -> jit cache hit).

Driver:  python benchmarks/scaling_multiproc.py [--out SCALING_r03.json]
Worker:  ... --worker <pid> <nproc> <port> <outfile>   (internal)
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
CHAINS_PER_PROC = 4
N_OBS = 2000
TREES = 50
WARMUP = 20
ITERS = 400   # production-shaped: per-dispatch coordination amortizes
CORES_PER_PROC = 2


def worker(pid, nproc, port, outfile):
    # port == 0 marks the INDEPENDENT control arm: nproc concurrent
    # processes with NO jax.distributed coupling — separates host
    # contention (shared memory bus on the CPU proxy) from the
    # distributed-runtime overhead that would transfer to a real pod
    indep = port == 0
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=1"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    if nproc > 1 and not indep:
        jax.distributed.initialize(f"localhost:{port}",
                                   num_processes=nproc, process_id=pid)

    import numpy as np

    from stan4bart_tpu.formula import build_model_frame
    from stan4bart_tpu.gibbs import GibbsProgram
    from stan4bart_tpu.models.assemble import build_parametric_model
    from stan4bart_tpu.ops.bart import BartConfig
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    d = generate_friedman_data(N_OBS, ranef=True)
    df = friedman_dataframe(d)
    mf = build_model_frame("y ~ bart(X1+X2+X3) + X4 + (1 | g.2)", df)
    pm, _, _ = build_parametric_model(mf, "gaussian",
                                      {"centered_ranef": True})
    prog = GibbsProgram(pm, BartConfig(num_trees=TREES), mf.y, mf.bart_X,
                        warmup=WARMUP, iterations=ITERS)

    chains = CHAINS_PER_PROC * (1 if indep else nproc)
    keys = jax.random.split(jax.random.PRNGKey(7 + (pid if indep else 0)),
                            chains)

    if nproc > 1 and not indep:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from stan4bart_tpu.parallel import multihost

        # build the jitted program ONCE (run_chains_multihost constructs
        # fresh closures per call, which would put a full recompile
        # inside the timed second run — measured eff(2) 0.15 from
        # exactly that artifact)
        mesh = multihost.global_chain_mesh()
        sharding = NamedSharding(mesh, P("chains"))
        global_keys = multihost.make_global(np.asarray(keys), sharding)
        # shard_map, not bare GSPMD: forces exactly one chain shard per
        # device (plain jit(vmap) left the partitioner free to
        # replicate parts of the scan — measured eff(2) stuck at ~0.65
        # independent of program length, the replication signature)
        run_j = jax.jit(jax.shard_map(
            jax.vmap(lambda k: prog.run_chain(k, keep_warmup=False),
                     axis_name="chains"),
            mesh=mesh, in_specs=P("chains"), out_specs=P("chains"),
            check_vma=False))

        def run():
            with mesh:
                _, draws = run_j(global_keys)
            return jax.block_until_ready(multihost.gather(draws))
    else:
        run_j = jax.jit(jax.vmap(
            lambda k: prog.run_chain(k, keep_warmup=False),
            axis_name="chains"))

        def run():
            return jax.block_until_ready(run_j(keys))

    run()                       # compile + warm (jit cache)
    t0 = time.perf_counter()
    run()                       # timed: identical program, cache hit
    dt = time.perf_counter() - t0
    draws_s = chains * ITERS / dt

    if pid == 0 or indep:
        with open(outfile + (f".{pid}" if indep else ""), "w") as fh:
            json.dump({"nproc": nproc, "chains": chains,
                       "iters": ITERS, "wall_s": dt,
                       "draws_per_s": draws_s}, fh)
    print(f"worker {pid}/{nproc}: {draws_s:.1f} draws/s "
          f"({dt:.1f}s)", flush=True)


def spawn(nproc, port, outfile):
    procs = []
    for pid in range(nproc):
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        lo = pid * CORES_PER_PROC
        cmd = ["taskset", "-c", f"{lo}-{lo + CORES_PER_PROC - 1}",
               sys.executable, os.path.abspath(__file__),
               "--worker", str(pid), str(nproc), str(port), outfile]
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, cwd=REPO))
    logs, codes = [], []
    for p in procs:
        out, _ = p.communicate(timeout=3600)
        logs.append(out.decode())
        codes.append(p.returncode)
    return codes, logs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", nargs=4)
    ap.add_argument("--out", default="SCALING_r03.json")
    ap.add_argument("--port", type=int, default=12621)
    args = ap.parse_args()
    if args.worker:
        pid, nproc, port, outfile = args.worker
        worker(int(pid), int(nproc), int(port), outfile)
        return

    results = {}
    for nproc in (1, 2, "2indep"):
        indep = nproc == "2indep"
        np_i = 2 if indep else nproc
        out = f"/tmp/scaling_{nproc}.json"
        for attempt in range(3):  # port-retry on handshake misses
            codes, logs = spawn(
                np_i, 0 if indep else args.port + 2 * attempt, out)
            if all(c == 0 for c in codes):
                break
        else:
            raise RuntimeError("\n".join(logs))
        if not all(c == 0 for c in codes):
            print("\n".join(logs))
            raise RuntimeError(f"nproc={nproc} failed: {codes}")
        if indep:
            parts = [json.load(open(out + f".{p}")) for p in range(np_i)]
            results[nproc] = {
                "nproc": np_i, "independent": True,
                "chains": sum(p["chains"] for p in parts),
                "iters": ITERS,
                "wall_s": max(p["wall_s"] for p in parts),
                "draws_per_s": sum(p["draws_per_s"] for p in parts),
            }
        else:
            results[nproc] = json.load(open(out))
        print(f"nproc={nproc}: {results[nproc]['draws_per_s']:.1f} "
              "draws/s", flush=True)

    eff = results[2]["draws_per_s"] / (2 * results[1]["draws_per_s"])
    eff_ctl = (results["2indep"]["draws_per_s"]
               / (2 * results[1]["draws_per_s"]))
    # distributed overhead isolated from shared-host contention: the
    # piece that transfers to a real pod (where hosts do not share a
    # memory bus)
    eff_dist = eff / max(eff_ctl, 1e-9)
    summary = {
        "harness": "scaling_multiproc",
        "config": {"n": N_OBS, "trees": TREES,
                   "chains_per_proc": CHAINS_PER_PROC, "iters": ITERS,
                   "cores_per_proc": CORES_PER_PROC,
                   "backend": "cpu gloo (localhost DCN proxy)"},
        "one_proc": results[1],
        "two_proc": results[2],
        "two_proc_independent_control": results["2indep"],
        "efficiency_2proc_raw": round(eff, 4),
        "efficiency_2proc_contention_control": round(eff_ctl, 4),
        "efficiency_2proc_distributed_only": round(eff_dist, 4),
        "north_star": ">= 0.80 at >= 2 hosts (BASELINE.md); the "
                      "distributed_only number is the pod-transferable "
                      "one (real hosts do not share a memory bus)",
    }
    with open(args.out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({"eff(2)": round(eff, 3)}))


if __name__ == "__main__":
    main()
