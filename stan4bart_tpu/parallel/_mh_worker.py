"""Multi-process worker: one process of a local jax.distributed CPU cluster.

Run BY FILE PATH:  python .../_mh_worker.py <pid> <nproc> <port> <out>
(not ``-m``: runpy would import the stan4bart_tpu package — and initialize
the XLA backend — before jax.distributed.initialize can run).

Each process joins the cluster with 2 virtual CPU devices (so nproc=2 gives
a 4-device global mesh), fits the same tiny stan4bart model over the global
chain mesh, and process 0 writes the gathered draws to <out> as .npz.
Used by tests/test_multihost.py and __graft_entry__.dryrun_multichip to
validate the multi-host path without multiple hosts.
"""

import os
import sys


def main():
    pid, nproc, port, out = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    # distributed init must precede ANY backend touch — including the
    # stan4bart_tpu package import (it initializes jax at import time)
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc

    from stan4bart_tpu.parallel import multihost

    import numpy as np

    import stan4bart_tpu as s4b
    from stan4bart_tpu.utils.friedman import (
        friedman_dataframe,
        generate_friedman_data,
    )

    df = friedman_dataframe(generate_friedman_data(60, ranef=True))
    fit = s4b.stan4bart(
        "y ~ bart(X1+X2) + X4 + (1 | g.2)", df,
        chains=4, warmup=15, iter=40, seed=42, verbose=-1,
        bart_args={"n.trees": 4},
    )
    ev = fit.extract("ev")
    sigma = fit.extract("sigma")

    # fused-sweep path: f32 + sweep_kernel rides shard_map over the global
    # mesh (each process's devices run the chain-blocked Pallas driver —
    # interpreted on CPU — on their local chain shard)
    fit32 = s4b.stan4bart(
        "y ~ bart(X1+X2) + X4 + (1 | g.2)", df,
        chains=4, warmup=10, iter=25, seed=42, verbose=-1,
        bart_args={"n.trees": 4, "sweep_kernel": True},
        dtype="float32",
    )
    ev32 = fit32.extract("ev")
    # cross-chain diagnostics as collectives on the global draws
    diag = multihost.sharded_diagnostics(
        fit.draws.stan[:, fit.warmup:],
        [fit._name_idx["aux.1"], fit._name_idx["lp__"]],
    )

    # multi-process x observation-sharding composition: the 2-D
    # chains x data mesh spans BOTH processes (2 chain groups across
    # DCN x 2 obs shards within each process's devices); every
    # sufficient statistic psums over 'data' while draws all-gather
    # at the end (round-5 composition of the two multi-chip axes)
    # chunk_size exercises the chunked obs-sharded loop (state threading
    # + traced it0 offset) across processes, not just single-process
    fit_obs = s4b.stan4bart(
        "y ~ bart(X1+X2) + X4 + (1 | g.2)", df,
        chains=2, warmup=10, iter=25, seed=43, verbose=-1,
        chunk_size=5, bart_args={"n.trees": 4},
        stan_args={"obs_shards": 2},
    )
    ev_obs = fit_obs.extract("ev")
    if pid == 0:
        np.savez(out, ev=ev, sigma=sigma, rhat=diag["rhat"],
                 ess=diag["ess"], ev32=ev32, ev_obs=ev_obs,
                 stan_obs=fit_obs.draws.stan)
    # all processes must reach the end together (gather is collective)
    print(f"worker {pid}: done", flush=True)


if __name__ == "__main__":
    main()
