"""One process of the 2-process x 2-obs-shard obs-scaling timing cell.

Run BY FILE PATH:  python .../_obs_mp_worker.py <pid> <nproc> <port>
<out> <n> <trees> <iters>  (jax.distributed.initialize must precede any
backend touch, so nothing heavy is imported before it — the same
discipline as stan4bart_tpu/parallel/_mh_worker.py).

Each process contributes 2 virtual CPU devices; the GLOBAL
(chains=2) x (data=2) mesh spans both processes, so each obs-shard
group lives inside one process (the ICI-analog layout) and the chain
groups cross the localhost DCN analog.  Times the second
run_obs_sharded call (jit cache hit); process 0 writes the row.
"""

import os
import sys


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             int(sys.argv[3]), sys.argv[4])
    n, trees, iters = (int(sys.argv[5]), int(sys.argv[6]),
                       int(sys.argv[7]))
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)
    assert jax.device_count() == 2 * nproc

    import json
    import time

    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from obs_scaling import build_prog
    from stan4bart_tpu.parallel.mesh import (
        chain_data_mesh,
        run_obs_sharded,
    )

    prog = build_prog(n, trees, iters)
    mesh = chain_data_mesh(2, 2)  # 4 global devices, 2 per process
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    st, dr = run_obs_sharded(prog, keys, mesh, n_iters=iters)
    jax.block_until_ready(dr.stan)
    t0 = time.perf_counter()
    st, dr = run_obs_sharded(prog, keys, mesh, n_iters=iters, state=st,
                             it0=iters)
    jax.block_until_ready(dr.stan)
    dt = (time.perf_counter() - t0) / iters
    if pid == 0:
        with open(out, "w") as fh:
            json.dump({"nproc": nproc,
                       "mesh": "2 chains x 2 data (global, spans "
                               "both processes)",
                       "ms_per_iter": round(dt * 1e3, 2)}, fh)
    print(f"mp worker {pid}: {dt*1e3:.1f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
