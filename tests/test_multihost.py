"""Multi-process (multi-host analog) execution: a 2-process local
jax.distributed CPU cluster must reproduce the single-process numerics
(SURVEY.md section 2.6 TPU-native column; the reference's equivalent is the
PSOCK cluster dispatch, stan4bart_fit.R:495-558)."""

import os
import subprocess
import sys

import numpy as np
import pytest

import stan4bart_tpu as s4b
from stan4bart_tpu.utils.friedman import friedman_dataframe, generate_friedman_data

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cluster(nproc, port, out, timeout=420):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            # by file path, NOT -m: runpy would import the parent package
            # (and initialize the XLA backend) before jax.distributed
            [sys.executable,
             os.path.join(REPO, "stan4bart_tpu", "parallel",
                          "_mh_worker.py"),
             str(pid), str(nproc), str(port), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO,
        )
        for pid in range(nproc)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode())
    return [p.returncode for p in procs], logs


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    out = str(tmp_path / "mh.npz")
    # retry on fresh ports: under heavy host load the jax.distributed
    # handshake can miss heartbeats (same policy as
    # __graft_entry__._dryrun_multiprocess)
    for attempt in range(3):
        codes, logs = _run_cluster(2, 12411 + 2 * attempt, out)
        if codes == [0, 0]:
            break
    assert codes == [0, 0], "\n".join(logs)

    data = np.load(out)
    # single-process reference with the same seed/config
    df = friedman_dataframe(generate_friedman_data(60, ranef=True))
    fit = s4b.stan4bart(
        "y ~ bart(X1+X2) + X4 + (1 | g.2)", df,
        chains=4, warmup=15, iter=40, seed=42, verbose=-1,
        bart_args={"n.trees": 4},
    )
    np.testing.assert_allclose(data["ev"], fit.extract("ev"),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(data["sigma"], fit.extract("sigma"),
                               rtol=1e-8, atol=1e-8)
    assert np.all(np.isfinite(data["rhat"]))
    assert np.all(data["ess"] > 0)

    # fused-sweep (f32 Pallas, shard_map over the global mesh) vs the same
    # config single-process: identical per-chain RNG streams, but the
    # per-device batch size differs (1 vs 4 chains/device), so XLA's f32
    # reduction rounding can flip an MH accept and amplify chaotically —
    # compare only the early window, loosely (same rationale as
    # tests/test_cores_skip.py)
    fit32 = s4b.stan4bart(
        "y ~ bart(X1+X2) + X4 + (1 | g.2)", df,
        chains=4, warmup=10, iter=25, seed=42, verbose=-1,
        bart_args={"n.trees": 4, "sweep_kernel": True},
        dtype="float32",
    )
    assert data["ev32"].shape == fit32.extract("ev").shape
    assert np.all(np.isfinite(data["ev32"]))
    np.testing.assert_allclose(data["ev32"][:, :8],
                               fit32.extract("ev")[:, :8],
                               rtol=2e-2, atol=2e-2)

    # multi-process x obs-sharding composition: the worker's 2-process
    # (2 chains x 2 data) global-mesh fit must match the same
    # obs_shards=2 fit run single-process (same seed, same 2-shard
    # psum reduction structure -> f64 parity)
    fit_obs = s4b.stan4bart(
        "y ~ bart(X1+X2) + X4 + (1 | g.2)", df,
        chains=2, warmup=10, iter=25, seed=43, verbose=-1,
        chunk_size=5, bart_args={"n.trees": 4},
        stan_args={"obs_shards": 2},
    )
    np.testing.assert_allclose(data["stan_obs"],
                               np.asarray(fit_obs.draws.stan),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(data["ev_obs"], fit_obs.extract("ev"),
                               rtol=1e-6, atol=1e-8)
