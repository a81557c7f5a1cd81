"""Multi-host (multi-process) distributed chain execution over DCN/ICI.

TPU-native replacement for the reference's PSOCK/FORK cluster dispatch
(/root/reference/R/stan4bart_fit.R:495-558).  Where the reference serializes
(control, data, model) to worker R processes over OS sockets and gathers full
chain results at the end, here every process participates in one global SPMD
program:

* ``initialize()`` wires ``jax.distributed`` (coordinator + process grid);
* ``global_chain_mesh()`` builds a 1-D ``jax.sharding.Mesh`` over ALL global
  devices (every host's chips), axis ``"chains"``;
* chain keys are computed identically on every process from the shared seed
  (the reference's per-chain-seed discipline, stan4bart_fit.R:510-522) and
  assembled into a global array with ``jax.make_array_from_callback`` — each
  process only materializes its addressable shard;
* the Gibbs program jits once per process over the global mesh; XLA routes
  any cross-chain reduction (R-hat/ESS, pooled summaries) over ICI within a
  host and DCN across hosts;
* ``gather`` all-gathers the sharded draw pytree back to full numpy arrays on
  every host (one collective, not R-object serialization).

There is zero mid-run communication between chains (matching the reference's
independence) — multi-host cost is one scatter at launch and one gather at
the end, so samples/s scaling efficiency is bounded only by per-host compile
and the end gather.

CPU validation: the same code runs as N local processes with
``jax.distributed.initialize("localhost:<port>", N, pid)`` and virtual CPU
devices (tests/test_multihost.py; __graft_entry__.dryrun_multichip spawns a
2-process case).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None):
    """Wire jax.distributed for this process.

    With no arguments, defers to cluster auto-detection (TPU pod metadata /
    environment).  Explicit arguments support manual CPU/GPU clusters:
    ``initialize("host0:1234", num_processes=4, process_id=k)``.
    Idempotent: safe to call when already initialized.
    """
    # must not touch the XLA backend (jax.devices / process_count) before
    # jax.distributed.initialize — probe the distributed state directly
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # single-process use without a coordinator
        if "already initialized" not in str(e):
            raise


def global_chain_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over ALL global devices (every process's chips)."""
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, ("chains",))


def make_global(full: np.ndarray, sharding: NamedSharding):
    """Assemble a globally-sharded array from a full host array that every
    process has computed identically (each process materializes only its
    addressable shards)."""
    full = np.asarray(full)
    return jax.make_array_from_callback(
        full.shape, sharding, lambda idx: full[idx]
    )


def gather(tree):
    """All-gather a sharded pytree of draws to full numpy on every host."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return jax.tree_util.tree_map(np.asarray, tree)
    gathered = multihost_utils.process_allgather(tree, tiled=True)
    return jax.tree_util.tree_map(np.asarray, gathered)


def run_chains_multihost(prog, keys, mesh: Mesh | None = None,
                         gather_results: bool = True, chain_block: int = 8,
                         timings: dict | None = None,
                         **run_kwargs):
    """Run one chain per key over the global device mesh.

    ``keys`` is the FULL (chains, 2) key array, identical on all processes
    (deterministic from the user seed).  Returns (final_states, draws);
    draws are gathered to full numpy on every host when gather_results.
    timings: optional dict filled with measured warmup_s / sample_s
    (warmup and sampling run as two compiled programs).

    When the program carries the fused Pallas sweep (``sweep_consts``) and
    no callback / pooled adaptation is in play, each device runs the
    chain-blocked batched driver on its local shard under ``shard_map`` —
    the multi-host deployment keeps the measured fused-sweep throughput on
    every chip (GSPMD cannot auto-partition a Pallas custom call, so the
    vmapped path would have to fall back to the XLA scan sweep).
    """
    if mesh is None:
        mesh = global_chain_mesh()
    n_dev = mesh.devices.size
    chains = keys.shape[0]
    if chains % n_dev != 0:
        raise ValueError(
            f"chains ({chains}) must be a multiple of the global device "
            f"count ({n_dev})"
        )
    from stan4bart_tpu.parallel.mesh import _timed_phases

    sharding = NamedSharding(mesh, P("chains"))
    global_keys = make_global(np.asarray(keys), sharding)
    keep_warmup = run_kwargs.pop("keep_warmup", True)
    boi = run_kwargs.pop("bart_offset_init", None)
    sigma_init = run_kwargs.pop("sigma_init", 1.0)
    callback = run_kwargs.pop("callback", None)

    use_batched = (
        prog.sweep_consts is not None
        and callback is None
        and not getattr(prog.nuts_cfg, "pooled_axis", None)
    )
    if use_batched:
        run_w = jax.jit(jax.shard_map(
            lambda k: prog.run_batched_warmup(k, boi, sigma_init,
                                              chain_block),
            mesh=mesh, in_specs=P("chains"), out_specs=P("chains"),
            check_vma=False,
        ))
        run_s = jax.jit(jax.shard_map(
            lambda s: prog.run_batched_sample(s, chain_block),
            mesh=mesh, in_specs=P("chains"), out_specs=P("chains"),
            check_vma=False,
        ))
    elif getattr(prog.nuts_cfg, "pooled_axis", None):
        # vmap axis name: pooled-adaptation pmeans (NutsConfig.pooled_axis)
        # span ALL chains globally — GSPMD lowers them to ICI/DCN
        # collectives (shard_map would split the axis in two)
        run_w = jax.jit(jax.vmap(
            lambda k: prog.run_chain_warmup(k, boi, sigma_init,
                                            callback),
            axis_name="chains"))
        run_s = jax.jit(jax.vmap(
            lambda s: prog.run_chain_sample(s, callback),
            axis_name="chains"))
    else:
        # shard_map, not bare GSPMD: with no cross-chain collectives the
        # partitioner is otherwise free to replicate parts of the scan
        # across processes — measured on the 2-process CPU proxy as
        # eff(2) stuck at ~0.65 regardless of program length; forcing
        # one chain shard per device recovers 0.81
        # (benchmarks/scaling_multiproc.py, SCALING_r03.json)
        run_w = jax.jit(jax.shard_map(
            jax.vmap(lambda k: prog.run_chain_warmup(
                k, boi, sigma_init, callback)),
            mesh=mesh, in_specs=P("chains"), out_specs=P("chains"),
            check_vma=False,
        ))
        run_s = jax.jit(jax.shard_map(
            jax.vmap(lambda s: prog.run_chain_sample(s, callback)),
            mesh=mesh, in_specs=P("chains"), out_specs=P("chains"),
            check_vma=False,
        ))
    with mesh:
        final_states, draws = _timed_phases(
            prog, run_w, run_s, global_keys, keep_warmup, timings,
            stack_axis=1)
    if gather_results:
        draws = gather(draws)
    return final_states, draws


def sharded_diagnostics(draws_stan, param_idx, mesh: Mesh | None = None):
    """Split-R-hat + ESS computed ON the sharded global draw array — the
    cross-chain reductions compile to ICI/DCN collectives (the reference
    vendors these and never calls them; SURVEY.md section 5).

    draws_stan: global (chains, iter, P) array (may be sharded over chains);
    param_idx: list of parameter column indices to diagnose.
    Returns dict(rhat=(len(idx),), ess=(len(idx),)) as concrete host arrays.
    """
    from stan4bart_tpu.parallel.diagnostics import ess, split_rhat

    idx = jnp.asarray(param_idx)

    @jax.jit
    def diag(stan):
        sel = stan[..., idx]                 # (chains, iter, k)
        rhat = split_rhat(sel)
        # vmapped over parameters (one fused program, not O(P) separate
        # FFT dispatches — same fix as results.summary, round 3)
        ess_vals = jax.vmap(ess, in_axes=2)(sel)
        return dict(rhat=rhat, ess=ess_vals)

    out = diag(draws_stan)
    return {k: np.asarray(jax.device_get(v)) for k, v in out.items()}
