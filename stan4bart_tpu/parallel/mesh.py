"""Chain sharding over a TPU device mesh.

TPU-native replacement for the reference's chain parallelism — an R
``parallel`` PSOCK/FORK cluster serializing whole samplers per worker
(/root/reference/R/stan4bart_fit.R:495-558).  Here chains are a vmapped
batch axis laid out over a 1-D ``jax.sharding.Mesh`` with GSPMD: each chip
runs chains/n_devices independent Gibbs chains in lockstep inside one
compiled program; there is zero mid-run communication (matching the
reference), while cross-chain reductions (R-hat/ESS, pooled summaries)
compile to ICI collectives when computed on the sharded draws.

Scaling the observation axis (the reference handles big q only via CSR
sparsity and big n not at all — SURVEY.md section 5 long-context note) is
the second mesh axis, planned: the BART sufficient-statistic one-hot
matmuls and the gather-based Z matvec are both data-parallel over
observations with a single psum at the reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def chain_mesh(n_devices: int | None = None) -> Mesh:
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, ("chains",))


def chain_data_mesh(n_chain_shards: int, n_data_shards: int) -> Mesh:
    """2-D mesh: chains x observations."""
    devices = np.asarray(
        jax.devices()[: n_chain_shards * n_data_shards]
    ).reshape(n_chain_shards, n_data_shards)
    return Mesh(devices, ("chains", "data"))


def run_chains_sharded(prog, keys, mesh: Mesh | None = None, **run_kwargs):
    """Run one chain per key, sharded over the mesh's 'chains' axis.

    len(keys) must be a multiple of the mesh size (pad chains up if needed).
    Returns (final_states, draws) with leading chains axis, sharded.
    """
    if mesh is None:
        mesh = chain_mesh()
    n_dev = mesh.devices.size
    chains = keys.shape[0]
    if chains % n_dev != 0:
        raise ValueError(
            f"chains ({chains}) must be a multiple of mesh size ({n_dev})"
        )
    sharding = NamedSharding(mesh, P("chains"))
    keys = jax.device_put(keys, sharding)

    def run_one(key):
        return prog.run_chain(key, **run_kwargs)

    # the vmap axis name makes pooled-adaptation pmeans
    # (NutsConfig.pooled_axis="chains") global over ALL chains; GSPMD
    # lowers them to cross-device collectives over the mesh
    run = jax.jit(jax.vmap(run_one, axis_name="chains"))
    with mesh:
        return run(keys)


def run_chains_batched_sharded(prog, keys, mesh: Mesh | None = None,
                               chain_block: int = 8, **run_kwargs):
    """Chain-sharded batch-explicit driver: each device runs the
    chain-blocked fused Pallas sweep (``GibbsProgram.run_chains_batched``)
    on its LOCAL chain shard under ``shard_map``.

    Manual sharding is what lets the Pallas sweep custom-call ride a
    multi-device mesh: GSPMD cannot auto-partition a custom call, which is
    why the vmapped ``run_chains_sharded`` path keeps the XLA scan sweep.
    With this driver, multi-chip deployments keep the measured fused-sweep
    throughput (BENCH_NOTES round 2) on every chip.

    Per-chain RNG streams are identical to the single-device batched
    driver, so draws are chain-for-chain comparable across mesh sizes.
    Pooled adaptation is not supported here: the vmap axis name inside the
    local batch shadows the mesh axis, so the pool would silently become
    per-device (use ``run_chains_sharded`` for pooled runs).
    """
    if mesh is None:
        mesh = chain_mesh()
    if prog.sweep_consts is None:
        raise ValueError(
            "run_chains_batched_sharded requires sweep_kernel=True"
        )
    if run_kwargs.pop("callback", None) is not None:
        raise ValueError(
            "the batched sharded driver does not support callbacks; "
            "use run_chains_sharded"
        )
    if getattr(prog.nuts_cfg, "pooled_axis", None):
        raise ValueError(
            "pooled_adaptation is not supported with the sharded "
            "fused-sweep driver; use run_chains_sharded"
        )
    n_dev = mesh.devices.size
    chains = keys.shape[0]
    if chains % n_dev != 0:
        raise ValueError(
            f"chains ({chains}) must be a multiple of mesh size ({n_dev})"
        )
    sharding = NamedSharding(mesh, P("chains"))
    keys = jax.device_put(keys, sharding)

    def local_run(local_keys):
        return prog.run_chains_batched(
            local_keys, chain_block=chain_block, **run_kwargs
        )

    run = jax.jit(jax.shard_map(
        local_run, mesh=mesh, in_specs=P("chains"),
        out_specs=P("chains"), check_vma=False,
    ))
    with mesh:
        return run(keys)


def _gibbs_state_pspec(state, n_obs: int):
    """PartitionSpec pytree for a chain-batched GibbsState: chain axis on
    'chains'; every observation-sized axis on 'data'; everything else
    replicated.  Used to pin GSPMD so the BART sufficient-statistic
    reductions and the likelihood sum become psum collectives over the
    'data' axis (BASELINE.json north star: observation sharding for the
    sufficient-statistic scans and CSR matvec)."""
    import jax.tree_util as jtu

    def spec_for(leaf):
        shape = leaf.shape  # leading axis = chains
        parts = ["chains"]
        for d in shape[1:]:
            parts.append("data" if d == n_obs else None)
        return P(*parts)

    return jtu.tree_map(spec_for, state)


def run_obs_sharded(prog, keys, mesh: Mesh, n_iters: int,
                    is_warmup: bool = False, state=None):
    """Run n_iters Gibbs iterations with chains sharded over 'chains' AND
    observations sharded over 'data' (2-D mesh).  Returns (state, draws).

    Tree arrays / NUTS state replicate within a chain group; (N,)-buffers
    and the (T, N) leaf-index cache shard over 'data'; XLA inserts the
    all-reduces for every masked sum, one-hot matmul, and likelihood
    reduction.
    """
    from jax.sharding import NamedSharding

    def init_all(keys):
        return jax.vmap(prog.init_state)(keys)

    with mesh:
        if state is None:
            state = jax.jit(init_all)(keys)
        pspec = _gibbs_state_pspec(state, prog.N)
        shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), pspec
        )
        state = jax.device_put(state, shardings)

        def step_all(state, it):
            state, draw = jax.vmap(
                lambda s, i: prog.step(s, i, is_warmup),
                in_axes=(0, None), axis_name="chains",
            )(state, it)
            state = jax.lax.with_sharding_constraint(state, pspec)
            return state, draw

        @jax.jit
        def run(state):
            return jax.lax.scan(step_all, state, jnp.arange(n_iters))

        return run(state)
