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
