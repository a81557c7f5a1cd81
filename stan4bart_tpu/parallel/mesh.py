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

    run = jax.jit(jax.vmap(run_one))
    with mesh:
        return run(keys)
