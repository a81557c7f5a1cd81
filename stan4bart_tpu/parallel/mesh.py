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
    """2-D mesh: chains x observations.

    ``jax.devices()`` is the GLOBAL device list, so under multi-process
    (jax.distributed) this mesh spans every host's chips: laid out with
    'data' innermost so each obs-shard group rides ICI within a host
    wherever n_data_shards divides the per-host chip count, and the
    chains axis (no mid-run communication) crosses DCN."""
    devices = np.asarray(
        jax.devices()[: n_chain_shards * n_data_shards]
    ).reshape(n_chain_shards, n_data_shards)
    return Mesh(devices, ("chains", "data"))


def _timed_phases(prog, run_warmup, run_sample, keys, keep_warmup,
                  timings, stack_axis):
    """Shared two-program phase driver: run warmup, disengage, run
    sampling, measuring REAL per-phase wall clock into ``timings`` (the
    reference's warm/sample_delta_t; previously these drivers ran one
    fused program and fit.timings pro-rated the split)."""
    import time as _time

    t0 = _time.perf_counter()
    states, warm = jax.block_until_ready(run_warmup(keys))
    t1 = _time.perf_counter()
    states = jax.jit(prog._disengage)(states)
    states, samp = jax.block_until_ready(run_sample(states))
    t2 = _time.perf_counter()
    if timings is not None:
        timings["warmup_s"] = t1 - t0
        timings["sample_s"] = t2 - t1
    if keep_warmup:
        draws = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=stack_axis),
            warm, samp)
    else:
        draws = samp
    return states, draws


def run_chains_sharded(prog, keys, mesh: Mesh | None = None,
                       timings: dict | None = None, **run_kwargs):
    """Run one chain per key, sharded over the mesh's 'chains' axis.

    len(keys) must be a multiple of the mesh size (pad chains up if needed).
    Returns (final_states, draws) with leading chains axis, sharded.
    timings: optional dict filled with measured warmup_s / sample_s.
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
    keep_warmup = run_kwargs.pop("keep_warmup", True)
    boi = run_kwargs.pop("bart_offset_init", None)
    sigma_init = run_kwargs.pop("sigma_init", 1.0)
    callback = run_kwargs.pop("callback", None)

    # the vmap axis name makes pooled-adaptation pmeans
    # (NutsConfig.pooled_axis="chains") global over ALL chains; GSPMD
    # lowers them to cross-device collectives over the mesh
    run_w = jax.jit(jax.vmap(
        lambda k: prog.run_chain_warmup(k, boi, sigma_init, callback),
        axis_name="chains"))
    run_s = jax.jit(jax.vmap(
        lambda s: prog.run_chain_sample(s, callback),
        axis_name="chains"))
    with mesh:
        return _timed_phases(prog, run_w, run_s, keys, keep_warmup,
                             timings, stack_axis=1)


def run_chains_batched_sharded(prog, keys, mesh: Mesh | None = None,
                               chain_block: int = 8,
                               timings: dict | None = None,
                               **run_kwargs):
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
    keep_warmup = run_kwargs.pop("keep_warmup", True)
    boi = run_kwargs.pop("bart_offset_init", None)
    sigma_init = run_kwargs.pop("sigma_init", 1.0)

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
    with mesh:
        return _timed_phases(prog, run_w, run_s, keys, keep_warmup,
                             timings, stack_axis=1)


def _obs_shard_inputs(prog, n_shards: int, bart_offset_init=None):
    """Host-side: gather every obs-sized member of the program into one
    input pytree, padded to a multiple of ``n_shards``.  Padding
    replicates row 0 with likelihood weight 0 — an EXACTLY equivalent
    model (w=1 multiplications are exact in floating point, w=0 rows
    contribute zero to every sufficient statistic, and normalization
    constants keep the true global N), so an unweighted model only
    becomes weighted when padding actually occurs.  Returns
    (inputs, meta) with meta carrying the padded total and the
    precomputed global init heuristics."""
    pm = prog.pm
    N = prog.N
    pad = (-N) % n_shards
    Np = N + pad

    def pad0(a):
        a = np.asarray(a)
        if pad == 0:
            return a
        return np.concatenate([a, np.repeat(a[:1], pad, axis=0)], axis=0)

    weighted = prog.weights is not None or pad > 0
    A = pad0(pm.gram_A) if prog.use_gram else None
    inputs = {
        "y": pad0(prog.y),
        "ranks": pad0(prog.ranks),
        "X": pad0(pm.X),
        "z_structs": [(pad0(lhs), pad0(gidx))
                      for lhs, gidx in pm.z_structs],
    }
    if prog.use_gram:
        inputs["gram_A"] = A
    if weighted:
        w = (np.asarray(prog.weights, np.float64)
             if prog.weights is not None else np.ones(N))
        w = np.concatenate([w, np.zeros(pad)]) if pad else w
        dt = np.asarray(prog.y).dtype
        inputs["weights"] = w.astype(dt)
        if prog.use_gram:
            inputs["gram_AW"] = (A * w[:, None]).astype(A.dtype)
    elif prog.use_gram:
        inputs["gram_AW"] = A
    if prog.user_offset is not None:
        inputs["user_offset"] = pad0(prog.user_offset)
    if bart_offset_init is not None:
        inputs["bart_offset_init"] = pad0(bart_offset_init)

    scale_y = (1.0 if prog.is_binary
               else float(np.std(np.asarray(prog.y), ddof=1)))
    meta = {
        "Np": Np,
        "scale_y": scale_y,
        "inv_mass0": np.asarray(pm.initial_inv_mass(scale_y, N)),
    }
    return inputs, meta


def _obs_state_specs(state):
    """PartitionSpec pytree for a chain-batched GibbsState under the
    explicit 2-D shard_map: obs-sized BartState/GibbsState fields (known
    BY NAME, not by dimension matching) carry 'data'; everything else is
    per-chain only."""
    t = jax.tree_util.tree_map
    bart = type(state.bart)(
        feature=P("chains"), cut=P("chains"), leaf_value=P("chains"),
        leaf_idx=P("chains", None, "data"),
        allfit=P("chains", "data"),
        k=P("chains"), sigma_mu=P("chains"),
        tree_fit=P("chains", None, "data"),
    )
    return state._replace(
        nuts=t(lambda _: P("chains"), state.nuts),
        vi=t(lambda _: P("chains"), state.vi),
        bart=bart,
        bart_offset=P("chains", "data"),
        stan_offset=P("chains", "data"),
        latents=P("chains", "data"),
        rng=P("chains"),
    )


def _obs_draw_specs(draw):
    """Scan-stacked draws are (iters, chains, ...): everything replicated
    over 'data' except the per-obs bart_train fit."""
    d = jax.tree_util.tree_map(lambda _: P(None, "chains"), draw)
    return d._replace(bart_train=P(None, "chains", "data"))


def prepare_obs_inputs(prog, mesh: Mesh, bart_offset_init=None):
    """Build the padded obs-sharded input set ONCE and place it on the
    mesh with its target sharding (P('data')): repeated run_obs_sharded
    calls (warmup + sampling, or chunked execution) reuse the same
    device buffers instead of re-transferring the full (N, D) input set
    per call.  Under multi-process the same call assembles GLOBAL arrays
    (each process materializes only its addressable shards) — this is
    what composes observation sharding with jax.distributed."""
    n_data = mesh.shape["data"]
    inputs, meta = _obs_shard_inputs(prog, n_data,
                                     bart_offset_init=bart_offset_init)
    from stan4bart_tpu.parallel.multihost import make_global

    sh = NamedSharding(mesh, P("data"))
    with mesh:
        inputs = jax.tree_util.tree_map(lambda a: make_global(a, sh),
                                        inputs)
    return inputs, meta


def run_obs_sharded(prog, keys, mesh: Mesh, n_iters: int,
                    is_warmup: bool = False, state=None,
                    bart_offset_init=None, sigma_init: float = 1.0,
                    prepared=None, it0: int = 0):
    """Run n_iters Gibbs iterations with chains sharded over 'chains' AND
    observations sharded over 'data' (2-D mesh), as an EXPLICIT
    ``shard_map`` program: every device holds one obs shard of
    (y, ranks, X, Z, gram_A) via ``GibbsProgram.local_view``, and every
    sufficient statistic — the six masked sums per tree update, the
    (2, max_nodes) leaf statistics, the Gram likelihood anchor, the
    interweave/level reductions — is a hand-placed ``psum`` over 'data'
    (ops/bart.bart_sweep / ParametricModel._psum).  Tree structures,
    NUTS state, and the RNG stream replicate across the data axis by
    construction, so the sampled chains are identical at any shard count
    up to reduction-order rounding (pinned in tests/test_obs_sharding).

    This is the production multi-chip large-n path (the reference's only
    big-axis answer is single-core CSR — SURVEY.md section 5): per Gibbs
    iteration the communication is ~(6 scalars + 2 max_nodes rows) per
    tree update plus one (D+1)-vector for the NUTS anchor, all riding
    ICI allreduces, while the O(N) one-hot matmuls stay local.  N not
    divisible by the data-mesh size is padded with weight-0 replicas of
    row 0 (exactly equivalent likelihood; see _obs_shard_inputs).

    Runs under multi-process too (mesh over the global device set): the
    inputs/keys are assembled as global arrays and the returned draws
    stay sharded — gather them with parallel.multihost.gather.

    prepared: optional (inputs, meta) from ``prepare_obs_inputs`` —
    reuses the placed input buffers across calls.

    Returns (final_states, draws); draws.bart_train is sliced back to
    the true N, final state obs buffers keep the padded length (feed
    them back to this driver only)."""
    n_chain = mesh.shape["chains"]
    chains = keys.shape[0]
    if chains % n_chain != 0:
        raise ValueError(
            f"chains ({chains}) must be a multiple of the chain-mesh "
            f"size ({n_chain})"
        )
    if prepared is None:
        prepared = prepare_obs_inputs(prog, mesh,
                                      bart_offset_init=bart_offset_init)
    inputs, meta = prepared
    Np = meta["Np"]
    from stan4bart_tpu.parallel.multihost import make_global

    keys = make_global(np.asarray(keys),
                       NamedSharding(mesh, P("chains")))

    in_data_specs = jax.tree_util.tree_map(lambda _: P("data"), inputs)

    def local_body(local_keys, local_data, local_state, it_start):
        lprog = prog.local_view(
            local_data, axis="data", scale_y=meta["scale_y"],
            inv_mass0=meta["inv_mass0"], n_global_pad=Np,
        )
        if local_state is None:
            st = jax.vmap(lambda k: lprog.init_state(
                k, local_data.get("bart_offset_init"), sigma_init
            ))(local_keys)
        else:
            st = local_state

        def step_all(st, it):
            return jax.vmap(
                lambda s, i: lprog.step(s, i, is_warmup),
                in_axes=(0, None),
            )(st, it)

        # it_start is a TRACED in-phase offset so chunked execution
        # (run_chains_obs_sharded) keeps the adaptation/rescale
        # schedules on the true iteration index without a recompile
        # per chunk
        return jax.lax.scan(step_all, st,
                            jnp.arange(n_iters) + it_start)

    # output structures (field names drive the specs — obs-sized dims are
    # not identified by size, which collides at tiny shapes)
    st_struct = jax.eval_shape(
        lambda k: jax.vmap(prog.init_state)(k), keys
    )
    dr_struct = jax.eval_shape(
        lambda s: jax.vmap(lambda ss: prog.step(ss, 0, is_warmup))(s)[1],
        st_struct,
    )
    state_specs = _obs_state_specs(st_struct)
    draw_specs = _obs_draw_specs(dr_struct)

    it_start = jnp.asarray(int(it0), dtype=jnp.int32)
    with mesh:
        if state is None:
            run = jax.jit(jax.shard_map(
                lambda k, d, i0: local_body(k, d, None, i0), mesh=mesh,
                in_specs=(P("chains"), in_data_specs, P()),
                out_specs=(state_specs, draw_specs), check_vma=False,
            ))
            out_state, draws = run(keys, inputs, it_start)
        else:
            run = jax.jit(jax.shard_map(
                lambda k, d, s, i0: local_body(k, d, s, i0), mesh=mesh,
                in_specs=(P("chains"), in_data_specs, state_specs, P()),
                out_specs=(state_specs, draw_specs), check_vma=False,
            ))
            out_state, draws = run(keys, inputs, state, it_start)
    if Np != prog.N:
        draws = draws._replace(bart_train=draws.bart_train[..., :prog.N])
    return out_state, draws


def run_chains_obs_sharded(prog, keys, mesh: Mesh, bart_offset_init=None,
                           sigma_init: float = 1.0,
                           keep_warmup: bool = True,
                           chunk_size: int | None = None):
    """Full fit protocol — warmup, adaptation disengage, sampling — on
    the explicit 2-D chains x data shard_map (run_obs_sharded).  Matches
    the (final_states, draws, run_info) contract of run_chains_chunked:
    draws come back (chains, iters, ...) with the warmup prefix when
    keep_warmup; run_info carries REAL measured per-phase wall clock.

    chunk_size bounds the iterations per compiled device execution (the
    axon-tunnel chip kills executions past ~60 s); each phase threads the
    padded state across <= chunk_size pieces (exact: pinned by
    tests/test_obs_sharding state-threading parity).  KeyboardInterrupt
    between chunks yields a valid partial fit (completed chunks only).
    The padded input set is built and placed ONCE and reused by every
    chunk of both phases."""
    import time as _time

    prepared = prepare_obs_inputs(prog, mesh,
                                  bart_offset_init=bart_offset_init)

    def run_phase(n_total, is_warmup, state):
        pieces = []
        done = 0
        interrupted = False
        step_sz = n_total if chunk_size is None else max(int(chunk_size), 1)
        try:
            while done < n_total:
                n = min(step_sz, n_total - done)
                state, d = run_obs_sharded(
                    prog, keys, mesh, n, is_warmup=is_warmup,
                    state=state, sigma_init=sigma_init,
                    prepared=prepared, it0=done,
                )
                jax.block_until_ready(d.stan)
                pieces.append(d)
                done += n
        except KeyboardInterrupt:
            interrupted = True
        if not pieces:
            return state, None, 0, interrupted
        draws = (pieces[0] if len(pieces) == 1 else
                 jax.tree_util.tree_map(
                     lambda *xs: jnp.concatenate(xs, axis=0), *pieces))
        return state, draws, done, interrupted

    t0 = _time.perf_counter()
    state, warm, warm_done, interrupted = run_phase(
        prog.warmup, True, None)
    warmup_s = _time.perf_counter() - t0
    samp, samp_done = None, 0
    if not interrupted:
        # the freeze touches only per-chain NUTS fields (replicated over
        # 'data'), so it runs as a plain jit over the global state
        state = jax.jit(prog._disengage)(state)
        state, samp, samp_done, interrupted = run_phase(
            prog.iterations, False, state)
    sample_s = _time.perf_counter() - t0 - warmup_s

    swap = lambda a: jnp.swapaxes(a, 0, 1)  # noqa: E731 (iters, chains) ->
    t = jax.tree_util.tree_map
    if warm is None and samp is None:
        raise KeyboardInterrupt("interrupted before any chunk completed")
    if samp is None:
        draws = t(swap, warm)
    elif warm is None or not keep_warmup:
        draws = t(swap, samp)
    else:
        draws = t(lambda w, s: swap(jnp.concatenate([w, s], axis=0)),
                  warm, samp)
    run_info = {
        "warmup_s": warmup_s, "sample_s": sample_s,
        "warmup_done": warm_done, "sample_done": samp_done,
        "interrupted": interrupted,
    }
    n = prog.N
    if state.bart.allfit.shape[-1] != n:
        # slice the weight-0 pad rows off the final state so it is a
        # valid UNSHARDED state (continue_sampling runs the global
        # prog.step on it) — exact: the pad rows are w=0 replicas that
        # never touched a statistic
        state = state._replace(
            bart=state.bart._replace(
                leaf_idx=state.bart.leaf_idx[..., :n],
                allfit=state.bart.allfit[..., :n],
                tree_fit=state.bart.tree_fit[..., :n],
            ),
            bart_offset=state.bart_offset[..., :n],
            stan_offset=state.stan_offset[..., :n],
            latents=state.latents[..., :n],
        )
    return state, draws, run_info
