"""Per-phase profiling API (stan4bart_tpu/utils/profiling.py).

The reference only accumulates whole-phase wall clock
(interruptable_sampler.hpp:101-102); the TPU build's actionable unit is
the compiled region, so profile_phases times full/nuts/bart scans
separately.  This test checks the API contract, not speed."""

import jax
import jax.numpy as jnp
import pytest

from stan4bart_tpu.formula import build_model_frame
from stan4bart_tpu.gibbs import GibbsProgram
from stan4bart_tpu.models.assemble import build_parametric_model
from stan4bart_tpu.ops.bart import BartConfig
from stan4bart_tpu.utils.friedman import (
    friedman_dataframe,
    generate_friedman_data,
)
from stan4bart_tpu.utils.profiling import format_profile, profile_phases


@pytest.fixture(scope="module")
def prog_and_states():
    d = generate_friedman_data(200, ranef=True, causal=True)
    df = friedman_dataframe(d)
    mf = build_model_frame(
        "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 | g.1)", df
    )
    pm, _, _ = build_parametric_model(
        mf, "gaussian", {"centered_ranef": True}, dtype=jnp.float64
    )
    prog = GibbsProgram(
        pm, BartConfig(num_trees=5), mf.y, mf.bart_X,
        warmup=10, iterations=4, dtype=jnp.float64,
    )
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    states = jax.jit(jax.vmap(prog.init_state))(keys)

    def wchunk(state):
        def body(state, i):
            state, _ = prog.step(state, i, True)
            return state, None
        state, _ = jax.lax.scan(body, state, jnp.arange(10))
        return state

    states = jax.jit(jax.vmap(wchunk))(states)
    return prog, prog._disengage(states)


def test_profile_phases_contract(prog_and_states):
    prog, states = prog_and_states
    p = profile_phases(prog, states, n_iter=3, repeats=1)
    assert set(p) >= {"full", "nuts", "bart", "glue", "n_chains"}
    assert p["n_chains"] == 2
    for k in ("full", "nuts", "bart"):
        assert p[k] > 0.0
    # glue is a residual, clamped at zero
    assert p["glue"] >= 0.0
    txt = format_profile(p)
    assert "full" in txt and "bart" in txt and "%" in txt


def test_profile_phases_binary(prog_and_states):
    # binary path exercises the latent branch of the bart scan
    d = generate_friedman_data(150, ranef=True, causal=True, binary=True)
    df = friedman_dataframe(d)
    mf = build_model_frame(
        "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 | g.1)", df
    )
    pm, _, _ = build_parametric_model(mf, "binomial", {}, dtype=jnp.float64)
    prog = GibbsProgram(
        pm, BartConfig(num_trees=5), mf.y, mf.bart_X,
        warmup=6, iterations=3, dtype=jnp.float64,
    )
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    states = jax.jit(jax.vmap(prog.init_state))(keys)
    p = profile_phases(prog, states, n_iter=2, repeats=1)
    assert p["full"] > 0.0 and p["bart"] > 0.0
