"""Cross-chain convergence diagnostics: split-R-hat and effective sample
size.

The reference vendors Stan's implementations
(/root/reference/src/include/stan/analyze/mcmc/
compute_potential_scale_reduction.hpp, compute_effective_sample_size.hpp)
but never invokes them (SURVEY.md section 5).  Here they are first-class,
pure-JAX (jit/vmap-able, and reducible across a chain-sharded mesh with
``psum`` collectives — see parallel.mesh), following the same definitions:
split each chain in half, classic R-hat; ESS from the combined-chain
autocorrelation (FFT) with Geyer initial-positive + monotone truncation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def split_rhat(draws):
    """draws: (chains, iterations[, params]) -> split-R-hat
    (compute_potential_scale_reduction.hpp semantics)."""
    x = jnp.asarray(draws)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    C, I, P = x.shape
    half = I // 2
    x = jnp.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)
    n = half
    chain_mean = jnp.mean(x, axis=1)
    chain_var = jnp.var(x, axis=1, ddof=1)
    B = n * jnp.var(chain_mean, axis=0, ddof=1)
    W = jnp.mean(chain_var, axis=0)
    var_plus = (n - 1) / n * W + B / n
    rhat = jnp.sqrt(var_plus / W)
    return rhat[0] if squeeze else rhat


def _autocovariance(x):
    """Per-chain biased autocovariance via FFT; x: (chains, n)."""
    n = x.shape[1]
    x = x - jnp.mean(x, axis=1, keepdims=True)
    size = int(2 ** np.ceil(np.log2(2 * n)))
    f = jnp.fft.rfft(x, size, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), size, axis=1)[:, :n]
    return acov / n


def _running_min(x):
    def body(carry, v):
        m = jnp.minimum(carry, v)
        return m, m

    _, out = jax.lax.scan(body, jnp.asarray(jnp.inf, x.dtype), x)
    return out


def ess(draws):
    """draws: (chains, iterations) -> effective sample size
    (compute_effective_sample_size.hpp semantics)."""
    # f64 when available (Stan computes these in double); without x64
    # enabled jax would only warn and truncate — request f32 explicitly
    # to keep user-facing runs warning-free
    acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    x = jnp.asarray(draws, dtype=acc)
    C, n = x.shape
    acov = _autocovariance(x)                          # (C, n)
    chain_mean = jnp.mean(x, axis=1)
    mean_var = jnp.mean(acov[:, 0]) * n / (n - 1.0)    # mean within-chain var
    # Stan uses var_plus = mean_var*(n-1)/n + between-chain variance
    # (compute_effective_sample_size.hpp) — i.e. the biased within estimate
    var_plus = mean_var * (n - 1.0) / n
    if C > 1:
        var_plus = var_plus + jnp.var(chain_mean, ddof=1)

    # combined autocorrelation at each lag
    rho = 1.0 - (mean_var - jnp.mean(acov, axis=0)) / var_plus  # (n,)
    rho = rho.at[0].set(1.0)

    # Geyer pairs P_k = rho_{2k} + rho_{2k+1}, k = 0, 1, ...
    n_pairs = n // 2
    pair = rho[0 : 2 * n_pairs : 2] + rho[1 : 2 * n_pairs : 2]  # (n_pairs,)
    # initial-positive: keep pairs up to (excluding) the first non-positive
    keep = jnp.cumprod((pair > 0).astype(acc))
    # initial-monotone: enforce non-increasing over the kept sequence
    pair_mono = _running_min(pair)
    tau = -1.0 + 2.0 * jnp.sum(pair_mono * keep)
    tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(float(n * C))))
    return C * n / tau
