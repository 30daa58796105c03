"""Trend/seasonal decomposition ops (reference models/dlinear.py:138-170,
models/layers/Autoformer_EncDec.py:26-86)."""

from __future__ import annotations

import jax.numpy as jnp


def moving_avg(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Edge-replicated moving average over the time axis of [B, L, C].

    Matches the reference exactly (dlinear.py:153-170): pad (k-1)//2 copies
    of the first/last step on each end, then average-pool with stride 1.
    Note: for even k the output is L-1 long in the reference too, so even
    kernels should be avoided (the reference configs use odd kernels).
    """
    pad = (kernel_size - 1) // 2
    front = jnp.repeat(x[:, :1, :], pad, axis=1)
    end = jnp.repeat(x[:, -1:, :], pad, axis=1)
    xp = jnp.concatenate([front, x, end], axis=1)
    # cumulative-sum average pooling: one pass, no conv needed
    cs = jnp.cumsum(xp, axis=1)
    cs = jnp.concatenate([jnp.zeros_like(cs[:, :1]), cs], axis=1)
    out_len = xp.shape[1] - kernel_size + 1
    return (cs[:, kernel_size:kernel_size + out_len] - cs[:, :out_len]) / kernel_size


def series_decomp(x: jnp.ndarray, kernel_size: int):
    """x -> (seasonal residual, trend moving-mean)."""
    mean = moving_avg(x, kernel_size)
    return x - mean, mean


def series_decomp_multi(x: jnp.ndarray, kernel_sizes: tuple):
    """Multi-kernel decomposition: mean of per-kernel seasonal/trend parts
    (reference Autoformer_EncDec.py:56-76, used by FEDformer)."""
    seas, means = [], []
    for k in kernel_sizes:
        s, m = series_decomp(x, k)
        seas.append(s)
        means.append(m)
    return sum(seas) / len(seas), sum(means) / len(means)


def my_layernorm_bias_correction(x_hat: jnp.ndarray) -> jnp.ndarray:
    """De-biased layernorm tail for seasonal parts
    (reference Autoformer_EncDec.py:6-18): subtract the per-sample mean over
    the time axis after a standard LayerNorm."""
    bias = jnp.mean(x_hat, axis=1, keepdims=True)
    return x_hat - bias
