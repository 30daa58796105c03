"""RevIN — reversible per-window instance normalization.

Functional re-design of reference models/layers/RevIN.py:5-69: instead of a
stateful module that stashes mean/std between `norm` and `denorm` calls,
`revin_norm` returns the statistics explicitly and `revin_denorm` consumes
them — the natural JAX formulation, and trivially fusible by XLA.

Statistics use stop_gradient, matching the reference `.detach()`
(RevIN.py:42-43) — a deliberate parity trap (SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def revin_norm(x: jnp.ndarray, eps: float = 1e-5, subtract_last: bool = False):
    """x: [B, L, C] -> (normalized x, stats dict). Reduction over all axes
    between batch and channel (RevIN.py:38)."""
    axes = tuple(range(1, x.ndim - 1))
    if subtract_last:
        center = x[:, -1:, :]
    else:
        center = jax.lax.stop_gradient(jnp.mean(x, axis=axes, keepdims=True))
    var = jnp.var(x, axis=axes, keepdims=True)
    stdev = jax.lax.stop_gradient(jnp.sqrt(var + eps))
    xn = (x - center) / stdev
    return xn, {"center": center, "stdev": stdev}


def revin_denorm(y: jnp.ndarray, stats: dict) -> jnp.ndarray:
    return y * stats["stdev"] + stats["center"]


class RevINAffine(nn.Module):
    """Optional learnable per-channel affine (RevIN.py:32-35). The flagship
    model uses affine=False, so this is standalone."""

    num_features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mode: str):
        weight = self.param("affine_weight", nn.initializers.ones, (self.num_features,))
        bias = self.param("affine_bias", nn.initializers.zeros, (self.num_features,))
        if mode == "norm":
            return x * weight + bias
        elif mode == "denorm":
            return (x - bias) / (weight + self.eps * self.eps)
        raise NotImplementedError(mode)


def masked_window_norm(x, mask):
    """Mask-aware Non-stationary-Transformer window normalization for the
    imputation task (reference TimesNet.py:114-123, PatchTST.py:157-166,
    gpt4ts.py:105-112): statistics over OBSERVED points only, both
    detached; x must already be zero-filled at held-out points.
    x [B, L, C], mask [B, L, C] (1 = observed) -> (x_norm, means, stdev)."""
    m = mask.astype(x.dtype)
    cnt = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
    means = jax.lax.stop_gradient(x.sum(axis=1, keepdims=True) / cnt)
    xc = (x - means) * m
    stdev = jax.lax.stop_gradient(
        jnp.sqrt((xc * xc).sum(axis=1, keepdims=True) / cnt + 1e-5))
    return xc / stdev, means, stdev
