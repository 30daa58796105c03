"""Attention masks (reference models/layers/masking.py:4-28)."""

from __future__ import annotations

import jax.numpy as jnp


def triangular_causal_mask(L: int, S: int | None = None) -> jnp.ndarray:
    """Boolean [L, S] mask, True = masked (upper triangle)."""
    S = S if S is not None else L
    return jnp.triu(jnp.ones((L, S), dtype=bool), k=1)


def prob_mask(L: int, index: jnp.ndarray, scores_shape) -> jnp.ndarray:
    """Mask rows of the causal mask gathered at the top-u query positions
    (ProbAttention, masking.py:15-28). index: [B, H, u]."""
    causal = triangular_causal_mask(L, scores_shape[-1])
    return causal[index]  # [B, H, u, S]
