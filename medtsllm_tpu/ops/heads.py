"""Output heads (reference models/medtsllm.py:541-552 FlattenHead)."""

from __future__ import annotations

import flax.linen as nn


class FlattenHead(nn.Module):
    """Flatten last two dims then project: [..., d, n] -> [..., target]."""

    target_window: int
    head_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = x.reshape(*x.shape[:-2], x.shape[-2] * x.shape[-1])
        x = nn.Dense(self.target_window, name="linear")(x)
        return nn.Dropout(self.head_dropout)(x, deterministic=deterministic)
