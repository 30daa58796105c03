"""Embedding ops (reference models/layers/embed.py:8-210).

All modules take/return time-major-last tensors [B, L, C] (flax Conv
convention), which removes the permute round-trips the torch reference
needs for Conv1d.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import flax.linen as nn
import numpy as np


def positional_embedding(max_len: int, d_model: int) -> np.ndarray:
    """Fixed sincos table [max_len, d_model] (embed.py:8-26)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                      * -(math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)[:, : d_model // 2]
    return pe.astype(np.float32)


# torch kaiming_normal_(fan_in, leaky_relu) gain^2 = 2/(1+0.01^2) ~= 2
_kaiming_conv = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class TokenEmbedding(nn.Module):
    """Circular conv1d (k=3, no bias) token embedding (embed.py:29-46)."""

    d_model: int

    @nn.compact
    def __call__(self, x):  # [B, L, C] -> [B, L, d_model]
        return nn.Conv(self.d_model, kernel_size=(3,), padding="CIRCULAR",
                       use_bias=False, kernel_init=_kaiming_conv)(x)


class FixedEmbedding(nn.Module):
    """Non-trainable sinusoidal lookup table (embed.py:49-65)."""

    c_in: int
    d_model: int

    def setup(self):
        self.table = jnp.asarray(positional_embedding(self.c_in, self.d_model))

    def __call__(self, x):  # int indices -> embeddings
        return jnp.take(self.table, x, axis=0)


class TemporalEmbedding(nn.Module):
    """Calendar-feature embeddings summed over month/day/weekday/hour(/minute)
    (embed.py:68-94)."""

    d_model: int
    embed_type: str = "fixed"
    freq: str = "h"

    @nn.compact
    def __call__(self, x_mark):  # [B, L, >=4] int calendar features
        x = x_mark.astype(jnp.int32)
        sizes = {"month": 13, "day": 32, "weekday": 7, "hour": 24, "minute": 4}

        def emb(name, c_in, idx):
            if self.embed_type == "fixed":
                return FixedEmbedding(c_in, self.d_model, name=name)(idx)
            return nn.Embed(c_in, self.d_model, name=name)(idx)

        out = (emb("month_embed", sizes["month"], x[:, :, 0])
               + emb("day_embed", sizes["day"], x[:, :, 1])
               + emb("weekday_embed", sizes["weekday"], x[:, :, 2])
               + emb("hour_embed", sizes["hour"], x[:, :, 3]))
        if self.freq == "t":
            out = out + emb("minute_embed", sizes["minute"], x[:, :, 4])
        return out


class TimeFeatureEmbedding(nn.Module):
    """Linear projection of real-valued time features (embed.py:97-106)."""

    d_model: int
    freq: str = "h"

    @nn.compact
    def __call__(self, x_mark):
        return nn.Dense(self.d_model, use_bias=False)(x_mark)


class DataEmbedding(nn.Module):
    """value conv-embed + positional + optional temporal (embed.py:109-131)."""

    d_model: int
    embed_type: str = "fixed"
    freq: str = "h"
    dropout: float = 0.1
    use_pos: bool = True

    @nn.compact
    def __call__(self, x, x_mark=None, *, deterministic: bool = True):
        out = TokenEmbedding(self.d_model, name="value_embedding")(x)
        if self.use_pos:
            pe = jnp.asarray(positional_embedding(x.shape[1], self.d_model))
            out = out + pe[None, :, :]
        if x_mark is not None:
            if self.embed_type == "timeF":
                out = out + TimeFeatureEmbedding(self.d_model, self.freq,
                                                 name="temporal_embedding")(x_mark)
            else:
                out = out + TemporalEmbedding(self.d_model, self.embed_type,
                                              self.freq, name="temporal_embedding")(x_mark)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class DataEmbedding_wo_pos(DataEmbedding):
    use_pos: bool = False


class DataEmbedding_wo_time(nn.Module):
    """value conv-embed + positional only (embed.py:200-210)."""

    d_model: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        out = TokenEmbedding(self.d_model, name="value_embedding")(x)
        pe = jnp.asarray(positional_embedding(x.shape[1], self.d_model))
        out = out + pe[None, :, :]
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


def patch_unfold(x: jnp.ndarray, patch_len: int, stride: int) -> jnp.ndarray:
    """Replication-pad the series end by `stride`, then unfold into patches.

    x: [B, C, L] -> [B, C, n_patches, patch_len] with
    n_patches = (L - patch_len)//stride + 2 (embed.py:186-191 +
    medtsllm.py:52). Pure gather — XLA fuses it into the following matmul.
    """
    pad = jnp.repeat(x[:, :, -1:], stride, axis=-1)
    xp = jnp.concatenate([x, pad], axis=-1)
    L = xp.shape[-1]
    n_patches = (L - patch_len) // stride + 1
    starts = np.arange(n_patches) * stride
    idx = starts[:, None] + np.arange(patch_len)[None, :]  # [P, patch_len]
    return xp[:, :, idx]


class PatchEmbedding(nn.Module):
    """Patch + conv token embedding (embed.py:166-197).

    Input [B, C, L]; output ([B*C, n_patches, d_model], n_vars). The conv
    embedding treats each patch as a length-`patch_len` sequence with 1
    channel position per step, exactly like the reference TokenEmbedding
    applied to unfolded patches.
    """

    d_model: int
    patch_len: int
    stride: int
    dropout: float = 0.1
    pos_embed: bool = True

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, C, _ = x.shape
        patches = patch_unfold(x, self.patch_len, self.stride)  # [B,C,P,pl]
        P = patches.shape[2]
        patches = patches.reshape(B * C, P, self.patch_len)
        out = TokenEmbedding(self.d_model, name="value_embedding")(patches)
        if self.pos_embed:
            pe = jnp.asarray(positional_embedding(P, self.d_model))
            out = out + pe[None, :, :]
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out, C
