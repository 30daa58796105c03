"""Autoformer encoder/decoder with progressive decomposition
(reference models/layers/Autoformer_EncDec.py:6-232)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .decomp import series_decomp


class MyLayerNorm(nn.Module):
    """De-biased layernorm for seasonal parts (Autoformer_EncDec.py:6-18)."""

    @nn.compact
    def __call__(self, x):
        x_hat = nn.LayerNorm(name="layernorm")(x)
        return x_hat - jnp.mean(x_hat, axis=1, keepdims=True)


class AutoformerEncoderLayer(nn.Module):
    """Attention + decomp + conv FFN + decomp (Autoformer_EncDec.py:79-115)."""

    attention: nn.Module
    d_model: int
    d_ff: int | None = None
    moving_avg: int = 25
    dropout: float = 0.1
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, attn_mask=None, *, deterministic: bool = True):
        d_ff = self.d_ff or 4 * self.d_model
        drop = lambda v: nn.Dropout(self.dropout)(v, deterministic=deterministic)
        act = nn.relu if self.activation == "relu" else (
            lambda v: nn.gelu(v, approximate=False))  # torch F.gelu default is exact erf

        new_x, attn = self.attention(x, x, x, attn_mask,
                                     deterministic=deterministic)
        x = x + drop(new_x)
        x, _ = series_decomp(x, self.moving_avg)
        y = drop(act(nn.Dense(d_ff, use_bias=False, name="conv1")(x)))
        y = drop(nn.Dense(self.d_model, use_bias=False, name="conv2")(y))
        res, _ = series_decomp(x + y, self.moving_avg)
        return res, attn


class AutoformerEncoder(nn.Module):
    attn_layers: tuple
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, attn_mask=None, *, deterministic: bool = True):
        attns = []
        for layer in self.attn_layers:
            x, attn = layer(x, attn_mask, deterministic=deterministic)
            attns.append(attn)
        if self.use_norm:
            x = MyLayerNorm(name="norm")(x)
        return x, attns


class AutoformerDecoderLayer(nn.Module):
    """Progressive decomposition decoder layer with trend accumulation
    (Autoformer_EncDec.py:151-209): three decomps, trend parts projected by
    a circular conv and summed."""

    self_attention: nn.Module
    cross_attention: nn.Module
    d_model: int
    c_out: int
    d_ff: int | None = None
    moving_avg: int = 25
    dropout: float = 0.1
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, cross, x_mask=None, cross_mask=None, *,
                 deterministic: bool = True):
        d_ff = self.d_ff or 4 * self.d_model
        drop = lambda v: nn.Dropout(self.dropout)(v, deterministic=deterministic)
        act = nn.relu if self.activation == "relu" else (
            lambda v: nn.gelu(v, approximate=False))  # torch F.gelu default is exact erf

        x = x + drop(self.self_attention(x, x, x, x_mask,
                                         deterministic=deterministic)[0])
        x, trend1 = series_decomp(x, self.moving_avg)
        x = x + drop(self.cross_attention(x, cross, cross, cross_mask,
                                          deterministic=deterministic)[0])
        x, trend2 = series_decomp(x, self.moving_avg)
        y = drop(act(nn.Dense(d_ff, use_bias=False, name="conv1")(x)))
        y = drop(nn.Dense(self.d_model, use_bias=False, name="conv2")(y))
        x, trend3 = series_decomp(x + y, self.moving_avg)

        residual_trend = trend1 + trend2 + trend3
        residual_trend = nn.Conv(self.c_out, kernel_size=(3,),
                                 padding="CIRCULAR", use_bias=False,
                                 name="projection")(residual_trend)
        return x, residual_trend


class AutoformerDecoder(nn.Module):
    layers: tuple
    c_out: int
    use_norm: bool = True
    use_projection: bool = True

    @nn.compact
    def __call__(self, x, cross, x_mask=None, cross_mask=None, trend=None, *,
                 deterministic: bool = True):
        for layer in self.layers:
            x, residual_trend = layer(x, cross, x_mask, cross_mask,
                                      deterministic=deterministic)
            trend = trend + residual_trend
        if self.use_norm:
            x = MyLayerNorm(name="norm")(x)
        if self.use_projection:
            x = nn.Dense(self.c_out, name="projection")(x)
        return x, trend
