"""Transformer encoder/decoder stacks (reference
models/layers/Transformer_EncDec.py:29-144).

The reference's conv1d(k=1) FFN is an MXU matmul here (identical math,
native layout); the distilling ConvLayer (Informer, unused by registered
models) is included for completeness.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class EncoderLayer(nn.Module):
    """Post-norm self-attention + pointwise-conv FFN
    (Transformer_EncDec.py:29-49)."""

    attention: nn.Module
    d_model: int
    d_ff: int | None = None
    dropout: float = 0.1
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, attn_mask=None, tau=None, delta=None, *,
                 deterministic: bool = True):
        d_ff = self.d_ff or 4 * self.d_model
        drop = lambda v: nn.Dropout(self.dropout)(v, deterministic=deterministic)
        act = nn.relu if self.activation == "relu" else (
            lambda v: nn.gelu(v, approximate=False))  # torch F.gelu default is exact erf

        new_x, attn = self.attention(x, x, x, attn_mask, tau, delta,
                                     deterministic=deterministic)
        x = x + drop(new_x)
        y = x = nn.LayerNorm(name="norm1")(x)
        # k=1 conv == dense over features
        y = drop(act(nn.Dense(d_ff, name="conv1")(y)))
        y = drop(nn.Dense(self.d_model, name="conv2")(y))
        return nn.LayerNorm(name="norm2")(x + y), attn


class Encoder(nn.Module):
    """Stack of encoder layers with optional distilling convs and a final
    norm (Transformer_EncDec.py:52-83)."""

    attn_layers: tuple
    conv_layers: tuple | None = None
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, attn_mask=None, tau=None, delta=None, *,
                 deterministic: bool = True):
        attns = []
        if self.conv_layers is not None:
            for i, (attn_layer, conv_layer) in enumerate(
                    zip(self.attn_layers, self.conv_layers)):
                d = delta if i == 0 else None
                x, attn = attn_layer(x, attn_mask, tau, d,
                                     deterministic=deterministic)
                x = conv_layer(x)
                attns.append(attn)
            x, attn = self.attn_layers[-1](x, None, tau, None,
                                           deterministic=deterministic)
            attns.append(attn)
        else:
            for attn_layer in self.attn_layers:
                x, attn = attn_layer(x, attn_mask, tau, delta,
                                     deterministic=deterministic)
                attns.append(attn)
        if self.use_norm:
            x = nn.LayerNorm(name="norm")(x)
        return x, attns


class DecoderLayer(nn.Module):
    """Self + cross attention decoder layer (Transformer_EncDec.py:86-124)."""

    self_attention: nn.Module
    cross_attention: nn.Module
    d_model: int
    d_ff: int | None = None
    dropout: float = 0.1
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, cross, x_mask=None, cross_mask=None, tau=None,
                 delta=None, *, deterministic: bool = True):
        d_ff = self.d_ff or 4 * self.d_model
        drop = lambda v: nn.Dropout(self.dropout)(v, deterministic=deterministic)
        act = nn.relu if self.activation == "relu" else (
            lambda v: nn.gelu(v, approximate=False))  # torch F.gelu default is exact erf

        x = x + drop(self.self_attention(x, x, x, x_mask, tau, None,
                                         deterministic=deterministic)[0])
        x = nn.LayerNorm(name="norm1")(x)
        x = x + drop(self.cross_attention(x, cross, cross, cross_mask, tau,
                                          delta, deterministic=deterministic)[0])
        y = x = nn.LayerNorm(name="norm2")(x)
        y = drop(act(nn.Dense(d_ff, name="conv1")(y)))
        y = drop(nn.Dense(self.d_model, name="conv2")(y))
        return nn.LayerNorm(name="norm3")(x + y)


class Decoder(nn.Module):
    layers: tuple
    use_norm: bool = True
    projection_dim: int | None = None

    @nn.compact
    def __call__(self, x, cross, x_mask=None, cross_mask=None, tau=None,
                 delta=None, *, deterministic: bool = True):
        for layer in self.layers:
            x = layer(x, cross, x_mask, cross_mask, tau, delta,
                      deterministic=deterministic)
        if self.use_norm:
            x = nn.LayerNorm(name="norm")(x)
        if self.projection_dim is not None:
            x = nn.Dense(self.projection_dim, name="projection")(x)
        return x


class ConvLayer(nn.Module):
    """Informer distilling conv (Transformer_EncDec.py:6-26): circular conv
    k=3 + batchnorm + ELU + stride-2 maxpool over time."""

    c_in: int

    @nn.compact
    def __call__(self, x):  # [B, L, D]
        y = nn.Conv(self.c_in, kernel_size=(3,), padding="CIRCULAR",
                    name="downConv")(x)
        y = nn.BatchNorm(use_running_average=True, name="norm")(y)
        y = nn.elu(y)
        # maxpool k=3 s=2 p=1 over time
        ypad = jnp.pad(y, ((0, 0), (1, 1), (0, 0)), constant_values=-jnp.inf)
        L = ypad.shape[1]
        n_out = (L - 3) // 2 + 1
        idx = (jnp.arange(n_out) * 2)[:, None] + jnp.arange(3)[None, :]
        return jnp.max(ypad[:, idx, :], axis=2)
