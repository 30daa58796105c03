"""Frequency-domain attention ops (reference models/layers/FourierCorrelation.py).

TPU notes: the reference fills the selected-mode output with a python loop
of per-mode complex matmuls (FourierCorrelation.py:96-103); here mode
selection is a static gather, the per-mode transform is one complex einsum,
and writing back is a static scatter — three fused XLA ops. Complex math
runs in complex64 (XLA lowers to planar f32 pairs on TPU).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn


def get_frequency_modes(seq_len: int, modes: int = 64,
                        mode_select_method: str = "random") -> list[int]:
    """Frequency mode selection (FourierCorrelation.py:10-24): 'random'
    samples via the (seeded) global numpy RNG, else the lowest modes."""
    modes = min(modes, seq_len // 2)
    if mode_select_method == "random":
        index = list(range(0, seq_len // 2))
        np.random.shuffle(index)
        index = index[:modes]
    else:
        index = list(range(0, modes))
    index.sort()
    return index


def _uniform_scaled(scale):
    def init(key, shape, dtype=jnp.float32):
        import jax
        return scale * jax.random.uniform(key, shape, dtype)
    return init


class FourierBlock(nn.Module):
    """rFFT -> per-selected-mode complex weight matmul -> irFFT
    (FourierCorrelation.py:28-106). Self-attention replacement: only q is
    used. Returns [B, H, E, L] (see AutoCorrelationLayer reshape note)."""

    in_channels: int
    out_channels: int
    seq_len: int
    index: tuple  # static mode selection, chosen once at model construction
    n_heads: int = 8

    @nn.compact
    def __call__(self, q, k, v, attn_mask=None, *, deterministic: bool = True):
        index = self.index
        B, L, H, E = q.shape
        x = jnp.transpose(q, (0, 2, 3, 1))  # [B,H,E,L]
        scale = 1 / (self.in_channels * self.out_channels)
        shape = (self.n_heads, self.in_channels // self.n_heads,
                 self.out_channels // self.n_heads, len(index))
        w_re = self.param("weights1", _uniform_scaled(scale), shape)
        w_im = self.param("weights2", _uniform_scaled(scale), shape)
        weights = (w_re + 1j * w_im).astype(jnp.complex64)

        x_ft = jnp.fft.rfft(x.astype(jnp.float32), axis=-1)  # [B,H,E,F]
        idx = jnp.asarray(index, dtype=jnp.int32)
        x_sel = x_ft[..., idx]  # [B,H,E,M] static gather
        out_sel = jnp.einsum("bhim,hiom->bhom", x_sel, weights)

        F = self.seq_len // 2 + 1
        out_ft = jnp.zeros((B, H, self.out_channels // self.n_heads, F),
                           dtype=jnp.complex64)
        out_ft = out_ft.at[..., idx].set(out_sel)
        out = jnp.fft.irfft(out_ft, n=self.seq_len, axis=-1)
        return out.astype(q.dtype), None


class FourierCrossAttention(nn.Module):
    """Mode-sampled q/k spectra, tanh/softmax frequency attention, complex
    value mixing, irFFT (FourierCorrelation.py:110-235). Returns
    [B, H, E, Lq]."""

    in_channels: int
    out_channels: int
    seq_len_q: int
    seq_len_kv: int
    index_q: tuple  # static mode selections, chosen once at construction
    index_kv: tuple
    activation: str = "tanh"
    num_heads: int = 8

    @nn.compact
    def __call__(self, q, k, v, attn_mask=None, *, deterministic: bool = True):
        index_q, index_kv = self.index_q, self.index_kv
        B, L, H, E = q.shape
        xq = jnp.transpose(q, (0, 2, 3, 1)).astype(jnp.float32)  # [B,H,E,L]
        xk = jnp.transpose(k, (0, 2, 3, 1)).astype(jnp.float32)

        scale = 1 / (self.in_channels * self.out_channels)
        shape = (self.num_heads, self.in_channels // self.num_heads,
                 self.out_channels // self.num_heads, len(index_q))
        w_re = self.param("weights1", _uniform_scaled(scale), shape)
        w_im = self.param("weights2", _uniform_scaled(scale), shape)
        weights = (w_re + 1j * w_im).astype(jnp.complex64)

        xq_ft = jnp.fft.rfft(xq, axis=-1)[..., jnp.asarray(index_q)]
        xk_ft = jnp.fft.rfft(xk, axis=-1)[..., jnp.asarray(index_kv)]

        xqk_ft = jnp.einsum("bhex,bhey->bhxy", xq_ft, xk_ft)
        if self.activation == "tanh":
            xqk_ft = jnp.tanh(xqk_ft.real) + 1j * jnp.tanh(xqk_ft.imag)
        elif self.activation == "softmax":
            a = jnp.abs(xqk_ft)
            a = jnp.exp(a - a.max(axis=-1, keepdims=True))
            a = a / a.sum(axis=-1, keepdims=True)
            xqk_ft = a.astype(jnp.complex64)
        else:
            raise ValueError(f"{self.activation} activation is not implemented")

        xqkv_ft = jnp.einsum("bhxy,bhey->bhex", xqk_ft, xk_ft)
        xqkvw = jnp.einsum("bhex,heox->bhox", xqkv_ft, weights)

        F = self.seq_len_q // 2 + 1
        out_ft = jnp.zeros((B, H, self.out_channels // self.num_heads, F),
                           dtype=jnp.complex64)
        out_ft = out_ft.at[..., jnp.asarray(index_q)].set(xqkvw)
        out = jnp.fft.irfft(out_ft / self.in_channels / self.out_channels,
                            n=xq.shape[-1], axis=-1)
        return out.astype(q.dtype), None
