"""Frequency-domain attention ops (reference models/layers/FourierCorrelation.py).

TPU notes: the reference fills the selected-mode output with a python loop
of per-mode complex matmuls (FourierCorrelation.py:96-103); here mode
selection is a static gather, the per-mode transform is one einsum, and
writing back is a static scatter. All spectra are handled as (re, im) real
pairs: complex dtypes are UNIMPLEMENTED on some TPU backends, and real
matmuls ride the MXU; the DFT itself is a basis matmul (ops/dft.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from .dft import complex_einsum_ri, irfft_ri, rfft_ri


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

        xre, xim = rfft_ri(x.astype(jnp.float32))  # [B,H,E,F]
        idx = jnp.asarray(index, dtype=jnp.int32)
        ore, oim = complex_einsum_ri("bhim,hiom->bhom",
                                     xre[..., idx], xim[..., idx], w_re, w_im)

        F = self.seq_len // 2 + 1
        # the reference writes mode i's output at enumeration position wi
        # (FourierCorrelation.py:96-104) — selected modes PACK into the
        # lowest bins (upstream FEDformer behavior; identical to scatter-at-i
        # only for 'low' selection). Static pad, no scatter needed.
        pad = [(0, 0)] * 3 + [(0, F - len(index))]
        out = irfft_ri(jnp.pad(ore, pad), jnp.pad(oim, pad), n=self.seq_len)
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

        iq = jnp.asarray(index_q, dtype=jnp.int32)
        ikv = jnp.asarray(index_kv, dtype=jnp.int32)
        qre, qim = (t[..., iq] for t in rfft_ri(xq))
        kre, kim = (t[..., ikv] for t in rfft_ri(xk))

        # frequency attention scores q . k (no conjugate, like the reference)
        sre, sim = complex_einsum_ri("bhex,bhey->bhxy", qre, qim, kre, kim)
        if self.activation == "tanh":
            sre, sim = jnp.tanh(sre), jnp.tanh(sim)
        elif self.activation == "softmax":
            a = jnp.sqrt(sre ** 2 + sim ** 2)
            a = jnp.exp(a - a.max(axis=-1, keepdims=True))
            sre = a / a.sum(axis=-1, keepdims=True)
            sim = jnp.zeros_like(sre)
        else:
            raise ValueError(f"{self.activation} activation is not implemented")

        vre, vim = complex_einsum_ri("bhxy,bhey->bhex", sre, sim, kre, kim)
        ore, oim = complex_einsum_ri("bhex,heox->bhox", vre, vim, w_re, w_im)

        F = self.seq_len_q // 2 + 1
        Eo = self.out_channels // self.num_heads
        out_re = jnp.zeros((B, H, Eo, F), jnp.float32).at[..., iq].set(ore)
        out_im = jnp.zeros((B, H, Eo, F), jnp.float32).at[..., iq].set(oim)
        denom = self.in_channels * self.out_channels
        out = irfft_ri(out_re / denom, out_im / denom, n=xq.shape[-1])
        return out.astype(q.dtype), None
