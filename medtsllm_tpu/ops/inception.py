"""Inception conv blocks + period-folded 2D convolution (TimesNet).

Reference: models/layers/Conv_Blocks.py (parallel odd-kernel 2D convs,
mean-aggregated) applied to a [cycles x period] folding of the sequence
(models/TimesNet.py:281-318).

TPU-first re-derivation: the reference reshapes the series into a 2D image
whose width is a *data-dependent* period — a dynamic shape XLA cannot
compile, which the reference dodges with a per-forward CPU sync
(TimesNet.py:328 `.detach().cpu().numpy()`). Here the identical math is
expressed without any dynamic shape:

  A KxK conv at grid point (i, j) of the folded image reads x[(i+di)*p + (j+dj)]
  = x[t + di*p + dj] with t = i*p + j. So the folded conv is a 1D gather-conv
  with taps at traced offsets di*p + dj, plus masks reproducing the zero
  padding of the image borders. The period stays a traced scalar.

  Because every parallel inception kernel maps Nin->Nout and the block
  averages their outputs, the whole block collapses into ONE composite
  Kmax x Kmax kernel (smaller kernels zero-padded, then averaged) — a single
  fused gather+matmul sweep instead of num_kernels separate convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .dft import rfft_ri

# torch kaiming_normal_(fan_out, relu): scale 2.0 / fan_out
_kaiming_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def fold_conv2d(x: jnp.ndarray, period: jnp.ndarray, kernel: jnp.ndarray,
                bias: jnp.ndarray) -> jnp.ndarray:
    """Composite-kernel 2D conv on the period-folded view of x.

    x: [B, T, Nin]; period: traced int scalar; kernel: [K, K, Nin, Nout]
    (K odd, 'same' zero padding on the folded image); bias: [Nout].
    Returns [B, T, Nout] (the first T outputs of the folded conv, i.e. the
    reference's crop `out[:, :seq_len+pred_len]`, TimesNet.py:310).
    """
    B, T, Nin = x.shape
    K = kernel.shape[0]
    c = K // 2
    Nout = kernel.shape[-1]

    p = period.astype(jnp.int32)
    t = jnp.arange(T, dtype=jnp.int32)
    j = jnp.mod(t, p)
    cycles = (T + p - 1) // p
    total = cycles * p  # padded image length

    offsets = [(di, dj) for di in range(-c, c + 1) for dj in range(-c, c + 1)]
    off = jnp.asarray(offsets, dtype=jnp.int32)  # [taps, 2]
    w = kernel.reshape(K * K, Nin, Nout)  # tap-major, matches offsets order

    def tap(carry, inp):
        (di, dj), w_tap = inp
        s = t + di * p + dj
        jj = j + dj
        valid = (jj >= 0) & (jj < p) & (s >= 0) & (s < total) & (s < T)
        sc = jnp.clip(s, 0, T - 1)
        vals = jnp.take(x, sc, axis=1)  # [B, T, Nin]
        vals = jnp.where(valid[None, :, None], vals, 0.0)
        return carry + jnp.einsum("btn,no->bto", vals, w_tap,
                                  preferred_element_type=carry.dtype), None

    init = jnp.zeros((B, T, Nout), dtype=x.dtype)
    out, _ = jax.lax.scan(tap, init, (off, w.astype(x.dtype)))
    return out + bias.astype(x.dtype)


class InceptionBlockV1(nn.Module):
    """Parallel odd-kernel (1,3,...,2k-1) 2D convs, mean-aggregated
    (Conv_Blocks.py:5-32), evaluated on the folded grid via one composite
    kernel."""

    out_channels: int
    num_kernels: int = 6

    def composite_kernel(self, in_channels: int, dtype):
        K_max = 2 * self.num_kernels - 1
        c_max = K_max // 2
        combined = jnp.zeros((K_max, K_max, in_channels, self.out_channels),
                             dtype=dtype)
        biases = []
        for i in range(self.num_kernels):
            K = 2 * i + 1
            w = self.param(f"kernel_{i}", _kaiming_fan_out,
                           (K, K, in_channels, self.out_channels))
            b = self.param(f"bias_{i}", nn.initializers.zeros,
                           (self.out_channels,))
            pad = c_max - K // 2
            combined = combined.at[pad:pad + K, pad:pad + K].add(w.astype(dtype))
            biases.append(b)
        combined = combined / self.num_kernels
        bias = sum(biases) / self.num_kernels
        return combined, bias

    @nn.compact
    def __call__(self, x, period):
        kernel, bias = self.composite_kernel(x.shape[-1], x.dtype)
        return fold_conv2d(x, period, kernel, bias)


class InceptionBlockV2(nn.Module):
    """Separable 1xk / kx1 kernels + 1x1, mean-aggregated
    (Conv_Blocks.py:35-76); composed into the same composite-kernel form."""

    out_channels: int
    num_kernels: int = 6

    @nn.compact
    def __call__(self, x, period):
        in_channels = x.shape[-1]
        n_branches = 2 * (self.num_kernels // 2) + 1
        K_max = 2 * (self.num_kernels // 2) + 1
        c_max = K_max // 2
        combined = jnp.zeros((K_max, K_max, in_channels, self.out_channels),
                             dtype=x.dtype)
        biases = []
        for i in range(self.num_kernels // 2):
            K = 2 * i + 3
            pad = c_max - K // 2
            wr = self.param(f"row_kernel_{i}", _kaiming_fan_out,
                            (1, K, in_channels, self.out_channels))
            br = self.param(f"row_bias_{i}", nn.initializers.zeros,
                            (self.out_channels,))
            combined = combined.at[c_max:c_max + 1, pad:pad + K].add(
                wr.astype(x.dtype))
            wc = self.param(f"col_kernel_{i}", _kaiming_fan_out,
                            (K, 1, in_channels, self.out_channels))
            bc = self.param(f"col_bias_{i}", nn.initializers.zeros,
                            (self.out_channels,))
            combined = combined.at[pad:pad + K, c_max:c_max + 1].add(
                wc.astype(x.dtype))
            biases += [br, bc]
        w1 = self.param("one_kernel", _kaiming_fan_out,
                        (1, 1, in_channels, self.out_channels))
        b1 = self.param("one_bias", nn.initializers.zeros, (self.out_channels,))
        combined = combined.at[c_max, c_max].add(w1[0, 0].astype(x.dtype))
        biases.append(b1)
        combined = combined / n_branches
        bias = sum(biases) / n_branches
        return fold_conv2d(x, period, combined, bias)


def fft_for_period(x: jnp.ndarray, k: int = 2):
    """Top-k dominant periods by rFFT amplitude (TimesNet.py:321-330),
    fully on-device: periods stay traced integers."""
    re, im = rfft_ri(jnp.moveaxis(x.astype(jnp.float32), 1, -1))
    amp = jnp.moveaxis(jnp.sqrt(re * re + im * im), -1, 1)
    freq = amp.mean(axis=0).mean(axis=-1)
    freq = freq.at[0].set(0.0)
    _, top = jax.lax.top_k(freq, k)
    period = x.shape[1] // jnp.maximum(top, 1)
    weight = amp.mean(axis=-1)[:, top]  # [B, k]
    return period, weight
