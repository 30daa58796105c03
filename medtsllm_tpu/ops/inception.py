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
                bias: jnp.ndarray, seq_len: int | None = None,
                out_len: int | None = None) -> jnp.ndarray:
    """Composite-kernel 2D conv on the period-folded view of an image
    BUFFER.

    x: [B, Lbuf, Nin] — the folded image flattened row-major, valid at
    positions [0, total) where total = ceil(seq_len/period) * period is
    the reference's zero-padded image length (TimesNet.py:290-296); the
    buffer MUST hold zeros at [seq_len, Lbuf) when it carries the raw
    series, and the caller masks intermediate buffers beyond `total`
    (fold_conv_valid_mask). period: traced int scalar; kernel:
    [K, K, Nin, Nout] (K odd, 'same' zero padding on the folded image);
    bias: [Nout]; seq_len: the original series length T (defaults to
    Lbuf); out_len: number of output positions to produce (defaults to
    Lbuf; pass T for the final stage — the reference's crop
    `out[:, :seq_len+pred_len]`, TimesNet.py:310).

    Stacked stages must see each other's PADDED-ROW values: for
    total > seq_len the first conv's outputs at positions
    [seq_len, total) are nonzero (bias + taps of real data) and the
    reference's second conv reads them from the folded image
    (TimesNet.py:267-279 conv -> gelu -> conv on the same image). Hence
    the buffer semantics: produce out_len = 2*seq_len positions for
    intermediate stages (total <= 2*seq_len - 1 for any period <=
    seq_len), crop to seq_len only at the last stage. Caught by the
    executed oracle tests/test_reference_oracle_systems.py::
    test_timesblock_period_fold_oracle.
    """
    B, Lbuf, Nin = x.shape
    T = seq_len if seq_len is not None else Lbuf
    out_len = out_len if out_len is not None else Lbuf
    K = kernel.shape[0]
    c = K // 2
    Nout = kernel.shape[-1]

    p = period.astype(jnp.int32)
    t = jnp.arange(out_len, dtype=jnp.int32)
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
        valid = (jj >= 0) & (jj < p) & (s >= 0) & (s < total) & (s < Lbuf)
        sc = jnp.clip(s, 0, Lbuf - 1)
        vals = jnp.take(x, sc, axis=1)  # [B, out_len, Nin]
        vals = jnp.where(valid[None, :, None], vals, 0.0)
        return carry + jnp.einsum("btn,no->bto", vals, w_tap,
                                  preferred_element_type=carry.dtype), None

    init = jnp.zeros((B, out_len, Nout), dtype=x.dtype)
    out, _ = jax.lax.scan(tap, init, (off, w.astype(x.dtype)))
    return out + bias.astype(x.dtype)


def fold_conv_valid_mask(out_len: int, seq_len: int,
                         period: jnp.ndarray) -> jnp.ndarray:
    """[out_len] bool mask of positions inside the padded image
    (< ceil(seq_len/period)*period); intermediate buffers must be zeroed
    beyond it so the next stage's zero-'same'-padding semantics hold."""
    p = period.astype(jnp.int32)
    total = ((seq_len + p - 1) // p) * p
    return jnp.arange(out_len, dtype=jnp.int32) < total


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
    def __call__(self, x, period, seq_len: int | None = None,
                 out_len: int | None = None):
        kernel, bias = self.composite_kernel(x.shape[-1], x.dtype)
        return fold_conv2d(x, period, kernel, bias,
                           seq_len=seq_len, out_len=out_len)


class InceptionBlockV2(nn.Module):
    """Separable 1xk / kx1 kernels + 1x1, mean-aggregated
    (Conv_Blocks.py:35-76); composed into the same composite-kernel form."""

    out_channels: int
    num_kernels: int = 6

    @nn.compact
    def __call__(self, x, period, seq_len: int | None = None,
                 out_len: int | None = None):
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
        return fold_conv2d(x, period, combined, bias,
                           seq_len=seq_len, out_len=out_len)


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
