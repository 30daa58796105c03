"""AutoCorrelation mechanism (reference models/layers/AutoCorrelation.py).

FFT autocorrelation q*conj(k) -> top-k delay aggregation. TPU notes:
- top_k = factor*log(L) is static (L is static under jit);
- the reference's per-delay `torch.roll` python loop becomes one gather with
  traced delay indices + einsum-weighted sum;
- the reference's inference variant hardcodes `.cuda()`
  (AutoCorrelation.py:79,120) — here both variants are device-neutral.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn

from .dft import irfft_ri, rfft_ri


def _delay_gather(values: jnp.ndarray, delays: jnp.ndarray) -> jnp.ndarray:
    """values [B,H,E,L], delays [..., k] int -> rolled patterns.

    Returns [k, B, H, E, L] where pattern_i[t] = values[(t + delay_i) % L],
    i.e. torch.roll(values, -delay_i, -1). Shared delays (ndim 1) broadcast
    over the batch; per-batch delays ([B, k]) gather per sample.
    """
    L = values.shape[-1]
    t = jnp.arange(L, dtype=jnp.int32)
    if delays.ndim == 1:  # [k] shared across batch (training variant)
        idx = (t[None, :] + delays[:, None]) % L  # [k, L]
        return values[..., idx].transpose(3, 0, 1, 2, 4)  # -> [k,B,H,E,L]
    # [B, k] per-batch delays (inference variant)
    idx = (t[None, None, :] + delays[:, :, None]) % L  # [B, k, L]
    gathered = jnp.take_along_axis(
        values[:, None, :, :, :],  # [B,1,H,E,L]
        idx[:, :, None, None, :],  # [B,k,1,1,L]
        axis=-1)
    return gathered.transpose(1, 0, 2, 3, 4)  # [k,B,H,E,L]


class AutoCorrelation(nn.Module):
    """(1) period-based dependency discovery via FFT cross-correlation,
    (2) time-delay aggregation (AutoCorrelation.py:11-167)."""

    mask_flag: bool = True
    factor: int = 1
    attention_dropout: float = 0.1
    output_attention: bool = False

    @nn.compact
    def __call__(self, queries, keys, values, attn_mask=None, *,
                 deterministic: bool = True):
        B, L, H, E = queries.shape
        S = values.shape[1]
        if L > S:
            pad = jnp.zeros((B, L - S, H, E), dtype=values.dtype)
            values = jnp.concatenate([values, pad], axis=1)
            keys = jnp.concatenate([keys, pad], axis=1)
        else:
            values = values[:, :L]
            keys = keys[:, :L]

        q = jnp.transpose(queries, (0, 2, 3, 1))  # [B,H,E,L]
        k = jnp.transpose(keys, (0, 2, 3, 1))
        v = jnp.transpose(values, (0, 2, 3, 1))

        qre, qim = rfft_ri(q.astype(jnp.float32))
        kre, kim = rfft_ri(k.astype(jnp.float32))
        # q * conj(k) in (re, im) real pairs (complex64 is UNIMPLEMENTED on
        # some TPU backends)
        corr = irfft_ri(qre * kre + qim * kim, qim * kre - qre * kim, n=L)

        top_k = int(self.factor * math.log(L))
        mean_value = corr.mean(axis=1).mean(axis=1)  # [B, L]

        if not deterministic:
            # training variant (AutoCorrelation.py:33-60): delays shared
            # across the batch, weights read per-sample at those delays
            delays = jax.lax.top_k(mean_value.mean(axis=0), top_k)[1]  # [k]
            weights = mean_value[:, delays]  # [B, k]
        else:
            # inference variant (AutoCorrelation.py:62-100): per-batch delays
            weights, delays = jax.lax.top_k(mean_value, top_k)  # [B,k]

        tmp_corr = jax.nn.softmax(weights, axis=-1)  # [B, k]
        patterns = _delay_gather(v, delays)  # [k,B,H,E,L]
        agg = jnp.einsum("kbhel,bk->bhel", patterns,
                         tmp_corr.astype(patterns.dtype))
        V = jnp.transpose(agg, (0, 3, 1, 2)).astype(values.dtype)  # [B,L,H,E]

        attn = jnp.transpose(corr, (0, 3, 1, 2)) if self.output_attention else None
        return V, attn


class AutoCorrelationLayer(nn.Module):
    """QKV projection wrapper (AutoCorrelation.py:169-194). NOTE: like the
    reference, the inner block's output is flattened by raw memory
    reinterpretation (`out.view(B, L, -1)` on whatever layout the inner
    block emits) — FourierBlock emits [B,H,E,L] and this reshape is part of
    FEDformer's published semantics."""

    inner_correlation: nn.Module
    d_model: int
    n_heads: int
    d_keys: int | None = None
    d_values: int | None = None

    @nn.compact
    def __call__(self, queries, keys, values, attn_mask=None, *,
                 deterministic: bool = True):
        d_keys = self.d_keys or self.d_model // self.n_heads
        d_values = self.d_values or self.d_model // self.n_heads
        B, L, _ = queries.shape
        S = keys.shape[1]
        H = self.n_heads

        q = nn.Dense(d_keys * H, name="query_projection")(queries).reshape(B, L, H, d_keys)
        k = nn.Dense(d_keys * H, name="key_projection")(keys).reshape(B, S, H, d_keys)
        v = nn.Dense(d_values * H, name="value_projection")(values).reshape(B, S, H, d_values)

        out, attn = self.inner_correlation(q, k, v, attn_mask,
                                           deterministic=deterministic)
        out = out.reshape(B, L, -1)
        return nn.Dense(self.d_model, name="out_projection")(out), attn
