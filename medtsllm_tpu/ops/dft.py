"""DFT as matmul — TPU-friendly rFFT/irFFT for short sequences.

The frequency-domain models (FEDformer, AutoCorrelation, TimesNet period
detection) operate on sequences of a few hundred steps. XLA's FFT HLO is a
poor fit for the TPU systolic array (and compiles very slowly through the
remote-compile service used here); an explicit DFT basis matmul is exact,
rides the MXU, and fuses with neighboring ops. Bases are precomputed on
host per length and baked into the graph as constants (L<=1024 => <1MB).

`rfft`/`irfft` below are drop-in (last-axis) replacements for
jnp.fft.rfft/irfft, switching to jnp.fft above SEQ_CUTOFF.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

SEQ_CUTOFF = 2048  # beyond this, O(L log L) FFT wins


@lru_cache(maxsize=64)
def _rfft_basis(L: int):
    t = np.arange(L)[:, None]
    k = np.arange(L // 2 + 1)[None, :]
    ang = -2.0 * np.pi * t * k / L
    return (np.cos(ang).astype(np.float32),  # [L, F]
            np.sin(ang).astype(np.float32))


@lru_cache(maxsize=64)
def _irfft_basis(F: int, n: int):
    k = np.arange(F)[:, None]
    t = np.arange(n)[None, :]
    w = np.full(F, 2.0)
    w[0] = 1.0
    if n % 2 == 0 and F == n // 2 + 1:
        w[-1] = 1.0
    ang = 2.0 * np.pi * k * t / n
    a = (w[:, None] * np.cos(ang) / n).astype(np.float32)  # [F, n] for Re
    b = (-w[:, None] * np.sin(ang) / n).astype(np.float32)  # [F, n] for Im
    return a, b


def _matmul_last(x: jnp.ndarray, basis: jnp.ndarray) -> jnp.ndarray:
    """x [..., L] @ basis [L, F] as an explicit 2-D matmul. (Ellipsis
    einsums compile ~100x slower on the axon TPU backend.)"""
    lead = x.shape[:-1]
    out = x.reshape(-1, x.shape[-1]) @ basis
    return out.reshape(*lead, basis.shape[-1])


def rfft_ri(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real->spectrum over the last axis as a (re, im) pair. Complex dtypes
    are UNIMPLEMENTED on some TPU backends (and complex matmuls never hit
    the MXU); all in-graph frequency ops use this real-pair form."""
    L = x.shape[-1]
    cos, sin = (jnp.asarray(m) for m in _rfft_basis(L))
    xf = x.astype(jnp.float32)
    return _matmul_last(xf, cos), _matmul_last(xf, sin)


def irfft_ri(re: jnp.ndarray, im: jnp.ndarray, n: int) -> jnp.ndarray:
    """(re, im) spectrum -> real signal of length n (last axis)."""
    F_needed = n // 2 + 1
    F = re.shape[-1]
    if F < F_needed:
        pad = [(0, 0)] * (re.ndim - 1) + [(0, F_needed - F)]
        re, im = jnp.pad(re, pad), jnp.pad(im, pad)
    elif F > F_needed:
        re, im = re[..., :F_needed], im[..., :F_needed]
    a, b = (jnp.asarray(m) for m in _irfft_basis(re.shape[-1], n))
    return (_matmul_last(re.astype(jnp.float32), a)
            + _matmul_last(im.astype(jnp.float32), b))


def complex_mul_ri(are, aim, bre, bim):
    """(a * b) for (re, im) pairs."""
    return are * bre - aim * bim, are * bim + aim * bre


def complex_einsum_ri(order, are, aim, bre, bim):
    """einsum(order, a, b) for (re, im) pairs — 4 real MXU matmuls."""
    return (jnp.einsum(order, are, bre) - jnp.einsum(order, aim, bim),
            jnp.einsum(order, are, bim) + jnp.einsum(order, aim, bre))


def rfft(x: jnp.ndarray, n: int | None = None, axis: int = -1) -> jnp.ndarray:
    """Real -> complex spectrum over the last axis (axis=-1 only)."""
    assert axis in (-1, x.ndim - 1)
    if n is not None and n != x.shape[-1]:
        if n > x.shape[-1]:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
            x = jnp.pad(x, pad)
        else:
            x = x[..., :n]
    L = x.shape[-1]
    if L > SEQ_CUTOFF:
        return jnp.fft.rfft(x, axis=-1)
    cos, sin = (jnp.asarray(m) for m in _rfft_basis(L))
    xf = x.astype(jnp.float32)
    return _matmul_last(xf, cos) + 1j * _matmul_last(xf, sin)


def irfft(spec: jnp.ndarray, n: int, axis: int = -1) -> jnp.ndarray:
    """Complex spectrum -> real signal of length n over the last axis."""
    assert axis in (-1, spec.ndim - 1)
    F_needed = n // 2 + 1
    F = spec.shape[-1]
    if F < F_needed:
        pad = [(0, 0)] * (spec.ndim - 1) + [(0, F_needed - F)]
        spec = jnp.pad(spec, pad)
    elif F > F_needed:
        spec = spec[..., :F_needed]
    if n > SEQ_CUTOFF:
        return jnp.fft.irfft(spec, n=n, axis=-1)
    a, b = (jnp.asarray(m) for m in _irfft_basis(spec.shape[-1], n))
    return (_matmul_last(jnp.real(spec).astype(jnp.float32), a)
            + _matmul_last(jnp.imag(spec).astype(jnp.float32), b))
