"""Matmul-DFT equals jnp.fft numerics."""

import jax.numpy as jnp
import numpy as np

from medtsllm_tpu.ops.dft import irfft, rfft


def test_rfft_matches_numpy():
    rng = np.random.default_rng(0)
    for L in (8, 33, 100, 256):
        x = rng.normal(size=(2, 3, L)).astype(np.float32)
        got = np.asarray(rfft(jnp.asarray(x)))
        exp = np.fft.rfft(x, axis=-1)
        np.testing.assert_allclose(got, exp, atol=2e-3)


def test_irfft_roundtrip():
    rng = np.random.default_rng(1)
    for L in (8, 32, 100, 255):
        x = rng.normal(size=(2, L)).astype(np.float32)
        back = np.asarray(irfft(rfft(jnp.asarray(x)), n=L))
        np.testing.assert_allclose(back, x, atol=2e-3)


def test_irfft_matches_numpy_complex_input():
    rng = np.random.default_rng(2)
    L = 64
    spec = (rng.normal(size=(3, L // 2 + 1))
            + 1j * rng.normal(size=(3, L // 2 + 1))).astype(np.complex64)
    got = np.asarray(irfft(jnp.asarray(spec), n=L))
    exp = np.fft.irfft(spec, n=L, axis=-1)
    np.testing.assert_allclose(got, exp, atol=2e-3)


def test_irfft_truncated_modes():
    # FEDformer writes back only selected modes; extra spectrum is zero
    rng = np.random.default_rng(3)
    L = 32
    spec = np.zeros((2, L // 2 + 1), np.complex64)
    spec[:, :5] = rng.normal(size=(2, 5)) + 1j * rng.normal(size=(2, 5))
    got = np.asarray(irfft(jnp.asarray(spec[:, :5]), n=L))
    exp = np.fft.irfft(spec, n=L, axis=-1)
    np.testing.assert_allclose(got, exp, atol=2e-3)
