"""Pallas kernel fallbacks and numerics (kernels themselves exercise the
jnp path on the CPU test backend; the TPU path shares the same oracle)."""

import jax.numpy as jnp
import numpy as np

from medtsllm_tpu.ops.pallas.flash_attention import (
    _attention_reference, flash_attention)
from medtsllm_tpu.ops.pallas.reprogramming import (
    _reference as reprog_reference, reprogramming_attention)


def test_reprogramming_matches_einsum():
    rng = np.random.default_rng(0)
    B, L, H, E, S = 2, 16, 4, 8, 32
    q = jnp.asarray(rng.normal(size=(B, L, H, E)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(S, H, E)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(S, H, E)), jnp.float32)
    out = reprogramming_attention(q, k, v)
    exp = reprog_reference(q, k, v, 1.0 / np.sqrt(E))
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp), atol=1e-5)
    assert out.shape == (B, L, H, E)


def test_flash_attention_noncausal():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 24, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 24, 8)), jnp.float32)
    out = flash_attention(q, k, v, causal=False)
    exp = _attention_reference(q, k, v, False, 1.0 / np.sqrt(8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp), atol=1e-5)


def test_attention_gqa_broadcast_matches_repeat():
    """GQA: flash_attention with KV < H equals explicit head repetition."""
    import jax.numpy as jnp
    from medtsllm_tpu.ops.pallas.flash_attention import (
        _attention_reference, flash_attention)
    rng = np.random.default_rng(7)
    B, H, KV, L, D = 2, 8, 2, 24, 16
    q = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, KV, L, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, KV, L, D)).astype(np.float32))
    rep = H // KV
    out = flash_attention(q, k, v, causal=True)
    expect = _attention_reference(q, jnp.repeat(k, rep, axis=1),
                                  jnp.repeat(v, rep, axis=1),
                                  causal=True, sm_scale=D ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=2e-5, atol=2e-5)
