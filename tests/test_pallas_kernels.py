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


def test_w4a8_pack_unpack_round_trip():
    from medtsllm_tpu.ops.pallas.quant_matmul import (
        pack4_split, unpack4_split)
    rng = np.random.default_rng(0)
    for k in (8, 33, 256):
        q = rng.integers(-8, 8, size=(k, 16)).astype(np.int8)
        packed = pack4_split(q)
        assert packed.shape[0] == (k + 1) // 2
        back = np.asarray(unpack4_split(jnp.asarray(packed), k))
        np.testing.assert_array_equal(back, q)


def test_w4a8_kernel_matches_reference():
    """Pallas w4a8 matmul (interpret mode) == XLA unpack-then-dot oracle,
    including M padding and the final two-scale rescale."""
    from medtsllm_tpu.ops.pallas.quant_matmul import (
        pack4_split, w4a8_matmul_pallas, w4a8_matmul_reference)
    rng = np.random.default_rng(1)
    M, K, N = 40, 64, 32  # M not a block multiple: exercises padding
    xq = rng.integers(-127, 128, size=(M, K)).astype(np.int8)
    q = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
    packed = jnp.asarray(pack4_split(q))
    x_scale = jnp.asarray(rng.uniform(1e-3, 1e-1, (M, 1)).astype(np.float32))
    w_scale = jnp.asarray(rng.uniform(1e-3, 1e-1, (N,)).astype(np.float32))
    out = w4a8_matmul_pallas(jnp.asarray(xq), packed, x_scale, w_scale,
                             out_dtype=jnp.float32, block_m=16,
                             block_n=16, block_k2=16, interpret=True)
    ref = w4a8_matmul_reference(jnp.asarray(xq), packed, x_scale, w_scale,
                                out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_quantdense_int4_uses_split_layout():
    """QuantDense bits=4 packing matches pack4_split so the Pallas path
    and the XLA fallback read the same parameter layout."""
    from medtsllm_tpu.models.llm.transformer import QuantDense
    from medtsllm_tpu.ops.pallas.quant_matmul import pack4_split
    rng = np.random.default_rng(2)
    w = rng.normal(size=(64, 8)).astype(np.float32)
    q, scale = QuantDense.quantize(w, bits=4)
    qmax = 7.0
    absmax = np.max(np.abs(w), axis=0)
    expect = np.clip(np.round(w / (absmax / qmax)), -qmax, qmax).astype(np.int8)
    np.testing.assert_array_equal(q, pack4_split(expect))
