"""Small-M weight-streaming w8a8 kernel (ops/pallas/smallm_matmul.py):
exact numerics vs the XLA integer path, VMEM block sizing, and gating.

The kernel serves the reference's deployment shapes (batch 4-16,
/root/reference/configs/datasets/bidmc.toml:18-24) where the serving
step is weight-bandwidth-bound; see BASELINE.md "Serving latency"."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from medtsllm_tpu.ops.pallas.smallm_matmul import (
    _M_MAX, smallm_blocks, smallm_supported, w8a8_smallm_matmul_pallas)


@pytest.mark.parametrize("M,K,N,bn", [(448, 256, 512, 128),
                                      (37, 128, 256, 128),  # prefill-odd M
                                      (896, 384, 384, 128)])
def test_kernel_matches_xla_integers(M, K, N, bn):
    rng = np.random.default_rng(M)
    xq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    xs = jnp.asarray(rng.uniform(0.01, 0.1, (M, 1)), jnp.float32)
    ws = jnp.asarray(rng.uniform(0.001, 0.01, (N,)), jnp.float32)
    got = np.asarray(w8a8_smallm_matmul_pallas(xq, wq, xs, ws, block_n=bn,
                                               interpret=True))
    acc = np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)
    want = acc.astype(np.float32) * np.asarray(xs) * np.asarray(ws)[None, :]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_blocks_respect_vmem_budget():
    # batch-4 serving shapes all get a block
    assert smallm_blocks(448, 4096, 4096) == 512
    assert smallm_blocks(448, 4096, 11008) in (256, 512)
    assert smallm_blocks(448, 11008, 4096) in (128, 256, 512)
    # residency that cannot fit -> None
    assert smallm_blocks(8192, 11008, 11008) is None
    # indivisible N -> None
    assert smallm_blocks(448, 4096, 1000) is None


def test_gating(monkeypatch):
    from medtsllm_tpu.ops.pallas.smallm_matmul import use_smallm_kernel
    # measured negative result -> default OFF everywhere
    monkeypatch.delenv("MEDTSLLM_SMALLM_KERNEL", raising=False)
    assert not use_smallm_kernel()
    assert not smallm_supported(448, 4096, 4096)
    # opt-in flips the switch, but the CPU backend (the test mesh)
    # still never takes the kernel path
    monkeypatch.setenv("MEDTSLLM_SMALLM_KERNEL", "1")
    assert use_smallm_kernel()
    assert jax.default_backend() == "cpu"
    assert not smallm_supported(448, 4096, 4096)


def test_act_quant_matmul_gated_off_on_cpu():
    """_act_quant_matmul must keep XLA numerics on CPU (the kernel gate
    keys on the TPU backend); this pins the integration seam."""
    from medtsllm_tpu.models.llm.transformer import _act_quant_matmul
    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.normal(0, 1, (448, 256)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (256, 512)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (512,)), jnp.float32)
    out = _act_quant_matmul(xf, kq, scale, 8)
    amax = np.abs(np.asarray(xf)).max(axis=-1, keepdims=True)
    xs = np.maximum(amax / 127.0, 1e-10)
    xqi = np.round(np.asarray(xf) / xs).astype(np.int8)
    want = (xqi.astype(np.int32) @ np.asarray(kq, np.int32)
            ).astype(np.float32) * xs * np.asarray(scale)[None, :]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)
    assert _M_MAX >= 896  # covers batch 4-8 x 112-token serving regions
