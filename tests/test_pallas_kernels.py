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


def test_fused_rope_attention_kernel_matches_reference():
    """Pallas fused rope+attention (interpret mode) == XLA oracle, for
    no-prefix, shared-prefix (pb=1) and per-batch-prefix, including a
    prefix length that is not a sublane multiple (exercises padding)."""
    import jax
    from medtsllm_tpu.ops.pallas.rope_attention import (
        _pallas_forward, _reference, rope_tables)
    rng = np.random.default_rng(3)
    B, L, H, D = 2, 16, 16, 8
    sm = 1.0 / np.sqrt(D)
    xq = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
    xk = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
    xv = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
    for P, pb in ((0, 1), (5, 1), (5, B), (16, 1)):
        pos = jnp.arange(P, P + L)
        cos, sin = rope_tables(pos, D, 10000.0)
        if P:
            pk = jnp.asarray(rng.normal(size=(pb, H, P, D)), jnp.float32)
            pv = jnp.asarray(rng.normal(size=(pb, H, P, D)), jnp.float32)
        else:
            pk = pv = None
        out = _pallas_forward(xq, xk, xv, cos, sin, pk, pv, sm,
                              interpret=True)
        exp = _reference(xq, xk, xv, cos, sin, pk, pv, sm)
        np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                                   rtol=2e-5, atol=2e-5)


def test_fused_rope_attention_vjp_matches_direct_grad():
    """custom_vjp backward (XLA recompute) == jax.grad of the oracle."""
    import jax
    from medtsllm_tpu.ops.pallas.rope_attention import (
        _reference, fused_rope_attention, rope_tables)
    rng = np.random.default_rng(4)
    B, L, H, D = 1, 8, 2, 8
    sm = 1.0 / np.sqrt(D)
    xq = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
    xk = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
    xv = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
    P = 4
    cos, sin = rope_tables(jnp.arange(P, P + L), D, 10000.0)
    pk = jnp.asarray(rng.normal(size=(1, H, P, D)), jnp.float32)
    pv = jnp.asarray(rng.normal(size=(1, H, P, D)), jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_rope_attention(q, k, v, cos, sin, pk, pv,
                                            sm) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, cos, sin, pk, pv, sm) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(xq, xk, xv)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(xq, xk, xv)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_fused_rope_attention_gate_default_off(monkeypatch):
    """Kernel is opt-in: gate is False without MEDTSLLM_FUSED_ROPE_ATTN=1
    and rejects unsupported shapes even with it."""
    from medtsllm_tpu.ops.pallas.rope_attention import (
        fused_rope_attention_supported as gate)
    monkeypatch.delenv("MEDTSLLM_FUSED_ROPE_ATTN", raising=False)
    assert not gate("llama", 32, 32, 128, 112, False, True)
    monkeypatch.setenv("MEDTSLLM_FUSED_ROPE_ATTN", "1")
    assert gate("llama", 32, 32, 128, 112, False, True)
    assert not gate("gpt2", 32, 32, 128, 112, False, True)   # style
    assert not gate("llama", 32, 8, 128, 112, False, True)   # GQA
    assert not gate("llama", 32, 32, 64, 112, False, True)   # head_dim
    assert not gate("llama", 32, 32, 128, 113, False, True)  # L % 16
    assert not gate("llama", 32, 32, 128, 112, True, True)   # bias
    assert not gate("llama", 32, 32, 128, 112, False, False) # causal


def test_rotary_embedding_seq_axis_layouts_agree():
    """RoPE applied pre-transpose ([B,L,H,D], seq_axis=1) == applied
    post-transpose ([B,H,L,D], seq_axis=2) then compared in one layout."""
    from medtsllm_tpu.models.llm.transformer import rotary_embedding
    rng = np.random.default_rng(5)
    B, H, L, D = 2, 4, 12, 16
    x_blhd = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
    pos = jnp.arange(7, 7 + L)
    a = rotary_embedding(x_blhd, pos, 10000.0, seq_axis=1)
    b = rotary_embedding(x_blhd.transpose(0, 2, 1, 3), pos, 10000.0,
                         seq_axis=2)
    np.testing.assert_allclose(np.asarray(a.transpose(0, 2, 1, 3)),
                               np.asarray(b), rtol=1e-6, atol=1e-6)


def _gmm_oracle(xq, xs, w, ws, counts, row_off, block_m):
    """Per-row expert lookup: rows of group e (and its tile-tail padding
    rows, which the kernel computes against e's weights) hit w[e]."""
    E = counts.shape[0]
    R, _ = xq.shape
    out = np.zeros((R, w.shape[-1]), np.float32)
    for e in range(E):
        tile_end = -(-int(counts[e]) // block_m) * block_m
        for r in range(int(row_off[e]), int(row_off[e]) + tile_end):
            acc = xq[r].astype(np.int32) @ w[e].astype(np.int32)
            out[r] = acc.astype(np.float32) * xs[r] * ws[e]
    return out


def test_grouped_matmul_matches_oracle_all_routings():
    """gmm (interpret mode) == per-row int8 oracle for balanced, skewed,
    all-to-one, and all-empty routings, including tile-tail rows."""
    from medtsllm_tpu.ops.pallas.grouped_matmul import (
        gmm, gmm_metadata, gmm_visits, row_quant)
    rng = np.random.default_rng(0)
    E, K, N, bm, bn = 4, 256, 512, 128, 256
    rows = 384
    V = gmm_visits(rows, E, bm)
    R_pad = V * bm
    w = jnp.asarray(rng.integers(-127, 127, (E, K, N)), jnp.int8)
    ws = jnp.asarray(rng.standard_normal((E, N)).astype(np.float32) * 0.01)
    for sizes in ([96, 96, 96, 96], [300, 0, 50, 34],
                  [384, 0, 0, 0], [0, 0, 0, 0]):
        counts = jnp.asarray(sizes, jnp.int32)
        ve, valid, row_off = gmm_metadata(counts, bm, V)
        assert int(valid.sum()) == sum(-(-s // bm) for s in sizes)
        x = rng.standard_normal((R_pad, K)).astype(np.float32)
        xq, xs = row_quant(jnp.asarray(x))
        (y,) = gmm(xq, xs, (w,), (ws,), ve, valid,
                   block_m=bm, block_n=bn, interpret=True)
        exp = _gmm_oracle(np.asarray(xq), np.asarray(xs), np.asarray(w),
                          np.asarray(ws), np.asarray(counts),
                          np.asarray(row_off), bm)
        np.testing.assert_allclose(np.asarray(y), exp, rtol=1e-5, atol=1e-5)


def test_grouped_matmul_two_weights_share_activation_sweep():
    """The (gate, up) two-weight form equals two single-weight calls."""
    from medtsllm_tpu.ops.pallas.grouped_matmul import (
        gmm, gmm_metadata, gmm_visits, row_quant)
    rng = np.random.default_rng(1)
    E, K, N, bm, bn = 2, 128, 256, 128, 128
    V = gmm_visits(200, E, bm)
    counts = jnp.asarray([130, 70], jnp.int32)
    ve, valid, _ = gmm_metadata(counts, bm, V)
    x = rng.standard_normal((V * bm, K)).astype(np.float32)
    xq, xs = row_quant(jnp.asarray(x))
    wa = jnp.asarray(rng.integers(-127, 127, (E, K, N)), jnp.int8)
    wb = jnp.asarray(rng.integers(-127, 127, (E, K, N)), jnp.int8)
    sa = jnp.asarray(rng.uniform(1e-3, 1e-2, (E, N)), jnp.float32)
    sb = jnp.asarray(rng.uniform(1e-3, 1e-2, (E, N)), jnp.float32)
    ya, yb = gmm(xq, xs, (wa, wb), (sa, sb), ve, valid,
                 block_m=bm, block_n=bn, interpret=True)
    (ra,) = gmm(xq, xs, (wa,), (sa,), ve, valid,
                block_m=bm, block_n=bn, interpret=True)
    (rb,) = gmm(xq, xs, (wb,), (sb,), ve, valid,
                block_m=bm, block_n=bn, interpret=True)
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(ra))
    np.testing.assert_array_equal(np.asarray(yb), np.asarray(rb))


def test_grouped_matmul_metadata_and_block_n():
    from medtsllm_tpu.ops.pallas.grouped_matmul import (
        gmm_metadata, gmm_visits, pick_block_n)
    # visits bound: every m-tile plus one tail per group
    assert gmm_visits(384, 4, 128) == 3 + 4
    ve, valid, row_off = gmm_metadata(
        jnp.asarray([300, 0, 50, 34], jnp.int32), 128, 7)
    # 300 -> tiles 0..2, 0 -> none, 50 -> tile 3, 34 -> tile 4
    assert list(np.asarray(ve)[:5]) == [0, 0, 0, 2, 3]
    assert list(np.asarray(valid)) == [1, 1, 1, 1, 1, 0, 0]
    assert list(np.asarray(row_off)) == [0, 384, 384, 512]
    # invalid visits alias the last real expert's weight block
    assert list(np.asarray(ve)[5:]) == [3, 3]
    assert pick_block_n(5632) == 512 and pick_block_n(2048) == 512
    assert pick_block_n(100) == 0  # no 128-multiple divisor -> fallback


def test_grouped_matmul_fused_silu_epilogue():
    """fuse_silu: one activated output == silu(gate) * up computed from
    the two single-weight results (exact in f32)."""
    from medtsllm_tpu.ops.pallas.grouped_matmul import (
        gmm, gmm_metadata, gmm_visits, row_quant)
    rng = np.random.default_rng(2)
    E, K, N, bm, bn = 3, 128, 256, 128, 128
    V = gmm_visits(260, E, bm)
    counts = jnp.asarray([60, 0, 200], jnp.int32)
    ve, valid, _ = gmm_metadata(counts, bm, V)
    x = rng.standard_normal((V * bm, K)).astype(np.float32)
    xq, xs = row_quant(jnp.asarray(x))
    wg = jnp.asarray(rng.integers(-127, 127, (E, K, N)), jnp.int8)
    wu = jnp.asarray(rng.integers(-127, 127, (E, K, N)), jnp.int8)
    sg = jnp.asarray(rng.uniform(1e-3, 1e-2, (E, N)), jnp.float32)
    su = jnp.asarray(rng.uniform(1e-3, 1e-2, (E, N)), jnp.float32)
    (act,) = gmm(xq, xs, (wg, wu), (sg, su), ve, valid,
                 block_m=bm, block_n=bn, interpret=True, fuse_silu=True)
    g, u = gmm(xq, xs, (wg, wu), (sg, su), ve, valid,
               block_m=bm, block_n=bn, interpret=True)
    import jax
    exp = np.asarray(jax.nn.silu(g) * u)
    np.testing.assert_allclose(np.asarray(act), exp, rtol=1e-6, atol=1e-7)
