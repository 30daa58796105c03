"""Fused RoPE + prefix-KV + attention (TPU Pallas) for the llama path.

Profiling the 7B batch-80 int8 serving step showed attention costing
~82 ms of a ~470 ms step — not in FLOPs (~0.7 TFLOP) but in HBM
materializations XLA refuses to elide: the rotary rotation is cloned
into kLoop fusions that absorb the [B,L,H,D]->[B,H,L,D] head transpose
as strided reads, the half-split (rotate-half) slices force half-lane
(D/2=64) padded layouts, and the f32 score tensor plus prefix-KV
concat round-trip HBM every layer. This kernel does the whole block —
rotate q/k, append the cached prefix K/V, scores, causal+prefix mask,
softmax, and the value contraction — in VMEM, reading q/k/v in the
contiguous projection layout [B, L, H, D] and writing the attention
output in the same layout (o_proj consumes it directly; the transposes
disappear). 16 heads per program keep the grid at B * H/16 so per-step
grid overhead is negligible.

Mirrors the intent of the reference's flash-attn dependency
(/root/reference/recommended.txt:4, models/medtsllm.py:159) on the
serving shapes this framework actually runs (~100-200 tokens), where
the generic flash kernel (ops/pallas/flash_attention.py) measured
slower than XLA. Forward-only: a custom_vjp recomputes the XLA
reference graph for the backward (the frozen-backbone train step's
adjoint is unchanged, gradient-identical by construction).

Gating (see fused_rope_attention_supported): llama-style MHA,
head_dim 128, H % 16 == 0, L % 16 == 0, self-attention without bias.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

_HEAD_BLOCK = 16
_NEG_INF = -1e30


from .flash_attention import _use_pallas  # noqa: E402 (one shared gate)


def rope_tables(positions, head_dim: int, theta: float):
    """cos/sin [L, D/2] in f32 (position * inv_freq must stay f32)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2,
                                           dtype=jnp.float32) / head_dim))
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.cos(angles), jnp.sin(angles)


def _rope(x, cos, sin):
    """Half-split (llama) rotation of [..., L, H, D] with cos/sin
    [L, 1, D/2] broadcast over heads; runs at x.dtype."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                           axis=-1)


def _kernel(xq_ref, xk_ref, xv_ref, cos_ref, sin_ref, pk_ref, pv_ref,
            o_ref, *, sm_scale: float, prefix_len: int, hb: int):
    """One (batch, head-block) program: rope q/k, attend over
    [prefix | region] with end-aligned causal masking, write [L, HB, D].

    Refs: xq/xk/xv [1, L, HB, D]; cos/sin [L, half]; pk/pv
    [1, HB, Pp, D] (Pp = prefix_len padded up to a sublane multiple —
    the pad columns are masked). prefix_len == 0 skips the prefix
    entirely (pk/pv are 1-wide dummies).
    """
    L, _, D = xq_ref.shape[1], xq_ref.shape[2], xq_ref.shape[3]
    cos = cos_ref[...][:, None, :].astype(xq_ref.dtype)  # [L, 1, half]
    sin = sin_ref[...][:, None, :].astype(xq_ref.dtype)
    q = _rope(xq_ref[0], cos, sin)  # [L, HB, D]
    k = _rope(xk_ref[0], cos, sin)
    v = xv_ref[0]

    pp = pk_ref.shape[2] if prefix_len else 0
    causal = (jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
              <= jax.lax.broadcasted_iota(jnp.int32, (L, L), 0))
    if prefix_len:
        pcols = jax.lax.broadcasted_iota(jnp.int32, (L, pp), 1) < prefix_len

    for h in range(hb):
        qh = q[:, h, :]  # [L, D]
        s_reg = jax.lax.dot_general(
            qh, k[:, h, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # [L, L]
        s_reg = jnp.where(causal, s_reg, _NEG_INF)
        if prefix_len:
            s_pre = jax.lax.dot_general(
                qh, pk_ref[0, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale  # [L, Pp]
            s_pre = jnp.where(pcols, s_pre, _NEG_INF)
            s = jnp.concatenate([s_pre, s_reg], axis=1)  # [L, Pp+L]
        else:
            s = s_reg
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
        pb = p.astype(v.dtype)
        o = jax.lax.dot_general(
            pb[:, pp:], v[:, h, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if prefix_len:
            o = o + jax.lax.dot_general(
                pb[:, :pp], pv_ref[0, h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0, :, h, :] = (o / l).astype(o_ref.dtype)


def _reference(xq, xk, xv, cos, sin, pk, pv, sm_scale):
    """XLA oracle (and custom_vjp backward graph): same math through
    the existing einsum/softmax path."""
    B, L, H, D = xq.shape
    c = cos[None, :, None, :].astype(xq.dtype)
    s = sin[None, :, None, :].astype(xq.dtype)
    q = _rope(xq, c, s).transpose(0, 2, 1, 3)  # [B, H, L, D]
    k = _rope(xk, c, s).transpose(0, 2, 1, 3)
    v = xv.transpose(0, 2, 1, 3)
    if pk is not None:
        pk = jnp.broadcast_to(pk.astype(k.dtype), (B,) + pk.shape[1:])
        pv = jnp.broadcast_to(pv.astype(v.dtype), (B,) + pv.shape[1:])
        k = jnp.concatenate([pk, k], axis=2)
        v = jnp.concatenate([pv, v], axis=2)
    S = k.shape[2]
    scores = jnp.einsum("bhqd,bhsd->bhqs", q, k,
                        preferred_element_type=jnp.float32) * sm_scale
    mask = jnp.tril(jnp.ones((L, S), dtype=bool), k=S - L)
    scores = jnp.where(mask, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqs,bhsd->bhqd", probs.astype(v.dtype), v)
    return out.transpose(0, 2, 1, 3)  # [B, L, H, D]


def _pallas_forward(xq, xk, xv, cos, sin, pk, pv, sm_scale,
                    interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, H, D = xq.shape
    hb = _HEAD_BLOCK
    half = D // 2
    if pk is not None:
        P = pk.shape[2]
        pp = -(-P // 16) * 16  # pad the prefix length to a sublane tile
        widths = ((0, 0), (0, 0), (0, pp - P), (0, 0))
        pk = jnp.pad(pk, widths)
        pv = jnp.pad(pv, widths)
        pb = pk.shape[0]  # 1 (shared prefix) or B
    else:
        P, pp, pb = 0, 0, 1
        pk = jnp.zeros((1, H, 16, D), xq.dtype)
        pv = jnp.zeros((1, H, 16, D), xq.dtype)

    grid = (B, H // hb)
    kernel = functools.partial(_kernel, sm_scale=sm_scale, prefix_len=P,
                               hb=hb)
    qspec = pl.BlockSpec((1, L, hb, D), lambda b, h: (b, 0, h, 0))
    pspec = pl.BlockSpec((1, hb, pk.shape[2], D),
                         lambda b, h, pb=pb: (0 if pb == 1 else b, h, 0, 0))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            qspec, qspec, qspec,
            pl.BlockSpec((L, half), lambda b, h: (0, 0)),
            pl.BlockSpec((L, half), lambda b, h: (0, 0)),
            pspec, pspec,
        ],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, L, H, D), xq.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(xq, xk, xv, cos, sin, pk, pv)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_rope_attention(xq, xk, xv, cos, sin, pk, pv, sm_scale):
    """q/k/v [B, L, H, D] (projection layout, pre-rotary), cos/sin
    [L, D/2], optional prefix K/V [1 or B, H, P, D] (rotary already
    applied) -> [B, L, H, D]. Fused Pallas on TPU, XLA oracle off it."""
    if _use_pallas():
        return _pallas_forward(xq, xk, xv, cos, sin, pk, pv, sm_scale)
    return _reference(xq, xk, xv, cos, sin, pk, pv, sm_scale)


def _fra_fwd(xq, xk, xv, cos, sin, pk, pv, sm_scale):
    return (fused_rope_attention(xq, xk, xv, cos, sin, pk, pv, sm_scale),
            (xq, xk, xv, cos, sin, pk, pv))


def _fra_bwd(sm_scale, res, g):
    xq, xk, xv, cos, sin, pk, pv = res
    # adjoint through the XLA reference graph (the prefix cache is a
    # constant of the step: zero cotangent, matching the KV-cache train
    # path's semantics in models/medtsllm.py::train_prefix_cache_safe)
    def f(xq_, xk_, xv_):
        return _reference(xq_, xk_, xv_, cos, sin, pk, pv, sm_scale)
    _, vjp = jax.vjp(f, xq, xk, xv)
    dxq, dxk, dxv = vjp(g)
    # cos/sin derive from integer positions today, so a zero cotangent is
    # exact; if rope tables ever become trainable (learned rope scaling),
    # this fused path would silently zero that gradient — keep it gated
    # off for such variants
    zc = jnp.zeros_like(cos)
    zpk = None if pk is None else jnp.zeros_like(pk)
    zpv = None if pv is None else jnp.zeros_like(pv)
    return dxq, dxk, dxv, zc, jnp.zeros_like(sin), zpk, zpv


fused_rope_attention.defvjp(_fra_fwd, _fra_bwd)


def fused_rope_attention_supported(style: str, H: int, KV: int, D: int,
                                   L: int, has_bias: bool,
                                   causal: bool) -> bool:
    """Static gate for the fused path: llama-style causal MHA at
    head_dim 128 with head count and region length tiling into the
    16-wide blocks the kernel uses.

    OFF by default (opt in with MEDTSLLM_FUSED_ROPE_ATTN=1): measured
    on the v5e at the 7B serving shape (B=80, L=112, H=32, D=128,
    P=48, bf16), every kernel formulation LOSES to XLA's batched
    attention — per-head unrolled dots 0.81x, head-major in-kernel
    transpose 0.73x, pre-transposed per-head blocks 0.89x, batched
    dot_general over heads 0.95x (2026-08-17, /tmp/ab_rope{2,3,4}.py
    protocol). The workload is 2560 tiny [112,128]x[128,160]
    attention problems; XLA pipelines them as one batched matmul
    while a Pallas grid pays per-program overhead it cannot amortize.
    End-to-end the kernel is +1% (155.1 vs 153.4 win/s) — within
    tunnel variance. The measured serving win came from the XLA-path
    layout fixes instead (rotate-before-transpose, early compute-dtype
    cast, GQA einsum fold in flash_attention's reference path)."""
    if os.environ.get("MEDTSLLM_FUSED_ROPE_ATTN") != "1":
        return False
    return (style == "llama" and causal and not has_bias and KV == H
            and D == 128 and H % _HEAD_BLOCK == 0 and L % 16 == 0
            and L >= 16)
