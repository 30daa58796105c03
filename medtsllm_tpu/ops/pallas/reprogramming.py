"""Fused reprogramming cross-attention kernel (TPU Pallas).

The MedTsLLM reprogramming layer (reference models/medtsllm.py:581-591)
attends L patch queries into a shared S-token compressed text basis:

    scores = einsum("blhe,she->bhls", q, k); A = softmax(scale*scores)
    out    = einsum("bhls,she->blhe", A, v)

The key/value basis is SHARED across the batch — the kernel keeps one
(k, v) tile resident in VMEM and streams query blocks over it, fusing
scores + softmax + value mix in one pass (no [B,H,L,S] score tensor in
HBM). Falls back to the jnp einsum form off-TPU / on non-tiling shapes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .flash_attention import _use_pallas


def _reference(q, k, v, scale):
    scores = jnp.einsum("blhe,she->bhls", q, k)
    A = jax.nn.softmax(scale * scores, axis=-1)
    return jnp.einsum("bhls,she->blhe", A, v)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # q: [1, L, E] (one (batch, head) slice), k/v: [1, S, E] per-head shared
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def reprogramming_attention(q, k, v, scale: float | None = None):
    """q [B, L, H, E], k/v [S, H, E] -> [B, L, H, E]."""
    B, L, H, E = q.shape
    S = k.shape[0]
    if scale is None:
        scale = 1.0 / math.sqrt(E)

    tile_ok = (E % 128 == 0) and (L % 8 == 0) and (S % 8 == 0)
    # per-program VMEM: the f32 [L, S] scores + q/o [L, E] + the shared
    # k/v [S, E] pair; shapes beyond the budget fall back to the einsum
    # (Mosaic would otherwise fail allocation at compile time)
    vmem = (4 * L * S + 2 * q.dtype.itemsize * L * E
            + 2 * k.dtype.itemsize * S * E)
    if not (_use_pallas() and tile_ok and S >= 128
            and vmem < 13 * 2 ** 20):
        return _reference(q, k, v, scale)

    from jax.experimental import pallas as pl

    # fold (H, B) into the grid HEAD-MAJOR: program i handles head
    # i // B, so the shared k/v block index is constant for B consecutive
    # programs and Pallas's revisit elision keeps the basis resident in
    # VMEM — one DMA per head, not one per (batch, head)
    qh = jnp.transpose(q, (2, 0, 1, 3)).reshape(H * B, L, E)
    kh = jnp.transpose(k, (1, 0, 2))  # [H, S, E]
    vh = jnp.transpose(v, (1, 0, 2))

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(H * B,),
        in_specs=[
            pl.BlockSpec((1, L, E), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, S, E), lambda i, B=B: (i // B, 0, 0)),
            pl.BlockSpec((1, S, E), lambda i, B=B: (i // B, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, E), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((H * B, L, E), q.dtype),
    )(qh, kh, vh)
    return jnp.transpose(out.reshape(H, B, L, E), (1, 2, 0, 3))
