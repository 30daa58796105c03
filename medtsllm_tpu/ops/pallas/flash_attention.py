"""Flash attention (TPU Pallas) with jnp fallback.

TPU-native replacement for the reference's flash-attn dependency
(models/medtsllm.py:159, recommended.txt:4 — which its own dead-condition
bug never enables, medtsllm.py:160). Online-softmax blocked attention:
HBM->VMEM tiles feed the MXU per (q_block, k_block) step; running max/sum
and the output accumulator live in VMEM scratch, so the full [L, S] score
matrix never materializes in HBM.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

_DEF_BLOCK_Q = 256
_DEF_BLOCK_K = 512
_NEG_INF = -1e30
# Measured on v5e (tools/ab_flash.py, bf16, causal, best tuned blocks;
# xla = the _attention_reference einsum path XLA fuses itself):
#   L     d64-GQA   d128-MHA     winner
#   256   0.73x     0.70x        XLA
#   512   1.12x     1.57x        kernel (block_k=512)
#   544   0.78x     1.01x        XLA (partial k-tile waste at 544%256!=0)
#   1024  1.32x     1.87x        kernel
#   2048  1.58x     2.04x        kernel
#   4096  3.03x     2.60x        kernel
# -> kernel from 512 tokens when the (padded) kv length tiles cleanly
# into 256s; XLA otherwise. The 545-token flagship windows land on XLA
# by measurement, not by assumption.
_MIN_SEQ_FOR_KERNEL = int(os.environ.get("MEDTSLLM_FLASH_MIN_SEQ", 512))


def _use_pallas() -> bool:
    if os.environ.get("MEDTSLLM_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _attention_reference(q, k, v, causal: bool, sm_scale: float,
                         bias=None):
    """jnp fallback (and numerics oracle for the kernel).

    k/v may carry fewer heads than q (grouped-query attention): the
    group axis stays a free einsum dimension, so the K/V repeat is a
    broadcast inside the batched matmul — never materialized in HBM.
    ``bias`` [1, H, L, S] is added to the scores (t5 relative positions).
    """
    B, H, L, D = q.shape
    KV, S = k.shape[1], k.shape[2]
    G = H // KV
    # fold the group axis into the q rows: [B, KV, G*L, D] x
    # [B, KV, S, D]^T is a clean two-batch-dim dot_general for BOTH MHA
    # (G=1) and GQA. A size-1 free group dim in the einsum pushes XLA's
    # TPU backend off the batched-matmul emitter onto a dilated
    # convolution lowering (profiled: the MHA QK dot compiled to
    # %convolution-base-dilated); the fold keeps it on the MXU.
    q4 = q.reshape(B, KV, G * L, D)
    scores = (jnp.einsum("bkqd,bksd->bkqs", q4, k,
                         preferred_element_type=jnp.float32) * sm_scale
              ).reshape(B, KV, G, L, S)
    if bias is not None:
        scores = scores + bias.reshape(1, KV, G, L, S).astype(scores.dtype)
    if causal:
        # align diagonals at the END: query i attends keys <= i + (S - L)
        mask = jnp.tril(jnp.ones((L, S), dtype=bool), k=S - L)
        scores = jnp.where(mask, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkqs,bksd->bkqd",
                     probs.reshape(B, KV, G * L, S).astype(v.dtype), v)
    return out.reshape(B, H, L, D)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  sm_scale: float, causal: bool, block_q: int, block_k: int,
                  q_len: int, kv_len: int):
    from jax.experimental import pallas as pl

    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def compute():
        q = q_ref[0]  # [block_q, d]
        k = k_ref[0]  # [block_k, d]
        v = v_ref[0]  # [block_k, d]
        kv_partial = kv_len % block_k != 0  # static
        if kv_partial:
            # the last k/v tile reads past kv_len: those rows are garbage
            # (possibly NaN — 0 * NaN = NaN in the p@v contraction), so
            # zero them and mask their score columns
            valid = (ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, 1), 0)) < kv_len
            k = jnp.where(valid, k, 0)
            v = jnp.where(valid, v, 0)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # [bq, bk]
        if kv_partial:
            k_cols = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_cols < kv_len, s, _NEG_INF)

        if causal:
            offs = kv_len - q_len  # diagonal offset for self-attn suffix
            q_ids = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_ids = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_ids <= q_ids + offs, s, _NEG_INF)

        m_prev = m_scr[:]  # [bq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [bq, bk]
        l_new = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = m_new
        l_scr[:] = l_new

    if causal:
        # skip fully-masked k blocks above the diagonal
        offs = kv_len - q_len

        @pl.when(ki * block_k <= qi * block_q + (block_q - 1) + offs)
        def _():
            compute()
    else:
        compute()

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


def _flash_attention_pallas(q, k, v, causal: bool, sm_scale: float,
                            block_q: int, block_k: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, L, D = q.shape
    KV, S = k.shape[1], k.shape[2]
    G = H // KV  # grouped-query: G query heads share one kv head
    BH = B * H
    q3 = q.reshape(BH, L, D)
    k3 = k.reshape(B * KV, S, D)
    v3 = v.reshape(B * KV, S, D)

    block_q = min(block_q, L)
    block_k = min(block_k, S)
    grid = (BH, pl.cdiv(L, block_q), pl.cdiv(S, block_k))

    kernel = functools.partial(
        _flash_kernel, sm_scale=sm_scale, causal=causal,
        block_q=block_q, block_k=block_k, q_len=L, kv_len=S)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            # flat q index b = batch*H + h maps to kv row batch*KV + h//G,
            # which is exactly b // G — the kv tile is read once per group
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b // G, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b // G, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, L, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(q3, k3, v3)
    return out.reshape(B, H, L, D)


def flash_attention(q, k, v, causal: bool = True, sm_scale: float | None = None,
                    bias=None,
                    block_q: int = _DEF_BLOCK_Q, block_k: int = _DEF_BLOCK_K):
    """q [B,H,L,D], k/v [B,KV,S,D] -> [B,H,L,D] (KV may divide H: GQA;
    the group broadcast happens inside the kernel / batched matmul, the
    repeated K/V are never materialized).

    Uses the Pallas kernel on TPU when shapes tile cleanly; jnp fallback
    otherwise. ``bias`` [1, H, L, S] additive scores bias (t5 relative
    positions) always takes the jnp path — enc-dec sequences are short.
    Causal masking aligns the diagonal at the sequence end (query i
    attends keys <= i + S - L), matching decoder-only semantics with a
    prompt prefix.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    L, S, D = q.shape[2], k.shape[2], q.shape[-1]
    if bias is not None:
        return _attention_reference(q, k, v, causal, sm_scale, bias)

    # kernel only where it measured faster than XLA's fused attention
    # (table above): >=512 tokens AND the kv length tiles cleanly into
    # 256s — partial k-tiles (e.g. the 545-token flagship window) waste
    # more MXU work than the kernel saves
    if max(L, S) < _MIN_SEQ_FOR_KERNEL:
        return _attention_reference(q, k, v, causal, sm_scale)

    if S % 256 != 0:
        # causal self-attention at an unaligned length: pad q/k/v at the
        # END to the next 256 multiple when the extra FLOPs are small
        # (<=10%) — real query i still attends exactly keys <= i (padded
        # keys sit above every real diagonal), padded rows sliced off.
        # Near the crossover the pad doesn't pay (545 -> 768 = +93%
        # causal FLOPs vs the kernel's ~1.3x advantage), but at long
        # lengths it avoids BOTH the partial-tile waste and the XLA
        # path's materialized [L, S] score tensor (OOM risk at 16k+).
        pad = (-S) % 256
        if (_use_pallas() and causal and L == S and D % 64 == 0
                and pad <= S // 10):
            widths = ((0, 0), (0, 0), (0, pad), (0, 0))
            bk = 512 if (S + pad) % 512 == 0 else 256
            out = _flash_attention_pallas(
                jnp.pad(q, widths), jnp.pad(k, widths), jnp.pad(v, widths),
                causal, sm_scale, block_q, bk)
            return out[:, :, :L]
        return _attention_reference(q, k, v, causal, sm_scale)

    tile_ok = (D % 64 == 0) and (L % 8 == 0) and (S % 8 == 0)
    if _use_pallas() and tile_ok and L >= 128 and S >= 128:
        # keep k-tiles full: block_k 512 only when S tiles into 512s
        bk = block_k if S % block_k == 0 else 256
        return _flash_attention_pallas(q, k, v, causal, sm_scale,
                                       block_q, bk)
    return _attention_reference(q, k, v, causal, sm_scale)
