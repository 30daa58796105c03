"""w4a8 quantized matmul (TPU Pallas): int4 weights unpacked in VMEM.

TPU-native replacement for the reference's bitsandbytes 4-bit path
(reference models/medtsllm.py:162-173). The XLA int4 path
(``QuantDense.unpack4`` + dot) materializes the unpacked int8 weight
tensor in HBM every call — packed read (0.5x) + unpacked write (1x) +
matmul read (1x) = 2.5x the HBM traffic of plain int8, which is why
weight-only int4 *loses* to int8 despite carrying half the bits. This
kernel streams the packed nibbles HBM->VMEM once and unpacks in VMEM
right before the MXU, so the HBM cost is the true 0.5x.

Measured on v5e (tools/ab_w4a8.py): numerics agree exactly with the XLA
path at every shape; XLA's own unpack-then-dot is as fast or faster at
production sizes (it pipelines the nibble shifts against the MXU), so
the kernel is opt-in — see ``use_w4a8_kernel``.

Layout: ``pack4_split`` stores logical weight rows [0, K/2) in the high
nibble and rows [K/2, K) in the low nibble of a [K/2, N] int8 tensor.
Unpacking is then two arithmetic shifts + a *contiguous* concat — the
kernel never interleaves. The matmul splits with it:

    y = x[:, :K/2] @ hi + x[:, K/2:] @ lo

two s8 x s8 -> s32 MXU contractions per (m, n, k) grid step, accumulated
in VMEM scratch, rescaled once at the last k step by (per-token
activation scale) x (per-output-channel weight scale).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def pack4_split(q: np.ndarray) -> np.ndarray:
    """[K, N] int8 in [-8, 7] -> [ceil(K/2), N] packed (split-halves).

    Row p holds logical row p in the high nibble and logical row
    p + ceil(K/2) in the low nibble (last low row zero-padded if K odd).
    """
    xp = jnp if isinstance(q, jnp.ndarray) else np
    K = q.shape[0]
    half = (K + 1) // 2
    if K != 2 * half:
        q = xp.concatenate(
            [q, xp.zeros((2 * half - K, q.shape[1]), q.dtype)])
    hi, lo = q[:half], q[half:]
    return ((hi.astype(xp.int16) << 4) | (lo.astype(xp.int16) & 0xF)).astype(
        xp.int8)


def unpack4_split(packed: jnp.ndarray, n_in: int) -> jnp.ndarray:
    """Inverse of pack4_split, for the XLA fallback path: contiguous
    concat (no interleave)."""
    hi = jnp.right_shift(packed, 4)  # arithmetic shift keeps sign
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    return jnp.concatenate([hi, lo], axis=0)[:n_in]


def _make_kernel():
    from jax.experimental import pallas as pl

    def kernel(xlo_ref, xhi_ref, wp_ref, xs_ref, ws_ref, o_ref, acc_scr):
        ki = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ki == 0)
        def _init():
            acc_scr[:] = jnp.zeros_like(acc_scr)

        # Mosaic has no 8-bit shift lowering (arith.shrsi fails to
        # legalize) — widen to i32, shift, narrow. Sign-extension of the
        # low nibble: <<28 then arithmetic >>28.
        wp = wp_ref[:].astype(jnp.int32)  # [bk2, bn] packed
        hi = jnp.right_shift(wp, 4).astype(jnp.int8)
        lo = jnp.right_shift(jnp.left_shift(wp, 28), 28).astype(jnp.int8)
        acc_scr[:] += jax.lax.dot_general(
            xlo_ref[:], hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc_scr[:] += jax.lax.dot_general(
            xhi_ref[:], lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(ki == nk - 1)
        def _finish():
            o_ref[:] = (acc_scr[:].astype(jnp.float32)
                        * xs_ref[:] * ws_ref[:]).astype(o_ref.dtype)

    return kernel


def w4a8_matmul_pallas(xq: jnp.ndarray, packed: jnp.ndarray,
                       x_scale: jnp.ndarray, w_scale: jnp.ndarray,
                       out_dtype=jnp.bfloat16,
                       block_m: int = 1024, block_n: int = 512,
                       block_k2: int = 128, interpret: bool = False
                       ) -> jnp.ndarray:
    """xq [M, K] int8, packed [K/2, N] int8 (pack4_split), x_scale [M, 1]
    f32, w_scale [N] f32 -> [M, N] out_dtype.

    Requires K even, K/2 % block_k2 == 0, N % block_n == 0; M is padded
    to block_m here (padded rows sliced off).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = xq.shape
    K2, N = packed.shape
    assert K == 2 * K2, (K, K2)
    block_m = min(block_m, max(128, 1 << (M - 1).bit_length()))
    pad_m = (-M) % block_m
    if pad_m:
        xq = jnp.pad(xq, ((0, pad_m), (0, 0)))
        x_scale = jnp.pad(x_scale, ((0, pad_m), (0, 0)))
    Mp = M + pad_m

    x_lo, x_hi = xq[:, :K2], xq[:, K2:]
    ws2 = w_scale.reshape(1, N).astype(jnp.float32)
    xs2 = x_scale.astype(jnp.float32)

    grid = (Mp // block_m, N // block_n, K2 // block_k2)
    out = pl.pallas_call(
        _make_kernel(),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k2), lambda m, n, k: (m, k)),
            pl.BlockSpec((block_m, block_k2), lambda m, n, k: (m, k)),
            pl.BlockSpec((block_k2, block_n), lambda m, n, k: (k, n)),
            pl.BlockSpec((block_m, 1), lambda m, n, k: (m, 0)),
            pl.BlockSpec((1, block_n), lambda m, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x_lo, x_hi, packed, xs2, ws2)
    return out[:M] if pad_m else out


def _pick_block(dim: int, candidates=(512, 256, 128)) -> int | None:
    for b in candidates:
        if dim % b == 0:
            return b
    return None


def w4a8_blocks(K: int, N: int) -> tuple[int, int] | None:
    """(block_n, block_k2) tiling for the kernel, or None if the shapes
    don't tile (llama-7B: N=11008 -> block_n 256, K2=5504 -> block_k2 128)."""
    if K % 2:
        return None
    bn = _pick_block(N)
    bk2 = _pick_block(K // 2, (512, 256, 128))
    if bn is None or bk2 is None:
        return None
    return bn, bk2


def use_w4a8_kernel() -> bool:
    """Opt-in (MEDTSLLM_W4A8_KERNEL=1): the measured A/B on v5e
    (tools/ab_w4a8.py, 2026-08-16) has the kernel tying XLA's
    unpack-then-dot at M<=1024 (1.00-1.07x on qkv) and losing at large M
    (0.78-0.90x at M=7680) — XLA pipelines the nibble unpack against the
    MXU better than this kernel's in-step unpack. Numerics are exact
    (same integer matmul) either way; the XLA path is the default."""
    if os.environ.get("MEDTSLLM_DISABLE_PALLAS"):
        return False
    if not os.environ.get("MEDTSLLM_W4A8_KERNEL"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def w4a8_matmul_reference(xq, packed, x_scale, w_scale,
                          out_dtype=jnp.bfloat16):
    """XLA oracle with identical semantics (materializes the unpacked
    weight — numerics check only)."""
    K = xq.shape[1]
    w = unpack4_split(packed, K)
    acc = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * x_scale
            * w_scale.reshape(1, -1)).astype(out_dtype)


def w4a8_matmul(xq, packed, x_scale, w_scale, out_dtype=jnp.bfloat16):
    """Dispatch: Pallas kernel on TPU when shapes tile, XLA otherwise."""
    M, K = xq.shape
    N = packed.shape[1]
    blocks = w4a8_blocks(K, N)
    if use_w4a8_kernel() and blocks is not None:
        bn, bk2 = blocks
        return w4a8_matmul_pallas(xq, packed, x_scale, w_scale, out_dtype,
                                  block_n=bn, block_k2=bk2)
    return w4a8_matmul_reference(xq, packed, x_scale, w_scale, out_dtype)
