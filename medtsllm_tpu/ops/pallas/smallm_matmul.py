"""Small-M w8a8 matmul (TPU Pallas): weight-streaming serving kernel.

MEASURED NEGATIVE RESULT — opt-in only (MEDTSLLM_SMALLM_KERNEL=1).

This kernel was built against a diagnosis that turned out to be a
measurement artifact: the pre-2026-08-19 probe (tools/ab_smallbatch.py)
timed a loop-INVARIANT fori_loop body, XLA's LICM hoisted the matmul
out of the loop, and the "per-matmul" time was really the tunnel's
~30 ms dispatch floor divided by the loop count — yielding a bogus
"~60 GB/s, 7x off the weight-read bound" story at M = 448 (the batch-4
serving shape; the reference deploys at batch 16,
/root/reference/configs/datasets/bidmc.toml:18-24).

A hoist-proof carry-chained re-measurement (weights cycled through a
16-slice HBM bank, every output feeding the next input) shows XLA's
s8xs8 dot at M=448 is already at 68-76% of the v5e's 394 TOP/s int8
compute bound — and M=448 is ABOVE the int8 roofline ridge
(M* = 394e12 / (2*819e9) ~ 240), so the shape is compute-bound and
there is no "weight-streaming" win to be had:

    4096x4096   xla  56.0 us   (bound 38.2)   kernel  74.9 us (0.75x)
    4096x11008  xla 135.8 us   (bound 102.5)  kernel 192.9 us (0.70x)

The kernel keeps the activations VMEM-resident and streams the weight
in [K, block_n] column blocks (double-buffered, fused dequant epilogue,
no s32 HBM round-trip) — numerics match transformer._act_quant_matmul
exactly (same integer matmul, same f32 rescale) — but Mosaic's schedule
loses ~25-30% to XLA's, so it stays off the hot path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


_VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom of the ~16 MB/core


def _make_kernel(n_blocks_hint: int):
    from jax.experimental import pallas as pl  # noqa: F401

    def kernel(xq_ref, wq_ref, xs_ref, ws_ref, o_ref):
        acc = jax.lax.dot_general(
            xq_ref[:], wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[:] = (acc.astype(jnp.float32) * xs_ref[:]
                    * ws_ref[:]).astype(o_ref.dtype)

    return kernel


def w8a8_smallm_matmul_pallas(xq: jnp.ndarray, wq: jnp.ndarray,
                              x_scale: jnp.ndarray, w_scale: jnp.ndarray,
                              out_dtype=jnp.float32, block_n: int = 512,
                              interpret: bool = False) -> jnp.ndarray:
    """xq [M, K] int8, wq [K, N] int8, x_scale [M, 1] f32, w_scale [N]
    f32 -> [M, N] out_dtype. M is padded to a sublane multiple here;
    N % block_n == 0 required."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = xq.shape
    K2, N = wq.shape
    assert K == K2, (K, K2)
    assert N % block_n == 0, (N, block_n)
    pad_m = (-M) % 32  # s8 sublane tile
    if pad_m:
        xq = jnp.pad(xq, ((0, pad_m), (0, 0)))
        x_scale = jnp.pad(x_scale, ((0, pad_m), (0, 0)))
    Mp = M + pad_m

    out = pl.pallas_call(
        _make_kernel(N // block_n),
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda n: (0, 0)),   # resident
            pl.BlockSpec((K, block_n), lambda n: (0, n)),
            pl.BlockSpec((Mp, 1), lambda n: (0, 0)),
            pl.BlockSpec((1, block_n), lambda n: (0, n)),
        ],
        out_specs=pl.BlockSpec((Mp, block_n), lambda n: (0, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(xq, wq, x_scale.astype(jnp.float32),
      w_scale.reshape(1, N).astype(jnp.float32))
    return out[:M] if pad_m else out


def smallm_blocks(M: int, K: int, N: int) -> int | None:
    """Largest block_n (<= 512) whose VMEM residency fits: resident
    activations + double-buffered weight and output blocks. None when no
    block divides N or M is too large to keep resident."""
    Mp = M + ((-M) % 32)
    for bn in (512, 256, 128):
        if N % bn:
            continue
        # Pallas double-buffers EVERY block — including the resident
        # activations whose index never changes (measured: a Mosaic
        # scoped-vmem OOM at M=1792 requested exactly 2x each block)
        need = (2 * Mp * K                  # resident int8 activations
                + 2 * K * bn                # double-buffered weight block
                + 2 * Mp * bn * 4           # double-buffered f32 out block
                + 2 * (Mp * 4 + bn * 4))    # scales
        if need <= _VMEM_BUDGET:
            return bn
    return None


def use_smallm_kernel() -> bool:
    """Default OFF: the kernel measures 0.70-0.75x XLA at the serving
    shapes it targets (see module docstring). MEDTSLLM_SMALLM_KERNEL=1
    opts in for A/Bs (tools/ab_w8a8_small.py)."""
    return os.environ.get("MEDTSLLM_SMALLM_KERNEL", "0") == "1"


_M_MAX = 1024  # beyond this the resident-activation design stops paying


def smallm_supported(M: int, K: int, N: int) -> bool:
    if not use_smallm_kernel():
        return False
    if jax.default_backend() != "tpu":
        return False
    return M <= _M_MAX and K % 128 == 0 and smallm_blocks(M, K, N) is not None
