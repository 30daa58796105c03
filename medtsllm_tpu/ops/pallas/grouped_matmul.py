"""Grouped per-expert w8a8 matmul (TPU Pallas) — megablocks-style "gmm".

True dropless MoE at actual-routed-token cost. The reference accepts any
HF AutoModel backbone including Mixtral (/root/reference/models/
medtsllm.py:175); HF's MixtralSparseMoeBlock is exactly dropless. This
framework's static dispatch (transformer.MoEMLP) must pick a capacity:
the GShard factor 1.25 risks silent drops under routing skew, while the
exact-dropless setting (expert_capacity = 0) pads every expert's buffer
to ALL tokens — E/k x the useful FLOPs (4x at E=8, k=2). This kernel
removes that tradeoff: tokens are packed per expert into block_m-aligned
groups and the grid visits only the tiles a group actually fills, so
compute follows the ROUTED token count (plus < block_m rows of tail
padding per expert) with zero drops, whatever the skew.

Layout (aligned grouping): rows of ``xq`` are packed by expert with each
group's start tile-aligned — group e occupies rows [row_off[e],
row_off[e] + counts[e]) and the tail of its last tile is zeros. Because
groups are tile-aligned AND contiguous, occupied m-tiles are exactly
tiles 0..n_real-1 of the packed space: the grid's visit index IS the
m-tile index, and the only per-visit metadata is the expert id
(scalar-prefetched, megablocks-style) plus a valid flag. Invalid tail
visits map onto the unused tail tiles and store zeros (defined output
everywhere — keeps the NaN debugger quiet) without touching the MXU.

Grid is (N/bn, V) with visits innermost: consecutive visits of the same
expert reuse the resident [K, bn] weight block (Pallas skips the DMA
when a block index repeats), so total weight traffic is the E x K x N
minimum; activations re-stream once per N-tile sweep.

Numerics: the plain gmm matches transformer._act_quant_bmm exactly
(same s8 x s8 -> s32 MXU contraction, same f32 rescale order). The
PRODUCTION serving chain (fuse_silu + emit_quant, the MoEMLP default)
re-quantizes the SwiGLU output with per-(row, N-tile) scales — FINER
than the bmm path's per-row scale, so that chain agrees with
_act_quant_bmm to quantization noise, not bit-exactly (machine-checked
law oracle: tests/test_moe.py::test_moe_grouped_multi_tile_requant_law).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pick_block_n(n: int, target: int = 512) -> int:
    """Largest multiple-of-128 divisor of ``n`` that is <= target
    (0 when none exists — caller falls back to the padded bmm path)."""
    best = 0
    for bn in range(128, min(n, target) + 1, 128):
        if n % bn == 0:
            best = bn
    return best


def gmm_visits(n_rows: int, n_groups: int, block_m: int) -> int:
    """Static visit/tile bound: every m-tile plus one tail per group."""
    return -(-n_rows // block_m) + n_groups


def gmm_metadata(counts, block_m: int, n_visits: int):
    """Visit list for a grouped matmul over ``counts`` routed tokens.

    counts: [E] int32 routed tokens per expert (sum <= n_rows);
    n_visits: the static gmm_visits() bound.

    Returns (visit_e [V] int32, visit_valid [V] int32, row_off [E]
    int32). Visit v computes m-tile v of the packed row space against
    expert visit_e[v]'s weights; row_off[e] is the first packed row of
    group e (a block_m multiple). Invalid visits (v >= total occupied
    tiles) repeat the last real expert id so their weight block aliases
    the resident one.
    """
    i32 = jnp.int32
    E = counts.shape[0]
    V = n_visits
    n_tiles = (counts.astype(i32) + block_m - 1) // block_m  # [E]
    tile_off = jnp.concatenate(
        [jnp.zeros(1, i32), jnp.cumsum(n_tiles).astype(i32)])  # [E+1]
    # expert of tile t = number of groups whose tile range ends at or
    # before t (searchsorted over the cumulative tile offsets)
    t_idx = jnp.arange(V, dtype=i32)
    ve = jnp.searchsorted(tile_off[1:], t_idx, side="right").astype(i32)
    ve = jnp.minimum(ve, E - 1)  # in-bounds even for the all-empty edge
    n_real = tile_off[-1]
    valid = (t_idx < n_real).astype(i32)
    last_e = ve[jnp.maximum(n_real - 1, 0)]
    ve = jnp.where(valid == 1, ve, last_e)
    row_off = tile_off[:-1] * block_m  # [E]
    return ve, valid, row_off


def _make_kernel(n_weights, fuse_silu=False, emit_quant=False,
                 n_chunks=1, w_bits=8):
    from jax.experimental import pallas as pl

    def kernel(ve_ref, valid_ref, xq_ref, xs_ref, *rest):
        del ve_ref
        w_refs = rest[0:n_weights]
        s_refs = rest[n_weights:2 * n_weights]
        o_refs = rest[2 * n_weights:]
        v = pl.program_id(1)
        ok = valid_ref[v] == 1

        def dot_w(x_blk, w_blk, k0, ck):
            """x_blk[:, k0:k0+ck] @ w[k0:k0+ck] for int8 or split-halves
            packed int4 weights. The pack puts logical row r < K/2 in
            the HIGH nibble of packed row r and row K/2 + r in the LOW
            nibble (quant_matmul.pack4_split), so the contraction is two
            nibble-shifted dots — the unpacked [K, bn] block never
            materializes and weight DMA is HALF of w8."""
            if w_bits == 8:
                return jax.lax.dot_general(
                    x_blk[:, k0:k0 + ck], w_blk[k0:k0 + ck],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            half = x_blk.shape[1] // 2  # K/2 == packed rows
            dn = (((1,), (0,)), ((), ()))

            # Mosaic has no 8-bit shift lowering (quant_matmul.py:75) —
            # widen to i32, shift, narrow back to i8 for the MXU
            def hi_of(p):
                return jnp.right_shift(p.astype(jnp.int32),
                                       4).astype(jnp.int8)

            def lo_of(p):
                w32 = jnp.left_shift(p.astype(jnp.int32), 28)
                return jnp.right_shift(w32, 28).astype(jnp.int8)

            if k0 + ck <= half:  # chunk entirely in the hi-nibble half
                return jax.lax.dot_general(
                    x_blk[:, k0:k0 + ck], hi_of(w_blk[k0:k0 + ck]), dn,
                    preferred_element_type=jnp.int32)
            if k0 >= half:  # entirely in the lo-nibble half
                return jax.lax.dot_general(
                    x_blk[:, k0:k0 + ck],
                    lo_of(w_blk[k0 - half:k0 - half + ck]), dn,
                    preferred_element_type=jnp.int32)
            # full-K chunk (n_chunks == 0 path): hi + lo dots
            return (jax.lax.dot_general(
                        x_blk[:, :half], hi_of(w_blk), dn,
                        preferred_element_type=jnp.int32)
                    + jax.lax.dot_general(
                        x_blk[:, half:], lo_of(w_blk), dn,
                        preferred_element_type=jnp.int32))

        @pl.when(ok)
        def _():
            x = xq_ref[:]
            K = x.shape[1]
            res = []
            for w_ref, s_ref in zip(w_refs, s_refs):
                if n_chunks == 0:
                    acc = dot_w(x, w_ref[0], 0, K)
                    out = acc.astype(jnp.float32) * xs_ref[:]
                else:
                    # per-(row, k-chunk) activation scales (the fused
                    # requant layout emitted by emit_quant below): split
                    # the contraction, rescale each partial in f32
                    ck = K // n_chunks
                    out = None
                    for kb in range(n_chunks):
                        acc = dot_w(x, w_ref[0], kb * ck, ck)
                        part = acc.astype(jnp.float32) * xs_ref[kb, 0][:, None]
                        out = part if out is None else out + part
                res.append(out * s_ref[0])
            if fuse_silu:
                # SwiGLU epilogue in-VMEM: the (gate, up) pair never
                # round-trips through HBM — one activated output instead
                # of two f32 intermediates plus an elementwise pass
                t = jax.nn.silu(res[0]) * res[1]
                if emit_quant:
                    # fused requant: emit int8 rows + a per-(row, N-tile)
                    # scale — the downstream gmm consumes them with
                    # n_chunks rescaling; the [R, N] f32 activation never
                    # exists in HBM (r4's separate row_quant pass read
                    # and re-wrote it — the dominant residual traffic)
                    amax = jnp.max(jnp.abs(t), axis=1, keepdims=True)
                    s = jnp.maximum(amax / 127.0, 1e-10)
                    o_refs[0][:] = jnp.round(t / s).astype(o_refs[0].dtype)
                    o_refs[1][0, 0] = s[:, 0]
                else:
                    o_refs[0][:] = t.astype(o_refs[0].dtype)
            else:
                for o_ref, r in zip(o_refs, res):
                    o_ref[:] = r.astype(o_ref.dtype)

        @pl.when(jnp.logical_not(ok))
        def _():
            for o_ref in o_refs:
                if len(o_ref.shape) == 3:  # (1, 1, bm) scale block
                    o_ref[0, 0] = jnp.full((o_ref.shape[-1],), 1e-10,
                                           jnp.float32)
                else:
                    o_ref[:] = jnp.zeros_like(o_ref)

    return kernel


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                             "interpret", "out_dtype",
                                             "fuse_silu", "emit_quant",
                                             "w_bits"))
def gmm(xq, x_scale, weights, w_scales, visit_e, visit_valid,
        *, block_m: int = 128, block_n: int = 512, interpret: bool = False,
        out_dtype=jnp.float32, fuse_silu: bool = False,
        emit_quant: bool = False, w_bits: int = 8):
    """Grouped w8a8 matmul(s) over expert-packed rows.

    xq        [R_pad, K] int8, rows packed per gmm_metadata's layout
              (R_pad = V * block_m, V = len(visit_e))
    x_scale   per-row activation scale, one of
                [R_pad, 1] f32  — one scale per row, or
                [KB, 1, R_pad] f32 — per-(row, K-chunk) scales for
                K % KB == 0 chunks (the layout emit_quant produces):
                the contraction splits into KB chunks, each partial sum
                rescaled in f32 before accumulation
    weights   tuple of [E, K, N] int8 (1 = single matmul; 2 = gate+up
              sharing the activation sweep)
    w_scales  tuple of [E, N] f32 per-expert per-output-channel scales
    visit_*   from gmm_metadata (scalar-prefetched)
    fuse_silu requires exactly 2 weights (gate, up): returns the single
              activated array silu(out0) * out1 — the SwiGLU elementwise
              epilogue runs in VMEM, so the two f32 intermediates never
              round-trip through HBM (the dominant traffic at serving
              shapes: 2 x R x F x 4 bytes written + re-read per layer)
    emit_quant (requires fuse_silu) re-quantizes the activated tile
              in-VMEM and returns (int8 [R_pad, N], scales
              [N // block_n, 1, R_pad] f32) ready to feed a downstream
              gmm as (xq, x_scale) — the [R, N] f32 activation never
              touches HBM (r4's separate row_quant pass cost a full
              f32 read + int8 write of it). Scales are per-(row,
              N-tile): FINER than the bmm path's per-row scale, so
              numerics are within quantization noise of (not identical
              to) _act_quant_bmm.

    Returns a tuple of [R_pad, N] ``out_dtype`` arrays, one per weight
    (a single array under fuse_silu): out = (xq @ w[visit_e[row // bm]])
    .astype(f32) * x_scale * w_scale[e]; rows in unoccupied tail tiles
    are zero (scale outputs hold the 1e-10 floor there).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    weights = tuple(weights)
    w_scales = tuple(w_scales)
    nw = len(weights)
    R_pad, K = xq.shape
    E, K2, N = weights[0].shape
    V = visit_e.shape[0]
    assert w_bits in (4, 8)
    # w_bits=4: split-halves PACKED int4 weights [E, K/2, N] — the
    # kernel contracts hi/lo nibble halves directly (half the weight
    # DMA; the unpacked block never materializes)
    wk = K if w_bits == 8 else K // 2
    assert w_bits == 8 or K % 2 == 0, (K, "w_bits=4 needs even K")
    assert K2 == wk and R_pad == V * block_m, (xq.shape, V, block_m)
    assert N % block_n == 0, (N, block_n)
    assert not fuse_silu or nw == 2, "fuse_silu takes (gate, up)"
    assert not emit_quant or fuse_silu, "emit_quant rides the SwiGLU path"
    # the (1, 1, block_m) scale output block puts block_m in the lane
    # dim: TPU lowering needs it 128-divisible (bm=64 FAILED on-chip)
    assert not emit_quant or block_m % 128 == 0, (block_m, "emit_quant")
    n_chunks = 0  # 0 = per-row [R_pad, 1] scale layout
    if x_scale.ndim == 3:
        n_chunks = x_scale.shape[0]
        assert x_scale.shape == (n_chunks, 1, R_pad) and K % n_chunks == 0
        # packed chunks must not straddle the hi/lo nibble boundary
        assert w_bits == 8 or n_chunks % 2 == 0, (n_chunks, "w_bits=4")
    n_out = 1 if fuse_silu else nw
    for w, s in zip(weights, w_scales):
        assert w.shape == (E, wk, N) and s.shape == (E, N)

    def x_map(j, v, ve, valid):
        del j, ve, valid
        return (v, 0)

    def xs_map(j, v, ve, valid):
        del j, ve, valid
        return (0, 0, v)

    def w_map(j, v, ve, valid):
        del valid
        return (ve[v], 0, j)

    def ws_map(j, v, ve, valid):
        del valid
        return (ve[v], 0, j)

    def o_map(j, v, ve, valid):
        del ve, valid
        return (v, j)

    def os_map(j, v, ve, valid):
        del ve, valid
        return (j, 0, v)

    xs_spec = (pl.BlockSpec((block_m, 1), x_map) if n_chunks == 0
               else pl.BlockSpec((n_chunks, 1, block_m), xs_map))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N // block_n, V),
        in_specs=[
            pl.BlockSpec((block_m, K), x_map),
            xs_spec,
            *[pl.BlockSpec((1, wk, block_n), w_map) for _ in range(nw)],
            # scales ride as [E, 1, N]: a (1, block_n) block of an [E, N]
            # array has second-to-last dim 1 (not 8-divisible, != E) and
            # fails the TPU lowering's tiling rule; the singleton middle
            # axis makes the last-two block dims (1, block_n) legal
            *[pl.BlockSpec((1, 1, block_n), ws_map) for _ in range(nw)],
        ],
        out_specs=([pl.BlockSpec((block_m, block_n), o_map),
                    pl.BlockSpec((1, 1, block_m), os_map)] if emit_quant
                   else [pl.BlockSpec((block_m, block_n), o_map)
                         for _ in range(n_out)]),
    )

    out_shape = ([jax.ShapeDtypeStruct((R_pad, N), jnp.int8),
                  jax.ShapeDtypeStruct((N // block_n, 1, R_pad),
                                       jnp.float32)] if emit_quant
                 else [jax.ShapeDtypeStruct((R_pad, N), out_dtype)
                       for _ in range(n_out)])
    out_bytes = (R_pad * N + (N // block_n) * R_pad * 4 if emit_quant
                 else n_out * R_pad * N * 4)
    outs = pl.pallas_call(
        _make_kernel(nw, fuse_silu=fuse_silu, emit_quant=emit_quant,
                     n_chunks=n_chunks, w_bits=w_bits),
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * R_pad * K * N * nw,
            bytes_accessed=(R_pad * K * (N // block_n)
                            + nw * E * wk * N + out_bytes),
            transcendentals=R_pad * N if fuse_silu else 0),
        interpret=interpret,
    )(visit_e, visit_valid, xq, x_scale.astype(jnp.float32),
      *weights, *[s[:, None, :] for s in w_scales])
    return tuple(outs)


def row_quant(x):
    """Per-row symmetric int8 activation quantization (the exact
    _act_quant_* recipe: amax/127 scale, round, int8)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-10)
    xq = jnp.round(x / scale).astype(jnp.int8)
    return xq, scale.astype(jnp.float32)
