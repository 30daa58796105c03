"""Fused selective-SSM scan (TPU Pallas) — the Mamba recurrence.

The TPU-native analogue of mamba-ssm's fused CUDA selective_scan kernel
(the reference lists mamba-ssm/causal-conv1d as optional deps,
recommended.txt:6-7). The XLA path must materialize the discretized
[B, L, N, E] tensors in HBM (dA = exp(dt*A), dBx = dt*x*B, the scan
prefixes, then the C contraction) — measured 63-103 ms per 130M-shape
layer on v5e, entirely HBM-bound. This kernel streams only the [B, L, E]
and [B, L, N] operands and keeps every [*, N, E] intermediate in VMEM
registers, so HBM traffic drops ~50x: it reads dt/x/B/C once, writes y
once, and the recurrent state h [B, N, bE] lives in VMEM scratch across
sequence chunks.

Grid: (E/block_e, L/chunk); the channel axis is embarrassingly parallel
(diagonal A), the chunk axis is "arbitrary" (sequential) and carries h.
Inside a chunk the recurrence unrolls per token with [B, N, block_e]
vector ops — 48 x 16 x 256 elements per op keeps all 8x128 VPU lanes
busy.

The backward is fused too (_ssm_bwd_kernel): the adjoint recurrence is
the same affine scan reversed, so the forward saves chunk-start boundary
states and the backward recomputes within-chunk states and accumulates
all six input gradients in VMEM (7.9x the XLA adjoint, BASELINE.md).
Off-TPU the XLA reference graph is used for both directions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_CHUNK = 16   # c16/e128 measured best (28.9ms vs XLA 106.8ms per
_BLOCK_E = 128  # 130M-shape layer); c16/e256 exceeds the 16MB VMEM scope


from .flash_attention import _use_pallas  # noqa: E402 (one shared gate)


def selective_scan(dA: jnp.ndarray, dBx: jnp.ndarray,
                   chunk: int = 64, h0: jnp.ndarray | None = None) -> jnp.ndarray:
    """h_t = dA_t * h_{t-1} + dBx_t over axis 1; h_0 = `h0` (or 0).

    dA, dBx: [B, L, N, E] -> h [B, L, N, E] in f32; h0 [B, N, E]. Chunked
    lax.scan-of-associative-scan; used by the reference/backward path
    and off-TPU.
    """
    B, L, N, E = dA.shape
    f32 = jnp.float32
    pad = (-L) % chunk
    if pad:
        dA = jnp.concatenate(
            [dA, jnp.ones((B, pad, N, E), dA.dtype)], axis=1)
        dBx = jnp.concatenate(
            [dBx, jnp.zeros((B, pad, N, E), dBx.dtype)], axis=1)
    C = (L + pad) // chunk
    dA = dA.astype(f32).reshape(B, C, chunk, N, E).transpose(1, 0, 2, 3, 4)
    dBx = dBx.astype(f32).reshape(B, C, chunk, N, E).transpose(1, 0, 2, 3, 4)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    def step(h0_, ab):
        a, b = ab
        a_cum, b_cum = jax.lax.associative_scan(combine, (a, b), axis=1)
        h = a_cum * h0_[:, None] + b_cum
        return h[:, -1], h

    init = (jnp.zeros((B, N, E), f32) if h0 is None
            else jnp.broadcast_to(h0.astype(f32), (B, N, E)))
    _, hs = jax.lax.scan(step, init, (dA, dBx))
    hs = hs.transpose(1, 0, 2, 3, 4).reshape(B, C * chunk, N, E)
    return hs[:, :L]


def _ssm_reference(dt, A_T, Bs, Cs, xs, D, h0=None):
    """y = C . h + D*x with h the dt-discretized recurrence (all f32).

    dt, xs [B, L, E]; A_T [N, E]; Bs, Cs [B, L, N]; D [E] -> y [B, L, E].
    """
    dA = jnp.exp(dt[:, :, None, :] * A_T[None, None])
    dBx = (dt * xs)[:, :, None, :] * Bs[..., None]
    h = selective_scan(dA, dBx, h0=h0)
    y = jnp.einsum("blne,bln->ble", h, Cs)
    return y + D[None, None, :] * xs


def selective_ssm_final(dt, A_T, Bs, Cs, xs, D, h0=None):
    """(y, h_final [B, N, E]) — the prefill form: XLA path only (the
    prompt prefix is a few dozen tokens computed once per eval pass, so
    the fused kernel has nothing to win there)."""
    dA = jnp.exp(dt[:, :, None, :] * A_T[None, None])
    dBx = (dt * xs)[:, :, None, :] * Bs[..., None]
    h = selective_scan(dA, dBx, h0=h0)
    y = jnp.einsum("blne,bln->ble", h, Cs) + D[None, None, :] * xs
    return y, h[:, -1]


def _tok(arr, t):
    """Static slice of token t on axis 1 (Mosaic rejects >2D gather
    indexing like arr[:, t] on computed values)."""
    return jax.lax.squeeze(
        jax.lax.slice_in_dim(arr, t, t + 1, axis=1), (1,))


def _ssm_fwd_body(dt_ref, x_ref, b_ref, c_ref, at_ref, d_ref, o_ref,
                  hb_ref, h_scr, chunk: int, h0_ref=None):
    from jax.experimental import pallas as pl

    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _init():
        h_scr[:] = (jnp.zeros_like(h_scr) if h0_ref is None
                    else h0_ref[:].astype(h_scr.dtype))

    if hb_ref is not None:  # record the chunk-START state (bwd residual)
        hb_ref[:, 0] = h_scr[:]
    at = at_ref[:]          # [N, bE]
    d = d_ref[:]            # [1, bE]
    dt_c = dt_ref[:]        # [B, chunk, bE]
    x_c = x_ref[:]          # [B, chunk, bE]
    # discretize the WHOLE chunk vectorized (exp and muls across all
    # chunk tokens at once); the per-token loop below is then only the
    # irreducible 2-op recurrence chain + the C contraction
    dA_c = jnp.exp(dt_c[:, :, None, :] * at[None, None])   # [B,c,N,bE]
    dBx_c = (dt_c * x_c)[:, :, None, :] * b_ref[:][..., None]
    c_c = c_ref[:]          # [B, chunk, N]
    h = h_scr[:]            # [B, N, bE]
    for t in range(chunk):
        h = _tok(dA_c, t) * h + _tok(dBx_c, t)
        y = jnp.sum(h * _tok(c_c, t)[..., None], axis=1)   # [B, bE]
        o_ref[:, t] = y + d * _tok(x_c, t)
    h_scr[:] = h


def _ssm_kernel(dt_ref, x_ref, b_ref, c_ref, at_ref, d_ref, o_ref, h_scr, *,
                chunk: int):
    _ssm_fwd_body(dt_ref, x_ref, b_ref, c_ref, at_ref, d_ref, o_ref,
                  None, h_scr, chunk)


def _ssm_kernel_h0(dt_ref, x_ref, b_ref, c_ref, at_ref, d_ref, h0_ref,
                   o_ref, h_scr, *, chunk: int):
    """Forward kernel seeded with an initial state h0 [B, N, bE] — the
    serving path resumes the recurrence from the cached prompt-prefix
    state instead of zero."""
    _ssm_fwd_body(dt_ref, x_ref, b_ref, c_ref, at_ref, d_ref, o_ref,
                  None, h_scr, chunk, h0_ref=h0_ref)


def _ssm_kernel_bounds(dt_ref, x_ref, b_ref, c_ref, at_ref, d_ref,
                       o_ref, hb_ref, h_scr, *, chunk: int):
    """Forward kernel that additionally records the state at each chunk
    START (hb) — the residual the backward kernel resumes from."""
    _ssm_fwd_body(dt_ref, x_ref, b_ref, c_ref, at_ref, d_ref, o_ref,
                  hb_ref, h_scr, chunk)


def _ssm_kernel_bounds_h0(dt_ref, x_ref, b_ref, c_ref, at_ref, d_ref,
                          h0_ref, o_ref, hb_ref, h_scr, *, chunk: int):
    """Bounds-recording forward seeded with h0: hb[0] = h0, so the SAME
    backward kernel resumes correctly for the cached-prefix train path."""
    _ssm_fwd_body(dt_ref, x_ref, b_ref, c_ref, at_ref, d_ref, o_ref,
                  hb_ref, h_scr, chunk, h0_ref=h0_ref)


def _ssm_bwd_kernel(dt_ref, x_ref, b_ref, c_ref, at_ref, g_ref, hb_ref,
                    ddt_ref, dx_ref, db_ref, dc_ref, dat_ref,
                    hhat_scr, *, chunk: int):
    """Reverse-time adjoint, chunks processed right-to-left.

    hhat carry = dA_{t0} * hhat_{t0} of the chunk to the right (zero at
    the sequence end). Per chunk: recompute the forward states from the
    saved chunk-start boundary, then run the reverse recurrence
    hhat_t = C_t g_t + dA_{t+1} hhat_{t+1} and accumulate
      ddt = sum_n hhat*(h_prev*A*dA + B*x),  dx_ssm = dt * sum_n hhat*B,
      dB_n = sum_e hhat*dt*x,  dC_n = sum_e h*g,
      dA_T += sum_{b,t} hhat*h_prev*dt*dA   (per e-block slice).
    """
    from jax.experimental import pallas as pl

    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _init():
        hhat_scr[:] = jnp.zeros_like(hhat_scr)
        dat_ref[:] = jnp.zeros_like(dat_ref)

    at = at_ref[:]              # [N, bE]
    dt_c = dt_ref[:]            # [B, chunk, bE]
    x_c = x_ref[:]
    g_c = g_ref[:]              # [B, chunk, bE]
    b_c = b_ref[:]              # [B, chunk, N]
    c_c = c_ref[:]
    dA_c = jnp.exp(dt_c[:, :, None, :] * at[None, None])   # [B,c,N,bE]

    tok = _tok
    # forward recompute from the chunk-start boundary
    h = hb_ref[:, 0]            # [B, N, bE]
    hs = [h]                    # hs[t] = h_{t-1} (state BEFORE token t)
    for t in range(chunk):
        dBx = (tok(dt_c, t) * tok(x_c, t))[:, None, :] \
            * tok(b_c, t)[..., None]
        h = tok(dA_c, t) * h + dBx
        hs.append(h)

    hhat_next = hhat_scr[:]     # dA_{t+1} * hhat_{t+1} from the right
    dat_acc = dat_ref[:]
    for t in range(chunk - 1, -1, -1):
        hhat = tok(c_c, t)[..., None] * tok(g_c, t)[:, None, :] + hhat_next
        h_prev = hs[t]
        dA_t = tok(dA_c, t)
        hp_dA = hhat * h_prev * dA_t                       # [B, N, bE]
        ddt_ref[:, t] = (jnp.sum(hp_dA * at[None], axis=1)
                         + jnp.sum(hhat * tok(b_c, t)[..., None], axis=1)
                         * tok(x_c, t))
        dx_ref[:, t] = (jnp.sum(hhat * tok(b_c, t)[..., None], axis=1)
                        * tok(dt_c, t))
        db_ref[0, :, t] = jnp.sum(
            hhat * (tok(dt_c, t) * tok(x_c, t))[:, None, :], axis=2)
        dc_ref[0, :, t] = jnp.sum(hs[t + 1] * tok(g_c, t)[:, None, :],
                                  axis=2)
        dat_acc = dat_acc + jnp.sum(hp_dA * tok(dt_c, t)[:, None, :],
                                    axis=0)
        hhat_next = dA_t * hhat
    dat_ref[:] = dat_acc
    hhat_scr[:] = hhat_next


def _ssm_pallas(dt, A_T, Bs, Cs, xs, D, chunk: int, block_e: int,
                interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, E = dt.shape
    N = A_T.shape[0]
    pad = (-L) % chunk
    if pad:
        # dt = 0 -> dA = 1, dBx = 0: padded steps carry the state through
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
        Bs = jnp.pad(Bs, ((0, 0), (0, pad), (0, 0)))
        Cs = jnp.pad(Cs, ((0, 0), (0, pad), (0, 0)))
    Lp = L + pad
    grid = (E // block_e, Lp // chunk)

    out = pl.pallas_call(
        functools.partial(_ssm_kernel, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, chunk, block_e), lambda e, c: (0, c, e)),
            pl.BlockSpec((B, chunk, block_e), lambda e, c: (0, c, e)),
            pl.BlockSpec((B, chunk, N), lambda e, c: (0, c, 0)),
            pl.BlockSpec((B, chunk, N), lambda e, c: (0, c, 0)),
            pl.BlockSpec((N, block_e), lambda e, c: (0, e)),
            pl.BlockSpec((1, block_e), lambda e, c: (0, e)),
        ],
        out_specs=pl.BlockSpec((B, chunk, block_e), lambda e, c: (0, c, e)),
        out_shape=jax.ShapeDtypeStruct((B, Lp, E), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, N, block_e), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(dt, xs, Bs, Cs, A_T, D.reshape(1, E))
    return out[:, :L]


def _ssm_pallas_h0(dt, A_T, Bs, Cs, xs, D, h0, chunk: int, block_e: int,
                   interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, E = dt.shape
    N = A_T.shape[0]
    pad = (-L) % chunk
    if pad:
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
        Bs = jnp.pad(Bs, ((0, 0), (0, pad), (0, 0)))
        Cs = jnp.pad(Cs, ((0, 0), (0, pad), (0, 0)))
    Lp = L + pad
    grid = (E // block_e, Lp // chunk)
    h0 = jnp.broadcast_to(h0.astype(jnp.float32), (B, N, E))

    out = pl.pallas_call(
        functools.partial(_ssm_kernel_h0, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, chunk, block_e), lambda e, c: (0, c, e)),
            pl.BlockSpec((B, chunk, block_e), lambda e, c: (0, c, e)),
            pl.BlockSpec((B, chunk, N), lambda e, c: (0, c, 0)),
            pl.BlockSpec((B, chunk, N), lambda e, c: (0, c, 0)),
            pl.BlockSpec((N, block_e), lambda e, c: (0, e)),
            pl.BlockSpec((1, block_e), lambda e, c: (0, e)),
            pl.BlockSpec((B, N, block_e), lambda e, c: (0, 0, e)),
        ],
        out_specs=pl.BlockSpec((B, chunk, block_e), lambda e, c: (0, c, e)),
        out_shape=jax.ShapeDtypeStruct((B, Lp, E), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, N, block_e), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(dt, xs, Bs, Cs, A_T, D.reshape(1, E), h0)
    return out[:, :L]


@jax.custom_vjp
def selective_ssm_h0(dt, A_T, Bs, Cs, xs, D, h0):
    """Fused SSM seeded from a cached prefix state h0 [1 or B, N, E].

    Differentiable in everything but h0 (the cache is a constant of the
    serving/finetune step — its cotangent is zero): the backward reuses
    the chunk-boundary adjoint kernel, whose first boundary is h0."""
    B, _, E = dt.shape
    N = A_T.shape[0]
    if _use_pallas():
        tiles = _pick_tiles(B, E, N)
        if tiles is not None:
            return _ssm_pallas_h0(dt, A_T, Bs, Cs, xs, D, h0, *tiles)
    return _ssm_reference(dt, A_T, Bs, Cs, xs, D, h0=h0)


def _ssm_h0_fwd(dt, A_T, Bs, Cs, xs, D, h0):
    B, _, E = dt.shape
    N = A_T.shape[0]
    tiles = _pick_tiles(B, E, N) if _use_pallas() else None
    if tiles is not None:
        y, hb = _ssm_pallas_with_bounds(dt, A_T, Bs, Cs, xs, D, *tiles,
                                        h0=h0)
        return y, (dt, A_T, Bs, Cs, xs, D, h0, hb, tiles)
    return (_ssm_reference(dt, A_T, Bs, Cs, xs, D, h0=h0),
            (dt, A_T, Bs, Cs, xs, D, h0, None, None))


def _ssm_h0_bwd(res, g):
    dt, A_T, Bs, Cs, xs, D, h0, hb, tiles = res
    if hb is not None:
        g32 = g.astype(jnp.float32)
        ddt, dx_ssm, dB, dC, dAT = _ssm_pallas_bwd(
            dt, A_T, Bs, Cs, xs, g32, hb, *tiles)
        dx = dx_ssm + D[None, None, :] * g32
        dD = jnp.sum(g32 * xs, axis=(0, 1))
        return ddt, dAT, dB, dC, dx, dD, jnp.zeros_like(h0)
    # off-TPU: adjoint via the XLA reference graph, h0 held constant
    def ref(dt_, at_, bs_, cs_, xs_, d_):
        return _ssm_reference(dt_, at_, bs_, cs_, xs_, d_, h0=h0)
    _, vjp = jax.vjp(ref, dt, A_T, Bs, Cs, xs, D)
    return (*vjp(g), jnp.zeros_like(h0))


selective_ssm_h0.defvjp(_ssm_h0_fwd, _ssm_h0_bwd)


def _ssm_pallas_with_bounds(dt, A_T, Bs, Cs, xs, D, chunk: int,
                            block_e: int, interpret: bool = False,
                            h0=None):
    """Forward + chunk-start boundary states hb [B, L/chunk, N, E];
    optionally seeded with h0 (cached-prefix train path)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, E = dt.shape
    N = A_T.shape[0]
    pad = (-L) % chunk
    if pad:
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
        Bs = jnp.pad(Bs, ((0, 0), (0, pad), (0, 0)))
        Cs = jnp.pad(Cs, ((0, 0), (0, pad), (0, 0)))
    Lp = L + pad
    nc = Lp // chunk
    grid = (E // block_e, nc)

    in_specs = [
        pl.BlockSpec((B, chunk, block_e), lambda e, c: (0, c, e)),
        pl.BlockSpec((B, chunk, block_e), lambda e, c: (0, c, e)),
        pl.BlockSpec((B, chunk, N), lambda e, c: (0, c, 0)),
        pl.BlockSpec((B, chunk, N), lambda e, c: (0, c, 0)),
        pl.BlockSpec((N, block_e), lambda e, c: (0, e)),
        pl.BlockSpec((1, block_e), lambda e, c: (0, e)),
    ]
    operands = [dt, xs, Bs, Cs, A_T, D.reshape(1, E)]
    kernel = _ssm_kernel_bounds
    if h0 is not None:
        in_specs.append(
            pl.BlockSpec((B, N, block_e), lambda e, c: (0, 0, e)))
        operands.append(jnp.broadcast_to(h0.astype(jnp.float32), (B, N, E)))
        kernel = _ssm_kernel_bounds_h0

    out, hb = pl.pallas_call(
        functools.partial(kernel, chunk=chunk),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((B, chunk, block_e), lambda e, c: (0, c, e)),
            pl.BlockSpec((B, 1, N, block_e), lambda e, c: (0, c, 0, e)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lp, E), jnp.float32),
            jax.ShapeDtypeStruct((B, nc, N, E), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, N, block_e), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*operands)
    return out[:, :L], hb


def _ssm_pallas_bwd(dt, A_T, Bs, Cs, xs, g, hb, chunk: int, block_e: int,
                    interpret: bool = False):
    """Adjoint via _ssm_bwd_kernel. Returns (ddt, dx_ssm, dBs, dCs,
    dA_T) — in THAT order (dx before dB/dC; when N == E the [B, L, E]
    and [B, L, N] gradients shape-match, so a swapped unpack would be
    silent) — the D-skip terms (dD, D*g into dx) are added by the caller.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, E = dt.shape
    N = A_T.shape[0]
    pad = (-L) % chunk
    if pad:
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
        Bs = jnp.pad(Bs, ((0, 0), (0, pad), (0, 0)))
        Cs = jnp.pad(Cs, ((0, 0), (0, pad), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    Lp = L + pad
    nc = Lp // chunk
    ne = E // block_e
    grid = (ne, nc)
    rev = lambda e, c: (0, nc - 1 - c, e)      # chunks right-to-left
    rev_n = lambda e, c: (0, nc - 1 - c, 0)

    ddt, dx, db, dc, dat = pl.pallas_call(
        functools.partial(_ssm_bwd_kernel, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, chunk, block_e), rev),
            pl.BlockSpec((B, chunk, block_e), rev),
            pl.BlockSpec((B, chunk, N), rev_n),
            pl.BlockSpec((B, chunk, N), rev_n),
            pl.BlockSpec((N, block_e), lambda e, c: (0, e)),
            pl.BlockSpec((B, chunk, block_e), rev),
            pl.BlockSpec((B, 1, N, block_e),
                         lambda e, c: (0, nc - 1 - c, 0, e)),
        ],
        out_specs=[
            pl.BlockSpec((B, chunk, block_e), rev),
            pl.BlockSpec((B, chunk, block_e), rev),
            # dB/dC reduce over e, which is a PARALLEL grid axis: give
            # each e-block its own slab and sum outside the kernel
            pl.BlockSpec((1, B, chunk, N),
                         lambda e, c: (e, 0, nc - 1 - c, 0)),
            pl.BlockSpec((1, B, chunk, N),
                         lambda e, c: (e, 0, nc - 1 - c, 0)),
            pl.BlockSpec((N, block_e), lambda e, c: (0, e)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lp, E), jnp.float32),
            jax.ShapeDtypeStruct((B, Lp, E), jnp.float32),
            jax.ShapeDtypeStruct((ne, B, Lp, N), jnp.float32),
            jax.ShapeDtypeStruct((ne, B, Lp, N), jnp.float32),
            jax.ShapeDtypeStruct((N, E), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, N, block_e), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(dt, xs, Bs, Cs, A_T, g, hb)
    return (ddt[:, :L], dx[:, :L], db.sum(axis=0)[:, :L],
            dc.sum(axis=0)[:, :L], dat)


def _pick_tiles(B: int, E: int, N: int):
    """Largest (chunk, block_e) whose VMEM residency fits the ~16MB
    scoped budget for BOTH the forward and the backward kernel (the
    backward holds chunk+1 recomputed states plus dA_c); None when even
    the smallest doesn't (fall back to XLA)."""
    budget = 13 * 2 ** 20
    if E % _BLOCK_E:
        return None  # lane-width tiling requires E % 128 == 0
    be = _BLOCK_E
    for chunk in (_CHUNK, 8, 4):
        need = ((2 * chunk + 1) * B * N * be * 4  # hs list + dA_c
                + 10 * B * chunk * be * 4         # io blocks x2 buf
                + 2 * B * N * be * 4)             # scratch + carry
        if need <= budget:
            return chunk, be
    return None


@jax.custom_vjp
def selective_ssm(dt, A_T, Bs, Cs, xs, D):
    """Fused y = SSM(dt, A, B, C, x) + D*x.

    dt, xs [B, L, E] f32; A_T [N, E] f32; Bs, Cs [B, L, N] f32; D [E].
    Pallas kernel on TPU when the tiles fit VMEM, XLA otherwise.
    """
    B, _, E = dt.shape
    N = A_T.shape[0]
    if _use_pallas():
        tiles = _pick_tiles(B, E, N)
        if tiles is not None:
            return _ssm_pallas(dt, A_T, Bs, Cs, xs, D, *tiles)
    return _ssm_reference(dt, A_T, Bs, Cs, xs, D)


def _ssm_fwd(dt, A_T, Bs, Cs, xs, D):
    B, _, E = dt.shape
    N = A_T.shape[0]
    tiles = _pick_tiles(B, E, N) if _use_pallas() else None
    if tiles is not None:
        y, hb = _ssm_pallas_with_bounds(dt, A_T, Bs, Cs, xs, D, *tiles)
        return y, (dt, A_T, Bs, Cs, xs, D, hb, tiles)
    return (_ssm_reference(dt, A_T, Bs, Cs, xs, D),
            (dt, A_T, Bs, Cs, xs, D, None, None))


def _ssm_bwd(res, g):
    dt, A_T, Bs, Cs, xs, D, hb, tiles = res
    if hb is not None:
        # fused Pallas adjoint (same VMEM-resident structure as forward)
        g32 = g.astype(jnp.float32)
        ddt, dx_ssm, dB, dC, dAT = _ssm_pallas_bwd(
            dt, A_T, Bs, Cs, xs, g32, hb, *tiles)
        dx = dx_ssm + D[None, None, :] * g32
        dD = jnp.sum(g32 * xs, axis=(0, 1))
        return ddt, dAT, dB, dC, dx, dD
    # off-TPU: adjoint via the XLA reference graph
    _, vjp = jax.vjp(_ssm_reference, dt, A_T, Bs, Cs, xs, D)
    return vjp(g)


selective_ssm.defvjp(_ssm_fwd, _ssm_bwd)
