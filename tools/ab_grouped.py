"""Grouped-GEMM candidates for the MoE expert matmuls, A/B'd at the
moe-8x1b serving shape (BASELINE.md "MoE single-chip decomposition"):
the padded E-batched bmm pays 1.25x capacity padding x 1.61x
batched-GEMM tiling vs a dense matmul of equal active FLOPs. Candidates
to recover it (all full SwiGLU chains: gate+up, silu*mul, down, with
per-row dynamic int8 activation quantization as in production):

  A. bmm C=560    — the current padded dispatch (moe_capacity(T,8,2,1.25))
  B. bmm C=512    — capacity floored to a 128-multiple (tile-step probe)
  C. bmm C=640    — capacity raised to a 128-multiple
  D. dense rows=E*C — ONE matmul over the same row count as A
                     (isolates the batched-vs-flat penalty at equal work)
  E. dense rows=T*k — the ideal dropless bound (zero padding, one GEMM)
  F. ragged_dot rows=T*k, balanced groups — megablocks-style dropless
     grouped GEMM via jax.lax.ragged_dot (sorted-by-expert layout)
  G. ragged_dot, worst-case skew (all rows to one expert) — routing
     sensitivity of F's lowering

Run on the TPU: python tools/ab_grouped.py [--batch 16]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.ab_moe import timed  # on-device fori_loop slope protocol


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--tokens", type=int, default=112)
    ap.add_argument("--bm", type=int, default=0,
                    help="with --only H: run only the gmm variants with "
                         "this block_m (0 = all)")
    ap.add_argument("--only", default="",
                    help="comma list of section letters to run (A, D, F, "
                         "A0, H); empty = all. Each compile costs 20-40s "
                         "of tunnel time — re-run only what changed.")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))

    def want(section):
        return not only or section in only

    import jax
    import jax.numpy as jnp

    from medtsllm_tpu.models.llm.loader import resolve_config
    from medtsllm_tpu.models.llm.transformer import (
        _act_quant_bmm, _act_quant_matmul, moe_capacity)

    cfg, _ = resolve_config("moe-8x1b")
    D, F, E, k = cfg.d_model, cfg.d_ff, cfg.n_experts, cfg.n_experts_per_tok
    T = args.batch * args.tokens
    rows = T * k
    C0 = moe_capacity(T, E, k, cfg.expert_capacity)
    print(f"T={T} rows(T*k)={rows} D={D} F={F} E={E} k={k} C0={C0}",
          flush=True)

    rng = np.random.default_rng(0)

    def expert_params(C):
        kq = {n: jnp.asarray(rng.integers(-127, 128, s), jnp.int8)
              for n, s in [("g", (E, D, F)), ("u", (E, D, F)),
                           ("d", (E, F, D))]}
        sc = {n: jnp.asarray(rng.uniform(1e-3, 1e-2, s), jnp.float32)
              for n, s in [("g", (E, F)), ("u", (E, F)), ("d", (E, D))]}
        h = jnp.asarray(rng.standard_normal((E, C, D)), jnp.float32)
        return kq, sc, h

    def swiglu_bmm(kq, sc, h):
        g = _act_quant_bmm(h, kq["g"], sc["g"])
        u = _act_quant_bmm(h, kq["u"], sc["u"])
        return _act_quant_bmm(jax.nn.silu(g) * u, kq["d"], sc["d"])

    if want("A"):
        for C in (C0, 512, 640):
            kq, sc, h = expert_params(C)
            t = timed(jax.jit(swiglu_bmm), kq, sc, h)
            print(f"A/bmm C={C:4d} (rows {E*C:5d}): {t*1e3:8.3f} ms",
                  flush=True)

    # flat dense chains (one weight) at two row counts
    wq = {n: jnp.asarray(rng.integers(-127, 128, s), jnp.int8)
          for n, s in [("g", (D, F)), ("u", (D, F)), ("d", (F, D))]}
    ws = {n: jnp.asarray(rng.uniform(1e-3, 1e-2, s), jnp.float32)
          for n, s in [("g", (F,)), ("u", (F,)), ("d", (D,))]}

    def swiglu_dense(wq, ws, x):
        g = _act_quant_matmul(x, wq["g"], ws["g"], 8)
        u = _act_quant_matmul(x, wq["u"], ws["u"], 8)
        return _act_quant_matmul(jax.nn.silu(g) * u, wq["d"], ws["d"], 8)

    if want("D"):
        for R in (E * C0, rows):
            x = jnp.asarray(rng.standard_normal((R, D)), jnp.float32)
            t = timed(jax.jit(swiglu_dense), wq, ws, x)
            tag = "same-rows-as-A" if R == E * C0 else "dropless ideal"
            print(f"D/dense rows={R:5d} ({tag}): {t*1e3:8.3f} ms", flush=True)

    # ragged_dot dropless grouped GEMM (sorted-by-expert [rows, D] layout)
    kq, sc, _ = expert_params(C0)
    x = jnp.asarray(rng.standard_normal((rows, D)), jnp.float32)

    def rd(xq, w):
        return jax.lax.ragged_dot(xq, w, group_sizes=gs,
                                  preferred_element_type=jnp.int32)

    def quant_rows(x):
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        xs = jnp.maximum(amax / 127.0, 1e-10)
        return jnp.round(x / xs).astype(jnp.int8), xs

    def seg_scale(name):
        # per-row weight scale: scale[expert_of_row] via repeat over groups
        return jnp.repeat(sc[name], gs, axis=0, total_repeat_length=rows)

    def swiglu_ragged(kq, sc, gs, x):
        xq, xs = quant_rows(x)
        g = rd(xq, kq["g"]).astype(jnp.float32) * xs * seg_scale("g")
        u = rd(xq, kq["u"]).astype(jnp.float32) * xs * seg_scale("u")
        aq, as_ = quant_rows(jax.nn.silu(g) * u)
        return rd(aq, kq["d"]).astype(jnp.float32) * as_ * seg_scale("d")

    if want("F"):
        for tag, sizes in (
                ("balanced", [rows // E] * E),
                ("skew-all-to-one", [rows] + [0] * (E - 1))):
            gs = jnp.asarray(sizes, jnp.int32)
            try:
                fn = jax.jit(lambda kq, sc, gs, x:
                             swiglu_ragged(kq, sc, gs, x))
                t = timed(fn, kq, sc, gs, x)
                print(f"F/ragged_dot rows={rows} ({tag}): {t*1e3:8.3f} ms",
                      flush=True)
            except Exception as e:  # lowering support varies by backend
                print(f"F/ragged_dot ({tag}): FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    if want("A0"):
        # exact-dropless bmm: what HF-exact numerics cost TODAY (C = T)
        kq, sc, h = expert_params(T)
        t = timed(jax.jit(swiglu_bmm), kq, sc, h)
        print(f"A0/bmm C=T={T} (exact dropless today): {t*1e3:8.3f} ms",
              flush=True)

    # H: Pallas grouped gmm (ops/pallas/grouped_matmul) — dropless at
    # routed-count cost. Full chain: fused gate+up, silu*mul, row
    # requant, down.
    if not want("H"):
        return
    from medtsllm_tpu.ops.pallas.grouped_matmul import (
        gmm, gmm_metadata, gmm_visits, row_quant)
    kq, sc, _ = expert_params(C0)

    # bn must divide BOTH F=5632 (gate/up) and stay VMEM-safe; valid
    # steps are 128-multiples dividing 5632: 128/256/512/1408. The down
    # matmul (N=D) always runs at 512.
    for bm, bn, fused, requant, bnd, *w4flag in (
            (128, 512, False, False, 512), (128, 512, True, False, 512),
            (128, 1408, True, False, 512), (256, 512, True, False, 512),
            (64, 1408, True, False, 512),
            # r5: emit_quant — int8 rows + per-(row, F-tile) scales
            # straight out of the SwiGLU epilogue; the separate
            # row_quant pass (a full [R, F] f32 read + int8 write)
            # disappears. bnd: the down matmul's block_n (wider = fewer
            # activation re-streams of the [R, F] int8 rows; 1024 keeps
            # the [F, bnd] weight block within double-buffered VMEM).
            # (bm=64 x emit_quant is impossible — the (1, 1, bm) scale
            # block needs a 128-divisible lane dim; the gmm assert
            # rejects it, measured FAILED on-chip 2026-08-20.)
            (128, 1408, True, True, 512),
            (128, 512, True, True, 512),
            (128, 1408, True, True, 1024),
            # bm=256 x emit_quant x bnd=1024 FAILED to compile (Mosaic
            # HTTP 500, VMEM: 2x [256, 1408] f32 intermediates + the
            # double-buffered weight blocks) — measured 2026-08-20 b32
            (128, 1408, True, False, 1024),
            # r5: w4a8 — split-halves packed int4 expert weights, the
            # kernel contracts the nibbles directly (HALF the dominant
            # weight DMA: 277 -> 138 MB/layer at this shape)
            (128, 1408, True, True, 1024, 4),
            (128, 1408, True, True, 512, 4)):
        w4 = bool(w4flag and w4flag[0] == 4)
        if args.bm and bm != args.bm:
            continue
        V = gmm_visits(rows, E, bm)
        R_pad = V * bm

        def swiglu_gmm(kq, sc, counts, x):
            ve, valid, _ = gmm_metadata(counts, bm, V)
            xq, xs = row_quant(x)
            wb = 4 if w4 else 8
            if fused and requant:
                aq, as_ = gmm(xq, xs, (kq["g"], kq["u"]),
                              (sc["g"], sc["u"]), ve, valid,
                              block_m=bm, block_n=bn, fuse_silu=True,
                              emit_quant=True, w_bits=wb)
            elif fused:
                (act,) = gmm(xq, xs, (kq["g"], kq["u"]),
                             (sc["g"], sc["u"]), ve, valid,
                             block_m=bm, block_n=bn, fuse_silu=True)
                aq, as_ = row_quant(act)
            else:
                g, u = gmm(xq, xs, (kq["g"], kq["u"]), (sc["g"], sc["u"]),
                           ve, valid, block_m=bm, block_n=bn)
                act = jax.nn.silu(g) * u
                aq, as_ = row_quant(act)
            (y,) = gmm(aq, as_, (kq["d"],), (sc["d"],), ve, valid,
                       block_m=bm, block_n=bnd, w_bits=wb)
            return y

        xp = jnp.asarray(rng.standard_normal((R_pad, D)), jnp.float32)
        kq_run = kq
        if w4:
            from medtsllm_tpu.ops.pallas.quant_matmul import pack4_split
            kq_run = {n: jnp.stack([
                          jnp.asarray(pack4_split(np.asarray(
                              jnp.clip(kq[n][e], -7, 7))))
                          for e in range(E)]) for n in kq}
        label = (f"bm={bm} bn={bn}"
                 f"{' fused-silu' if fused else ''}"
                 f"{' emit-quant' if requant else ''}"
                 f"{f' bnd={bnd}' if bnd != 512 else ''}"
                 f"{' W4A8' if w4 else ''}")
        for tag, sizes in (("balanced", [rows // E] * E),
                           ("skew-all-to-one", [rows] + [0] * (E - 1))):
            counts = jnp.asarray(sizes, jnp.int32)
            try:
                t = timed(jax.jit(lambda kq, sc, c, x:
                                  swiglu_gmm(kq, sc, c, x)),
                          kq_run, sc, counts, xp)
                print(f"H/pallas gmm {label} ({tag}): {t*1e3:8.3f} ms",
                      flush=True)
            except Exception as e:
                print(f"H/pallas gmm {label} ({tag}): FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
