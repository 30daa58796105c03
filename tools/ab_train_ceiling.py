"""Mixed int8-fwd / bf16-bwd matmul ceiling for the TRAIN step (VERDICT
r4 item 4): what fraction of the pure-matmul bound rows 5i/5j achieve.

The 5j step (reference flagship finetune, /root/reference/models/
medtsllm.py:162-233: frozen bnb-int8 7B + trainable fusion layers) does,
per decoder layer, per optimizer step:
  forward:  int8 s8 x s8 projections (q, k, v, o, gate, up, down) ONCE
            (remat="dots" SAVES projection outputs — only elementwise and
            attention-score work recomputes, transformer.py:_dots_policy)
  backward: dx-only bf16 matmuls through the frozen weights (STE,
            transformer.py:252-267 — no dW for frozen params), same seven
            shapes transposed
  attention: 2 fwd batched dots + 2 recomputed (policy drops batched
            dots) + 4 bwd batched dots over [B*H, L, S] at S = prefix+L
The ceiling = 32 x (sum of those isolated matmul times). Non-matmul
residual (norms/rotary/quant fusion, fusion-layer fwd+bwd, optimizer on
the fusion params) is the gap to the measured step.

Run on the TPU:
  python tools/ab_train_ceiling.py --batch 16            # probe table
  python bench.py --train --quant 8 --batch 16 --remat dots  # measured
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timed_matmul(f, a, b, lo=16, hi=64):
    """Two-depth fori-loop SLOPE timing — floor-immune (each sample is
    floor + K*t; (t_hi - t_lo)/(hi - lo) cancels the tunnel round-trip
    floor, which is weather: ~1 ms to ~1 s — CLAUDE.md). The loop index
    perturbs the first operand (hoist-proof against XLA LICM)."""
    import jax
    import jax.numpy as jnp

    def make(loops):
        def run(a, b):
            def body(i, acc):
                if a.dtype == jnp.int8:
                    ai = a + i.astype(jnp.int8)
                else:
                    # the perturbation must be REPRESENTABLE in a.dtype
                    # (1 + 1e-30 rounds to exactly 1.0 even in f32 — the
                    # body goes loop-invariant and LICM hoists it: the
                    # first r5 run read 0.000 ms for every bf16 probe)
                    ai = a + i.astype(a.dtype) * jnp.asarray(1e-3,
                                                             a.dtype)
                # consume the FULL output (a [0, 0] probe lets XLA
                # shrink the dot to a single output column)
                return acc + jnp.sum(f(ai, b).astype(jnp.float32))
            return jax.lax.fori_loop(0, loops, body, jnp.float32(0))
        return jax.jit(run)

    g_lo, g_hi = make(lo), make(hi)
    float(g_lo(a, b)), float(g_hi(a, b))  # compile + first-exec stall
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(g_lo(a, b))
        t1 = time.perf_counter()
        float(g_hi(a, b))
        ts.append((time.perf_counter() - t1) - (t1 - t0))
    # MEDIAN of the differences: each sample is (floor_hi + hi*t) -
    # (floor_lo + lo*t) and the floors are independent weather draws, so
    # a single storm makes a sample arbitrarily negative or large — the
    # min() used first read 0.000 ms for every small matmul
    return max(float(np.median(ts)), 1e-9) / (hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--region", type=int, default=112,
                    help="device-computed tokens per window (prefix-"
                         "cached suffix + TS patches)")
    ap.add_argument("--prefix", type=int, default=37)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--measured-ms", type=float, default=0.0,
                    help="measured train-step ms (bench.py --train) to "
                         "report %% of ceiling against")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    D, F, H, HD = 4096, 11008, 32, 128
    M = args.batch * args.region
    L, S = args.region, args.region + args.prefix
    BH = args.batch * H

    def int8_mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    def bf16_mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())))

    def batched_mm(a, b):
        return jax.lax.dot_general(a, b, (((2,), (1,)), ((0,), (0,))))

    # -- forward int8 projections (once per layer under remat="dots") ----
    fwd_shapes = [("q/k/v/o", 4, D, D), ("gate/up", 2, D, F),
                  ("down", 1, F, D)]
    fwd_total = 0.0
    print(f"M={M} (b{args.batch} x {args.region} tok) L={L} S={S}")
    for name, count, K, N in fwd_shapes:
        a = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
        t = _timed_matmul(int8_mm, a, b)
        fwd_total += count * t
        print(f"fwd  int8 {name:8s} [{M},{K}]x[{K},{N}] x{count}: "
              f"{t*1e3:7.3f} ms  {2*M*K*N/t/1e12:6.1f} TOP/s", flush=True)

    # -- backward dx bf16 through frozen weights (STE, no dW) ------------
    bwd_shapes = [("q/k/v/o", 4, D, D), ("gate/up", 2, F, D),
                  ("down", 1, D, F)]
    bwd_total = 0.0
    for name, count, K, N in bwd_shapes:
        a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
        t = _timed_matmul(bf16_mm, a, b)
        bwd_total += count * t
        print(f"bwd bf16 {name:8s} [{M},{K}]x[{K},{N}] x{count}: "
              f"{t*1e3:7.3f} ms  {2*M*K*N/t/1e12:6.1f} TOP/s", flush=True)

    # -- attention batched dots: 2 fwd + 2 recompute + 4 bwd -------------
    qk = (jnp.asarray(rng.standard_normal((BH, L, HD)), jnp.bfloat16),
          jnp.asarray(rng.standard_normal((BH, HD, S)), jnp.bfloat16))
    av = (jnp.asarray(rng.standard_normal((BH, L, S)), jnp.bfloat16),
          jnp.asarray(rng.standard_normal((BH, S, HD)), jnp.bfloat16))
    t_qk = _timed_matmul(batched_mm, *qk)
    t_av = _timed_matmul(batched_mm, *av)
    attn_total = 4 * (t_qk + t_av)  # 2 fwd + 2 recompute + ~4 bwd = 8 dots
    print(f"attn bf16 scores [{BH},{L},{HD}]x[.,{HD},{S}]: {t_qk*1e3:.3f} "
          f"ms; av: {t_av*1e3:.3f} ms; x8 per layer", flush=True)

    per_layer = fwd_total + bwd_total + attn_total
    ceiling = args.layers * per_layer
    print(f"\nper-layer: fwd {fwd_total*1e3:.3f} + bwd {bwd_total*1e3:.3f}"
          f" + attn {attn_total*1e3:.3f} = {per_layer*1e3:.3f} ms")
    print(f"{args.layers}-layer matmul ceiling: {ceiling*1e3:.1f} ms",
          flush=True)
    if args.measured_ms:
        pct = ceiling * 1e3 / args.measured_ms * 100
        print(f"measured step {args.measured_ms:.1f} ms -> "
              f"{pct:.0f}% of ceiling "
              f"(residual {args.measured_ms - ceiling*1e3:.1f} ms: "
              f"norm/rotary/quant elementwise recompute, fusion layers "
              f"fwd+bwd, optimizer)", flush=True)


if __name__ == "__main__":
    main()
