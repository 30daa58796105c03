"""Small-batch serving floor probe: where does the time go at batch 4-16?

NOTE (2026-08-19): this tool's original _time() body was loop-invariant
and got LICM-hoisted — its pre-fix numbers (the "~60 GB/s at M=448"
diagnosis) measured the tunnel dispatch floor, not the matmul, and are
retracted in BASELINE.md. The loop index is now mixed into every
iteration's input. For the highest-SNR per-matmul numbers prefer the
carry-chained slope probe in tools/ab_w8a8_small.py; this tool remains
useful for the fused-vs-separate layout comparison. At the small-M
serving shapes (M = batch x 112-token prefix-cached region) it
decomposes:

  1. the bare s8xs8 matmul time per 7B projection shape (as
     tools/ab_int8_ceiling.py, at small M),
  2. the same work with q/k/v and gate/up FUSED into one wide matmul
     (the fusion lost end-to-end at M=7680 because the s32 [M, 12288]
     round-trip outweighed the win — at M=448 that intermediate is 1/20
     the size, so the verdict may flip),
  3. a pure weight-READ lower bound (sum over every weight matrix),
     i.e. what an ideally weight-streaming-bound step would cost.

Run on the TPU: python tools/ab_smallbatch.py [--layers 32]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

D, FF = 4096, 11008
SEPARATE = [("q", D, D), ("k", D, D), ("v", D, D), ("o", D, D),
            ("gate", D, FF), ("up", D, FF), ("down", FF, D)]
FUSED = [("qkv", D, 3 * D), ("o", D, D), ("gate+up", D, 2 * FF),
         ("down", FF, D)]


def _time(fn, *args, loops, reps=5):
    # fn takes (i, *args) and must MIX the loop index into its inputs:
    # a loop-invariant body is hoisted out of the fori_loop by XLA's
    # LICM, and with the tunnel's ~30 ms dispatch floor the "loop" then
    # measures floor/loops. (This bug produced the pre-2026-08-19
    # "~60 GB/s at M=448" diagnosis in BASELINE.md — retracted there.)
    import jax
    import jax.numpy as jnp

    def run(*a):
        def body(i, acc):
            return acc + fn(i, *a).astype(jnp.float32)[0, 0]
        return jax.lax.fori_loop(0, loops, body, jnp.float32(0))

    g = jax.jit(run)
    float(g(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / loops


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--loops", type=int, default=100)
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    def matmul_probe(M, plan):
        total = 0.0
        for name, K, N in plan:
            xq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
            w = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
            xs = jnp.asarray(rng.uniform(1e-3, 1e-2, (M, 1)), jnp.float32)
            ws = jnp.asarray(rng.uniform(1e-3, 1e-2, (N,)), jnp.float32)

            def f(i, xq, w, xs, ws):
                acc = jax.lax.dot_general(
                    xq + i.astype(jnp.int8), w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return (acc.astype(jnp.float32) * (xs * ws[None, :])
                        ).astype(jnp.bfloat16)

            t = _time(f, xq, w, xs, ws, loops=args.loops)
            total += t
            print(f"    {name:8s} {K:5d}x{N:<5d} {t*1e6:8.1f} us", flush=True)
        return total

    # pure weight-read floor: one pass over every per-layer weight byte
    nbytes = sum(K * N for _, K, N in SEPARATE)
    w_all = jnp.asarray(rng.integers(-127, 128, (nbytes,)), jnp.int8)

    def read_all(i, w):
        # dynamic 2-element window start forces a fresh full read each
        # iteration (hoist-proof) at negligible extra cost
        s = jax.lax.dynamic_slice(w, (i % 2,), (w.shape[0] - 2,))
        return jnp.sum(s, dtype=jnp.int32).reshape(1, 1)

    t_read = _time(read_all, w_all, loops=20)
    print(f"weight-read floor: {nbytes/1e6:.1f} MB/layer, "
          f"{t_read*1e3:.3f} ms/layer -> x{args.layers} = "
          f"{t_read*args.layers*1e3:.1f} ms/step "
          f"({nbytes/t_read/1e9:.0f} GB/s)", flush=True)

    for batch in (4, 8, 16, 80):
        M = batch * 112
        print(f"\nbatch {batch} (M={M}):")
        print("  separate projections:")
        t_sep = matmul_probe(M, SEPARATE)
        print("  fused qkv + gate/up:")
        t_fus = matmul_probe(M, FUSED)
        print(f"  per-layer: separate {t_sep*1e3:.3f} ms, fused "
              f"{t_fus*1e3:.3f} ms ({t_sep/t_fus:.2f}x)  ->  x{args.layers}: "
              f"separate {t_sep*args.layers*1e3:.1f} ms, fused "
              f"{t_fus*args.layers*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
