"""A/B the small-M weight-streaming w8a8 Pallas kernel vs XLA's s8 dot.

This probe produced the CORRECTED small-batch diagnosis in BASELINE.md
("Serving latency", 2026-08-19 second session): at M=448 (batch 4 x
112-token prefix-cached region — the reference deploys at batch 16,
/root/reference/configs/datasets/bidmc.toml:18-24) XLA's s8xs8 dot is
already at 68-93% of the v5e's 394 TOP/s int8 compute bound, and M=448
sits ABOVE the int8 roofline ridge (M* = 394e12/(2*819e9) ~ 240), so
the shape is compute-bound — there is no weight-streaming headroom.
The Pallas kernel (ops/pallas/smallm_matmul.py) measures 0.54-0.75x
XLA and is opt-in only.

Methodology (hoist-proof slope): naive fori_loop timing of a
loop-invariant body gets LICM-hoisted by XLA and measures the tunnel's
1-31 ms dispatch floor divided by the loop count (the bug behind the
retracted "~60 GB/s" diagnosis). Here every matmul output feeds the
next input (carry-chained scan) and the weights cycle through a
BANK-slice HBM bank, so nothing is hoistable and every weight read hits
HBM; per-matmul cost is the slope between R=2 and R=10 outer repeats
(128 matmuls of signal against one dispatch floor).

Run on the TPU: python tools/ab_w8a8_small.py [--ms 448 896]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHAPES = [("qkv/o", 4096, 4096, 512), ("up/gate", 4096, 11008, 256),
          ("down", 11008, 4096, 128)]
HBM_GBPS = 819.0
S8_TOPS = 394e12
BANK = 16


def main():
    import jax
    import jax.numpy as jnp
    from medtsllm_tpu.ops.pallas.smallm_matmul import (
        smallm_blocks, w8a8_smallm_matmul_pallas)

    ap = argparse.ArgumentParser()
    ap.add_argument("--ms", type=int, nargs="+", default=[448, 896])
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    def timeit_call(g, *a, reps=5):
        float(g(*a))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(g(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    @jax.jit
    def trivial(x):
        return (x + 1.0).sum()

    print(f"backend {jax.default_backend()}  tunnel floor "
          f"{timeit_call(trivial, jnp.ones((8, 8))) * 1e3:.2f} ms",
          flush=True)

    for M in args.ms:
        print(f"\nM={M} (batch {M // 112} x 112-token region):", flush=True)
        for name, K, N, bn_pref in SHAPES:
            xq0 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
            xs = jnp.asarray(rng.uniform(0.01, 0.1, (M, 1)), jnp.float32)
            ws = jnp.asarray(rng.uniform(0.001, 0.01, (N,)), jnp.float32)
            Wb = jnp.asarray(rng.integers(-3, 4, (BANK, K, N)), jnp.int8)

            def xla_fn(x, w):
                acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                return (acc.astype(jnp.float32) * (xs * ws[None, :])
                        ).astype(jnp.bfloat16)

            def make_chain(fn, R):
                def body(x, w):
                    yi = jax.lax.convert_element_type(fn(x, w), jnp.int8)
                    if N >= K:
                        xn = yi[:, :K]
                    else:
                        xn = jnp.concatenate(
                            [yi] * (-(-K // N)), axis=1)[:, :K]
                    return xn, ()

                def step(xq, Wb_):
                    x = jax.lax.fori_loop(
                        0, R, lambda r, x: jax.lax.scan(body, x, Wb_)[0],
                        xq)
                    return x.astype(jnp.float32)[0, 0]

                return jax.jit(step)

            def slope(fn, r_lo=2, r_hi=10):
                t_lo = timeit_call(make_chain(fn, r_lo), xq0, Wb)
                t_hi = timeit_call(make_chain(fn, r_hi), xq0, Wb)
                return (t_hi - t_lo) / ((r_hi - r_lo) * BANK)

            read_b = K * N / (HBM_GBPS * 1e9)
            comp_b = 2 * M * K * N / S8_TOPS
            per = slope(xla_fn)
            row = (f"  {name:8s} {K:5d}x{N:<5d} xla {per * 1e6:7.1f} us "
                   f"[read bound {read_b * 1e6:5.1f}, s8-compute bound "
                   f"{comp_b * 1e6:5.1f}]")
            bn = smallm_blocks(M, K, N) or bn_pref
            if N % bn == 0:
                def krn_fn(x, w, bn=bn):
                    return w8a8_smallm_matmul_pallas(
                        x, w, xs, ws, block_n=bn, out_dtype=jnp.bfloat16)

                # numerics: exact integer match vs the XLA path
                got = np.asarray(jax.jit(krn_fn)(xq0, Wb[0]), np.float32)
                want = np.asarray(jax.jit(xla_fn)(xq0, Wb[0]), np.float32)
                np.testing.assert_allclose(got, want, rtol=1e-2)
                try:
                    per_k = slope(krn_fn)
                    row += (f"  kernel(bn={bn}) {per_k * 1e6:7.1f} us "
                            f"({per / per_k:4.2f}x xla)")
                except Exception as e:  # VMEM overflow at large M
                    row += f"  kernel(bn={bn}) FAIL: {str(e)[:60]}"
            else:
                row += "  kernel: no fitting block"
            print(row, flush=True)


if __name__ == "__main__":
    main()
