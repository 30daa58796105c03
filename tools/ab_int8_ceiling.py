"""Pure s8 x s8 -> s32 matmul ceiling on this chip at production shapes.

Run on the TPU: python tools/ab_int8_ceiling.py
Times the bare XLA int8 dot (with per-channel rescale epilogue, exactly
what QuantDense emits) at the 7B projection shapes and the bench batch
sizes. The gap between this and the end-to-end w8a8 throughput is the
non-matmul overhead (norms, rotary, attention, dynamic quantization).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    shapes = [("qkv/o", 4096, 4096), ("up/gate", 4096, 11008),
              ("down", 11008, 4096)]
    LOOPS = 50
    for M in (7680, 10240, 15360):  # batch 48/64/96 x 160 tokens
        for name, K, N in shapes:
            xq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
            w = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
            xs = jnp.asarray(rng.uniform(1e-3, 1e-2, (M, 1)), jnp.float32)
            ws = jnp.asarray(rng.uniform(1e-3, 1e-2, (N,)), jnp.float32)

            def f(xq, w, xs, ws):
                acc = jax.lax.dot_general(
                    xq, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return (acc.astype(jnp.float32) * (xs * ws[None, :])
                        ).astype(jnp.bfloat16)

            def run(xq, w, xs, ws):
                def body(i, acc):
                    return acc + f(xq + i.astype(jnp.int8), w, xs, ws
                                   ).astype(jnp.float32)[0, 0]
                return jax.lax.fori_loop(0, LOOPS, body, jnp.float32(0))

            g = jax.jit(run)
            float(g(xq, w, xs, ws))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(g(xq, w, xs, ws))
                ts.append(time.perf_counter() - t0)
            t = min(ts) / LOOPS
            tops = 2 * M * K * N / t / 1e12
            print(f"M={M:6d} {name:8s} {t*1e3:7.3f}ms {tops:6.1f} TOP/s",
                  flush=True)


if __name__ == "__main__":
    main()
