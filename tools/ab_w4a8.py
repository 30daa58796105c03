"""On-chip A/B: Pallas w4a8 kernel vs XLA unpack-then-dot, llama shapes.

Run on the TPU: python tools/ab_w4a8.py
Checks numerics (exact int agreement expected — same integer matmul) and
times both at the production (M, K, N) projections of the 7B backbone.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from medtsllm_tpu.ops.pallas.quant_matmul import (
        pack4_split, w4a8_blocks, w4a8_matmul_pallas, w4a8_matmul_reference)

    rng = np.random.default_rng(0)
    shapes = [
        ("qkv/o 7B", 4096, 4096),
        ("up/gate 7B", 4096, 11008),
        ("down 7B", 11008, 4096),
    ]
    for M in (128, 1024, 7680):  # serve-small, serve-mid, bench batch 48
        for name, K, N in shapes:
            xq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
            q = rng.integers(-8, 8, (K, N)).astype(np.int8)
            packed = jnp.asarray(pack4_split(q))
            xs = jnp.asarray(rng.uniform(1e-3, 1e-2, (M, 1)), jnp.float32)
            ws = jnp.asarray(rng.uniform(1e-3, 1e-2, (N,)), jnp.float32)

            bn, bk2 = w4a8_blocks(K, N)
            f_pl = jax.jit(lambda a, b, c, d: w4a8_matmul_pallas(
                a, b, c, d, block_n=bn, block_k2=bk2))
            f_ref = jax.jit(w4a8_matmul_reference)
            o_pl = np.asarray(f_pl(xq, packed, xs, ws), np.float32)
            o_ref = np.asarray(f_ref(xq, packed, xs, ws), np.float32)
            err = float(np.max(np.abs(o_pl - o_ref)))

            # the tunnel adds ~30ms per dispatch — amortize over LOOPS
            # on-device iterations (input perturbed per step so XLA can't
            # hoist the matmul; only a 4-byte scalar comes back)
            LOOPS = 50

            def looped(f):
                def run(a, b, c, d):
                    def body(i, acc):
                        ai = a + i.astype(jnp.int8)
                        return acc + f(ai, b, c, d).astype(
                            jnp.float32)[0, 0]
                    return jax.lax.fori_loop(0, LOOPS, body, jnp.float32(0))
                return jax.jit(run)

            s_pl, s_ref = looped(f_pl), looped(f_ref)

            def best(f, reps=5):
                float(f(xq, packed, xs, ws))  # compile + warm
                ts = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    float(f(xq, packed, xs, ws))
                    ts.append(time.perf_counter() - t0)
                return min(ts) / LOOPS

            t_pl, t_ref = best(s_pl), best(s_ref)
            tops = 2 * M * K * N / t_pl / 1e12
            print(f"M={M:5d} {name:12s} pallas {t_pl*1e3:7.3f}ms "
                  f"({tops:6.1f} TOP/s) xla {t_ref*1e3:7.3f}ms "
                  f"speedup {t_ref/t_pl:5.2f}x maxdiff {err:g}")


if __name__ == "__main__":
    main()
