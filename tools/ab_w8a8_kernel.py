"""Can a Pallas s8xs8->s32 matmul beat XLA's at the qkv shape?

tools/ab_int8_ceiling.py shows XLA's int8 dot runs 4096x4096 at only
~186 TOP/s (vs 268-310 on the wide FFN shapes) at M=7680. This probe
tiles the same contraction in Pallas with VMEM accumulation and sweeps
block shapes. If a tiling clearly beats XLA here, it's worth wiring into
QuantDense; if not, the ceiling table stands as-is.

Run on the TPU: python tools/ab_w8a8_kernel.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make_kernel():
        def kernel(x_ref, w_ref, xs_ref, ws_ref, o_ref, acc_scr):
            ki = pl.program_id(2)
            nk = pl.num_programs(2)

            @pl.when(ki == 0)
            def _init():
                acc_scr[:] = jnp.zeros_like(acc_scr)

            acc_scr[:] += jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

            @pl.when(ki == nk - 1)
            def _finish():
                o_ref[:] = (acc_scr[:].astype(jnp.float32)
                            * xs_ref[:] * ws_ref[:]).astype(o_ref.dtype)

        return kernel

    def w8a8_pallas(xq, w, xs, ws, bm, bn, bk):
        M, K = xq.shape
        N = w.shape[1]
        grid = (M // bm, N // bn, K // bk)
        return pl.pallas_call(
            make_kernel(),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda m, n, k: (m, k)),
                pl.BlockSpec((bk, bn), lambda m, n, k: (k, n)),
                pl.BlockSpec((bm, 1), lambda m, n, k: (m, 0)),
                pl.BlockSpec((1, bn), lambda m, n, k: (0, n)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(xq, w, xs.astype(jnp.float32), ws.reshape(1, -1).astype(jnp.float32))

    rng = np.random.default_rng(0)
    LOOPS = 30
    M, K, N = 7680, 4096, 4096
    xq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    xs = jnp.asarray(rng.uniform(1e-3, 1e-2, (M, 1)), jnp.float32)
    ws = jnp.asarray(rng.uniform(1e-3, 1e-2, (N,)), jnp.float32)

    def xla(xq, w, xs, ws):
        acc = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (xs * ws[None, :])
                ).astype(jnp.bfloat16)

    def timed(f):
        def run(xq, w, xs, ws):
            def body(i, acc):
                return acc + f(xq + i.astype(jnp.int8), w, xs, ws
                               ).astype(jnp.float32)[0, 0]
            return jax.lax.fori_loop(0, LOOPS, body, jnp.float32(0))
        g = jax.jit(run)
        float(g(xq, w, xs, ws))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(g(xq, w, xs, ws))
            ts.append(time.perf_counter() - t0)
        return min(ts) / LOOPS

    t_xla = timed(xla)
    print(f"xla        {t_xla*1e3:7.3f}ms {2*M*K*N/t_xla/1e12:6.1f} TOP/s",
          flush=True)

    o_ref = np.asarray(jax.jit(xla)(xq, w, xs, ws), np.float32)
    for bm in (512, 1024):
        for bn in (512, 1024):
            for bk in (512, 1024, 2048):
                f = lambda a, b, c, d, bm=bm, bn=bn, bk=bk: w8a8_pallas(
                    a, b, c, d, bm, bn, bk)
                o = np.asarray(jax.jit(f)(xq, w, xs, ws), np.float32)
                err = np.abs(o - o_ref).max()
                t = timed(f)
                print(f"pallas[{bm}x{bn}x{bk}] {t*1e3:7.3f}ms "
                      f"{2*M*K*N/t/1e12:6.1f} TOP/s "
                      f"speedup {t_xla/t:5.2f}x maxdiff {err:g}", flush=True)


if __name__ == "__main__":
    main()
