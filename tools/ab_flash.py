"""On-chip A/B: Pallas flash attention vs XLA-fused attention.

Run on the TPU: python tools/ab_flash.py [--tune]

Sweeps the shapes this framework actually runs (VERDICT r1 item 3):
  - 1B backbone (TinyLlama shape): H=32, KV=4 (GQA), head_dim 64
  - 7B backbone (Llama-2 shape):   H=32, KV=32,      head_dim 128
at sequence lengths 256..4096, batch scaled to keep total work constant.
Checks numerics against the jnp oracle first, then times both paths with
the looped-on-device trick (the axon tunnel adds ~30ms/dispatch; only a
4-byte scalar comes home). --tune additionally sweeps (block_q, block_k).

The verdict this script produces decides _MIN_SEQ_FOR_KERNEL in
ops/pallas/flash_attention.py and the A/B table in BASELINE.md.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tune", action="store_true",
                    help="sweep (block_q, block_k) per shape")
    ap.add_argument("--causal", type=int, default=1)
    ap.add_argument("--seqs", default="256,512,1024,2048,4096",
                    help="comma-separated sequence lengths")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from medtsllm_tpu.ops.pallas.flash_attention import (
        _attention_reference, _flash_attention_pallas)

    causal = bool(args.causal)
    rng = np.random.default_rng(0)
    # (name, H, KV, D); batch chosen per-L to hold B*H*L^2*D roughly fixed
    families = [("1b gqa d64", 32, 4, 64), ("7b mha d128", 32, 32, 128)]
    seqs = tuple(int(s) for s in args.seqs.split(","))
    LOOPS = 20

    for name, H, KV, D in families:
        for L in seqs:
            # cap B so the XLA path's materialized [B,H,L,L] f32 score
            # tensor stays ~<=1GB (the pallas path never materializes it)
            B = max(1, min(64, int(2 ** 30 / (H * L * L * 4))))
            q = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
            k = jnp.asarray(rng.normal(size=(B, KV, L, D)), jnp.bfloat16)
            v = jnp.asarray(rng.normal(size=(B, KV, L, D)), jnp.bfloat16)
            scale = 1.0 / np.sqrt(D)

            def xla_path(q, k, v):
                return _attention_reference(q, k, v, causal, scale)

            blocks = ([(bq, bk) for bq in (128, 256)
                       for bk in (128, 256, 512) if bq <= L and bk <= L]
                      if args.tune else [(min(256, L), min(256, L))])

            # numerics once per shape (default blocks)
            bq0, bk0 = blocks[0]
            o_pl = _flash_attention_pallas(q, k, v, causal, scale, bq0, bk0)
            o_ref = xla_path(q, k, v)
            err = float(jnp.max(jnp.abs(o_pl.astype(jnp.float32)
                                        - o_ref.astype(jnp.float32))))

            def looped(f):
                def run(q, k, v):
                    def body(i, acc):
                        qi = q + (i % 3).astype(q.dtype) * 1e-3
                        return acc + f(qi, k, v).astype(
                            jnp.float32)[0, 0, 0, 0]
                    return jax.lax.fori_loop(0, LOOPS, body, jnp.float32(0))
                return jax.jit(run)

            def best(f, reps=3):
                float(f(q, k, v))  # compile + warm
                ts = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    float(f(q, k, v))
                    ts.append(time.perf_counter() - t0)
                return min(ts) / LOOPS

            t_ref = best(looped(jax.jit(xla_path)))
            results = []
            for bq, bk in blocks:
                f_pl = jax.jit(lambda q, k, v, bq=bq, bk=bk:
                               _flash_attention_pallas(q, k, v, causal,
                                                       scale, bq, bk))
                results.append((best(looped(f_pl)), bq, bk))
            t_pl, bq, bk = min(results)
            # attention FLOPs: 2 matmuls, causal halves the work
            flops = 2 * 2 * B * H * L * L * D * (0.5 if causal else 1.0)
            print(f"{name:12s} L={L:5d} B={B:3d} "
                  f"pallas[{bq}x{bk}] {t_pl*1e3:7.3f}ms "
                  f"({flops/t_pl/1e12:5.1f} TF/s) "
                  f"xla {t_ref*1e3:7.3f}ms speedup {t_ref/t_pl:5.2f}x "
                  f"maxdiff {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
