"""MoE layer decomposition at the moe-8x1b serving shape: where does the
time go between routing/dispatch and the expert matmuls?

Times three programs at one MoE layer's production shape
(T = batch x 112-token prefix-cached region, D = 2048, F = 5632,
E = 8, k = 2, capacity 1.25 -> C slots per expert):

  1. full MoEMLP.apply (router + dispatch scatter/gather + E-batched
     w8a8 expert matmuls + weighted combine),
  2. experts-only lower bound: the three batched s8xs8 matmuls on the
     same [E, C, *] shapes (what an ideal zero-overhead dispatch costs),
  3. dense-active-equivalent: the same SwiGLU FLOPs as k dense matmuls
     over [T, D] (what a dense model with the same ACTIVE params costs).

(1) - (2) is the routing + dispatch + combine overhead; (2) vs (3) shows
what expert batching costs relative to dense matmuls of equal FLOPs.
Run on the TPU: python tools/ab_moe.py [--batch 80]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, *args, mix_arg=-1, reps=3):
    """Per-call time via the ON-DEVICE fori_loop slope (bench.py
    measure_eval_on_device): one jitted program runs the body K times
    with a traced trip count, so host<->device traffic is one dispatch +
    one readback per timing and the K_hi-vs-K_lo slope contains zero
    host cost. (The old depth-8 dispatch-group timing charged ~floor/8
    to every call — under a 30 ms storm floor that inflated each number
    by ~4 ms, which is LARGER than the true per-layer cost and made the
    printed overhead percentages meaningless.) The loop index is mixed
    into the activation argument (x * (1 + i*1e-30), exact identity in
    f32) so XLA cannot hoist the loop-invariant body — the LICM bug
    class documented in BASELINE.md."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(a, K):
        def body(i, acc):
            aa = list(a)
            t = aa[mix_arg]
            aa[mix_arg] = (t * (1.0 + i.astype(jnp.float32) * 1e-30)
                           ).astype(t.dtype)
            out = fn(*aa)
            return acc + jnp.sum(out).astype(jnp.float32)
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    def t_of(K):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(args, K))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    float(run(args, 1))  # compile + absorb the first-exec stall
    k_lo = 2
    per_est = max(t_of(k_lo) / k_lo, 1e-5)
    k_hi = max(k_lo * 8, min(512, int(4.0 / per_est)))
    per = (t_of(k_hi) - t_of(k_lo)) / (k_hi - k_lo)
    if not per > 0:
        per = t_of(k_hi) / k_hi
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=80)
    ap.add_argument("--tokens", type=int, default=112)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from medtsllm_tpu.models.llm.loader import resolve_config
    from medtsllm_tpu.models.llm.transformer import MoEMLP, _act_quant_bmm

    cfg, _ = resolve_config("moe-8x1b")
    D, F, E, k = cfg.d_model, cfg.d_ff, cfg.n_experts, cfg.n_experts_per_tok
    T = args.batch * args.tokens
    from medtsllm_tpu.models.llm.transformer import moe_capacity
    C = moe_capacity(T, E, k, cfg.expert_capacity)
    print(f"T={T} D={D} F={F} E={E} k={k} C={C}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, T, D)), jnp.float32)

    moe = MoEMLP(cfg, quantize=8)
    params = jax.jit(moe.init)(jax.random.PRNGKey(0), x)["params"]
    full = jax.jit(lambda p, xx: moe.apply({"params": p}, xx))
    t_full = timed(full, params, x)

    # grouped-dispatch full layer (the serving default): dropless Pallas
    # gmm + gather packing instead of the capacity scatter + bmms
    import dataclasses
    moe_g = MoEMLP(dataclasses.replace(cfg, moe_grouped=True), quantize=8)
    full_g = jax.jit(lambda p, xx: moe_g.apply({"params": p}, xx))
    t_full_g = timed(full_g, params, x)

    # experts-only lower bound: same three bmm shapes, no dispatch
    h = jnp.asarray(rng.standard_normal((E, C, D)), jnp.float32)

    def experts_only(p, hh):
        g = _act_quant_bmm(hh, p["w_gate_q"], p["w_gate_scale"])
        u = _act_quant_bmm(hh, p["w_up_q"], p["w_up_scale"])
        act = jax.nn.silu(g) * u
        return _act_quant_bmm(act, p["w_down_q"], p["w_down_scale"])

    t_experts = timed(jax.jit(experts_only), params, h)

    # dense-active-equivalent: k x dense SwiGLU over [T, D] (w8a8)
    from medtsllm_tpu.models.llm.transformer import _act_quant_matmul
    wg = jnp.asarray(rng.integers(-127, 128, (D, F)), jnp.int8)
    wu = jnp.asarray(rng.integers(-127, 128, (D, F)), jnp.int8)
    wd = jnp.asarray(rng.integers(-127, 128, (F, D)), jnp.int8)
    sg = jnp.asarray(rng.uniform(1e-3, 1e-2, (F,)), jnp.float32)
    su = jnp.asarray(rng.uniform(1e-3, 1e-2, (F,)), jnp.float32)
    sd = jnp.asarray(rng.uniform(1e-3, 1e-2, (D,)), jnp.float32)

    def dense_active(xx):
        # gate and up MUST use distinct weights: with a shared weight XLA
        # CSEs the two projections into one matmul and the "dense" baseline
        # measures 2/3 of its true cost (this bug inflated the r4
        # batched-GEMM penalty estimate from 1.10x to 1.61x)
        xt = xx.reshape(T, D)
        out = xt
        for _ in range(k):
            g = _act_quant_matmul(out, wg, sg, 8)
            u = _act_quant_matmul(out, wu, su, 8)
            out = _act_quant_matmul(jax.nn.silu(g) * u, wd, sd, 8)
        return out

    t_dense = timed(jax.jit(dense_active), x)

    print(f"full MoE layer      : {t_full*1e3:8.2f} ms", flush=True)
    print(f"full layer (grouped): {t_full_g*1e3:8.2f} ms "
          f"(dropless gmm serving default; overhead vs capacity bmm "
          f"{100*(t_full_g-t_full)/t_full:+.0f}%)", flush=True)
    print(f"experts-only bmms   : {t_experts*1e3:8.2f} ms "
          f"(dispatch+router overhead {100*(t_full-t_experts)/t_full:.0f}%)",
          flush=True)
    print(f"dense k-pass equiv  : {t_dense*1e3:8.2f} ms "
          f"(expert batching {t_experts/t_dense:.2f}x dense of equal "
          f"active FLOPs; slots/tokens ratio {E*C/(T*k):.2f})", flush=True)


if __name__ == "__main__":
    main()
