"""On-chip A/B: fused Pallas selective-scan kernels vs the XLA graph.

Run on the TPU: python tools/ab_ssm.py
Reproduces the BASELINE.md numbers at the mamba-130m layer shape:
forward (selective_ssm vs _ssm_reference) and full forward+gradient
(the fused adjoint kernel vs jax.vjp of the reference graph), with
numerics checks.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from medtsllm_tpu.ops.pallas.selective_scan import (_ssm_reference,
                                                        selective_ssm)

    rng = np.random.default_rng(0)
    B, L, E, N = 48, 160, 1536, 16  # mamba-130m layer at the bench batch
    args = (
        jnp.asarray(np.abs(rng.normal(size=(B, L, E))) * 0.1, jnp.float32),
        -jnp.asarray(np.abs(rng.normal(size=(N, E))), jnp.float32),
        jnp.asarray(rng.normal(size=(B, L, N)), jnp.float32),
        jnp.asarray(rng.normal(size=(B, L, N)), jnp.float32),
        jnp.asarray(rng.normal(size=(B, L, E)), jnp.float32),
        jnp.asarray(rng.normal(size=(E,)), jnp.float32),
    )

    def timed(f, depth=8):
        # back-to-back dispatch, one readback per group: amortizes the
        # tunnel's variable per-readback floor (BASELINE.md "Dispatch
        # protocol"); sync-per-call would charge it to every call
        out = f(*args)
        float(jax.tree_util.tree_leaves(out)[0].sum())
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            outs = [f(*args) for _ in range(depth)]
            float(jnp.stack([jax.tree_util.tree_leaves(o)[0].sum()
                             for o in outs]).sum())
            ts.append((time.perf_counter() - t0) / depth)
        return min(ts)

    f_k = jax.jit(selective_ssm)
    f_r = jax.jit(_ssm_reference)
    err = float(jnp.abs(f_k(*args) - f_r(*args)).max())
    t_k, t_r = timed(f_k), timed(f_r)
    print(f"forward : pallas {t_k*1e3:7.1f}ms  xla {t_r*1e3:7.1f}ms "
          f"speedup {t_r/t_k:5.2f}x  maxdiff {err:g}", flush=True)

    g_k = jax.jit(jax.grad(lambda *a: (selective_ssm(*a) ** 2).mean(),
                           argnums=tuple(range(6))))
    g_r = jax.jit(jax.grad(lambda *a: (_ssm_reference(*a) ** 2).mean(),
                           argnums=tuple(range(6))))
    rel = max(float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
              for a, b in zip(g_k(*args), g_r(*args)))
    t_gk, t_gr = timed(g_k), timed(g_r)
    print(f"fwd+grad: pallas {t_gk*1e3:7.1f}ms  xla {t_gr*1e3:7.1f}ms "
          f"speedup {t_gr/t_gk:5.2f}x  max grad reldiff {rel:g}", flush=True)


if __name__ == "__main__":
    main()
