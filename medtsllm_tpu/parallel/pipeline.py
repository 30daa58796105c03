"""GPipe-style pipeline parallelism over a stacked layer axis.

The reference is single-device (no pipeline anywhere; its 7B backbone
must fit one GPU, /root/reference/models/medtsllm.py:129-233 loads it
whole). On TPU pods the production lever for backbones larger than one
chip's HBM is staging the layer stack across a "stage" mesh axis and
streaming microbatches through it over ICI. This module implements that
schedule the JAX way:

- layer params live STACKED, one tree whose leaves have a leading
  [n_layers] axis, sharded ``P("stage", ...)`` — each device group holds
  only its own layers' weights (the HBM saving is real, not emulated);
- the schedule runs inside ``jax.shard_map`` manual over the "stage"
  axis only — "data" and "tensor" remain auto (GSPMD), so pipeline
  composes with the existing DP batch sharding and Megatron TP rules
  (parallel/sharding.py) without either knowing about the other;
- microbatches flow stage-to-stage via ``lax.ppermute`` (ICI
  neighbor hops), the tick loop is a ``lax.scan`` (one compiled
  program, no per-tick dispatch), and backward is plain jax AD through
  the scan — the GPipe "all-forward then all-backward" schedule with
  optional per-layer remat.

Bubble accounting: with S stages and M microbatches the pipeline runs
M + S - 1 ticks, so utilization is M / (M + S - 1) — callers pick
``n_microbatches`` >= 2-4x the stage count to amortize (GPipe's rule).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_layer_params(per_layer: list) -> dict:
    """Stack N structurally-identical per-layer param trees into one tree
    whose leaves carry a leading [N] layer axis (host-side, numpy ok)."""
    import numpy as np
    return jax.tree.map(lambda *ws: np.stack([np.asarray(w) for w in ws]),
                        *per_layer)


def unstack_layer_params(stacked, n_layers: int) -> list:
    """Inverse of stack_layer_params (host-side)."""
    return [jax.tree.map(lambda w: w[i], stacked) for i in range(n_layers)]


def pipeline_spec(spec: P) -> P:
    """Prepend the stage axis to a per-layer partition spec: a per-layer
    kernel rule P(None, "tensor") becomes P("stage", None, "tensor") on
    the stacked [L, in, out] leaf."""
    return P("stage", *spec)


def pipeline_apply(block_fn, stacked_params, x, *, mesh: Mesh,
                   n_microbatches: int, stage_axis: str = "stage",
                   checkpoint_policy=None):
    """Run ``x`` through ``n_layers`` of ``block_fn`` pipelined over the
    mesh's ``stage_axis``.

    block_fn(layer_params, x) -> x          one layer, pure, shape-preserving
    stacked_params                          tree, leaves [n_layers, ...],
                                            placed/constrained P("stage", ...)
    x                                       [batch, ...]; batch divisible by
                                            n_microbatches; microbatch rows
                                            stay sharded over "data" (auto)
    checkpoint_policy                       None | True | jax.checkpoint
                                            policy: remat each layer in
                                            backward (GPipe memory profile)

    Numerically identical to applying the layers sequentially (the unit
    tests assert fwd+grad parity vs a lax.scan over layers).
    """
    n_stages = mesh.shape[stage_axis]
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if n_layers % n_stages != 0:
        raise ValueError(
            f"n_layers={n_layers} not divisible by {n_stages} stages")
    batch = x.shape[0]
    if batch % n_microbatches != 0:
        raise ValueError(
            f"batch={batch} not divisible by {n_microbatches} microbatches")

    if checkpoint_policy is True:
        block_fn = jax.checkpoint(block_fn)
    elif checkpoint_policy is not None:
        block_fn = jax.checkpoint(block_fn, policy=checkpoint_policy)

    stream = x.reshape(n_microbatches, batch // n_microbatches, *x.shape[1:])

    def body(local_params, stream):
        # local_params leaves: [n_layers/S, ...] (this stage's layers);
        # stream: [M, mB, ...] replicated over stage, data-sharded (auto)
        s = jax.lax.axis_index(stage_axis)
        n_ticks = n_microbatches + n_stages - 1
        ndim = stream.ndim - 1

        def stage_layers(x):
            def step(x, p):
                return block_fn(p, x), None
            out, _ = jax.lax.scan(step, x, local_params)
            return out

        def tick(carry, t):
            recv, acc = carry
            # stage 0 feeds from the microbatch stream; later stages from
            # the neighbor hop. Ticks past the stream end re-feed the last
            # microbatch — their outputs are never recorded (bubble).
            inject = jnp.where(
                s == 0, stream[jnp.minimum(t, n_microbatches - 1)], recv)
            y = stage_layers(inject)
            # the last stage records finished microbatch t-(S-1)
            idx = jnp.clip(t - (n_stages - 1), 0, n_microbatches - 1)
            upd = jax.lax.dynamic_update_slice(acc, y[None],
                                               (idx,) + (0,) * ndim)
            acc = jnp.where(t >= n_stages - 1, upd, acc)
            recv = jax.lax.ppermute(
                y, stage_axis,
                [(i, (i + 1) % n_stages) for i in range(n_stages)])
            return (recv, acc), None

        varying = partial(jax.lax.pcast, axis_name=(stage_axis,),
                          to="varying")
        carry0 = (varying(jnp.zeros_like(stream[0])),
                  varying(jnp.zeros_like(stream)))
        (_, acc), _ = jax.lax.scan(tick, carry0, jnp.arange(n_ticks))
        # only the last stage holds real outputs; psum broadcasts them
        # (each other stage contributes zeros)
        return jax.lax.psum(jnp.where(s == n_stages - 1, acc, 0.0),
                            stage_axis)

    # scope the ambient (abstract) mesh so the partial-manual shard_map
    # (auto axes: everything but stage) resolves even when the caller's
    # jit has no mesh context (the trainer relies on NamedSharding
    # propagation); use_abstract_mesh is legal under tracing, set_mesh is
    # not
    from jax.sharding import use_abstract_mesh
    with use_abstract_mesh(mesh.abstract_mesh):
        out = jax.shard_map(body, mesh=mesh, axis_names={stage_axis},
                            in_specs=(P(stage_axis), P()), out_specs=P())(
            stacked_params, stream)
    return out.reshape(batch, *x.shape[1:])
