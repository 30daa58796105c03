"""Parameter/batch sharding rules.

Megatron-style tensor parallelism for the decoder backbones: column-shard
the fan-out projections (q/k/v, mlp up/gate), row-shard the fan-in
projections (attention out, mlp down) — XLA inserts the all-reduce at the
row-sharded matmul output. Vocab table sharded over rows. Everything else
replicated. Batch arrays shard over "data".
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over the /-joined param path, spec) — first match wins;
# kernel_q/scale are the int8-quantized forms of the same projections
LLM_PARTITION_RULES = (
    # fused gpt2 qkv + separate llama q/k/v: shard output features
    (r".*(c_attn|q_proj|k_proj|v_proj)/base/kernel(_q)?$", P(None, "tensor")),
    (r".*(c_attn|q_proj|k_proj|v_proj)/base/(bias|scale)$", P("tensor")),
    # attention out / mlp down: shard input features (row-parallel)
    (r".*attn/(c_proj|o_proj)/base/kernel(_q)?$", P("tensor", None)),
    # mixtral sparse-MoE experts (transformer.py MoEMLP): stacked
    # [E, in, out] weights shard experts over "expert", within-expert
    # Megatron column/row over "tensor"; the router gate ([d, E], tiny)
    # stays replicated. GSPMD turns the dispatch scatter/gather into the
    # token all-to-all between "data" and "expert" groups.
    (r".*mlp/(w_gate|w_up)(_q)?$", P("expert", None, "tensor")),
    (r".*mlp/(w_gate|w_up)_scale$", P("expert", "tensor")),
    (r".*mlp/w_down(_q)?$", P("expert", "tensor", None)),
    (r".*mlp/w_down_scale$", P("expert", None)),
    # mlp fan-out (wi/wi_0/wi_1 are the t5 FFN names)
    (r".*mlp/(c_fc|gate_proj|up_proj|wi|wi_0|wi_1)/kernel(_q)?$",
     P(None, "tensor")),
    (r".*mlp/(c_fc|gate_proj|up_proj|wi|wi_0|wi_1)/(bias|scale)$",
     P("tensor")),
    # mlp fan-in (wo is the t5 FFN output)
    (r".*mlp/(c_proj|down_proj|wo)/kernel(_q)?$", P("tensor", None)),
    # mamba mixer (models/llm/mamba.py): channel-parallel over d_inner E —
    # the selective scan is elementwise in E, so it shards for free.
    # in_proj fan-out [D, 2E] column-sharded; x_proj/out_proj fan-in
    # [E, .] row-sharded (XLA psums their outputs); per-channel conv,
    # dt fan-out, A_log/D shard their E axis
    (r".*(in_proj|dt_proj)/kernel(_q)?$", P(None, "tensor")),
    (r".*(in_proj|dt_proj)/(bias|scale)$", P("tensor")),
    (r".*(x_proj|out_proj)/kernel(_q)?$", P("tensor", None)),
    (r".*/conv_kernel$", P(None, None, "tensor")),
    (r".*/conv_bias$", P("tensor")),
    (r".*/A_log$", P("tensor", None)),
    (r".*/D$", P("tensor")),
    # token table: shard the embedding rows (vocab)
    (r".*/wte$|^wte$", P("tensor", None)),
    # lora adapters: a column-sharded on rank? keep replicated (tiny)
)


# Leaves smaller than this stay replicated under FSDP: gathering a
# layernorm scale costs more in collective latency than its bytes save.
FSDP_MIN_SIZE = 2 ** 16


def fsdp_spec(spec: P, shape, mesh: Mesh, min_size: int = FSDP_MIN_SIZE) -> P:
    """ZeRO-3-style upgrade of a TP/EP/stage spec: shard one remaining
    unsharded dim of a large leaf over the "data" axis, so parameters —
    and, because optimizer state mirrors param shardings, the Adam
    moments — are fully partitioned across the mesh. XLA/GSPMD inserts
    the per-layer all-gather on use and the reduce-scatter on the
    gradient (the ZeRO-3 / FSDP communication schedule) from this layout
    alone; no hand-written collectives. The largest eligible dim is
    chosen so the all-gathers move contiguous slabs."""
    if "data" not in mesh.shape or mesh.shape["data"] == 1:
        return spec
    # Vectors (norm scales, biases) stay replicated regardless of size:
    # their all-gathers are latency-bound and XLA can't overlap a gather
    # this small with anything useful.
    if len(shape) < 2 or int(np.prod(shape)) < min_size:
        return spec
    axes = list(spec) + [None] * (len(shape) - len(spec))
    dp = mesh.shape["data"]
    best = None
    for dim, axis in enumerate(axes):
        if axis is None and shape[dim] % dp == 0:
            if best is None or shape[dim] > shape[best]:
                best = dim
    if best is None:
        return spec
    axes[best] = "data"
    return P(*axes)


def partition_spec_for(path: str, shape, rules=LLM_PARTITION_RULES) -> P:
    # pipeline-stacked blocks (nn.scan over layers, transformer.py
    # h_stack): every leaf gains a leading [n_layers] axis sharded over
    # the "stage" mesh axis; the per-layer rule applies one dim deeper
    stacked = "h_stack" in path
    for pattern, spec in rules:
        if re.match(pattern, path):
            if stacked:
                spec = P("stage", *spec)
            # drop axes the shape can't support
            if len(spec) <= len(shape):
                return spec
    return P("stage") if stacked else P()


def _iter_paths(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for keypath, leaf in flat:
        path = "/".join(str(getattr(k, "key", k)) for k in keypath)
        yield path, leaf


def shard_params(params, mesh: Mesh, rules=LLM_PARTITION_RULES,
                 divisibility_fallback: bool = True,
                 fsdp: bool = False, fsdp_min_size: int = FSDP_MIN_SIZE):
    """device_put each param with its NamedSharding. A sharded dim that is
    not divisible by its mesh axis (or whose axis the mesh doesn't have)
    falls back to replication along that dim only — the other dims keep
    their sharding (a stacked pipeline leaf stays stage-sharded even when
    its tensor dim can't split). With ``fsdp=True`` every large leaf
    additionally shards one free dim over "data" (ZeRO-3 layout, see
    fsdp_spec)."""
    def place(path, leaf):
        spec = partition_spec_for(path, np.shape(leaf), rules)
        if divisibility_fallback and spec != P():
            shape = np.shape(leaf)
            spec = P(*[
                axis if (axis is not None and axis in mesh.shape
                         and shape[dim] % mesh.shape[axis] == 0) else None
                for dim, axis in enumerate(spec)])
        if fsdp:
            spec = fsdp_spec(spec, np.shape(leaf), mesh, fsdp_min_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves = [place("/".join(str(getattr(k, "key", k)) for k in kp), leaf)
              for kp, leaf in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def batch_spec(ndim: int) -> P:
    return P("data", *([None] * (ndim - 1)))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    out = {}
    for k, v in batch.items():
        if k == "prefix_ids":
            # the constant prompt head is shared by every row: replicate
            # over the mesh instead of sharding over "data"
            out[k] = jax.device_put(v, NamedSharding(mesh, P()))
        elif k == "prefix_kv":
            # already on device from the jitted prefill, sharded however
            # XLA laid it out (kv heads over "tensor" under TP) — keep it
            out[k] = v
        elif hasattr(v, "ndim"):
            out[k] = jax.device_put(
                v, NamedSharding(mesh, batch_spec(v.ndim)))
        else:
            out[k] = v
    return out
