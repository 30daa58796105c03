"""Device mesh construction."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def create_mesh(data: int = -1, tensor: int = 1, stage: int = 1,
                expert: int = 1, devices=None) -> Mesh:
    """Mesh with ("data"[, "stage"][, "expert"], "tensor") axes. data=-1
    consumes the remaining devices. Tensor-parallel groups are laid out on
    adjacent device ids so TP collectives ride ICI neighbors; expert
    groups (MoE all-to-all) sit one level out, pipeline stages outermost
    (stage hops are one ppermute per microbatch — far less traffic than
    TP's per-matmul collectives)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    per = tensor * stage * expert
    if data == -1:
        assert n % per == 0, (
            f"{n} devices not divisible by tensor={tensor} x stage={stage}"
            f" x expert={expert}")
        data = n // per
    assert data * per == n, (
        f"mesh {data}x{stage}x{expert}x{tensor} != {n} devices")
    names = (("data",) + (("stage",) if stage > 1 else ())
             + (("expert",) if expert > 1 else ()) + ("tensor",))
    shape = ((data,) + ((stage,) if stage > 1 else ())
             + ((expert,) if expert > 1 else ()) + (tensor,))
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=names)


def mesh_from_config(config) -> Mesh | None:
    """[setup] mesh config: `tensor_parallel`, `pipeline_parallel`,
    `expert_parallel` (ints) and optional `data_parallel`. Returns None
    when running single-device unsharded."""
    setup = config.get("setup", {})
    if ("tensor_parallel" not in setup and "data_parallel" not in setup
            and "pipeline_parallel" not in setup
            and "expert_parallel" not in setup
            and not setup.get("fsdp", False)):
        return None  # sharding is opt-in
    tensor = int(setup.get("tensor_parallel", 1) or 1)
    stage = int(setup.get("pipeline_parallel", 1) or 1)
    expert = int(setup.get("expert_parallel", 1) or 1)
    data = int(setup.get("data_parallel", -1) or -1)
    n = len(jax.devices())
    if tensor == 1 and stage == 1 and expert == 1 and (n == 1 or data == 1):
        return None  # explicit or implied single-device run
    return create_mesh(data=data, tensor=tensor, stage=stage, expert=expert)
