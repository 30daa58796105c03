"""Device mesh construction."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def create_mesh(data: int = -1, tensor: int = 1, stage: int = 1,
                devices=None) -> Mesh:
    """Mesh with ("data"[, "stage"], "tensor") axes. data=-1 consumes the
    remaining devices. Tensor-parallel groups are laid out on adjacent
    device ids so TP collectives ride ICI neighbors; pipeline stages sit
    one level out (stage hops are one ppermute per microbatch — far less
    traffic than TP's per-matmul collectives)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    per = tensor * stage
    if data == -1:
        assert n % per == 0, (
            f"{n} devices not divisible by tensor={tensor} x stage={stage}")
        data = n // per
    assert data * per == n, f"mesh {data}x{stage}x{tensor} != {n} devices"
    if stage > 1:
        arr = np.asarray(devices).reshape(data, stage, tensor)
        return Mesh(arr, axis_names=("data", "stage", "tensor"))
    arr = np.asarray(devices).reshape(data, tensor)
    return Mesh(arr, axis_names=("data", "tensor"))


def mesh_from_config(config) -> Mesh | None:
    """[setup] mesh config: `tensor_parallel`, `pipeline_parallel` (ints)
    and optional `data_parallel`. Returns None when running single-device
    unsharded."""
    setup = config.get("setup", {})
    if ("tensor_parallel" not in setup and "data_parallel" not in setup
            and "pipeline_parallel" not in setup):
        return None  # sharding is opt-in
    tensor = int(setup.get("tensor_parallel", 1) or 1)
    stage = int(setup.get("pipeline_parallel", 1) or 1)
    data = int(setup.get("data_parallel", -1) or -1)
    n = len(jax.devices())
    if tensor == 1 and stage == 1 and (n == 1 or data == 1):
        return None  # explicit or implied single-device run
    return create_mesh(data=data, tensor=tensor, stage=stage)
