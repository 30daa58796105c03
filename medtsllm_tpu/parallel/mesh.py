"""Device mesh construction."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def create_mesh(data: int = -1, tensor: int = 1, devices=None) -> Mesh:
    """Mesh with ("data", "tensor") axes. data=-1 consumes the remaining
    devices. Tensor-parallel groups are laid out on adjacent device ids so
    TP collectives ride ICI neighbors."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % tensor == 0, f"{n} devices not divisible by tensor={tensor}"
        data = n // tensor
    assert data * tensor == n, f"mesh {data}x{tensor} != {n} devices"
    arr = np.asarray(devices).reshape(data, tensor)
    return Mesh(arr, axis_names=("data", "tensor"))


def mesh_from_config(config) -> Mesh | None:
    """[setup] mesh config: `tensor_parallel` (int) and optional
    `data_parallel`. Returns None when running single-device unsharded."""
    setup = config.get("setup", {})
    if "tensor_parallel" not in setup and "data_parallel" not in setup:
        return None  # sharding is opt-in
    tensor = int(setup.get("tensor_parallel", 1) or 1)
    data = int(setup.get("data_parallel", -1) or -1)
    n = len(jax.devices())
    if (n == 1 and tensor == 1) or (tensor == 1 and data == 1):
        return None  # explicit or implied single-device run
    return create_mesh(data=data, tensor=tensor)
