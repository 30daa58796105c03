"""Parallelism: device mesh + sharding rules (SURVEY.md §5.8).

The reference is single-device (no torch.distributed anywhere); scaling to
a TPU slice is native here: one `jax.sharding.Mesh` with ("data", "tensor")
axes, parameters of the LLM backbone sharded over "tensor" (ICI
collectives inserted by XLA), batch over "data".
"""

from .mesh import create_mesh, mesh_from_config  # noqa: F401
from .sharding import (  # noqa: F401
    FSDP_MIN_SIZE, LLM_PARTITION_RULES, batch_spec, fsdp_spec,
    partition_spec_for, shard_batch, shard_params,
)
