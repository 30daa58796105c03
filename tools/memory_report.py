"""Per-device memory accounting for sharded training steps.

Two sources, both chip-independent:
  - EXACT param / optimizer-state bytes per device, computed from each
    leaf's NamedSharding shard shape — this is the number the FSDP and
    pipeline HBM claims rest on (params + Adam moments are the dominant
    persistent HBM for large backbones);
  - XLA's CompiledMemoryStats for the AOT-compiled train step
    (argument/output/temp/peak bytes) on the virtual mesh — relative
    temp/activation comparisons between layouts (absolute values are
    CPU-backend numbers, not TPU HBM).

Usage (one JSON line per spec, same spec grammar as bench --mesh):

  python tools/memory_report.py 8 8:2 8:2:1:1:f 8:1:2

The reference has no counterpart (single-device torch,
/root/reference/tasks/base.py:157-160).
"""

import json
import os
import sys

SPECS = sys.argv[1:] or ["8", "8:2", "8:2:1:1:f", "8:1:2"]
_N = max(int(s.split(":")[0]) for s in SPECS)
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={_N}")
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_trainer  # noqa: E402


def per_device_bytes(tree) -> int:
    """Exact bytes per device: each leaf contributes its SHARD size."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        if not hasattr(leaf, "shape"):
            continue
        shape = (leaf.sharding.shard_shape(leaf.shape)
                 if isinstance(leaf, jax.Array) else leaf.shape)
        total += int(np.prod(shape, dtype=np.int64)) * leaf.dtype.itemsize
    return int(total)


def report(spec: str, batch: int = 16, history_len: int = 64) -> dict:
    parts = spec.split(":")
    n = int(parts[0])
    tensor = int(parts[1]) if len(parts) > 1 else 1
    stage = int(parts[2]) if len(parts) > 2 else 1
    expert = int(parts[3]) if len(parts) > 3 else 1
    fsdp = len(parts) > 4 and parts[4].lower() in ("f", "fsdp", "1")
    model = "mixtral-tiny" if expert > 1 else "llama-tiny"

    setup = None
    if tensor * stage * expert > 1 or fsdp or n > 1:
        setup = {"tensor_parallel": tensor,
                 **({"pipeline_parallel": stage} if stage > 1 else {}),
                 **({"expert_parallel": expert} if expert > 1 else {}),
                 **({"fsdp": True, "fsdp_min_size": 64} if fsdp else {}),
                 "data_parallel": n // (tensor * stage * expert)}
    import contextlib
    import io
    with contextlib.redirect_stdout(io.StringIO()):
        t = build_trainer(model, batch, history_len, bf16=False,
                          prefix_cache=stage <= 1, setup_extra=setup)
        b = next(iter(t.train_pipeline))
        arrays = t._device_batch(t.train_model_inputs(b))
        valid = jnp.asarray(b["valid"])
        compiled = t.train_step.lower(
            t.params, t.opt_state, arrays, valid, t._next_rng()).compile()
    ma = compiled.memory_analysis()
    return {
        "spec": spec,
        "mesh": dict(t.mesh.shape) if t.mesh is not None else None,
        "params_bytes_per_device": per_device_bytes(t.params),
        "opt_state_bytes_per_device": per_device_bytes(t.opt_state),
        "xla_train_step": {
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "peak_bytes": int(ma.peak_memory_in_bytes),
        },
        "note": "params/opt exact from shard shapes; xla stats are "
                "virtual-CPU-mesh relative indicators, not TPU HBM",
    }


if __name__ == "__main__":
    for s in SPECS:
        print(json.dumps(report(s)))
