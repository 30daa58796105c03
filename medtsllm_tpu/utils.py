"""Run utilities: run ids, seeding, dtype policy.

Mirrors reference utils.py:7-16,86-95 but with an explicit JAX PRNG story:
JAX randomness is key-threaded (deterministic by construction), so
`set_seed` only seeds python/numpy for the host-side pipeline and returns
the root `jax.random.PRNGKey` for the model.
"""

from __future__ import annotations

import datetime
import random

import jax
import jax.numpy as jnp
import numpy as np


# batch keys that enter the jit graph as arrays (everything else —
# descriptions, examples — is host-side prompt material). One canonical
# tuple: tasks/base.model_inputs and the PromptBuilder filter both key
# on it; task trainers may append task-specific arrays (imputation's
# "mask") AFTER the filter.
ARRAY_BATCH_KEYS = ("x_enc", "y", "labels", "index", "valid")


def get_run_id(config=None) -> str:
    """Timestamp run ids; DEBUG- prefix when config.DEBUG (utils.py:7-10)."""
    run_id = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    if config is not None and config.get("DEBUG", False):
        run_id = "DEBUG-" + run_id
    return run_id


def set_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNG key.

    The reference seeds python+torch (utils.py:14-16) and notably NOT numpy;
    we seed numpy too since our host pipeline uses numpy shuffling.
    """
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


_DTYPE_TABLE = {
    "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
    "float16": jnp.float16, "half": jnp.float16, "fp16": jnp.float16,
    "16": jnp.float16, 16: jnp.float16,
    "float32": jnp.float32, "float": jnp.float32, "fp32": jnp.float32,
    "32": jnp.float32, 32: jnp.float32,
}


class Precision:
    """One dtype policy object (SURVEY.md §5.9).

    - `param_dtype`: dtype parameters are stored in.
    - `compute_dtype`: dtype of matmuls/activations.
    "mixed" = fp32 params + bf16 compute regions, matching the reference's
    fp32 weights + torch.autocast(bf16) (tasks/base.py:257-275).
    """

    def __init__(self, name: str | int = "float32"):
        self.name = name
        if name == "mixed":
            self.param_dtype = jnp.float32
            self.compute_dtype = jnp.bfloat16
        else:
            if name not in _DTYPE_TABLE:
                raise ValueError(f"Invalid dtype selection: {name}")
            self.param_dtype = _DTYPE_TABLE[name]
            self.compute_dtype = _DTYPE_TABLE[name]
        self.mixed = name == "mixed"

    def __repr__(self):
        return f"Precision({self.name!r})"


def get_dtype(name: str | int):
    """Reference-compatible dtype resolver (utils.py:86-95)."""
    if name == "mixed":
        return jnp.float32
    if name not in _DTYPE_TABLE:
        raise ValueError(f"Invalid dtype selection: {name}")
    return _DTYPE_TABLE[name]


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def tree_size_bytes(params) -> int:
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for x in jax.tree.leaves(params))
