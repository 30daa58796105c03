"""Multi-host (DCN) initialization (SURVEY.md §5.8).

On a multi-host TPU slice, `jax.distributed.initialize` must run before
first device use; afterwards `jax.devices()` spans the slice and the same
("data","tensor") mesh code paths apply unchanged — XLA routes
tensor-parallel collectives over ICI within a host group and data-parallel
gradient reductions over DCN.
"""

from __future__ import annotations

import os


def initialize_from_env() -> bool:
    """Initialize jax.distributed from standard env vars when present
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a
    TPU pod environment where initialize() autodetects). Returns True if
    multi-process mode was enabled; safe no-op on single host."""
    import jax

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nprocs = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    try:
        if coord and nprocs is not None and pid is not None:
            jax.distributed.initialize(coordinator_address=coord,
                                       num_processes=int(nprocs),
                                       process_id=int(pid))
            return True
        if os.environ.get("TPU_WORKER_HOSTNAMES"):
            jax.distributed.initialize()  # pod autodetection
            return True
    except RuntimeError:
        pass  # already initialized
    return False


def process_local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(local batch size, offset) for this process's shard of a global
    batch — hosts feed disjoint slices of each data-parallel batch."""
    import jax

    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    local = global_batch // n
    return local, jax.process_index() * local
