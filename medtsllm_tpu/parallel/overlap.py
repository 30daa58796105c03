"""Collective matmuls: overlap TP collectives with MXU compute.

The pjit path (parallel/sharding.py) lets XLA insert all-reduces after
row-parallel matmuls; on real ICI those collectives serialize with the
next layer's compute unless XLA's async scheduler finds the overlap.
This module implements the overlap *explicitly* as ring collective
matmuls under ``shard_map`` (the "collective matmul" of Wang et al. /
the scaling-book TP recipe, which the reference cannot express at all —
its NCCL use is framework-internal torch DDP — the reference is
strictly single-device, /root/reference/tasks/base.py:157-160 picks one
cuda/mps/cpu device and train.py:8-30 never shards):

  - ``allgather_matmul``:  y = allgather(x) @ W_col  — each ring step
    matmuls the resident shard while the next shard is in flight on ICI.
  - ``matmul_reduce_scatter``: y_scat = reduce_scatter(x @ W_row) — each
    ring step matmuls one output chunk while the partial sum for the
    previous chunk travels.

Together they form a sequence-parallel TP MLP (Korthikanti et al.):
activations stay token-sharded between blocks, the gather/scatter pair
replaces the all-reduce, and both halves hide their communication inside
the matmuls. On the CPU virtual mesh these are numerics-verified
(tests/test_overlap.py); the overlap itself is an ICI property.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _ring_perm(n: int):
    return [(j, (j + 1) % n) for j in range(n)]


def allgather_matmul(x_shard: jnp.ndarray, w_local: jnp.ndarray,
                     axis_name: str, n: int) -> jnp.ndarray:
    """x_shard [M/n, K] (token-sharded), w_local [K, N/n] (column shard)
    -> y [M, N/n] == concat_tokens(allgather(x)) @ w_local.

    Ring schedule: at step i every device matmuls the x shard that
    originated at device (idx - i) % n while simultaneously forwarding it
    around the ring — compute and ICI transfer of successive steps
    overlap because they have no data dependency.
    """
    idx = jax.lax.axis_index(axis_name)
    m = x_shard.shape[0]
    out = jnp.zeros((n * m, w_local.shape[1]), x_shard.dtype)

    def body(i, carry):
        out, cur = carry
        y = cur @ w_local
        src = jax.lax.rem(idx - i + n, n)
        out = jax.lax.dynamic_update_slice_in_dim(out, y, src * m, axis=0)
        cur = jax.lax.ppermute(cur, axis_name, _ring_perm(n))
        return out, cur

    out, _ = jax.lax.fori_loop(0, n, body, (out, x_shard))
    return out


def matmul_reduce_scatter(x: jnp.ndarray, w_local: jnp.ndarray,
                          axis_name: str, n: int) -> jnp.ndarray:
    """x [M, K/n] (feature shard), w_local [K/n, N] (row shard)
    -> y_shard [M/n, N] == reduce_scatter_tokens(sum_d x_d @ w_d).

    Ring schedule: the accumulator for output chunk c is created at
    device (c + 1) % n and rides the ring once (+1 per step), landing
    fully reduced at device c after n - 1 hops; device d therefore
    computes the partial for chunk (d - 1 - i) % n at step i and adds it
    to the arriving sum. The ppermute of the accumulator overlaps the
    next chunk's matmul.
    """
    assert x.shape[0] % n == 0, (
        f"matmul_reduce_scatter needs M divisible by n ({x.shape[0]} % {n})")
    idx = jax.lax.axis_index(axis_name)
    m = x.shape[0] // n

    def partial(c):
        rows = jax.lax.dynamic_slice_in_dim(x, c * m, m, axis=0)
        return rows @ w_local

    acc = partial(jax.lax.rem(idx - 1 + n, n))

    def body(i, acc):
        acc = jax.lax.ppermute(acc, axis_name, _ring_perm(n))
        return acc + partial(jax.lax.rem(idx - 1 - i + 2 * n, n))

    return jax.lax.fori_loop(1, n, body, acc)


def tp_mlp_overlapped(x_shard, w_up, w_down, axis_name: str, n: int,
                      act=jax.nn.gelu):
    """Sequence-parallel TP MLP: token-sharded in, token-sharded out.

    x_shard [M/n, D]; w_up [D, F/n] column shard; w_down [F/n, D] row
    shard. allgather_matmul hides the gather inside the up-projection,
    matmul_reduce_scatter hides the reduce inside the down-projection —
    no exposed all-reduce anywhere.
    """
    h = act(allgather_matmul(x_shard, w_up, axis_name, n))
    return matmul_reduce_scatter(h, w_down, axis_name, n)


def tp_mlp_reference(x, w_up_full, w_down_full, act=jax.nn.gelu):
    return act(x @ w_up_full) @ w_down_full


def make_sharded_mlp(mesh: Mesh, axis_name: str = "tensor",
                     act=jax.nn.gelu, overlapped: bool = True):
    """jit-able f(x [M, D], w_up [D, F], w_down [F, D]) running the MLP
    tensor-parallel over ``axis_name`` of ``mesh``. ``overlapped=False``
    uses plain shard_map psum (XLA-scheduled collectives) — the A/B
    partner for the ring version."""
    from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis_name]

    if overlapped:
        def local(x_shard, w_up, w_down):
            return tp_mlp_overlapped(x_shard, w_up, w_down, axis_name, n,
                                     act)
        in_specs = (P(axis_name, None), P(None, axis_name),
                    P(axis_name, None))
        out_spec = P(axis_name, None)
    else:
        def local(x, w_up, w_down):
            h = act(x @ w_up)  # column-parallel: no comm
            return jax.lax.psum(h @ w_down, axis_name)  # row-parallel
        in_specs = (P(), P(None, axis_name), P(axis_name, None))
        out_spec = P()

    fn = shard_map(local, mesh=mesh, in_specs=in_specs,
                   out_specs=out_spec, check_rep=False)
    return jax.jit(fn)
