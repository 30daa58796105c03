"""Ring collective matmuls (parallel/overlap.py) vs dense reference.

Numerics on the 8-device virtual CPU mesh; the overlap these schedules
buy is an ICI property, but correctness of the ring bookkeeping (chunk
routing, accumulation order) is fully testable here."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from medtsllm_tpu.parallel.overlap import (
    allgather_matmul, make_sharded_mlp, matmul_reduce_scatter,
    tp_mlp_reference,
)


def _mesh(n=8, name="tensor"):
    devs = np.array(jax.devices()[:n])
    return Mesh(devs, (name,))


@pytest.mark.parametrize("n", [2, 4, 8])
def test_allgather_matmul_matches_dense(n):
    mesh = _mesh(n)
    rng = np.random.default_rng(0)
    M, K, N = 8 * n, 16, 8 * n
    x = rng.normal(size=(M, K)).astype(np.float32)
    w = rng.normal(size=(K, N)).astype(np.float32)

    fn = shard_map(
        lambda xs, ws: allgather_matmul(xs, ws, "tensor", n),
        mesh=mesh, in_specs=(P("tensor", None), P(None, "tensor")),
        out_specs=P(None, "tensor"), check_rep=False)
    out = np.asarray(jax.jit(fn)(x, w))
    np.testing.assert_allclose(out, x @ w, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n", [2, 4, 8])
def test_matmul_reduce_scatter_matches_dense(n):
    mesh = _mesh(n)
    rng = np.random.default_rng(1)
    M, K, N = 8 * n, 8 * n, 16
    x = rng.normal(size=(M, K)).astype(np.float32)
    w = rng.normal(size=(K, N)).astype(np.float32)

    fn = shard_map(
        lambda xs, ws: matmul_reduce_scatter(xs, ws, "tensor", n),
        mesh=mesh, in_specs=(P(None, "tensor"), P("tensor", None)),
        out_specs=P("tensor", None), check_rep=False)
    out = np.asarray(jax.jit(fn)(x, w))
    np.testing.assert_allclose(out, x @ w, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("overlapped", [True, False])
def test_tp_mlp_matches_reference(overlapped):
    n = 8
    mesh = _mesh(n)
    rng = np.random.default_rng(2)
    M, D, F = 64, 32, 128
    x = rng.normal(size=(M, D)).astype(np.float32)
    w_up = rng.normal(size=(D, F)).astype(np.float32) * 0.1
    w_down = rng.normal(size=(F, D)).astype(np.float32) * 0.1

    fn = make_sharded_mlp(mesh, "tensor", overlapped=overlapped)
    out = np.asarray(fn(x, w_up, w_down))
    ref = np.asarray(tp_mlp_reference(jnp.asarray(x), jnp.asarray(w_up),
                                      jnp.asarray(w_down)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_ring_matmuls_compose_bfloat16():
    """bf16 end-to-end (the inference dtype): ring accumulation stays
    stable because partial sums accumulate in the matmul output dtype."""
    n = 4
    mesh = _mesh(n)
    rng = np.random.default_rng(3)
    M, D, F = 32, 16, 64
    x = rng.normal(size=(M, D)).astype(np.float32)
    w_up = rng.normal(size=(D, F)).astype(np.float32) * 0.1
    w_down = rng.normal(size=(F, D)).astype(np.float32) * 0.1
    fn = make_sharded_mlp(mesh, "tensor", overlapped=True)
    out = np.asarray(fn(x.astype(jnp.bfloat16), w_up.astype(jnp.bfloat16),
                        w_down.astype(jnp.bfloat16)).astype(jnp.float32))
    ref = np.asarray(tp_mlp_reference(jnp.asarray(x), jnp.asarray(w_up),
                                      jnp.asarray(w_down)))
    np.testing.assert_allclose(out, ref, rtol=0.1, atol=0.1)
