"""Pipeline parallelism (parallel/pipeline.py): fwd+grad parity vs the
sequential layer scan, on the virtual CPU mesh. The reference has no
pipeline (single-device, /root/reference/tasks/base.py:157-160); this is
the TPU-pod scaling axis for backbones larger than one chip's HBM."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from medtsllm_tpu.parallel.pipeline import (
    pipeline_apply, pipeline_spec, stack_layer_params, unstack_layer_params)


L, D, B, T = 8, 16, 8, 6


def _toy_params(rng):
    return {"w1": jnp.asarray(rng.normal(size=(L, D, D), scale=0.3),
                              jnp.float32),
            "w2": jnp.asarray(rng.normal(size=(L, D, D), scale=0.3),
                              jnp.float32)}


def _toy_block(p, x):
    return x + jax.nn.gelu(x @ p["w1"]) @ p["w2"]


def _sequential(params, x):
    out, _ = jax.lax.scan(lambda x, p: (_toy_block(p, x), None), x, params)
    return out


def _mesh(data, stage):
    devs = np.asarray(jax.devices()[:data * stage]).reshape(data, stage)
    return Mesh(devs, ("data", "stage"))


@pytest.mark.parametrize("data,stage,mb", [(2, 4, 4), (1, 4, 8), (2, 2, 2)])
def test_pipeline_forward_matches_sequential(data, stage, mb):
    rng = np.random.default_rng(0)
    params = _toy_params(rng)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    mesh = _mesh(data, stage)
    ref = jax.jit(_sequential)(params, x)
    with jax.set_mesh(mesh):
        got = jax.jit(lambda p, x: pipeline_apply(
            _toy_block, p, x, mesh=mesh, n_microbatches=mb))(params, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("checkpoint", [None, True])
def test_pipeline_grads_match_sequential(checkpoint):
    rng = np.random.default_rng(1)
    params = _toy_params(rng)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    mesh = _mesh(2, 4)

    def loss_ref(p, x):
        return (_sequential(p, x) ** 2).mean()

    def loss_pp(p, x):
        return (pipeline_apply(_toy_block, p, x, mesh=mesh,
                               n_microbatches=4,
                               checkpoint_policy=checkpoint) ** 2).mean()

    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(params, x)
    with jax.set_mesh(mesh):
        g_pp = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(params, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_pipeline_stage_sharded_params_stay_sharded():
    """Params placed P("stage", ...) are consumed shard-local: the HBM
    layout the pipeline exists for (each stage holds only its layers)."""
    rng = np.random.default_rng(2)
    params = _toy_params(rng)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    mesh = _mesh(2, 4)
    spec = pipeline_spec(P(None, None))
    assert spec == P("stage", None, None)
    placed = jax.tree.map(
        lambda w: jax.device_put(w, NamedSharding(mesh, spec)), params)
    ref = jax.jit(_sequential)(params, x)
    with jax.set_mesh(mesh):
        got = jax.jit(lambda p, x: pipeline_apply(
            _toy_block, p, x, mesh=mesh, n_microbatches=4))(placed, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)
    # each leaf shard holds 2 of the 8 layers
    leaf = placed["w1"]
    assert leaf.sharding.shard_shape(leaf.shape)[0] == L // 4


def test_pipeline_divisibility_errors():
    rng = np.random.default_rng(3)
    params = {"w1": jnp.zeros((6, D, D)), "w2": jnp.zeros((6, D, D))}
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    mesh = _mesh(2, 4)
    with pytest.raises(ValueError, match="not divisible by 4 stages"):
        pipeline_apply(_toy_block, params, x, mesh=mesh, n_microbatches=4)
    with pytest.raises(ValueError, match="not divisible by 3 microbatches"):
        pipeline_apply(_toy_block, _toy_params(rng), x, mesh=mesh,
                       n_microbatches=3)


def test_stack_unstack_roundtrip():
    rng = np.random.default_rng(4)
    layers = [{"a": rng.normal(size=(3, 5)), "b": {"c": rng.normal(size=(7,))}}
              for _ in range(4)]
    stacked = stack_layer_params(layers)
    assert stacked["a"].shape == (4, 3, 5)
    back = unstack_layer_params(stacked, 4)
    for orig, rt in zip(layers, back):
        for a, b in zip(jax.tree.leaves(orig), jax.tree.leaves(rt)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_real_decoder_block():
    """The actual transformer Block (llama-style) pipelined: stacked
    per-layer trees applied via Block.apply must reproduce the
    sequential stack, including int8-quantized projections."""
    from medtsllm_tpu.models.llm.transformer import Block, DecoderConfig

    cfg = DecoderConfig(style="llama", vocab_size=64, d_model=32, d_ff=64,
                        n_layers=4, n_heads=4, n_kv_heads=2,
                        max_position=32, dropout=0.0)
    block = Block(cfg, quantize=8)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 8, 32)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    per_layer = [block.init({"params": k}, x)["params"] for k in keys]

    def seq(x):
        for p in per_layer:
            x = block.apply({"params": p}, x, deterministic=True)
        return x

    stacked = jax.tree.map(lambda *ws: jnp.stack(ws), *per_layer)
    mesh = _mesh(2, 4)

    def block_fn(p, x):
        return block.apply({"params": p}, x, deterministic=True)

    ref = jax.jit(seq)(x)
    with jax.set_mesh(mesh):
        got = jax.jit(lambda p, x: pipeline_apply(
            block_fn, p, x, mesh=mesh, n_microbatches=4))(stacked, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)
