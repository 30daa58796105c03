"""GPT4TS (frozen gpt2-style backbone) + backbone infrastructure tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medtsllm_tpu.tasks import get_trainer
from conftest import make_config


def _cfg(task, tmp_path, **kw):
    kw.setdefault("hist", 32)
    kw.setdefault("pred", 32)
    cfg = make_config(task=task, model="gpt4ts", step=16, **kw)
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 1
    cfg.training.batch_size = 4
    cfg.datasets.synthetic.n_points = 512
    cfg["models"] = {"gpt4ts": {
        "llm": "gpt2-tiny", "d_model": 32, "d_ff": 32, "gpt_layers": 2,
        "train_mlp": False, "patching": {"patch_len": 8, "stride": 4}}}
    return cfg


def test_gpt4ts_forecasting(tmp_path):
    cfg = _cfg("forecasting", tmp_path, pred=16)
    trainer = get_trainer("g4-f", cfg)
    trainer.train()
    scores = trainer.test()
    assert np.isfinite(scores["test/mse"])


def test_gpt4ts_reconstruction(tmp_path):
    trainer = get_trainer("g4-r", _cfg("reconstruction", tmp_path))
    scores = trainer.val()
    assert np.isfinite(scores["val/mse"])


def test_gpt4ts_frozen_backbone(tmp_path):
    """Backbone attn/wte params must not move; ln/wpe must train
    (reference gpt4ts.py:47-53)."""
    cfg = _cfg("forecasting", tmp_path, pred=16)
    trainer = get_trainer("g4-fr", cfg)
    before = jax.device_get(trainer.params)
    trainer.train()
    after = jax.device_get(trainer.params)

    frozen_leaf = before["gpt2"]["h_0"]["attn"]["c_attn"]["base"]["kernel"]
    frozen_after = after["gpt2"]["h_0"]["attn"]["c_attn"]["base"]["kernel"]
    np.testing.assert_array_equal(frozen_leaf, frozen_after)

    wte_b, wte_a = before["gpt2"]["wte"], after["gpt2"]["wte"]
    np.testing.assert_array_equal(wte_b, wte_a)

    ln_b = before["gpt2"]["h_0"]["ln_1"]["scale"]
    ln_a = after["gpt2"]["h_0"]["ln_1"]["scale"]
    assert not np.array_equal(ln_b, ln_a), "ln params should train"

    wpe_b, wpe_a = before["gpt2"]["wpe"], after["gpt2"]["wpe"]
    assert not np.array_equal(wpe_b, wpe_a), "wpe should train"


def test_flash_attention_fallback_matches_reference():
    from medtsllm_tpu.ops.pallas.flash_attention import (
        _attention_reference, flash_attention)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 4, 32, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 4, 48, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 4, 48, 16)), jnp.float32)
    out = flash_attention(q, k, v, causal=True)
    exp = _attention_reference(q, k, v, True, 1.0 / np.sqrt(16))
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp), atol=1e-5)


def test_causal_alignment_suffix():
    """With S > L the causal diagonal anchors at the end: the last query
    sees everything, query 0 sees the first S-L+1 keys."""
    from medtsllm_tpu.ops.pallas.flash_attention import _attention_reference
    L, S, D = 4, 10, 8
    q = jnp.ones((1, 1, L, D))
    k = jnp.ones((1, 1, S, D))
    v = jnp.arange(S, dtype=jnp.float32)[None, None, :, None] * jnp.ones((1, 1, S, D))
    out = np.asarray(_attention_reference(q, k, v, True, 1.0))
    # uniform scores -> mean over visible keys
    np.testing.assert_allclose(out[0, 0, 0, 0], np.arange(S - L + 1).mean(), rtol=1e-5)
    np.testing.assert_allclose(out[0, 0, -1, 0], np.arange(S).mean(), rtol=1e-5)


def test_backbone_gpt2_llama_forward():
    from medtsllm_tpu.models.llm import load_backbone
    for preset in ("gpt2-tiny", "llama-tiny"):
        module, params, cfg = load_backbone(preset)
        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(2, 16, cfg.d_model)), jnp.float32)
        out = module.apply({"params": params}, inputs_embeds=x)
        assert out.shape == (2, 16, cfg.d_model)
        ids = jnp.zeros((2, 16), jnp.int32)
        out2 = module.apply({"params": params}, input_ids=ids)
        assert out2.shape == (2, 16, cfg.d_model)


def test_layer_truncation():
    from medtsllm_tpu.models.llm import load_backbone
    _, params, cfg = load_backbone("gpt2-tiny", llm_layers=1)
    assert cfg.n_layers == 1
    assert "h_0" in params and "h_1" not in params


def test_lora_params_and_effect():
    from medtsllm_tpu.models.llm.loader import load_backbone
    from medtsllm_tpu.models.llm.transformer import LoraSpec
    module, params, cfg = load_backbone(
        "llama-tiny", lora=LoraSpec(rank=4, alpha=8, targets=("q", "v")))
    names = []
    for kp, _ in jax.tree_util.tree_flatten_with_path(params)[0]:
        names.append("/".join(str(getattr(k, "key", k)) for k in kp))
    assert any("lora_a" in n for n in names)
    # lora_b zero-init => output identical to base at init
    module2, params2, _ = load_backbone("llama-tiny")
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 8, cfg.d_model)),
                    jnp.float32)
    o1 = module.apply({"params": params}, inputs_embeds=x)
    o2 = module2.apply({"params": params2}, inputs_embeds=x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_tensor_parallel_sharding_rules():
    from medtsllm_tpu.parallel import create_mesh, shard_params, partition_spec_for
    from medtsllm_tpu.models.llm import load_backbone
    from jax.sharding import PartitionSpec as P
    assert partition_spec_for("gpt2/h_0/attn/c_attn/base/kernel",
                              (64, 192)) == P(None, "tensor")
    assert partition_spec_for("h_0/mlp/down_proj/kernel",
                              (128, 64)) == P("tensor", None)
    assert partition_spec_for("h_0/ln_1/scale", (64,)) == P()

    mesh = create_mesh(data=2, tensor=4)
    _, params, _ = load_backbone("llama-tiny")
    sharded = shard_params(params, mesh)
    k = sharded["h_0"]["attn"]["q_proj"]["base"]["kernel"]
    assert len(k.sharding.device_set) == 8
