"""Fused q|k|v / gate|up projections (small-batch serving layout).

`DecoderConfig.fused_projections` stores the llama attention and SwiGLU
projections column-concatenated so each layer runs 2 wide matmuls
instead of 5 narrow ones — at serving batch <= 8 the per-projection
weight streams dominate and the fused matmuls measure 1.68-1.82x
(tools/ab_smallbatch.py, BASELINE.md). Numerics must be EXACTLY the
separate path's: the fused kernel is the column-concat of the separate
kernels, and per-output-channel quantization scales concatenate
(reference counterpart: the bnb int8 projections it accelerates,
models/medtsllm.py:162-173).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medtsllm_tpu.models.llm.loader import _hf_to_tree
from medtsllm_tpu.models.llm.transformer import (DecoderConfig, LoraSpec,
                                                 TransformerDecoder)
from medtsllm_tpu.runtime.checkpoint import restore_partial
from medtsllm_tpu.tasks import get_trainer
from conftest import make_config

TINY_GQA = DecoderConfig(style="llama", vocab_size=64, d_model=32,
                         n_layers=2, n_heads=4, n_kv_heads=2, d_ff=48,
                         max_position=128, bos_token_id=1, eos_token_id=2)


def _hf_tensors(cfg, seed=0):
    """Random torch-layout ([out, in]) HF llama state dict."""
    rng = np.random.default_rng(seed)
    D, FF = cfg.d_model, cfg.d_ff
    kvd = cfg.kv_heads * cfg.head_dim
    t = {"embed_tokens.weight": rng.normal(0, 0.02, (cfg.vocab_size, D)),
         "norm.weight": rng.normal(1, 0.02, (D,))}
    for i in range(cfg.n_layers):
        p = f"layers.{i}."
        t[p + "input_layernorm.weight"] = rng.normal(1, 0.02, (D,))
        t[p + "post_attention_layernorm.weight"] = rng.normal(1, 0.02, (D,))
        for n, rows in (("q_proj", D), ("k_proj", kvd), ("v_proj", kvd),
                        ("o_proj", D)):
            t[p + f"self_attn.{n}.weight"] = rng.normal(0, 0.05, (rows, D))
        for n, shape in (("gate_proj", (FF, D)), ("up_proj", (FF, D)),
                         ("down_proj", (D, FF))):
            t[p + f"mlp.{n}.weight"] = rng.normal(0, 0.05, shape)
    return {k: v.astype(np.float32) for k, v in t.items()}


def _forward(cfg, tensors, x, quantize, lora=None):
    module = TransformerDecoder(cfg, quantize=quantize, lora=lora)
    params = module.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)},
                         inputs_embeds=x)["params"]
    merged, loaded = restore_partial(jax.device_get(params),
                                     _hf_to_tree(cfg, tensors,
                                                 quantize=quantize))
    assert loaded, "no HF tensors matched the param tree"
    params = jax.tree.map(jnp.asarray, merged)
    return module.apply({"params": params}, inputs_embeds=x,
                        deterministic=True), params


@pytest.mark.parametrize("quantize", [0, 8])
def test_fused_matches_separate(quantize):
    """Same HF weights loaded fused vs separate produce identical
    outputs (bit-exact: column-concat kernels + per-channel scales
    commute with the concat; the int8 per-token activation scale sees
    the same x either way)."""
    cfg_sep = TINY_GQA
    cfg_fus = dataclasses.replace(TINY_GQA, fused_projections=True)
    tensors = _hf_tensors(TINY_GQA)
    x = jnp.asarray(np.random.default_rng(7).normal(0, 1, (2, 9, 32)),
                    jnp.float32)
    out_sep, p_sep = _forward(cfg_sep, tensors, x, quantize)
    out_fus, p_fus = _forward(cfg_fus, tensors, x, quantize)
    assert "qkv_proj" in p_fus["h_0"]["attn"]
    assert "gateup_proj" in p_fus["h_0"]["mlp"]
    assert "q_proj" not in p_fus["h_0"]["attn"]
    if quantize:
        # s8 x s8 -> s32 accumulates exactly: fused == separate bitwise
        np.testing.assert_array_equal(np.asarray(out_fus),
                                      np.asarray(out_sep))
    else:
        # f32 matmuls of different widths may tile differently (ulp-level
        # reduction-order noise); the math is identical
        np.testing.assert_allclose(np.asarray(out_fus),
                                   np.asarray(out_sep),
                                   rtol=2e-5, atol=1e-6)


def test_fused_lora_mask_restricts_slices():
    """LoRA targets=('q','v') on the fused qkv projection must adapt
    ONLY the q and v slices: perturbing lora_b rows never moves the k
    slice (mask zero -> zero delta AND zero gradient), while q/v react.
    Mirrors the gpt2 fused-c_attn mask (transformer.py)."""
    cfg = dataclasses.replace(TINY_GQA, fused_projections=True)
    tensors = _hf_tensors(cfg)
    lora = LoraSpec(rank=2, alpha=4, targets=("q", "v"))
    x = jnp.asarray(np.random.default_rng(3).normal(0, 1, (1, 5, 32)),
                    jnp.float32)
    module = TransformerDecoder(cfg, quantize=0, lora=lora)
    params = module.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)},
                         inputs_embeds=x)["params"]
    merged, _ = restore_partial(jax.device_get(params),
                                _hf_to_tree(cfg, tensors, quantize=0))
    params = jax.tree.map(jnp.asarray, merged)
    qkv = params["h_0"]["attn"]["qkv_proj"]
    assert qkv["lora_b"].shape[1] == 32 + 16 + 16  # H*D | KV*D | KV*D

    base = module.apply({"params": params}, inputs_embeds=x,
                        deterministic=True)

    def perturbed(sl):
        b = np.zeros(qkv["lora_b"].shape, np.float32)
        b[:, sl] = 1.0
        p2 = jax.tree.map(lambda v: v, params)
        p2["h_0"]["attn"]["qkv_proj"] = dict(qkv, lora_b=jnp.asarray(b))
        return module.apply({"params": p2}, inputs_embeds=x,
                            deterministic=True)

    # k slice masked: identical output; q and v slices: output moves
    np.testing.assert_array_equal(np.asarray(perturbed(slice(32, 48))),
                                  np.asarray(base))
    assert not np.allclose(np.asarray(perturbed(slice(0, 32))),
                           np.asarray(base))
    assert not np.allclose(np.asarray(perturbed(slice(48, 64))),
                           np.asarray(base))


def test_fused_prefill_suffix_matches_full():
    """The serving split (prefill the head once -> run the suffix
    against the prefix KV) must be exact with fused projections too —
    the prefill program reuses the same fused params."""
    cfg = dataclasses.replace(TINY_GQA, fused_projections=True)
    tensors = _hf_tensors(cfg)
    x = jnp.asarray(np.random.default_rng(11).normal(0, 1, (2, 12, 32)),
                    jnp.float32)
    module = TransformerDecoder(cfg, quantize=8)
    params = module.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)},
                         inputs_embeds=x)["params"]
    merged, _ = restore_partial(jax.device_get(params),
                                _hf_to_tree(cfg, tensors, quantize=8))
    params = jax.tree.map(jnp.asarray, merged)

    full = module.apply({"params": params}, inputs_embeds=x,
                        deterministic=True)
    P = 5
    prefix_kv = module.apply({"params": params},
                             inputs_embeds=x[:, :P], method="prefill")
    suffix = module.apply({"params": params}, inputs_embeds=x[:, P:],
                          prefix_kv=prefix_kv, deterministic=True)
    np.testing.assert_allclose(np.asarray(suffix), np.asarray(full[:, P:]),
                               rtol=1e-5, atol=1e-5)


def test_fuse_projections_failfast(tmp_path):
    """Config-level guards: non-llama backbones and TP > 1 must be
    rejected loudly (the Megatron TP rules key on the separate
    projection names; silently replicating the fused matmul would be a
    correct-but-unsharded trap)."""
    from medtsllm_tpu.models.medtsllm import MedTsLLM

    def cfg(llm, **setup):
        c = make_config(task="reconstruction", model="medtsllm", hist=32,
                        pred=32, step=16)
        c["models"] = {"medtsllm": {
            "d_model": 16, "d_ff": 16, "n_heads": 4, "num_tokens": 32,
            "covariate_mode": "concat",
            "embedding_downsample_mode": "linear",
            "patching": {"patch_len": 8, "stride": 4},
            "prompting": {"dataset": True, "task": True, "clip": False,
                          "input_stats": False, "examples": False,
                          "input_stats_dim": 0,
                          "input_stats_select": "all",
                          "cache_order": False},
            "llm": {"enabled": True, "llm": llm, "llm_layers": -1,
                    "fuse_projections": True},
        }}
        for k, v in setup.items():
            c.setup[k] = v
        return c

    class _DS:
        n_features = 3
        n_classes = 0

    with pytest.raises(ValueError, match="llama-style"):
        MedTsLLM.from_config(cfg("gpt2-tiny"), _DS())
    with pytest.raises(ValueError, match="single-chip"):
        MedTsLLM.from_config(cfg("llama-tiny", tensor_parallel=2), _DS())
    # the supported combination constructs fine
    model = MedTsLLM.from_config(cfg("llama-tiny"), _DS())
    assert model.llm_cfg.fused_projections


def test_fused_trainer_cached_equals_uncached(tmp_path):
    """End-to-end through the task trainer: fused projections + the
    prompt-prefix KV cache serve the same numbers as the uncached
    in-graph forward (the fused path changes the matmul grouping, not
    the math)."""
    cfg = make_config(task="reconstruction", model="medtsllm", hist=32,
                      pred=32, step=16)
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 1
    cfg.training.batch_size = 4
    cfg.datasets.synthetic.n_points = 384
    cfg["models"] = {"medtsllm": {
        "d_model": 16, "d_ff": 16, "n_heads": 4, "num_tokens": 32,
        "covariate_mode": "concat",
        "embedding_downsample_mode": "linear",
        "patching": {"patch_len": 8, "stride": 4},
        "prompting": {"dataset": True, "task": True, "clip": False,
                      "input_stats": True, "examples": False,
                      "input_stats_dim": 0, "input_stats_select": "all",
                      "cache_order": True},
        "llm": {"enabled": True, "llm": "llama-tiny", "llm_layers": -1,
                "prefix_cache": True, "fuse_projections": True,
                "load_in_8bit": True},
    }}
    trainer = get_trainer("fuse-e2e", cfg)
    batch = next(iter(trainer.test_pipeline))
    arrays = trainer.model_inputs(batch)
    cached = trainer.eval_model_inputs(batch)
    assert "prefix_kv" in cached
    out_u = trainer.eval_step(trainer.params, arrays)
    out_c = trainer.eval_step(trainer.params, cached)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_u),
                               rtol=1e-5, atol=1e-6)
