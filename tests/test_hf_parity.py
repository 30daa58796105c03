"""Numerical parity of the flax decoder backbones against HuggingFace torch
implementations with identical weights.

Builds tiny random HF models locally (no downloads), saves them as HF
snapshots (config.json + model.safetensors), loads them through our
loader, and compares last_hidden_state on the same inputs — validating the
GPT-2 Conv1D layout, GELU flavor, RoPE, RMSNorm, and GQA handling.
"""

import json

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _save_snapshot(tmp_path, hf_model, hf_config):
    from safetensors.torch import save_file
    snap = tmp_path / "snap"
    snap.mkdir()
    (snap / "config.json").write_text(json.dumps(hf_config.to_dict()))
    # clone: tied tensors (t5 shared/encoder/decoder embeddings) otherwise
    # trip safetensors' shared-memory check
    state = {k: v.clone().contiguous() for k, v in hf_model.state_dict().items()}
    save_file(state, str(snap / "model.safetensors"))
    return snap


def test_gpt2_parity(tmp_path):
    from transformers import GPT2Config, GPT2Model
    hf_cfg = GPT2Config(vocab_size=96, n_positions=64, n_embd=32,
                        n_layer=2, n_head=4, resid_pdrop=0.0,
                        embd_pdrop=0.0, attn_pdrop=0.0)
    torch.manual_seed(0)
    hf = GPT2Model(hf_cfg).eval()
    snap = _save_snapshot(tmp_path, hf, hf_cfg)

    from medtsllm_tpu.models.llm.loader import load_backbone
    module, params, cfg = load_backbone(str(snap))
    assert cfg.style == "gpt2" and cfg.n_layers == 2

    ids = np.array([[1, 5, 9, 20, 33, 2, 7, 11]], dtype=np.int32)
    with torch.no_grad():
        expected = hf(input_ids=torch.tensor(ids, dtype=torch.long)
                      ).last_hidden_state.numpy()
    got = np.asarray(module.apply({"params": params},
                                  input_ids=jnp.asarray(ids)))
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_opt_parity(tmp_path):
    """OPT family (decoder-only, learned positions at offset 2, pre-LN,
    biased separate q/k/v, relu FFN) — HF AutoModel breadth beyond the
    reference configs' named backbones (medtsllm.py:175)."""
    from transformers import OPTConfig, OPTModel
    hf_cfg = OPTConfig(vocab_size=96, hidden_size=32, ffn_dim=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       max_position_embeddings=64, dropout=0.0,
                       do_layer_norm_before=True, word_embed_proj_dim=32)
    torch.manual_seed(2)
    hf = OPTModel(hf_cfg).eval()
    snap = _save_snapshot(tmp_path, hf, hf_cfg)

    from medtsllm_tpu.models.llm.loader import load_backbone
    module, params, cfg = load_backbone(str(snap))
    assert cfg.style == "opt" and cfg.pos_offset == 2

    ids = np.array([[1, 5, 9, 20, 33, 2, 7, 11]], dtype=np.int32)
    with torch.no_grad():
        expected = hf(input_ids=torch.tensor(ids, dtype=torch.long)
                      ).last_hidden_state.numpy()
    got = np.asarray(module.apply({"params": params},
                                  input_ids=jnp.asarray(ids)))
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_neox_parity(tmp_path):
    """GPT-NeoX/pythia family: per-head-packed qkv (deinterleaved by the
    loader), partial rotary (rotary_pct), parallel attention+FFN
    residual, exact-erf gelu."""
    from transformers import GPTNeoXConfig, GPTNeoXModel
    hf_cfg = GPTNeoXConfig(vocab_size=96, hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4,
                           max_position_embeddings=64, rotary_pct=0.25,
                           use_parallel_residual=True, hidden_act="gelu",
                           hidden_dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(3)
    hf = GPTNeoXModel(hf_cfg).eval()
    snap = _save_snapshot(tmp_path, hf, hf_cfg)

    from medtsllm_tpu.models.llm.loader import load_backbone
    module, params, cfg = load_backbone(str(snap))
    assert cfg.style == "neox" and cfg.rotary_dims == 2  # 8 * 0.25

    ids = np.array([[1, 5, 9, 20, 33, 2, 7, 11]], dtype=np.int32)
    with torch.no_grad():
        expected = hf(input_ids=torch.tensor(ids, dtype=torch.long)
                      ).last_hidden_state.numpy()
    got = np.asarray(module.apply({"params": params},
                                  input_ids=jnp.asarray(ids)))
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_neox_sequential_residual_parity(tmp_path):
    """use_parallel_residual=False pythia variants take the sequential
    path."""
    from transformers import GPTNeoXConfig, GPTNeoXModel
    hf_cfg = GPTNeoXConfig(vocab_size=96, hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4,
                           max_position_embeddings=64, rotary_pct=1.0,
                           use_parallel_residual=False, hidden_act="gelu",
                           hidden_dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(4)
    hf = GPTNeoXModel(hf_cfg).eval()
    snap = _save_snapshot(tmp_path, hf, hf_cfg)

    from medtsllm_tpu.models.llm.loader import load_backbone
    module, params, cfg = load_backbone(str(snap))
    assert not cfg.parallel_residual and cfg.rotary_dims == cfg.head_dim

    ids = np.array([[3, 7, 1, 44, 8, 2, 9, 10]], dtype=np.int32)
    with torch.no_grad():
        expected = hf(input_ids=torch.tensor(ids, dtype=torch.long)
                      ).last_hidden_state.numpy()
    got = np.asarray(module.apply({"params": params},
                                  input_ids=jnp.asarray(ids)))
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_llama_parity(tmp_path):
    from transformers import LlamaConfig, LlamaModel
    hf_cfg = LlamaConfig(vocab_size=96, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, max_position_embeddings=64,
                         rms_norm_eps=1e-5, attention_dropout=0.0)
    torch.manual_seed(0)
    hf = LlamaModel(hf_cfg).eval()
    snap = _save_snapshot(tmp_path, hf, hf_cfg)

    from medtsllm_tpu.models.llm.loader import load_backbone
    module, params, cfg = load_backbone(str(snap))
    assert cfg.style == "llama" and cfg.kv_heads == 2

    ids = np.array([[1, 5, 9, 20, 33, 2, 7, 11]], dtype=np.int32)
    with torch.no_grad():
        expected = hf(input_ids=torch.tensor(ids, dtype=torch.long)
                      ).last_hidden_state.numpy()
    got = np.asarray(module.apply({"params": params},
                                  input_ids=jnp.asarray(ids)))
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_mistral_parity(tmp_path):
    """Mistral maps onto the llama-style decoder (loader
    config_from_hf_json handles model_type 'mistral'); workload sequences
    (<1k tokens) sit far inside the 4096 sliding window, so full causal
    attention is exact."""
    from transformers import MistralConfig, MistralModel
    hf_cfg = MistralConfig(vocab_size=96, hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           max_position_embeddings=64, rms_norm_eps=1e-5,
                           sliding_window=4096, attention_dropout=0.0)
    torch.manual_seed(0)
    hf = MistralModel(hf_cfg).eval()
    snap = _save_snapshot(tmp_path, hf, hf_cfg)

    from medtsllm_tpu.models.llm.loader import load_backbone
    module, params, cfg = load_backbone(str(snap))
    assert cfg.style == "llama" and cfg.kv_heads == 2

    ids = np.array([[1, 5, 9, 20, 33, 2, 7, 11]], dtype=np.int32)
    with torch.no_grad():
        expected = hf(input_ids=torch.tensor(ids, dtype=torch.long)
                      ).last_hidden_state.numpy()
    got = np.asarray(module.apply({"params": params},
                                  input_ids=jnp.asarray(ids)))
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_llama_parity_pipeline_layout(tmp_path):
    """The pipeline-parallel param layout (stacked h_stack, HF layer
    weights stacked by stack_decoder_tree) must reproduce the HF output
    exactly — run here without a mesh (the lifted-scan sequential
    fallback), sharded execution is covered in test_parallel.py."""
    from transformers import LlamaConfig, LlamaModel
    hf_cfg = LlamaConfig(vocab_size=96, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, max_position_embeddings=64,
                         rms_norm_eps=1e-5, attention_dropout=0.0)
    torch.manual_seed(0)
    hf = LlamaModel(hf_cfg).eval()
    snap = _save_snapshot(tmp_path, hf, hf_cfg)

    from medtsllm_tpu.models.llm.loader import load_backbone
    module, params, cfg = load_backbone(str(snap), pipeline=2)
    stacked = params["h_stack"]["block"]["attn"]["q_proj"]["base"]["kernel"]
    assert stacked.shape[0] == 2

    ids = np.array([[1, 5, 9, 20, 33, 2, 7, 11]], dtype=np.int32)
    with torch.no_grad():
        expected = hf(input_ids=torch.tensor(ids, dtype=torch.long)
                      ).last_hidden_state.numpy()
    got = np.asarray(module.apply({"params": params},
                                  input_ids=jnp.asarray(ids)))
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_mamba_parity(tmp_path):
    """Selective-SSM backbone vs HF MambaModel (its sequential slow path;
    ours is the chunked associative scan — same recurrence): validates the
    in/x/dt projection layout, depthwise causal conv, A_log/D, and gating."""
    from transformers import MambaConfig, MambaModel
    hf_cfg = MambaConfig(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                         state_size=8, conv_kernel=4, expand=2,
                         time_step_rank=4, use_cache=False)
    torch.manual_seed(0)
    hf = MambaModel(hf_cfg).eval()
    snap = _save_snapshot(tmp_path, hf, hf_cfg)

    from medtsllm_tpu.models.llm.loader import load_backbone
    module, params, cfg = load_backbone(str(snap))
    assert cfg.style == "mamba" and cfg.d_state == 8 and cfg.rank == 4

    ids = np.array([[1, 5, 9, 20, 33, 2, 7, 11]], dtype=np.int32)
    with torch.no_grad():
        expected = hf(input_ids=torch.tensor(ids, dtype=torch.long)
                      ).last_hidden_state.numpy()
    got = np.asarray(module.apply({"params": params},
                                  input_ids=jnp.asarray(ids)))
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_t5_parity(tmp_path):
    """T5 enc-dec: inputs_embeds feed the encoder, decoder_inputs_embeds
    the decoder (the reference's is_encoder_decoder call,
    medtsllm.py:346-348); validates T5LayerNorm, unscaled attention,
    relative-position buckets, and the relu FFN against HF T5Model."""
    from transformers import T5Config, T5Model
    hf_cfg = T5Config(vocab_size=96, d_model=32, d_kv=8, d_ff=64,
                      num_layers=2, num_decoder_layers=2, num_heads=4,
                      relative_attention_num_buckets=8,
                      relative_attention_max_distance=20,
                      dropout_rate=0.0, feed_forward_proj="relu",
                      is_encoder_decoder=True, use_cache=False)
    torch.manual_seed(0)
    hf = T5Model(hf_cfg).eval()
    snap = _save_snapshot(tmp_path, hf, hf_cfg)

    from medtsllm_tpu.models.llm.loader import load_backbone
    module, params, cfg = load_backbone(str(snap))
    assert cfg.style == "t5" and cfg.is_encoder_decoder
    assert cfg.head_dim == 8 and not cfg.t5_gated

    rng = np.random.default_rng(0)
    enc_in = rng.normal(0, 0.5, size=(2, 12, 32)).astype(np.float32)
    dec_in = rng.normal(0, 0.5, size=(2, 7, 32)).astype(np.float32)
    with torch.no_grad():
        expected = hf(inputs_embeds=torch.tensor(enc_in),
                      decoder_inputs_embeds=torch.tensor(dec_in)
                      ).last_hidden_state.numpy()
    got = np.asarray(module.apply(
        {"params": params}, inputs_embeds=jnp.asarray(enc_in),
        decoder_inputs_embeds=jnp.asarray(dec_in)))
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_t5_gated_parity(tmp_path):
    """T5 v1.1 gated-gelu FFN variant (flan-t5 family)."""
    from transformers import T5Config, T5Model
    hf_cfg = T5Config(vocab_size=96, d_model=32, d_kv=8, d_ff=64,
                      num_layers=2, num_decoder_layers=2, num_heads=4,
                      relative_attention_num_buckets=8,
                      relative_attention_max_distance=20,
                      dropout_rate=0.0, feed_forward_proj="gated-gelu",
                      is_encoder_decoder=True, use_cache=False)
    torch.manual_seed(1)
    hf = T5Model(hf_cfg).eval()
    snap = _save_snapshot(tmp_path, hf, hf_cfg)

    from medtsllm_tpu.models.llm.loader import load_backbone
    module, params, cfg = load_backbone(str(snap))
    assert cfg.t5_gated

    rng = np.random.default_rng(1)
    enc_in = rng.normal(0, 0.5, size=(2, 9, 32)).astype(np.float32)
    dec_in = rng.normal(0, 0.5, size=(2, 9, 32)).astype(np.float32)
    with torch.no_grad():
        expected = hf(inputs_embeds=torch.tensor(enc_in),
                      decoder_inputs_embeds=torch.tensor(dec_in)
                      ).last_hidden_state.numpy()
    got = np.asarray(module.apply(
        {"params": params}, inputs_embeds=jnp.asarray(enc_in),
        decoder_inputs_embeds=jnp.asarray(dec_in)))
    np.testing.assert_allclose(got, expected, atol=2e-4)


def _tiny_bart_cfg(**kw):
    from transformers import BartConfig
    return BartConfig(vocab_size=96, d_model=32, encoder_layers=2,
                      decoder_layers=2, encoder_attention_heads=4,
                      decoder_attention_heads=4, encoder_ffn_dim=64,
                      decoder_ffn_dim=64, max_position_embeddings=64,
                      dropout=0.0, attention_dropout=0.0,
                      activation_dropout=0.0, activation_function="gelu",
                      is_encoder_decoder=True, use_cache=False, **kw)


def test_bart_parity(tmp_path):
    """BART enc-dec (the third family the reference's AutoModel breadth
    names, medtsllm.py:175): post-LN blocks, learned positions at offset
    2 per side, layernorm_embedding, biased projections, erf-gelu FFN —
    validated against HF BartModel on the inputs_embeds path (the
    reference's enc-dec call shape, medtsllm.py:346-348)."""
    from transformers import BartModel
    hf_cfg = _tiny_bart_cfg(scale_embedding=False)
    torch.manual_seed(5)
    hf = BartModel(hf_cfg).eval()
    snap = _save_snapshot(tmp_path, hf, hf_cfg)

    from medtsllm_tpu.models.llm.loader import load_backbone
    module, params, cfg = load_backbone(str(snap))
    assert cfg.style == "bart" and cfg.is_encoder_decoder
    assert cfg.post_ln and cfg.pos_offset == 2

    rng = np.random.default_rng(5)
    enc_in = rng.normal(0, 0.5, size=(2, 12, 32)).astype(np.float32)
    dec_in = rng.normal(0, 0.5, size=(2, 7, 32)).astype(np.float32)
    with torch.no_grad():
        expected = hf(inputs_embeds=torch.tensor(enc_in),
                      decoder_inputs_embeds=torch.tensor(dec_in)
                      ).last_hidden_state.numpy()
    got = np.asarray(module.apply(
        {"params": params}, inputs_embeds=jnp.asarray(enc_in),
        decoder_inputs_embeds=jnp.asarray(dec_in)))
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_bart_scaled_embed_ids_parity(tmp_path):
    """scale_embedding=True variants multiply token embeddings by
    sqrt(d_model) on the input_ids path (HF BartScaledWordEmbedding) —
    exercised through encoder input_ids + decoder embeds."""
    from transformers import BartModel
    hf_cfg = _tiny_bart_cfg(scale_embedding=True)
    torch.manual_seed(6)
    hf = BartModel(hf_cfg).eval()
    snap = _save_snapshot(tmp_path, hf, hf_cfg)

    from medtsllm_tpu.models.llm.loader import load_backbone
    module, params, cfg = load_backbone(str(snap))
    assert cfg.scale_embedding

    ids = np.array([[1, 5, 9, 20, 33, 2, 7, 11]], dtype=np.int32)
    rng = np.random.default_rng(6)
    dec_in = rng.normal(0, 0.5, size=(1, 5, 32)).astype(np.float32)
    with torch.no_grad():
        expected = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                      decoder_inputs_embeds=torch.tensor(dec_in)
                      ).last_hidden_state.numpy()
    emb = module.apply({"params": params}, jnp.asarray(ids),
                       method="embed")
    got = np.asarray(module.apply(
        {"params": params}, inputs_embeds=emb,
        decoder_inputs_embeds=jnp.asarray(dec_in)))
    np.testing.assert_allclose(got, expected, atol=2e-4)
