"""Backbone construction + HF weight loading.

The reference calls AutoModel.from_pretrained over the network
(models/medtsllm.py:175-185, gpt4ts.py:44). This environment has zero
egress, so resolution order is:
  1. a local HF snapshot (config.json + *.safetensors) under
     `paths.llm_path` or the HF cache,
  2. a built-in architecture preset with deterministic random init
     (clearly warned — task metrics with a random backbone are not
     meaningful, but shapes/throughput are identical).

Layer truncation (`llm_layers` > 0) mirrors medtsllm.py:145-146.
"""

from __future__ import annotations

import dataclasses
import json
import warnings
from pathlib import Path

import jax
import numpy as np

from .transformer import (DecoderConfig, LoraSpec, TransformerDecoder,
                          TransformerEncDec)

# architecture presets (shapes match the HF configs of the models the
# reference targets)
PRESETS = {
    "gpt2": DecoderConfig(style="gpt2", vocab_size=50257, d_model=768,
                          n_layers=12, n_heads=12, d_ff=3072,
                          max_position=1024, dropout=0.1,
                          bos_token_id=50256, eos_token_id=50256),
    "meta-llama/Llama-2-7b-hf": DecoderConfig(
        style="llama", vocab_size=32000, d_model=4096, n_layers=32,
        n_heads=32, d_ff=11008, max_position=4096, norm_eps=1e-5,
        bos_token_id=1, eos_token_id=2),
    "llama-1b": DecoderConfig(  # TinyLlama-1.1B shape (bench-friendly)
        style="llama", vocab_size=32000, d_model=2048, n_layers=22,
        n_heads=32, n_kv_heads=4, d_ff=5632, max_position=2048,
        norm_eps=1e-5, bos_token_id=1, eos_token_id=2),
    "llama-tiny": DecoderConfig(  # test-sized llama-style backbone
        style="llama", vocab_size=512, d_model=64, n_layers=2,
        n_heads=4, d_ff=128, max_position=512, bos_token_id=1,
        eos_token_id=2),
    "mixtral-tiny": DecoderConfig(  # test-sized mixtral-style sparse MoE
        style="llama", vocab_size=512, d_model=64, n_layers=2,
        n_heads=4, d_ff=128, max_position=512, bos_token_id=1,
        eos_token_id=2, n_experts=4, n_experts_per_tok=2),
    "mixtral-tiny-128": DecoderConfig(  # MoE tiny at 128-multiple dims:
        # the smallest shape the grouped-GEMM kernel tiles (CPU interpret
        # tests + the dryrun's EP-grouped serving row use it)
        style="llama", vocab_size=512, d_model=128, n_layers=2,
        n_heads=4, d_ff=256, max_position=512, bos_token_id=1,
        eos_token_id=2, n_experts=4, n_experts_per_tok=2),
    "moe-8x1b": DecoderConfig(  # 8-expert MoE on the TinyLlama-1.1B shape:
        # ~6.4B stored / ~1.8B active params (top-2 routing), int8 fits one
        # v5e chip; GShard capacity 1.25 bounds the dispatch buffers
        style="llama", vocab_size=32000, d_model=2048, n_layers=22,
        n_heads=32, n_kv_heads=4, d_ff=5632, max_position=2048,
        norm_eps=1e-5, bos_token_id=1, eos_token_id=2,
        n_experts=8, n_experts_per_tok=2, expert_capacity=1.25),
    "llama-tiny-bpe": DecoderConfig(  # tiny body, full BPE vocab: CI
        style="llama", vocab_size=16384, d_model=64, n_layers=2,
        n_heads=4, d_ff=128, max_position=512, bos_token_id=1,
        eos_token_id=2),  # exercises the real fallback-BPE prompt path
    "encdec-tiny": DecoderConfig(  # test-sized encoder-decoder backbone
        style="llama", vocab_size=512, d_model=64, n_layers=2,
        n_heads=4, d_ff=128, max_position=512, bos_token_id=1,
        eos_token_id=2, is_encoder_decoder=True),
    "t5-tiny": DecoderConfig(  # test-sized t5-style encoder-decoder
        style="t5", vocab_size=512, d_model=64, n_layers=2,
        n_heads=4, d_ff=128, d_head=16, max_position=512,
        norm_eps=1e-6, pad_token_id=0, eos_token_id=1,
        is_encoder_decoder=True),
    "gpt2-tiny": DecoderConfig(  # test-sized gpt2-style backbone
        style="gpt2", vocab_size=512, d_model=64, n_layers=2,
        n_heads=4, d_ff=128, max_position=512, dropout=0.1,
        bos_token_id=0, eos_token_id=0),
    "opt-tiny": DecoderConfig(  # test-sized OPT-style backbone
        style="opt", vocab_size=512, d_model=64, n_layers=2,
        n_heads=4, d_ff=128, max_position=512, act_fn="relu",
        bos_token_id=2, eos_token_id=2, pad_token_id=1),
    "neox-tiny": DecoderConfig(  # test-sized GPT-NeoX/pythia backbone
        style="neox", vocab_size=512, d_model=64, n_layers=2,
        n_heads=4, d_ff=128, max_position=512, rotary_pct=0.25,
        parallel_residual=True, act_fn="gelu",
        bos_token_id=0, eos_token_id=0),
    "bart-tiny": DecoderConfig(  # test-sized BART encoder-decoder
        style="bart", vocab_size=512, d_model=64, n_layers=2,
        n_dec_layers=2, n_heads=4, d_ff=128, max_position=512,
        act_fn="gelu", is_encoder_decoder=True,
        bos_token_id=0, eos_token_id=2, pad_token_id=1),
}


def _mamba_presets():
    from .mamba import MambaConfig
    return {
        "mamba-130m": MambaConfig(  # state-spaces/mamba-130m-hf shape
            vocab_size=50280, d_model=768, n_layers=24),
        "mamba-tiny": MambaConfig(  # test-sized mamba backbone
            vocab_size=512, d_model=64, n_layers=2, d_state=8, dt_rank=4),
    }


def find_snapshot(llm_id: str, cache_dir: str | None) -> Path | None:
    """Locate a local HF snapshot directory for `llm_id`."""
    candidates = [Path(llm_id)]  # llm_id may itself be a snapshot dir
    if cache_dir:
        # per-model subdir BEFORE the cache root: a shared cache dir that
        # happens to hold a config.json must not shadow the requested id
        candidates.append(Path(cache_dir) / llm_id)
        candidates.append(Path(cache_dir))
    candidates.append(Path.home() / ".cache" / "huggingface" / "hub"
                      / f"models--{llm_id.replace('/', '--')}" / "snapshots")
    for cand in candidates:
        if not cand or not cand.exists():
            continue
        if (cand / "config.json").exists():
            return cand
        for sub in sorted(cand.glob("*/")):
            if (sub / "config.json").exists():
                return sub
    return None


#: ln-family hidden activations the MLP dispatch maps (transformer.py
#: MLP); validated here at LOAD time so an exotic snapshot fails with a
#: clear message instead of a KeyError deep inside apply()
KNOWN_LN_ACTS = ("gelu", "gelu_tanh", "gelu_new", "gelu_fast",
                 "gelu_pytorch_tanh", "quick_gelu", "relu", "silu", "swish")


def config_from_hf_json(path: Path) -> DecoderConfig:
    hf = json.loads((path / "config.json").read_text())
    model_type = hf.get("model_type", "gpt2")
    act = hf.get("activation_function", hf.get("hidden_act"))
    if (model_type in ("gpt2", "opt", "bart", "gpt_neox")
            and act is not None and act not in KNOWN_LN_ACTS):
        raise NotImplementedError(
            f"{model_type} snapshot uses hidden activation {act!r}; "
            f"supported: {KNOWN_LN_ACTS}")
    if model_type == "gpt2":
        return DecoderConfig(
            style="gpt2", vocab_size=hf["vocab_size"],
            d_model=hf["n_embd"], n_layers=hf["n_layer"],
            n_heads=hf["n_head"], d_ff=hf.get("n_inner") or 4 * hf["n_embd"],
            max_position=hf["n_positions"],
            norm_eps=hf.get("layer_norm_epsilon", 1e-5),
            dropout=hf.get("resid_pdrop", 0.1),
            bos_token_id=hf.get("bos_token_id"),
            eos_token_id=hf.get("eos_token_id"))
    if model_type in ("t5", "mt5"):
        return DecoderConfig(
            style="t5", vocab_size=hf["vocab_size"], d_model=hf["d_model"],
            n_layers=hf["num_layers"], n_heads=hf["num_heads"],
            d_ff=hf["d_ff"], d_head=hf.get("d_kv"),
            n_dec_layers=hf.get("num_decoder_layers"),
            rel_buckets=hf.get("relative_attention_num_buckets", 32),
            rel_max_distance=hf.get("relative_attention_max_distance", 128),
            norm_eps=hf.get("layer_norm_epsilon", 1e-6),
            dropout=hf.get("dropout_rate", 0.1),
            t5_gated="gated" in str(hf.get("feed_forward_proj", "relu")),
            is_encoder_decoder=True,
            bos_token_id=hf.get("bos_token_id"),
            eos_token_id=hf.get("eos_token_id"),
            pad_token_id=hf.get("pad_token_id"))
    if model_type == "mamba":
        from .mamba import MambaConfig
        rank = hf.get("time_step_rank", "auto")
        return MambaConfig(
            vocab_size=hf["vocab_size"], d_model=hf["hidden_size"],
            n_layers=hf["num_hidden_layers"],
            d_state=hf.get("state_size", 16),
            d_conv=hf.get("conv_kernel", 4), expand=hf.get("expand", 2),
            dt_rank=(None if rank == "auto" else int(rank)),
            norm_eps=hf.get("layer_norm_epsilon", 1e-5),
            use_bias=hf.get("use_bias", False),
            use_conv_bias=hf.get("use_conv_bias", True),
            bos_token_id=hf.get("bos_token_id"),
            eos_token_id=hf.get("eos_token_id"))
    if model_type in ("llama", "mistral", "mixtral"):
        moe = {}
        if model_type == "mixtral":
            # sliding-window attention is not implemented; mixtral ships
            # with sliding_window=null and sequences here are <1k tokens
            moe = dict(n_experts=hf.get("num_local_experts", 8),
                       n_experts_per_tok=hf.get("num_experts_per_tok", 2))
            if hf["intermediate_size"] >= 1024:
                # production-size snapshot: dropless dispatch (capacity =
                # n_tokens) would allocate [E, T, d_ff] buffers per layer
                # and run E/k x the needed FFN FLOPs — default to the
                # GShard 1.25 bound like the moe-8x1b preset. Override
                # with models.<m>.llm.expert_capacity (0 = exact dropless).
                moe["expert_capacity"] = 1.25
                warnings.warn(
                    "mixtral snapshot: defaulting expert_capacity to 1.25 "
                    "(GShard bound; set models.<m>.llm.expert_capacity = 0 "
                    "for exact dropless dispatch at much higher HBM)")
        return DecoderConfig(
            style="llama", vocab_size=hf["vocab_size"],
            d_model=hf["hidden_size"], n_layers=hf["num_hidden_layers"],
            n_heads=hf["num_attention_heads"],
            n_kv_heads=hf.get("num_key_value_heads"),
            d_ff=hf["intermediate_size"],
            max_position=hf.get("max_position_embeddings", 4096),
            rope_theta=hf.get("rope_theta", 10000.0),
            norm_eps=hf.get("rms_norm_eps", 1e-5),
            bos_token_id=hf.get("bos_token_id"),
            eos_token_id=hf.get("eos_token_id"), **moe)
    if model_type == "opt":
        if hf.get("word_embed_proj_dim", hf["hidden_size"]) != hf["hidden_size"]:
            raise NotImplementedError(
                "OPT word_embed_proj_dim != hidden_size (the 350m "
                "projection variant) is not supported")
        if not hf.get("do_layer_norm_before", True):
            raise NotImplementedError(
                "OPT do_layer_norm_before=false (the 350m post-LN "
                "variant) is not supported")
        return DecoderConfig(
            style="opt", vocab_size=hf["vocab_size"],
            d_model=hf["hidden_size"], n_layers=hf["num_hidden_layers"],
            n_heads=hf["num_attention_heads"], d_ff=hf["ffn_dim"],
            max_position=hf.get("max_position_embeddings", 2048),
            norm_eps=1e-5, dropout=hf.get("dropout", 0.1),
            act_fn=hf.get("activation_function", "relu"),
            bos_token_id=hf.get("bos_token_id"),
            eos_token_id=hf.get("eos_token_id"),
            pad_token_id=hf.get("pad_token_id"))
    if model_type == "bart":
        if (hf.get("decoder_attention_heads", hf["encoder_attention_heads"])
                != hf["encoder_attention_heads"]
                or hf.get("decoder_ffn_dim", hf["encoder_ffn_dim"])
                != hf["encoder_ffn_dim"]):
            raise NotImplementedError(
                "BART with asymmetric encoder/decoder head or FFN sizes "
                "is not supported (DecoderConfig carries one set)")
        return DecoderConfig(
            style="bart", vocab_size=hf["vocab_size"],
            d_model=hf["d_model"], n_layers=hf["encoder_layers"],
            n_dec_layers=hf.get("decoder_layers", hf["encoder_layers"]),
            n_heads=hf["encoder_attention_heads"],
            d_ff=hf["encoder_ffn_dim"],
            max_position=hf.get("max_position_embeddings", 1024),
            norm_eps=1e-5, dropout=hf.get("dropout", 0.1),
            act_fn=hf.get("activation_function", "gelu"),
            scale_embedding=hf.get("scale_embedding", False),
            is_encoder_decoder=True,
            bos_token_id=hf.get("bos_token_id"),
            eos_token_id=hf.get("eos_token_id"),
            pad_token_id=hf.get("pad_token_id"))
    if model_type == "gpt_neox":
        return DecoderConfig(
            style="neox", vocab_size=hf["vocab_size"],
            d_model=hf["hidden_size"], n_layers=hf["num_hidden_layers"],
            n_heads=hf["num_attention_heads"],
            d_ff=hf["intermediate_size"],
            max_position=hf.get("max_position_embeddings", 2048),
            rope_theta=hf.get("rotary_emb_base", 10000.0),
            rotary_pct=hf.get("rotary_pct", 0.25),
            parallel_residual=hf.get("use_parallel_residual", True),
            act_fn=hf.get("hidden_act", "gelu"),
            norm_eps=hf.get("layer_norm_eps", 1e-5),
            dropout=hf.get("hidden_dropout", 0.0),
            bos_token_id=hf.get("bos_token_id"),
            eos_token_id=hf.get("eos_token_id"))
    raise ValueError(f"Unsupported HF model_type {model_type!r}")


def _truncate(cfg, llm_layers: int):
    if llm_layers and 0 < llm_layers < cfg.n_layers:
        import dataclasses
        extra = {}
        if getattr(cfg, "n_dec_layers", None):
            extra["n_dec_layers"] = min(llm_layers, cfg.n_dec_layers)
        cfg = dataclasses.replace(cfg, n_layers=llm_layers, **extra)
    return cfg


def is_preset(llm_id: str) -> bool:
    """True when `llm_id` names a built-in bench-sized preset (vs an HF
    id that needs a local snapshot)."""
    return llm_id in PRESETS or llm_id in _mamba_presets()


def resolve_config(llm_id: str, cache_dir: str | None = None,
                   llm_layers: int = -1):
    """Returns (cfg, snapshot_path|None); cfg is a DecoderConfig or a
    MambaConfig (dispatch on cfg.style == "mamba")."""
    snap = find_snapshot(llm_id, cache_dir)
    if snap is not None:
        cfg = config_from_hf_json(snap)
    elif llm_id in PRESETS:
        cfg = PRESETS[llm_id]
    elif llm_id.startswith("mamba"):
        mp = _mamba_presets()
        if llm_id not in mp:
            raise ValueError(f"Unknown mamba preset {llm_id!r}; "
                             f"use one of {sorted(mp)}")
        cfg = mp[llm_id]
    else:
        raise ValueError(
            f"No local snapshot for {llm_id!r} and no built-in preset; "
            f"set paths.llm_path or use one of "
            f"{sorted(PRESETS) + sorted(_mamba_presets())}")
    return _truncate(cfg, llm_layers), snap


# ---------------------------------------------------------------------------
# HF tensor name -> flax param tree
# ---------------------------------------------------------------------------

def _hf_to_tree(cfg: DecoderConfig, tensors: dict,
                quantize: int = 0) -> dict:
    """Map HF state-dict names to the TransformerDecoder param tree.
    GPT-2 Conv1D weights are already [in, out]; torch Linear weights are
    [out, in] and get transposed. With quantize=True, projection kernels
    are stored as int8 kernel_q + f32 per-channel scale."""
    tree: dict = {}

    def put(path: str, value: np.ndarray):
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)

    def put_kernel(path: str, w: np.ndarray):
        """Projection kernels: quantizable (path ends with /kernel)."""
        if quantize:
            from .transformer import QuantDense
            q, scale = QuantDense.quantize(
                np.asarray(w, dtype=np.float32), bits=quantize,
                codebook=(getattr(cfg, "quant4_codebook", "absmax")
                          if quantize == 4 else "absmax"))
            put(path.removesuffix("kernel") + "kernel_q", q)
            put(path.removesuffix("kernel") + "scale", scale)
        else:
            put(path, w)

    if cfg.style == "mamba":
        put("wte", tensors["embeddings.weight"])
        put("norm_f/weight", tensors["norm_f.weight"])
        for i in range(cfg.n_layers):
            p = f"layers.{i}.mixer."
            put(f"h_{i}/norm/weight", tensors[f"layers.{i}.norm.weight"])
            put(f"h_{i}/A_log", tensors[p + "A_log"])
            put(f"h_{i}/D", tensors[p + "D"])
            # torch conv1d depthwise weight [E, 1, K] -> lax LIO [K, 1, E]
            put(f"h_{i}/conv_kernel",
                tensors[p + "conv1d.weight"].transpose(2, 1, 0))
            if p + "conv1d.bias" in tensors:
                put(f"h_{i}/conv_bias", tensors[p + "conv1d.bias"])
            for n in ("in_proj", "x_proj", "out_proj"):
                put_kernel(f"h_{i}/{n}/kernel", tensors[p + f"{n}.weight"].T)
                if p + f"{n}.bias" in tensors:
                    put(f"h_{i}/{n}/bias", tensors[p + f"{n}.bias"])
            put(f"h_{i}/dt_proj/kernel", tensors[p + "dt_proj.weight"].T)
            put(f"h_{i}/dt_proj/bias", tensors[p + "dt_proj.bias"])
        return tree
    if cfg.style == "t5":
        put("wte", tensors["shared.weight"])
        put("enc_norm/weight", tensors["encoder.final_layer_norm.weight"])
        put("dec_norm/weight", tensors["decoder.final_layer_norm.weight"])
        put("enc_rel_bias", tensors[
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"])
        put("dec_rel_bias", tensors[
            "decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"])
        ffn = (("wi_0", "wi_0"), ("wi_1", "wi_1")) if cfg.t5_gated else (("wi", "wi"),)
        ffn = ffn + (("wo", "wo"),)
        for i in range(cfg.n_layers):
            p = f"encoder.block.{i}."
            put(f"enc_h_{i}/input_layernorm/weight",
                tensors[p + "layer.0.layer_norm.weight"])
            for n in ("q", "k", "v", "o"):
                put_kernel(f"enc_h_{i}/attn/{n}_proj/base/kernel",
                           tensors[p + f"layer.0.SelfAttention.{n}.weight"].T)
            put(f"enc_h_{i}/post_attention_layernorm/weight",
                tensors[p + "layer.1.layer_norm.weight"])
            for hf_n, fx_n in ffn:
                put_kernel(f"enc_h_{i}/mlp/{fx_n}/kernel",
                           tensors[p + f"layer.1.DenseReluDense.{hf_n}.weight"].T)
        for i in range(cfg.n_dec_layers or cfg.n_layers):
            p = f"decoder.block.{i}."
            put(f"dec_h_{i}/input_layernorm/weight",
                tensors[p + "layer.0.layer_norm.weight"])
            for n in ("q", "k", "v", "o"):
                put_kernel(f"dec_h_{i}/attn/{n}_proj/base/kernel",
                           tensors[p + f"layer.0.SelfAttention.{n}.weight"].T)
            put(f"dec_h_{i}/cross_attention_layernorm/weight",
                tensors[p + "layer.1.layer_norm.weight"])
            for n in ("q", "k", "v", "o"):
                put_kernel(f"dec_h_{i}/cross_attn/{n}_proj/base/kernel",
                           tensors[p + f"layer.1.EncDecAttention.{n}.weight"].T)
            put(f"dec_h_{i}/post_attention_layernorm/weight",
                tensors[p + "layer.2.layer_norm.weight"])
            for hf_n, fx_n in ffn:
                put_kernel(f"dec_h_{i}/mlp/{fx_n}/kernel",
                           tensors[p + f"layer.2.DenseReluDense.{hf_n}.weight"].T)
        return tree
    if cfg.style == "bart":
        # HF BartModel: shared embeddings, per-side learned positions
        # (+2 offset rows) and layernorm_embedding, post-LN layers
        # (self_attn_layer_norm -> ln_1, encoder_attn_layer_norm ->
        # ln_cross, final_layer_norm -> ln_2), biased projections
        put("wte", tensors["shared.weight"])
        put("enc_wpe", tensors["encoder.embed_positions.weight"])
        put("dec_wpe", tensors["decoder.embed_positions.weight"])
        put("enc_ln_emb/scale", tensors["encoder.layernorm_embedding.weight"])
        put("enc_ln_emb/bias", tensors["encoder.layernorm_embedding.bias"])
        put("dec_ln_emb/scale", tensors["decoder.layernorm_embedding.weight"])
        put("dec_ln_emb/bias", tensors["decoder.layernorm_embedding.bias"])

        def bart_attn(dst, src):
            for hf_n, fx_n in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                               ("v_proj", "v_proj"), ("out_proj", "o_proj")):
                put_kernel(f"{dst}/{fx_n}/base/kernel",
                           tensors[src + f".{hf_n}.weight"].T)
                put(f"{dst}/{fx_n}/base/bias", tensors[src + f".{hf_n}.bias"])

        def bart_common(dst, src):
            put(f"{dst}/ln_1/scale",
                tensors[src + "self_attn_layer_norm.weight"])
            put(f"{dst}/ln_1/bias", tensors[src + "self_attn_layer_norm.bias"])
            put(f"{dst}/ln_2/scale", tensors[src + "final_layer_norm.weight"])
            put(f"{dst}/ln_2/bias", tensors[src + "final_layer_norm.bias"])
            bart_attn(f"{dst}/attn", src + "self_attn")
            put_kernel(f"{dst}/mlp/c_fc/kernel", tensors[src + "fc1.weight"].T)
            put(f"{dst}/mlp/c_fc/bias", tensors[src + "fc1.bias"])
            put_kernel(f"{dst}/mlp/c_proj/kernel",
                       tensors[src + "fc2.weight"].T)
            put(f"{dst}/mlp/c_proj/bias", tensors[src + "fc2.bias"])

        for i in range(cfg.n_layers):
            bart_common(f"enc_h_{i}", f"encoder.layers.{i}.")
        for i in range(cfg.n_dec_layers or cfg.n_layers):
            p = f"decoder.layers.{i}."
            bart_common(f"dec_h_{i}", p)
            put(f"dec_h_{i}/ln_cross/scale",
                tensors[p + "encoder_attn_layer_norm.weight"])
            put(f"dec_h_{i}/ln_cross/bias",
                tensors[p + "encoder_attn_layer_norm.bias"])
            bart_attn(f"dec_h_{i}/cross_attn", p + "encoder_attn")
        return tree
    if cfg.style == "opt":
        # HF OPTModel nests OPTDecoder under "decoder."; canonical flax
        # names reuse the gpt2-family layout (ln_1/ln_2/ln_f/c_fc/c_proj)
        # so the Megatron TP rules and freeze labels apply unchanged
        put("wte", tensors["decoder.embed_tokens.weight"])
        put("wpe", tensors["decoder.embed_positions.weight"])
        put("ln_f/scale", tensors["decoder.final_layer_norm.weight"])
        put("ln_f/bias", tensors["decoder.final_layer_norm.bias"])
        for i in range(cfg.n_layers):
            p = f"decoder.layers.{i}."
            put(f"h_{i}/ln_1/scale", tensors[p + "self_attn_layer_norm.weight"])
            put(f"h_{i}/ln_1/bias", tensors[p + "self_attn_layer_norm.bias"])
            put(f"h_{i}/ln_2/scale", tensors[p + "final_layer_norm.weight"])
            put(f"h_{i}/ln_2/bias", tensors[p + "final_layer_norm.bias"])
            for hf_n, fx_n in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                               ("v_proj", "v_proj"), ("out_proj", "o_proj")):
                put_kernel(f"h_{i}/attn/{fx_n}/base/kernel",
                           tensors[p + f"self_attn.{hf_n}.weight"].T)
                put(f"h_{i}/attn/{fx_n}/base/bias",
                    tensors[p + f"self_attn.{hf_n}.bias"])
            put_kernel(f"h_{i}/mlp/c_fc/kernel", tensors[p + "fc1.weight"].T)
            put(f"h_{i}/mlp/c_fc/bias", tensors[p + "fc1.bias"])
            put_kernel(f"h_{i}/mlp/c_proj/kernel", tensors[p + "fc2.weight"].T)
            put(f"h_{i}/mlp/c_proj/bias", tensors[p + "fc2.bias"])
        return tree
    if cfg.style == "neox":
        # HF GPTNeoXAttention packs q/k/v PER HEAD in query_key_value
        # ([H, 3, D] on the out axis) — deinterleave into separate
        # projections so the canonical q/k/v layout (and its TP rules)
        # applies
        put("wte", tensors["embed_in.weight"])
        put("ln_f/scale", tensors["final_layer_norm.weight"])
        put("ln_f/bias", tensors["final_layer_norm.bias"])
        H, D, M = cfg.n_heads, cfg.head_dim, cfg.d_model
        for i in range(cfg.n_layers):
            p = f"layers.{i}."
            put(f"h_{i}/ln_1/scale", tensors[p + "input_layernorm.weight"])
            put(f"h_{i}/ln_1/bias", tensors[p + "input_layernorm.bias"])
            put(f"h_{i}/ln_2/scale",
                tensors[p + "post_attention_layernorm.weight"])
            put(f"h_{i}/ln_2/bias",
                tensors[p + "post_attention_layernorm.bias"])
            qkv_w = tensors[p + "attention.query_key_value.weight"]
            qkv_w = np.asarray(qkv_w).reshape(H, 3, D, M)  # [H,3,D,in]
            qkv_b = np.asarray(
                tensors[p + "attention.query_key_value.bias"]).reshape(H, 3, D)
            for j, fx_n in enumerate(("q_proj", "k_proj", "v_proj")):
                put_kernel(f"h_{i}/attn/{fx_n}/base/kernel",
                           qkv_w[:, j].reshape(H * D, M).T)
                put(f"h_{i}/attn/{fx_n}/base/bias",
                    qkv_b[:, j].reshape(H * D))
            put_kernel(f"h_{i}/attn/o_proj/base/kernel",
                       tensors[p + "attention.dense.weight"].T)
            put(f"h_{i}/attn/o_proj/base/bias",
                tensors[p + "attention.dense.bias"])
            put_kernel(f"h_{i}/mlp/c_fc/kernel",
                       tensors[p + "mlp.dense_h_to_4h.weight"].T)
            put(f"h_{i}/mlp/c_fc/bias", tensors[p + "mlp.dense_h_to_4h.bias"])
            put_kernel(f"h_{i}/mlp/c_proj/kernel",
                       tensors[p + "mlp.dense_4h_to_h.weight"].T)
            put(f"h_{i}/mlp/c_proj/bias", tensors[p + "mlp.dense_4h_to_h.bias"])
        return tree
    if cfg.style == "gpt2":
        put("wte", tensors["wte.weight"])
        put("wpe", tensors["wpe.weight"])
        put("ln_f/scale", tensors["ln_f.weight"])
        put("ln_f/bias", tensors["ln_f.bias"])
        for i in range(cfg.n_layers):
            p = f"h.{i}."
            put(f"h_{i}/ln_1/scale", tensors[p + "ln_1.weight"])
            put(f"h_{i}/ln_1/bias", tensors[p + "ln_1.bias"])
            put(f"h_{i}/ln_2/scale", tensors[p + "ln_2.weight"])
            put(f"h_{i}/ln_2/bias", tensors[p + "ln_2.bias"])
            put_kernel(f"h_{i}/attn/c_attn/base/kernel", tensors[p + "attn.c_attn.weight"])
            put(f"h_{i}/attn/c_attn/base/bias", tensors[p + "attn.c_attn.bias"])
            put_kernel(f"h_{i}/attn/c_proj/base/kernel", tensors[p + "attn.c_proj.weight"])
            put(f"h_{i}/attn/c_proj/base/bias", tensors[p + "attn.c_proj.bias"])
            put_kernel(f"h_{i}/mlp/c_fc/kernel", tensors[p + "mlp.c_fc.weight"])
            put(f"h_{i}/mlp/c_fc/bias", tensors[p + "mlp.c_fc.bias"])
            put_kernel(f"h_{i}/mlp/c_proj/kernel", tensors[p + "mlp.c_proj.weight"])
            put(f"h_{i}/mlp/c_proj/bias", tensors[p + "mlp.c_proj.bias"])
    else:
        put("wte", tensors["embed_tokens.weight"])
        put("norm/weight", tensors["norm.weight"])
        for i in range(cfg.n_layers):
            p = f"layers.{i}."
            put(f"h_{i}/input_layernorm/weight", tensors[p + "input_layernorm.weight"])
            put(f"h_{i}/post_attention_layernorm/weight",
                tensors[p + "post_attention_layernorm.weight"])
            if getattr(cfg, "fused_projections", False):
                # small-batch serving layout: q|k|v column-concat into one
                # kernel (per-output-channel quantization scales
                # concatenate, so numerics match the separate path
                # exactly — DecoderConfig.fused_projections)
                put_kernel(f"h_{i}/attn/qkv_proj/base/kernel",
                           np.concatenate(
                               [tensors[p + f"self_attn.{n}.weight"].T
                                for n in ("q_proj", "k_proj", "v_proj")],
                               axis=1))
                put_kernel(f"h_{i}/attn/o_proj/base/kernel",
                           tensors[p + "self_attn.o_proj.weight"].T)
            else:
                for hf_n, fx_n in (("q_proj", "q_proj"),
                                   ("k_proj", "k_proj"),
                                   ("v_proj", "v_proj"),
                                   ("o_proj", "o_proj")):
                    put_kernel(f"h_{i}/attn/{fx_n}/base/kernel",
                               tensors[p + f"self_attn.{hf_n}.weight"].T)
            if getattr(cfg, "n_experts", 0) > 1:
                # mixtral sparse MoE: router + per-expert SwiGLU weights
                # stacked on a leading E axis (transformer.py MoEMLP)
                put(f"h_{i}/mlp/gate",
                    tensors[p + "block_sparse_moe.gate.weight"].T)
                for hf_n, fx_n in (("w1", "w_gate"), ("w3", "w_up"),
                                   ("w2", "w_down")):
                    w = np.stack([
                        tensors[p + f"block_sparse_moe.experts.{e}."
                                    f"{hf_n}.weight"].T
                        for e in range(cfg.n_experts)])  # [E, in, out]
                    if quantize in (4, 8):
                        # bnb quantizes expert Linears like any other
                        # (the reference's load_in_4bit/8bit applies
                        # model-wide, medtsllm.py:162-173): expert-wise
                        # absmax int8 / packed int4 (or fp4/nf4 codebook)
                        from .transformer import QuantDense
                        cb = (getattr(cfg, "quant4_codebook", "absmax")
                              if quantize == 4 else "absmax")
                        qs = [QuantDense.quantize(
                            np.asarray(w[e], dtype=np.float32),
                            bits=quantize, codebook=cb)
                            for e in range(cfg.n_experts)]
                        put(f"h_{i}/mlp/{fx_n}_q",
                            np.stack([q for q, _ in qs]))
                        put(f"h_{i}/mlp/{fx_n}_scale",
                            np.stack([s for _, s in qs]))
                    else:
                        put(f"h_{i}/mlp/{fx_n}", w)
            elif getattr(cfg, "fused_projections", False):
                put_kernel(f"h_{i}/mlp/gateup_proj/kernel",
                           np.concatenate(
                               [tensors[p + "mlp.gate_proj.weight"].T,
                                tensors[p + "mlp.up_proj.weight"].T],
                               axis=1))
                put_kernel(f"h_{i}/mlp/down_proj/kernel",
                           tensors[p + "mlp.down_proj.weight"].T)
            else:
                for hf_n in ("gate_proj", "up_proj", "down_proj"):
                    put_kernel(f"h_{i}/mlp/{hf_n}/kernel",
                               tensors[p + f"mlp.{hf_n}.weight"].T)
    return tree


def stack_decoder_tree(tree: dict, n_layers: int) -> dict:
    """Convert per-layer ``h_i`` subtrees to the pipeline layout
    (``h_stack/block`` with a leading [n_layers] axis on every leaf) —
    the param layout TransformerDecoder(pipeline=S) creates natively.
    Host-side (numpy); non-layer keys pass through."""
    from ...parallel.pipeline import stack_layer_params
    layers = [tree.pop(f"h_{i}") for i in range(n_layers)]
    tree["h_stack"] = {"block": stack_layer_params(layers)}
    return tree


def _load_safetensors(snap: Path) -> dict:
    from safetensors import safe_open
    tensors = {}
    for f in sorted(snap.glob("*.safetensors")):
        with safe_open(str(f), framework="numpy") as sf:
            for name in sf.keys():
                short = name
                for prefix in ("model.", "transformer.", "backbone."):
                    if short.startswith(prefix):
                        short = short[len(prefix):]
                tensors[short] = sf.get_tensor(name)
    return tensors


def load_backbone(llm_id: str, cache_dir: str | None = None,
                  llm_layers: int = -1, lora: LoraSpec | None = None,
                  dtype=np.float32, rng=None, remat: bool = False,
                  quantize: int = 0, act_quant: bool | str = True,
                  pipeline: int = 0, pipeline_microbatches: int = 0,
                  pipeline_mesh=None, fuse_projections: bool = False,
                  quant_codebook: str = "absmax"):
    """Returns (module, params, cfg). Params are loaded from a local
    snapshot when available, otherwise random-init with a warning.
    quantize: 0 (off), 8, or 4 bits; True is accepted as 8.
    quant_codebook (4-bit): "absmax" linear int4, or the bnb "nf4"/"fp4"
    16-entry codebooks (DecoderConfig.quant4_codebook).
    pipeline > 1 builds the decoder in pipeline-parallel layout (stacked
    h_stack params; HF layer weights are stacked to match)."""
    quantize = 8 if quantize is True else int(quantize or 0)
    assert quantize in (0, 4, 8), quantize
    cfg, snap = resolve_config(llm_id, cache_dir, llm_layers)
    if quant_codebook != "absmax":
        assert quantize == 4, "codebooks apply to 4-bit quantization only"
        if not hasattr(cfg, "quant4_codebook"):
            raise NotImplementedError(
                f"quant_codebook={quant_codebook!r} needs a decoder-style "
                f"backbone; {llm_id!r} ({cfg.style!r}) does not support it")
        cfg = dataclasses.replace(cfg, quant4_codebook=quant_codebook)
    if fuse_projections:
        if cfg.style != "llama":
            raise ValueError(
                f"fuse_projections supports llama-style decoders; "
                f"{llm_id!r} is {cfg.style!r}")
        cfg = dataclasses.replace(cfg, fused_projections=True)
    import jax.numpy as _jnp
    _dt = _jnp.dtype(dtype)
    extra = {}
    if cfg.style == "mamba":
        from .mamba import MambaBackbone
        module_cls = MambaBackbone
    elif cfg.is_encoder_decoder:
        module_cls = TransformerEncDec
    else:
        module_cls = TransformerDecoder
        extra = dict(pipeline=pipeline,
                     pipeline_microbatches=pipeline_microbatches,
                     pipeline_mesh=pipeline_mesh)
    if pipeline and pipeline > 1 and module_cls is not TransformerDecoder:
        raise NotImplementedError(
            f"pipeline parallelism supports decoder-only backbones; "
            f"got {module_cls.__name__} for {llm_id!r}")
    module = module_cls(
        cfg, lora=lora, remat=remat, quantize=quantize, act_quant=act_quant,
        dtype=(None if _dt == _jnp.float32 else _dt), param_dtype=_dt,
        **extra)

    if rng is None:
        rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp
    dummy = jnp.zeros((1, 8, cfg.d_model), dtype=dtype)
    if cfg.is_encoder_decoder:
        params = module.init({"params": rng, "dropout": rng},
                             inputs_embeds=dummy,
                             decoder_inputs_embeds=dummy)["params"]
    else:
        params = module.init({"params": rng, "dropout": rng},
                             inputs_embeds=dummy)["params"]

    if snap is not None and list(snap.glob("*.safetensors")):
        from ...runtime.checkpoint import restore_partial
        tensors = _load_safetensors(snap)
        tree = _hf_to_tree(cfg, tensors, quantize=quantize)
        if pipeline and pipeline > 1:
            tree = stack_decoder_tree(tree, cfg.n_layers)
        merged, _ = restore_partial(jax.device_get(params), tree)
        # restore_partial already cast each leaf to its TEMPLATE dtype — the
        # right per-leaf choice (weights at param_dtype, QuantDense
        # scales and LoRA adapters deliberately f32); no blanket cast
        params = jax.tree.map(jnp.asarray, merged)
    else:
        warnings.warn(
            f"LLM {llm_id!r}: no local weights found — using random init "
            f"(shapes/throughput faithful; task quality not meaningful)")
        # no cast: flax init already placed every leaf at its per-leaf
        # dtype (weights at param_dtype, QuantDense scales / LoRA
        # adapters / mamba A_log deliberately f32) — a blanket
        # astype(dtype) here would clobber the f32 leaves and make
        # numerics depend on whether a snapshot directory exists
    return module, params, cfg
