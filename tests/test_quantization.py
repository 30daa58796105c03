"""Int8 weight-only backbone quantization (reference bnb path,
medtsllm.py:162-173)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medtsllm_tpu.tasks import get_trainer
from conftest import make_config


@pytest.mark.parametrize("bits", [8, 4])
def test_act_quant_input_gradient_is_straight_through(bits):
    """Training BELOW a frozen int8/int4 backbone (the reference's
    finetune mode, medtsllm.py:162-173 + frozen params) needs dL/dx to
    survive the integer matmul: round() alone has zero gradient. The
    custom VJP must route backward through the DEQUANTIZED weight
    (bitsandbytes Linear8bitLt semantics)."""
    from medtsllm_tpu.models.llm.transformer import QuantDense
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 32)), jnp.float32)
    layer = QuantDense(16, bits=bits, act_quant=True)
    params = layer.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda xx: layer.apply(params, xx).sum())(x)
    kq, scale = params["params"]["kernel_q"], params["params"]["scale"]
    w = np.asarray(kq if bits == 8 else QuantDense.unpack4(kq, 32),
                   np.float32)
    expected = np.ones((4, 16), np.float32) @ (w * np.asarray(scale)).T
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("bits", [8, 4])
def test_int8_backward_matches_integer_law(bits):
    """llm.int8_backward (act_quant="int8_bwd"): dx runs on the s8 MXU —
    per-row absmax quantization of the scale-folded gradient, s8 x s8 ->
    s32, rescale. Exact numpy law oracle (this repo's quant-evidence
    standard)."""
    from medtsllm_tpu.models.llm.transformer import QuantDense
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 32)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
    layer = QuantDense(16, bits=bits, act_quant="int8_bwd")
    params = layer.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda xx: jnp.sum(layer.apply(params, xx)
                                    * cot))(x)
    kq, scale = params["params"]["kernel_q"], params["params"]["scale"]
    w = np.asarray(kq if bits == 8 else QuantDense.unpack4(kq, 32),
                   np.int32)
    gs = np.asarray(cot) * np.asarray(scale)[None, :]
    gsc = np.maximum(np.abs(gs).max(-1, keepdims=True) / 127.0, 1e-10)
    gq = np.round(gs / gsc).astype(np.int32)
    expected = (gq @ w.T).astype(np.float32) * gsc
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5,
                               atol=1e-6)


def test_int8_backward_tracks_ste_gradient():
    """The int8 dx must agree in DIRECTION with the bf16 STE dx
    (cos > 0.999) — one more per-row quantization of an already-STE
    gradient; also checked through the MoE expert bmm."""
    from medtsllm_tpu.models.llm.transformer import (QuantDense,
                                                     _act_quant_bmm)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 64)), jnp.float32)
    l_f = QuantDense(32, act_quant=True)
    l_q = QuantDense(32, act_quant="int8_bwd")
    params = l_f.init(jax.random.PRNGKey(3), x)

    def cos(a, b):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    g_f = jax.grad(lambda xx: jnp.sum(l_f.apply(params, xx) ** 2))(x)
    g_q = jax.grad(lambda xx: jnp.sum(l_q.apply(params, xx) ** 2))(x)
    assert cos(g_f, g_q) > 0.999

    h = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)
    kqe = jnp.asarray(rng.integers(-127, 128, (2, 16, 8)), jnp.int8)
    sce = jnp.asarray(rng.uniform(1e-3, 1e-2, (2, 8)), jnp.float32)
    b_f = jax.grad(lambda hh: jnp.sum(_act_quant_bmm(hh, kqe, sce) ** 2))(h)
    b_q = jax.grad(lambda hh: jnp.sum(
        _act_quant_bmm(hh, kqe, sce, True) ** 2))(h)
    assert cos(b_f, b_q) > 0.999


def test_int8_backward_trains_e2e(tmp_path):
    """llm.int8_backward plumbs through the config to every QuantDense
    (model.act_quant == "int8_bwd") and the quantized-backbone train
    step still optimizes: finite losses, fusion params move."""
    cfg = make_config(task="reconstruction", model="medtsllm",
                      hist=32, pred=32, step=16)
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 1
    cfg.training.batch_size = 4
    cfg.datasets.synthetic.n_points = 128
    cfg["models"] = {"medtsllm": {
        "d_model": 16, "d_ff": 16, "n_heads": 4, "num_tokens": 32,
        "covariate_mode": "concat", "embedding_downsample_mode": "linear",
        "patching": {"patch_len": 8, "stride": 4},
        "prompting": {"dataset": True, "task": True, "clip": False,
                      "input_stats": False, "examples": False,
                      "input_stats_dim": 0, "input_stats_select": "all"},
        "llm": {"enabled": True, "llm": "llama-tiny", "llm_layers": -1,
                "load_in_8bit": True, "int8_matmul": True,
                "int8_backward": True},
    }}
    trainer = get_trainer("i8bwd", cfg)
    assert trainer.model.act_quant == "int8_bwd"
    import copy
    before = copy.deepcopy(jax.device_get(
        trainer.params["output_projection"]))
    trainer.train()
    assert np.isfinite(trainer.val()["val/mse"])
    after = jax.device_get(trainer.params["output_projection"])
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(before),
                                jax.tree.leaves(after)))
    assert moved, "fusion params did not move under int8_backward"


def test_int8_backward_fails_fast_without_s8_path(tmp_path):
    """int8_backward without the s8 matmul path (int8_matmul=false, no
    quantized backbone, or fp4/nf4 codebooks) must RAISE, not silently
    train the bf16 backward."""
    def build(**llm):
        cfg = make_config(task="reconstruction", model="medtsllm",
                          hist=32, pred=32, step=16)
        cfg["paths"] = {"logdir": str(tmp_path / "logs")}
        cfg.datasets.synthetic.n_points = 128
        cfg["models"] = {"medtsllm": {
            "d_model": 16, "d_ff": 16, "n_heads": 4, "num_tokens": 32,
            "covariate_mode": "concat",
            "embedding_downsample_mode": "linear",
            "patching": {"patch_len": 8, "stride": 4},
            "prompting": {"dataset": True, "task": True, "clip": False,
                          "input_stats": False, "examples": False,
                          "input_stats_dim": 0, "input_stats_select": "all"},
            "llm": {"enabled": True, "llm": "llama-tiny", "llm_layers": 1,
                    "int8_backward": True, **llm},
        }}
        return get_trainer("i8ff", cfg)

    with pytest.raises(ValueError, match="int8_backward"):
        build(load_in_8bit=True, int8_matmul=False)
    with pytest.raises(ValueError, match="int8_backward"):
        build()  # no quantized backbone at all
    with pytest.raises(ValueError, match="int8_backward"):
        build(load_in_4bit=True, quant_type="nf4")  # weight-only dequant


def test_quantdense_roundtrip_accuracy():
    from medtsllm_tpu.models.llm.transformer import QuantDense
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.05, size=(64, 32)).astype(np.float32)
    q, scale = QuantDense.quantize(w)
    assert q.dtype == np.int8 and scale.shape == (32,)
    back = q.astype(np.float32) * scale[None, :]
    # per-channel absmax int8: relative error bounded by 1/254 of absmax
    assert np.abs(back - w).max() <= (np.abs(w).max(axis=0) / 127).max() + 1e-7


def test_quantized_backbone_close_to_fp(tmp_path):
    """Quantized snapshot load: output close to full-precision."""
    import json
    from safetensors.torch import save_file
    import torch
    from transformers import LlamaConfig, LlamaModel
    hf_cfg = LlamaConfig(vocab_size=96, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=4, max_position_embeddings=64)
    torch.manual_seed(0)
    hf = LlamaModel(hf_cfg).eval()
    snap = tmp_path / "snap"
    snap.mkdir()
    (snap / "config.json").write_text(json.dumps(hf_cfg.to_dict()))
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()},
              str(snap / "model.safetensors"))

    from medtsllm_tpu.models.llm.loader import load_backbone
    m_fp, p_fp, _ = load_backbone(str(snap))
    m_q, p_q, _ = load_backbone(str(snap), quantize=True)

    kq = p_q["h_0"]["attn"]["q_proj"]["base"]["kernel_q"]
    assert kq.dtype == jnp.int8

    ids = jnp.asarray(np.arange(8)[None, :], jnp.int32)
    o_fp = np.asarray(m_fp.apply({"params": p_fp}, input_ids=ids))
    o_q = np.asarray(m_q.apply({"params": p_q}, input_ids=ids))
    err = np.abs(o_fp - o_q).max() / (np.abs(o_fp).max() + 1e-6)
    assert err < 0.05, f"quantization error too large: {err}"


def test_medtsllm_8bit_e2e(tmp_path):
    cfg = make_config(task="reconstruction", model="medtsllm",
                      hist=32, pred=32, step=16)
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 1
    cfg.training.batch_size = 4
    cfg.datasets.synthetic.n_points = 256
    cfg["models"] = {"medtsllm": {
        "d_model": 16, "d_ff": 16, "n_heads": 4, "num_tokens": 32,
        "covariate_mode": "concat", "embedding_downsample_mode": "linear",
        "patching": {"patch_len": 8, "stride": 4},
        "prompting": {"dataset": True, "task": True, "clip": False,
                      "input_stats": False, "examples": False,
                      "input_stats_dim": 0, "input_stats_select": "all"},
        "llm": {"enabled": True, "llm": "llama-tiny", "llm_layers": -1,
                "load_in_4bit": False, "load_in_8bit": True},
    }}
    trainer = get_trainer("q8", cfg)
    kq = trainer.params["llm"]["h_0"]["attn"]["q_proj"]["base"]["kernel_q"]
    assert kq.dtype == jnp.int8
    trainer.train()  # int8 weights frozen; fusion layers train
    scores = trainer.val()
    assert np.isfinite(scores["val/mse"])


def test_int4_pack_unpack_roundtrip():
    from medtsllm_tpu.models.llm.transformer import QuantDense
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    w = rng.normal(0, 0.05, size=(33, 16)).astype(np.float32)  # odd rows
    q, scale = QuantDense.quantize(w, bits=4)
    assert q.shape == (17, 16) and q.dtype == np.int8
    unpacked = np.asarray(QuantDense.unpack4(jnp.asarray(q), 33))
    back = unpacked.astype(np.float32) * scale[None, :]
    # int4: error bounded by half a quantization step per channel
    step = np.abs(w).max(axis=0) / 7
    assert (np.abs(back - w) <= step[None, :] / 2 + 1e-6).all()


def test_medtsllm_4bit_e2e(tmp_path):
    cfg = make_config(task="reconstruction", model="medtsllm",
                      hist=32, pred=32, step=16)
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 1
    cfg.training.batch_size = 4
    cfg.datasets.synthetic.n_points = 256
    cfg["models"] = {"medtsllm": {
        "d_model": 16, "d_ff": 16, "n_heads": 4, "num_tokens": 32,
        "covariate_mode": "concat", "embedding_downsample_mode": "linear",
        "patching": {"patch_len": 8, "stride": 4},
        "prompting": {"dataset": True, "task": True, "clip": False,
                      "input_stats": False, "examples": False,
                      "input_stats_dim": 0, "input_stats_select": "all"},
        "llm": {"enabled": True, "llm": "llama-tiny", "llm_layers": -1,
                "load_in_4bit": True, "load_in_8bit": False},
    }}
    trainer = get_trainer("q4", cfg)
    kq = trainer.params["llm"]["h_0"]["attn"]["q_proj"]["base"]["kernel_q"]
    assert kq.dtype == jnp.int8
    assert kq.shape[0] == 32  # 64 input rows packed in pairs
    trainer.train()
    scores = trainer.val()
    assert np.isfinite(scores["val/mse"])


def test_codebook_roundtrip_error_vs_linear():
    """bnb codebook fidelity (VERDICT r2 item 6): nf4 is the QLoRA map
    optimized for N(0,1) weights — its roundtrip RMS error on gaussian
    weights must beat linear absmax int4; fp4 (the reference's bnb
    default) trades tail precision for near-zero resolution."""
    from medtsllm_tpu.models.llm.transformer import (QUANT4_CODEBOOKS,
                                                     QuantDense)
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    w = rng.normal(0, 0.05, size=(256, 64)).astype(np.float32)

    def roundtrip(codebook):
        q, scale = QuantDense.quantize(w, bits=4, codebook=codebook)
        codes = np.asarray(QuantDense.unpack4(jnp.asarray(q), 256))
        if codebook == "absmax":
            return codes.astype(np.float32) * scale[None, :]
        table = QUANT4_CODEBOOKS[codebook]
        return table[codes.astype(np.int32) + 8] * scale[None, :]

    def rms(back):
        return float(np.sqrt(np.mean((back - w) ** 2)))

    err_lin, err_nf4, err_fp4 = (rms(roundtrip(c))
                                 for c in ("absmax", "nf4", "fp4"))
    assert err_nf4 < err_lin, (err_nf4, err_lin)
    assert np.isfinite(err_fp4)
    # codebooks span [-1, 1]: extreme values must be exactly representable
    for cb in ("nf4", "fp4"):
        back = roundtrip(cb)
        cols = np.abs(w).argmax(axis=0)
        np.testing.assert_allclose(
            np.abs(back[cols, np.arange(w.shape[1])]),
            np.abs(w).max(axis=0), rtol=1e-6)


@pytest.mark.parametrize("codebook", ["nf4", "fp4"])
def test_quantdense_codebook_apply(codebook):
    """QuantDense in codebook mode = dequant-lookup then a plain matmul
    (weight-only, like bnb's 4-bit GEMM); verify against the manual
    computation, with and without act_quant requested (act_quant must be
    ignored — codebook values are not integers)."""
    from medtsllm_tpu.models.llm.transformer import (QUANT4_CODEBOOKS,
                                                     QuantDense)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(4, 32)), jnp.float32)
    for aq in (True, False):
        layer = QuantDense(16, bits=4, act_quant=aq, codebook=codebook,
                           use_bias=False)
        params = layer.init(jax.random.PRNGKey(1), x)
        y = np.asarray(layer.apply(params, x))
        kq = params["params"]["kernel_q"]
        scale = np.asarray(params["params"]["scale"])
        codes = np.asarray(QuantDense.unpack4(kq, 32)).astype(np.int32) + 8
        w = QUANT4_CODEBOOKS[codebook][codes]
        expected = (np.asarray(x) @ w) * scale[None, :]
        np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_codebook_backbone_logits_error(tmp_path):
    """The measured linear-int4 vs nf4/fp4 error table on a real load
    path (locally-built llama snapshot -> _hf_to_tree -> decoder
    forward), the accuracy-validation VERDICT r2 item 1 of the 4-bit
    path. nf4 must not lose to linear absmax on trained-weight-shaped
    (gaussian-ish) tensors."""
    import json
    from safetensors.torch import save_file
    import torch
    from transformers import LlamaConfig, LlamaModel
    hf_cfg = LlamaConfig(vocab_size=96, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=4, max_position_embeddings=64)
    torch.manual_seed(1)
    hf = LlamaModel(hf_cfg).eval()
    snap = tmp_path / "snap"
    snap.mkdir()
    (snap / "config.json").write_text(json.dumps(hf_cfg.to_dict()))
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()},
              str(snap / "model.safetensors"))

    from medtsllm_tpu.models.llm.loader import load_backbone
    m_fp, p_fp, _ = load_backbone(str(snap))
    ids = jnp.asarray(np.arange(8)[None, :], jnp.int32)
    ref = np.asarray(m_fp.apply({"params": p_fp}, input_ids=ids))

    errs = {}
    for name, kw in (("linear", {}), ("nf4", {"quant_codebook": "nf4"}),
                     ("fp4", {"quant_codebook": "fp4"})):
        m, p, _ = load_backbone(str(snap), quantize=4, **kw)
        out = np.asarray(m.apply({"params": p}, input_ids=ids))
        errs[name] = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6)
    assert all(e < 0.15 for e in errs.values()), errs
    assert errs["nf4"] <= errs["linear"] * 1.25, errs


def test_medtsllm_nf4_e2e(tmp_path):
    """models.<m>.llm.quant_type = nf4 end-to-end through the flagship."""
    cfg = make_config(task="reconstruction", model="medtsllm",
                      hist=32, pred=32, step=16)
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 1
    cfg.training.batch_size = 4
    cfg.datasets.synthetic.n_points = 256
    cfg["models"] = {"medtsllm": {
        "d_model": 16, "d_ff": 16, "n_heads": 4, "num_tokens": 32,
        "covariate_mode": "concat", "embedding_downsample_mode": "linear",
        "patching": {"patch_len": 8, "stride": 4},
        "prompting": {"dataset": True, "task": True, "clip": False,
                      "input_stats": False, "examples": False,
                      "input_stats_dim": 0, "input_stats_select": "all"},
        "llm": {"enabled": True, "llm": "llama-tiny", "llm_layers": -1,
                "load_in_4bit": True, "load_in_8bit": False,
                "quant_type": "nf4"},
    }}
    trainer = get_trainer("qnf4", cfg)
    assert trainer.model.llm_cfg.quant4_codebook == "nf4"
    kq = trainer.params["llm"]["h_0"]["attn"]["q_proj"]["base"]["kernel_q"]
    assert kq.dtype == jnp.int8
    trainer.train()
    scores = trainer.val()
    assert np.isfinite(scores["val/mse"])

    cfg.models.medtsllm.llm["quant_type"] = "bogus"
    with pytest.raises(ValueError, match="quant_type"):
        get_trainer("qbad", cfg)


def test_int8_matmul_matches_weight_only():
    """The s8xs8->s32 MXU path (act_quant) stays close to the weight-only
    dequant path — per-token absmax activation quantization adds <1%
    relative error on well-conditioned inputs."""
    from medtsllm_tpu.models.llm.transformer import QuantDense
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1.0, size=(4, 16, 64)).astype(np.float32))
    m_wo = QuantDense(32, use_bias=False, act_quant=False)
    m_aq = QuantDense(32, use_bias=False, act_quant=True)
    params = m_wo.init(jax.random.PRNGKey(0), x)
    y_wo = np.asarray(m_wo.apply(params, x))
    y_aq = np.asarray(m_aq.apply(params, x))
    rel = np.abs(y_aq - y_wo).max() / (np.abs(y_wo).max() + 1e-9)
    assert rel < 0.02, f"act-quant error too large: {rel}"


def test_int8_matmul_accumulates_in_int32():
    """Adversarial input: all-equal activations of length 512 would
    overflow an int8/int16 accumulator; int32 accumulation is exact."""
    from medtsllm_tpu.models.llm.transformer import QuantDense
    x = jnp.ones((1, 1, 512), jnp.float32) * 3.0
    m = QuantDense(8, use_bias=False, act_quant=True)
    params = m.init(jax.random.PRNGKey(1), x)
    w = np.asarray(params["params"]["kernel_q"], np.float32)
    scale = np.asarray(params["params"]["scale"])
    expect = (np.full((512,), 127.0) @ w) * (3.0 / 127.0) * scale
    got = np.asarray(m.apply(params, x))[0, 0]
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_gpt2_fused_lora_partial_targets():
    """gpt2 packs q|k|v into one c_attn matmul. A LoraSpec targeting a
    subset (e.g. only 'v') must create the adapter AND touch only the
    targeted third — not silently disable LoRA (the old 'q'-keyed gate)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from medtsllm_tpu.models.llm.transformer import Attention, LoraSpec
    from medtsllm_tpu.models.llm.loader import resolve_config

    cfg, _ = resolve_config("gpt2-tiny")
    spec = LoraSpec(rank=2, targets=("v",))
    attn = Attention(cfg, lora=spec, causal=True)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 8, cfg.d_model)), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths = ["/".join(str(getattr(k, "key", k)) for k in kp)
             for kp, _ in flat]
    assert any("lora_a" in p for p in paths), \
        "targets=('v',) created no adapter on the fused c_attn"

    base = attn.apply(params, x)
    # bump lora_b: only the v third of the fused output may change ->
    # attention OUTPUT changes (v flows through); q/k thirds are masked.
    import flax
    p2 = flax.core.unfreeze(params)
    ca = p2["params"]["c_attn"]
    ca["lora_b"] = jnp.ones_like(ca["lora_b"])
    bumped = attn.apply(flax.core.freeze(p2), x)
    assert not np.allclose(base, bumped), "masked adapter has no effect"

    # and the mask really zeroes the untargeted thirds: check the delta
    # on the fused projection directly
    from medtsllm_tpu.models.llm.transformer import LoRADense
    d = cfg.d_model
    mask = np.repeat(np.array([0.0, 0.0, 1.0], np.float32), d)
    ld = LoRADense(3 * d, lora=spec, lora_out_mask=mask)
    lp = ld.init(jax.random.PRNGKey(1), x)
    lp2 = flax.core.unfreeze(lp)
    lp2["params"]["lora_b"] = jnp.ones_like(lp2["params"]["lora_b"])
    y0 = ld.apply(lp, x)
    y1 = ld.apply(flax.core.freeze(lp2), x)
    diff = np.asarray(y1 - y0)
    np.testing.assert_array_equal(diff[..., :2 * d], 0)  # q,k untouched
    assert np.abs(diff[..., 2 * d:]).max() > 0  # v adapted
