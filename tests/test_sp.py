"""Sequence-parallel ring-collective TP (parallel/sp.py): numerics vs the
plain path on the 8-device virtual CPU mesh. The overlap these schedules
buy is an ICI property; what is testable here is that the ring
bookkeeping (token chunk routing, reduce-scatter accumulation, global
int8 scales) reproduces the single-device stack exactly, forward and
backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_config
from medtsllm_tpu.models.llm.loader import load_backbone
from medtsllm_tpu.parallel.mesh import create_mesh
from medtsllm_tpu.parallel.sharding import shard_params
from medtsllm_tpu.parallel.sp import _rmsnorm, sp_decoder_stack, sp_supported
from medtsllm_tpu.tasks import get_trainer


@pytest.fixture(autouse=True)
def needs_8_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


@pytest.mark.parametrize("quant,act_q", [(0, True), (8, True), (8, False)])
def test_sp_stack_matches_plain_fwd_and_grad(quant, act_q):
    """Odd L exercises the pad-to-multiple path (causal attention makes
    end-padding exact); dgrad checks the STE backward through the ring
    reduce-scatter and the custom-scale quant matmul."""
    module, params, cfg = load_backbone("llama-tiny", quantize=quant,
                                        act_quant=act_q)
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(2, 13, cfg.d_model)) * 0.1).astype(np.float32)

    def plain(x):
        return module.apply({"params": params}, inputs_embeds=x).sum()

    e_loss, e_grad = jax.value_and_grad(plain)(jnp.asarray(x))

    mesh = create_mesh(data=4, tensor=2)
    assert sp_supported(cfg, None, quant, mesh)
    sharded = shard_params(params, mesh)
    layers = [sharded[f"h_{i}"] for i in range(cfg.n_layers)]

    @jax.jit
    def sp(x):
        h = sp_decoder_stack(layers, x, cfg, mesh, quantize=quant,
                             act_quant=act_q)
        return _rmsnorm(h, sharded["norm"]["weight"], cfg.norm_eps).sum()

    g_loss, g_grad = jax.value_and_grad(sp)(jnp.asarray(x))
    assert abs(float(e_loss) - float(g_loss)) < 1e-3
    np.testing.assert_allclose(np.asarray(g_grad), np.asarray(e_grad),
                               atol=1e-3)


@pytest.mark.parametrize("quant", [0, 8])
def test_sp_stack_matches_plain_bf16_compute(quant):
    """bf16 compute dtype with an f32 residual stream (the
    mixed-precision regime): every sp matmul must run at the SAME dtype
    as the plain path's nn.Dense(dtype=bf16)/QuantDense — an f32 sp
    matmul would silently diverge (and cost 2x MXU). Forward parity at
    bf16 rounding; the int8 fan-in ring accumulates its exact s32xscale
    partials in f32 and casts once."""
    module, params, cfg = load_backbone("llama-tiny", quantize=quant,
                                        dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    x = (rng.normal(size=(2, 16, cfg.d_model)) * 0.1).astype(np.float32)

    plain = module.apply({"params": params}, inputs_embeds=jnp.asarray(x))

    mesh = create_mesh(data=4, tensor=2)
    assert sp_supported(cfg, None, quant, mesh)
    sharded = shard_params(params, mesh)
    layers = [sharded[f"h_{i}"] for i in range(cfg.n_layers)]

    @jax.jit
    def sp(x):
        h = sp_decoder_stack(layers, x, cfg, mesh, quantize=quant,
                             dtype=jnp.bfloat16)
        return _rmsnorm(h, sharded["norm"]["weight"], cfg.norm_eps)

    got = np.asarray(sp(jnp.asarray(x)), dtype=np.float32)
    want = np.asarray(plain, dtype=np.float32)
    # both paths round to bf16 at the same points; the residue is the
    # ring-sum order of the fan-in partials — the bf16 ring sums partials
    # in bf16 (like a GSPMD psum of bf16 partials would), while the int8
    # ring accumulates exact s32xscale partials in f32 and lands tighter
    tol = 2e-2 if quant == 8 else 5e-2
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


@pytest.mark.parametrize("quant", [0, 8])
def test_sp_prefix_kv_matches_plain_and_full(quant):
    """Prefix-KV serving under ring-TP (VERDICT r2 item 9): the sp stack
    consuming head-sharded prefix (k, v) must equal (a) the plain path
    with the same cache and (b) the full [prefix | suffix] sequence.
    Odd suffix length exercises pad-to-multiple with a position offset."""
    module, params, cfg = load_backbone("llama-tiny", quantize=quant)
    rng = np.random.default_rng(1)
    P, L, B = 7, 13, 2
    prefix = (rng.normal(size=(1, P, cfg.d_model)) * 0.1).astype(np.float32)
    suffix = (rng.normal(size=(B, L, cfg.d_model)) * 0.1).astype(np.float32)

    kvs = module.apply({"params": params}, jnp.asarray(prefix),
                       method="prefill")
    full = module.apply(
        {"params": params},
        inputs_embeds=jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(prefix), (B, P, cfg.d_model)),
             jnp.asarray(suffix)], axis=1))
    plain_cached = module.apply({"params": params},
                                inputs_embeds=jnp.asarray(suffix),
                                prefix_kv=kvs)
    np.testing.assert_allclose(np.asarray(plain_cached),
                               np.asarray(full[:, P:]), atol=1e-5)

    mesh = create_mesh(data=4, tensor=2)
    sharded = shard_params(params, mesh)
    layers = [sharded[f"h_{i}"] for i in range(cfg.n_layers)]

    @jax.jit
    def sp(x, kvs):
        h = sp_decoder_stack(layers, x, cfg, mesh, quantize=quant,
                             prefix_kv=kvs)
        return _rmsnorm(h, sharded["norm"]["weight"], cfg.norm_eps)

    got = sp(jnp.asarray(suffix), kvs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(plain_cached),
                               atol=2e-4)


def test_tp_overlap_prefix_cache_serving(tmp_path):
    """End-to-end: tp_overlap + prefix_cache together — serving the head
    from the KV cache through the ring-TP stack must reproduce the
    in-graph split-layout forward exactly (the test_prefix_cache
    cached-equals-uncached contract, now on the 8-device mesh)."""
    cfg = _cfg(tmp_path, overlap=True)
    cfg.models.medtsllm.llm["prefix_cache"] = True
    trainer = get_trainer("ring-cache", cfg)
    assert trainer.model.sp and trainer.model.supports_prefix_cache

    batch = next(iter(trainer.test_pipeline))
    arrays = trainer.model_inputs(batch)
    assert "prefix_ids" in arrays and arrays["prefix_ids"].ndim == 1
    cached = trainer.eval_model_inputs(batch)
    assert "prefix_kv" in cached and "prefix_ids" not in cached

    out_u = trainer.eval_step(trainer.params, arrays)
    out_c = trainer.eval_step(trainer.params, cached)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_c),
                               rtol=1e-4, atol=1e-5)


def _cfg(tmp_path, overlap: bool):
    cfg = make_config(task="reconstruction", model="medtsllm",
                      hist=32, pred=32, step=16)
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 1
    cfg.training.batch_size = 8
    cfg.datasets.synthetic.n_points = 128  # one optimizer step
    cfg.setup["tensor_parallel"] = 2
    cfg.setup["tp_overlap"] = overlap
    cfg["models"] = {"medtsllm": {
        "d_model": 16, "d_ff": 16, "n_heads": 4, "num_tokens": 32,
        "covariate_mode": "concat", "embedding_downsample_mode": "linear",
        "patching": {"patch_len": 8, "stride": 4},
        "prompting": {"dataset": True, "task": True, "clip": False,
                      "input_stats": False, "examples": False,
                      "input_stats_dim": 0, "input_stats_select": "all"},
        # prefix_cache off for BOTH so the only difference is the TP
        # schedule (tp_overlap gates the cache off anyway)
        "llm": {"enabled": True, "llm": "llama-tiny", "llm_layers": -1,
                "prefix_cache": False,
                "load_in_4bit": False, "load_in_8bit": False},
    }}
    return cfg


def test_tp_overlap_trainer_matches_auto(tmp_path):
    """[setup] tp_overlap end-to-end: same seed -> identical init (the sp
    param layout IS the plain layout); after one epoch the trained fusion
    params must match the GSPMD-auto TP run."""
    t1 = get_trainer("auto", _cfg(tmp_path / "a", overlap=False))
    t2 = get_trainer("ring", _cfg(tmp_path / "b", overlap=True))
    assert t2.model.sp and t2.model.sp_mesh is not None
    # prefix_cache=False in _cfg keeps both runs on the uncached path
    assert not t2.model.supports_prefix_cache

    t1.train()
    t2.train()
    assert np.isfinite(t2.val()["val/mse"])
    p1 = jax.device_get(t1.params["mapping_layer"]["kernel"])
    p2 = jax.device_get(t2.params["mapping_layer"]["kernel"])
    np.testing.assert_allclose(p1, p2, atol=2e-4)


def test_sp_rejects_unsupported(tmp_path):
    """Fail-fast: gpt2-style backbone under tp_overlap raises (biases +
    fused c_attn + learned positions are not in the sp schedule)."""
    cfg = _cfg(tmp_path, overlap=True)
    cfg.models.medtsllm.llm["llm"] = "gpt2-tiny"
    with pytest.raises(Exception, match="sequence-parallel"):
        get_trainer("spbad", cfg)
