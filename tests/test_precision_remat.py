"""Precision policy, remat path, and FEDformer Wavelets end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from medtsllm_tpu.tasks import get_trainer
from conftest import make_config


def _medtsllm_cfg(tmp_path, dtype="mixed", remat=False):
    cfg = make_config(task="reconstruction", model="medtsllm",
                      hist=32, pred=32, step=16)
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 1
    cfg.training.batch_size = 4
    cfg.datasets.synthetic.n_points = 256
    cfg.setup.dtype = dtype
    cfg["models"] = {"medtsllm": {
        "d_model": 16, "d_ff": 16, "n_heads": 4, "num_tokens": 32,
        "covariate_mode": "concat", "embedding_downsample_mode": "linear",
        "patching": {"patch_len": 8, "stride": 4},
        "prompting": {"dataset": True, "task": True, "clip": False,
                      "input_stats": False, "examples": False,
                      "input_stats_dim": 0, "input_stats_select": "all"},
        "llm": {"enabled": True, "llm": "llama-tiny", "llm_layers": -1,
                "remat": remat, "load_in_4bit": False, "load_in_8bit": False},
    }}
    return cfg


def test_mixed_precision_storage(tmp_path):
    """'mixed': trainable fp32, frozen backbone stored bf16."""
    trainer = get_trainer("prec", _medtsllm_cfg(tmp_path, dtype="mixed"))
    assert trainer.params["mapping_layer"]["kernel"].dtype == jnp.float32
    assert (trainer.params["llm"]["h_0"]["attn"]["q_proj"]["base"]["kernel"]
            .dtype == jnp.bfloat16)
    trainer.train()
    scores = trainer.val()
    assert np.isfinite(scores["val/mse"])


def test_bf16_storage(tmp_path):
    trainer = get_trainer("bf16", _medtsllm_cfg(tmp_path, dtype="bf16"))
    assert trainer.params["mapping_layer"]["kernel"].dtype == jnp.bfloat16
    scores = trainer.val()
    assert np.isfinite(scores["val/mse"])


def test_remat_backbone(tmp_path):
    """llm.remat=true must train and match the non-remat forward."""
    t1 = get_trainer("nr", _medtsllm_cfg(tmp_path / "a", remat=False))
    t2 = get_trainer("rm", _medtsllm_cfg(tmp_path / "b", remat=True))
    batch = next(iter(t1.val_pipeline))
    a1 = t1.model_inputs(batch)
    a2 = t2.model_inputs(batch)
    o1 = np.asarray(t1.eval_step(t1.params, a1))
    o2 = np.asarray(t2.eval_step(t2.params, a2))
    np.testing.assert_allclose(o1, o2, atol=2e-2)  # same seed, same init
    t2.train()  # backward through remat


def test_remat_gpt2_dropout_backbone(tmp_path):
    """remat with a dropout>0 backbone (gpt2, resid/embed dropout 0.1):
    `deterministic` must stay a STATIC bool through the jax.checkpoint
    boundary (a traced bool[] crashes flax Dropout) — regression test
    for the call-site remat wrapper; llama-tiny's dropout=0.0 would
    short-circuit the check and hide it."""
    cfg = _medtsllm_cfg(tmp_path, remat="dots")
    cfg.models.medtsllm.llm.llm = "gpt2-tiny"
    trainer = get_trainer("rg", cfg)
    batch = next(iter(trainer.val_pipeline))
    out = trainer.eval_step(trainer.params, trainer.model_inputs(batch))
    assert np.isfinite(np.asarray(out)).all()
    import jax as _jax
    valid = jnp.asarray(batch["valid"])
    _, _, loss = trainer.train_step(
        trainer.params, trainer.opt_state,
        trainer.train_model_inputs(batch), valid, _jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_remat_dots_policy_gradient_parity(tmp_path):
    """The "dots" policy (save projection-matmul outputs, recompute
    elementwise) must produce the SAME gradients as full-block remat —
    remat changes scheduling, never math."""
    import jax

    t_full = get_trainer("rf", _medtsllm_cfg(tmp_path / "a", remat=True))
    t_dots = get_trainer("rd", _medtsllm_cfg(tmp_path / "b", remat="dots"))
    batch = next(iter(t_full.train_pipeline))
    a1 = t_full.model_inputs(batch)
    a2 = t_dots.model_inputs(batch)

    def grads(t, arrays):
        def loss_fn(p):
            out = t.model.apply({"params": p}, arrays, training=False)
            return (out.astype(np.float32) ** 2).mean()
        return jax.grad(loss_fn)(t.params)

    g1 = grads(t_full, a1)
    g2 = grads(t_dots, a2)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    checked = 0
    for path, v1 in flat1:
        v2 = flat2[path]
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=1e-4, atol=1e-5)
        checked += 1
    assert checked > 10


def test_fedformer_wavelets_e2e(tmp_path):
    cfg = make_config(task="reconstruction", model="fedformer",
                      hist=32, pred=32, step=16)
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 1
    cfg.training.batch_size = 2
    cfg.datasets.synthetic.n_points = 128
    cfg["models"] = {"fedformer": {
        "version": "Wavelets", "mode_select": "low", "modes": 4,
        "label_len": 16, "e_layers": 1, "d_layers": 1, "d_model": 16,
        "n_heads": 8, "d_ff": 32, "moving_avg": 13, "activation": "gelu"}}
    trainer = get_trainer("wav", cfg)
    scores = trainer.val()
    assert np.isfinite(scores["val/mse"])
