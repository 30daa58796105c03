"""Optimizer construction (reference tasks/base.py:87-141)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from medtsllm_tpu.runtime.optim import Optimizer, lookahead

from conftest import make_config


def _cfg(optimizer="ranger"):
    cfg = make_config()
    cfg.training.optimizer = optimizer
    return cfg


def test_lookahead_slow_fast_update():
    """For the first sync_period-1 steps lookahead applies the inner
    updates verbatim; on the sync step params land on
    slow + alpha * (fast - slow) and the slow copy refreshes."""
    k, alpha = 5, 0.5
    inner = optax.sgd(0.1)
    tx = lookahead(inner, sync_period=k, slow_step=alpha)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((3,))}

    plain = {"w": jnp.ones((3,))}
    plain_state = inner.init(plain)
    start = params
    for step in range(1, k + 1):
        upd, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, upd)
        p_upd, plain_state = inner.update(grads, plain_state, plain)
        plain = optax.apply_updates(plain, p_upd)
        if step < k:
            np.testing.assert_allclose(params["w"], plain["w"], rtol=1e-6)
    # sync step: halfway between the start (slow) and the fast trajectory
    expect = start["w"] + alpha * (plain["w"] - start["w"])
    np.testing.assert_allclose(params["w"], expect, rtol=1e-6)


def test_ranger_classic_is_radam_plus_lookahead():
    opt = Optimizer(_cfg("ranger_classic"))
    params = {"w": jnp.ones((2, 2))}
    state = opt.init(params)
    grads = {"w": jnp.full((2, 2), 0.5)}
    upd, state = opt.update(grads, state, params)
    assert jnp.all(jnp.isfinite(upd["w"]))
    # the lookahead state carries a slow-weights copy of the tree
    flat = jax.tree_util.tree_leaves(state)
    assert any(np.shape(leaf) == (2, 2) for leaf in flat)


def test_ranger_trains_e2e():
    from medtsllm_tpu.tasks import get_trainer
    cfg = _cfg("ranger")
    cfg["models"] = {"dlinear": {"individual": False, "moving_avg": 13}}
    cfg.training.epochs = 1
    cfg.datasets.synthetic.n_points = 256
    trainer = get_trainer("ranger-e2e", cfg)
    trainer.train()
    assert np.isfinite(trainer.val()["val/mse"])

def test_grad_accumulation_matches_mean_grad_step():
    """K micro-batch updates under grad_accum_steps=K must equal ONE
    update with the mean gradient; params must not move mid-window."""
    cfg = _cfg("adam")
    cfg.training.grad_accum_steps = 2
    labels = {"w": "new", "f": "frozen"}
    params = {"w": jnp.ones((4,)), "f": jnp.ones((3,))}
    opt = Optimizer(cfg, labels)
    state = opt.init(params)
    g1 = {"w": jnp.full((4,), 0.5), "f": jnp.zeros((3,))}
    g2 = {"w": jnp.full((4,), 1.5), "f": jnp.zeros((3,))}

    upd1, state = opt.update(g1, state, params)
    np.testing.assert_array_equal(upd1["w"], 0.0)  # mid-window: no step
    p_mid = optax.apply_updates(params, upd1)
    upd2, state = opt.update(g2, state, p_mid)
    accum = optax.apply_updates(p_mid, upd2)

    cfg2 = _cfg("adam")
    opt_ref = Optimizer(cfg2, labels)
    state_ref = opt_ref.init(params)
    gm = {"w": jnp.full((4,), 1.0), "f": jnp.zeros((3,))}
    upd_ref, _ = opt_ref.update(gm, state_ref, params)
    ref = optax.apply_updates(params, upd_ref)
    np.testing.assert_allclose(accum["w"], ref["w"], rtol=1e-6)
    np.testing.assert_array_equal(accum["f"], params["f"])  # frozen


def test_grad_accumulation_frozen_leaves_hold_no_accumulator():
    """The accumulator must NOT allocate for frozen leaves (a frozen 7B
    backbone would pin an extra params-sized zeros tree)."""
    cfg = _cfg("adam")
    cfg.training.grad_accum_steps = 4
    labels = {"w": "new", "backbone": "frozen"}
    params = {"w": jnp.ones((4,)), "backbone": jnp.ones((1024,))}
    opt = Optimizer(cfg, labels)
    state = opt.init(params)
    assert state.acc["backbone"].size == 0
    assert state.acc["w"].shape == (4,)


def test_grad_clip_global_norm():
    cfg = _cfg("sgd")
    cfg.training.grad_clip_norm = 1.0
    cfg.training.learning_rate = 1.0
    opt = Optimizer(cfg, {"w": "new"})
    params = {"w": jnp.zeros((4,))}
    state = opt.init(params)
    g = {"w": jnp.full((4,), 10.0)}  # global norm 20
    upd, _ = opt.update(g, state, params)
    # nesterov sgd first step: update = lr * (1 + momentum) * clipped_grad,
    # so the clipped-to-norm-1 gradient surfaces as norm 1.9
    np.testing.assert_allclose(
        float(jnp.linalg.norm(upd["w"])), 1.9, rtol=1e-4)


def test_cosine_schedule_set_epoch():
    """Cosine decay with warmup; set_epoch must reach the injected
    hyperparams through the accumulation + clip wrappers."""
    cfg = _cfg("adam")
    cfg.training.lr_scheduler = "cosine"
    cfg.training.epochs = 11
    cfg.training.lr_warmup_epochs = 2
    cfg.training.lr_min_factor = 0.1
    cfg.training.grad_accum_steps = 2
    cfg.training.grad_clip_norm = 5.0
    base = float(cfg.training.learning_rate)
    opt = Optimizer(cfg, {"w": "new"})
    params = {"w": jnp.ones((4,))}
    state = opt.init(params)

    assert np.isclose(opt.schedule_factor(0), 0.5)      # warmup 1/2
    assert np.isclose(opt.schedule_factor(1), 1.0)      # warmup 2/2
    assert np.isclose(opt.schedule_factor(10), 0.1)     # floor at the end
    mid = opt.schedule_factor(6)                        # halfway: (1+mf)/2
    assert np.isclose(mid, 0.55)

    state = opt.set_epoch(state, 6)
    hp = opt._hyperparam_states(state)["new"].hyperparams
    assert np.isclose(float(hp["learning_rate"]), base * 0.55)
    assert np.isclose(opt.get_last_lr()[0], base * 0.55)


def test_schedules_train_e2e():
    from medtsllm_tpu.tasks import get_trainer
    cfg = _cfg("adam")
    cfg["models"] = {"dlinear": {"individual": False, "moving_avg": 13}}
    cfg.training.epochs = 2
    cfg.training.lr_scheduler = "cosine"
    cfg.training.grad_clip_norm = 1.0
    cfg.training.grad_accum_steps = 2
    cfg.datasets.synthetic.n_points = 256
    trainer = get_trainer("sched-e2e", cfg)
    trainer.train()
    assert np.isfinite(trainer.val()["val/mse"])

def test_clip_and_accum_survive_float0_grads():
    """Quantized backbones produce float0 gradients for int kernels
    (allow_int=True); clipping and accumulation must pass them through
    instead of crashing on float0 arithmetic."""
    cfg = _cfg("adam")
    cfg.training.grad_clip_norm = 1.0
    cfg.training.grad_accum_steps = 2
    labels = {"w": "new", "kq": "frozen"}
    params = {"w": jnp.ones((4,)), "kq": jnp.ones((3,), jnp.int8)}
    opt = Optimizer(cfg, labels)
    state = opt.init(params)

    def loss(p):
        return jnp.sum(p["w"] ** 2) + jnp.sum(p["kq"]).astype(jnp.float32) * 0

    grads = jax.grad(loss, allow_int=True)(params)
    assert grads["kq"].dtype == jax.dtypes.float0
    for _ in range(2):
        upd, state = opt.update(grads, state, params)
    assert jnp.any(upd["w"] != 0)  # boundary step fired
    assert upd["kq"].dtype == jax.dtypes.float0  # passed through


def test_quantized_clip_accum_e2e(tmp_path):
    """int8 backbone + grad_clip_norm + grad_accum_steps through the real
    train step (the combination that crashed optax.clip_by_global_norm)."""
    from medtsllm_tpu.tasks import get_trainer
    cfg = make_config(task="reconstruction", model="medtsllm",
                      hist=32, pred=32, step=16)
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 1
    cfg.training.batch_size = 8
    cfg.training.grad_clip_norm = 1.0
    cfg.training.grad_accum_steps = 2
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
    trainer = get_trainer("q8clip", cfg)
    trainer.train()
    assert np.isfinite(trainer.val()["val/mse"])


def test_grad_accum_run_shorter_than_window_fails_fast(tmp_path):
    from medtsllm_tpu.tasks import get_trainer
    import pytest
    cfg = _cfg("adam")
    cfg["models"] = {"dlinear": {"individual": False, "moving_avg": 13}}
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 1
    cfg.training.grad_accum_steps = 10_000
    cfg.datasets.synthetic.n_points = 256
    with pytest.raises(ValueError, match="no optimizer step"):
        get_trainer("accum-short", cfg)


def test_frozen_and_warmup_mutually_exclusive():
    import pytest
    cfg = _cfg("adam")
    cfg["finetuning"] = {"enabled": True, "frozen_epochs": 2,
                         "warmup_epochs": 5, "warmup_factor": 0.1}
    with pytest.raises(ValueError, match="mutually exclusive"):
        Optimizer(cfg, {"w": "new", "l": "loaded"})
