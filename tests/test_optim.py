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


def test_ranger_is_radam_plus_lookahead():
    opt = Optimizer(_cfg("ranger"))
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
