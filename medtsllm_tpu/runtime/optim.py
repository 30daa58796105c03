"""Optimizer + LR schedule construction on optax.

Reference surface (tasks/base.py:87-141): adam / adamw(wd=0.01) /
sgd(momentum=0.9, nesterov) / ranger; constant scheduler; finetuning either
freezes loaded params for `frozen_epochs` or warms them up over
`warmup_epochs` with a linspace(warmup_factor, 1) factor.

Param labels partition the tree into groups:
  "new"    — regular trainable params
  "loaded" — pretrained-transfer params (separate LR factor,
             tasks/base.py:87-91,122-139)
  "frozen" — no updates and no optimizer state (the reference sets
             requires_grad=False, e.g. the LLM backbone)

LR factors are hyperparameters injected per-epoch (`set_epoch`), so
schedule changes never recompile the update step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


class _LookaheadState(NamedTuple):
    inner: object
    slow: object  # slow-weight copy of the params
    count: jnp.ndarray


def lookahead(inner: optax.GradientTransformation,
              sync_period: int = 5,
              slow_step: float = 0.5) -> optax.GradientTransformation:
    """Lookahead (Zhang et al. 2019) as a stateful optax wrapper.

    Unlike ``optax.lookahead`` this keeps the slow weights inside the
    optimizer state instead of requiring ``LookaheadParams`` fast/slow
    param pairs, so it composes with multi_transform and never leaks
    into the train-step signature. Every ``sync_period`` steps the
    params are pulled toward slow + slow_step * (fast - slow) and the
    slow copy is refreshed. Defaults match pytorch_optimizer.Ranger21
    (lookahead_merge_time=5, blending alpha=0.5), the reference's
    ranger implementation (tasks/base.py:102-104).
    """

    def init(params):
        # a REAL copy: params buffers are donated by the train step, so the
        # slow weights must not alias them
        return _LookaheadState(inner=inner.init(params),
                               slow=jax.tree.map(jnp.copy, params),
                               count=jnp.zeros([], jnp.int32))

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("lookahead requires params in update() — "
                             "the slow weights interpolate toward the "
                             "fast weights")
        updates, inner_state = inner.update(grads, state.inner, params)
        count = state.count + 1
        sync = (count % sync_period) == 0
        fast = optax.apply_updates(params, updates)
        new_slow = jax.tree.map(
            lambda s, f: jnp.where(sync, s + slow_step * (f - s), s),
            state.slow, fast)
        final = jax.tree.map(
            lambda ns, p, u: jnp.where(sync, ns - p, u),
            new_slow, params, updates)
        return final, _LookaheadState(inner_state, new_slow, count)

    return optax.GradientTransformation(init, update)


def _base_optimizer(name: str, lr):
    match name:
        case "adam":
            return optax.adam(lr)
        case "adamw":
            return optax.adamw(lr, weight_decay=0.01)
        case "sgd":
            return optax.sgd(lr, momentum=0.9, nesterov=True)
        case "ranger" | "ranger21":
            # Ranger = RAdam + Lookahead; the reference pulls Ranger21
            # from pytorch_optimizer (tasks/base.py:102-104)
            return lookahead(optax.radam(lr))
        case _:
            raise ValueError(f"Invalid optimizer selection: {name}")


class Optimizer:
    def __init__(self, config, param_labels=None):
        t = config.training
        self.name = t.optimizer
        self.base_lr = float(t.learning_rate)

        scheduler_type = t.get("lr_scheduler")
        if scheduler_type not in (None, "none", "constant"):
            raise ValueError(f"Invalid scheduler selection: {scheduler_type}")

        groups = set(jax.tree.leaves(param_labels)) if param_labels is not None else {"new"}
        self.has_loaded = "loaded" in groups

        ft = config.get("finetuning", {})
        enabled = bool(ft.get("enabled", False)) and self.has_loaded
        self.frozen_epochs = int(ft.get("frozen_epochs", 0) or 0) if enabled else 0
        self.warmup_epochs = int(ft.get("warmup_epochs", 0) or 0) if enabled else 0
        if self.warmup_epochs:
            self.warmup_factors = np.linspace(
                float(ft.warmup_factor), 1.0, self.warmup_epochs)

        def make():
            return optax.inject_hyperparams(
                lambda learning_rate: _base_optimizer(self.name, learning_rate))(
                learning_rate=self.base_lr)

        if param_labels is None:
            self._tx = make()
        else:
            transforms = {"new": make()}
            if "loaded" in groups:
                transforms["loaded"] = make()
            if "frozen" in groups:
                transforms["frozen"] = optax.set_to_zero()
            self._tx = optax.multi_transform(transforms, param_labels)
        self.last_lrs = ([self.base_lr, self.base_lr] if self.has_loaded
                         else [self.base_lr])

    def init(self, params):
        return self._tx.init(params)

    def update(self, grads, opt_state, params):
        return self._tx.update(grads, opt_state, params)

    def loaded_factor(self, epoch: int) -> float:
        """Reference LambdaLR factor for the pretrained group
        (tasks/base.py:122-139); epoch 0-based like LambdaLR's counter."""
        if self.frozen_epochs > 0:
            return 0.0 if epoch < self.frozen_epochs else 1.0
        if self.warmup_epochs > 0:
            return (float(self.warmup_factors[epoch])
                    if epoch < self.warmup_epochs else 1.0)
        return 1.0

    def set_epoch(self, opt_state, epoch: int):
        if not self.has_loaded:
            return opt_state
        factor = self.loaded_factor(epoch)
        self.last_lrs = [self.base_lr, self.base_lr * factor]
        # hyperparams dict entries are mutable in place on the state pytree
        inner = opt_state.inner_states
        inner["new"].inner_state.hyperparams["learning_rate"] = \
            jnp.asarray(self.base_lr)
        inner["loaded"].inner_state.hyperparams["learning_rate"] = \
            jnp.asarray(self.base_lr * factor)
        return opt_state

    def get_last_lr(self) -> list[float]:
        return list(self.last_lrs)
