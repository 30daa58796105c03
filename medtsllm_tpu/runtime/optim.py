"""Optimizer + LR schedule construction on optax.

Reference surface (tasks/base.py:87-141): adam / adamw(wd=0.01) /
sgd(momentum=0.9, nesterov) / ranger21; constant scheduler; finetuning
either freezes loaded params for `frozen_epochs` or warms them up over
`warmup_epochs` with a linspace(warmup_factor, 1) factor.

Design: lr scale factors are *hyperparameters injected per-epoch* by the
trainer (`set_epoch`), so schedule changes never trigger recompilation —
the optimizer update stays one compiled XLA graph.
"""

from __future__ import annotations

import jax
import numpy as np
import optax


def _base_optimizer(name: str, lr, train_len: int = 0, epochs: int = 0):
    match name:
        case "adam":
            return optax.adam(lr)
        case "adamw":
            return optax.adamw(lr, weight_decay=0.01)
        case "sgd":
            return optax.sgd(lr, momentum=0.9, nesterov=True)
        case "ranger" | "ranger21":
            # Ranger = RAdam + Lookahead (the reference pulls Ranger21 from
            # pytorch_optimizer, tasks/base.py:102-104)
            return optax.lookahead(optax.radam(lr), sync_period=6, slow_step_size=0.5)
        case _:
            raise ValueError(f"Invalid optimizer selection: {name}")


class Optimizer:
    """Wraps an optax transform with per-group (new vs. pretrained-loaded)
    epoch-dependent LR factors."""

    def __init__(self, config, param_labels=None):
        t = config.training
        self.name = t.optimizer
        self.base_lr = float(t.learning_rate)
        self.lookahead = self.name in ("ranger", "ranger21")

        scheduler_type = t.get("lr_scheduler")
        if scheduler_type not in (None, "none", "constant"):
            raise ValueError(f"Invalid scheduler selection: {scheduler_type}")

        self.finetuning = param_labels is not None
        ft = config.get("finetuning", {})
        self.frozen_epochs = int(ft.get("frozen_epochs", 0) or 0) if self.finetuning else 0
        self.warmup_epochs = int(ft.get("warmup_epochs", 0) or 0) if self.finetuning else 0
        if self.warmup_epochs:
            self.warmup_factors = np.linspace(
                float(ft.warmup_factor), 1.0, self.warmup_epochs)

        def make(scale_name):
            inner = optax.inject_hyperparams(
                lambda learning_rate: _base_optimizer(self.name, learning_rate))(
                learning_rate=self.base_lr)
            return inner

        if self.finetuning:
            self._tx = optax.multi_transform(
                {"new": make("new"), "loaded": make("loaded")}, param_labels)
        else:
            self._tx = make("new")
        self._labels = param_labels
        self.last_lrs = [self.base_lr] + ([self.base_lr] if self.finetuning else [])

    def init(self, params):
        return self._tx.init(params)

    def update(self, grads, opt_state, params):
        return self._tx.update(grads, opt_state, params)

    def loaded_factor(self, epoch: int) -> float:
        """Reference LambdaLR factor for the pretrained group
        (tasks/base.py:122-139); epoch is 0-based like LambdaLR's counter."""
        if self.frozen_epochs > 0:
            return 0.0 if epoch < self.frozen_epochs else 1.0
        if self.warmup_epochs > 0:
            return (float(self.warmup_factors[epoch])
                    if epoch < self.warmup_epochs else 1.0)
        return 1.0

    def set_epoch(self, opt_state, epoch: int):
        """Inject this epoch's learning rates into the optimizer state."""
        if not self.finetuning:
            self.last_lrs = [self.base_lr]
            return opt_state
        factor = self.loaded_factor(epoch)
        self.last_lrs = [self.base_lr, self.base_lr * factor]

        def set_lr(state, lr):
            # inject_hyperparams state: InjectHyperparamsState(count, hyperparams, inner_state)
            state.hyperparams["learning_rate"] = jax.numpy.asarray(lr)
            return state

        inner = opt_state.inner_states
        set_lr(inner["new"].inner_state, self.base_lr)
        set_lr(inner["loaded"].inner_state, self.base_lr * factor)
        return opt_state

    def get_last_lr(self) -> list[float]:
        return list(self.last_lrs)
