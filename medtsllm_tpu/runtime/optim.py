"""Optimizer + LR schedule construction on optax.

Reference surface (tasks/base.py:87-141): adam / adamw(wd=0.01) /
sgd(momentum=0.9, nesterov) / ranger; constant scheduler; finetuning either
freezes loaded params for `frozen_epochs` or warms them up over
`warmup_epochs` with a linspace(warmup_factor, 1) factor.

Beyond the reference (which hardcodes gamma=1 StepLR, i.e. constant LR,
tasks/base.py:110-116), three production training levers, all opt-in:

  - `training.lr_scheduler = "cosine" | "linear"` with optional
    `lr_warmup_epochs` / `lr_min_factor` — per-epoch factors injected as
    hyperparameters (`set_epoch`), so schedule changes never recompile
    the jitted train step;
  - `training.grad_clip_norm = C` — global-norm clipping
    (optax.clip_by_global_norm) applied to the full gradient tree before
    the per-group transforms;
  - `training.grad_accum_steps = K` — a masked accumulator around the
    whole chain (`grad_accumulation`): K micro-batch gradients average
    before one optimizer step — the K-x-larger effective batch at
    constant activation HBM. Frozen leaves get no accumulator (unlike
    optax.MultiSteps, which would pin a frozen-7B-sized zeros tree).

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


def clip_global_norm_float(max_norm: float) -> optax.GradientTransformation:
    """Global-norm clipping over the FLOAT leaves of the gradient tree.
    Int-dtype params under ``jax.grad(..., allow_int=True)`` yield float0
    gradients (zero-byte, arithmetic-free); optax.clip_by_global_norm
    would crash squaring them. float0/int leaves pass through unscaled
    (they carry no gradient signal) and contribute nothing to the norm."""

    def _is_float(g):
        return (hasattr(g, "dtype") and g.dtype != jax.dtypes.float0
                and jnp.issubdtype(g.dtype, jnp.floating))

    def init(params):
        del params
        return optax.EmptyState()

    def update(grads, state, params=None):
        del params
        sq = sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads)
                 if _is_float(g))
        norm = jnp.sqrt(sq)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-16))
        clipped = jax.tree.map(
            lambda g: g * scale.astype(g.dtype) if _is_float(g) else g,
            grads)
        return clipped, state

    return optax.GradientTransformation(init, update)


class _AccumState(NamedTuple):
    mini_step: jnp.ndarray
    inner: object
    acc: object  # grad accumulator; size-0 placeholder for frozen leaves


def grad_accumulation(inner: optax.GradientTransformation, every: int,
                      param_labels=None) -> optax.GradientTransformation:
    """Gradient accumulation that, unlike ``optax.MultiSteps``, does NOT
    allocate an accumulator for frozen leaves (a frozen 7B backbone would
    pin an extra ~28 GB of f32 zeros in the optimizer state). Frozen
    leaves hold a size-0 placeholder; trainable leaves average over
    ``every`` micro-batches, then one inner step fires. The inner update
    is computed every call with the running mean and selected by the
    boundary flag — one jit trace, no lax.cond recompilation, and the
    wasted work is an elementwise pass over trainable params only.

    Windows span epoch boundaries (the accumulator lives in the
    optimizer state); only the final partial window of the run is
    dropped. The trainer fails fast when the whole run is shorter than
    one window and warns when a tail will be dropped (tasks/base.py).
    float0 gradients (int-quantized kernels under allow_int=True) pass
    through untouched — they admit no arithmetic and carry no signal."""

    def _f0(x):
        return hasattr(x, "dtype") and x.dtype == jax.dtypes.float0

    def _placeholder(p, label):
        # frozen leaves AND int-dtype leaves (whose grads are float0 and
        # admit no arithmetic) carry no accumulator
        if label == "frozen" or not jnp.issubdtype(p.dtype, jnp.floating):
            return jnp.zeros((0,), jnp.float32)
        return jnp.zeros_like(p)

    def init(params):
        if param_labels is None:
            acc = jax.tree.map(lambda p: _placeholder(p, "new"), params)
        else:
            acc = jax.tree.map(_placeholder, params, param_labels)
        return _AccumState(jnp.zeros([], jnp.int32), inner.init(params), acc)

    def update(grads, state, params=None):
        step = state.mini_step + 1
        boundary = step >= every
        acc = jax.tree.map(lambda a, g: a if a.size == 0 else a + g,
                           state.acc, grads)
        mean = jax.tree.map(
            lambda a, g: g if (a.size == 0 or _f0(g)) else a / every,
            acc, grads)
        cand_updates, cand_inner = inner.update(mean, state.inner, params)
        updates = jax.tree.map(
            lambda u: u if _f0(u)
            else jnp.where(boundary, u, jnp.zeros_like(u)), cand_updates)
        new_inner = jax.tree.map(
            lambda n, o: (jnp.where(boundary, n, o)
                          if hasattr(n, "dtype") and not _f0(n) else n),
            cand_inner, state.inner)
        new_acc = jax.tree.map(
            lambda a: jnp.where(boundary, jnp.zeros_like(a), a), acc)
        return updates, _AccumState(jnp.where(boundary, 0, step),
                                    new_inner, new_acc)

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
        if scheduler_type not in (None, "none", "constant",
                                  "cosine", "linear"):
            raise ValueError(f"Invalid scheduler selection: {scheduler_type}")
        self.schedule = (scheduler_type
                         if scheduler_type in ("cosine", "linear")
                         else "constant")
        self.total_epochs = int(t.get("epochs", 1) or 1)
        self.lr_min_factor = float(t.get("lr_min_factor", 0.0) or 0.0)
        self.lr_warmup_epochs = int(t.get("lr_warmup_epochs", 0) or 0)
        self.clip_norm = float(t.get("grad_clip_norm", 0.0) or 0.0)
        self.accum_steps = int(t.get("grad_accum_steps", 1) or 1)

        groups = set(jax.tree.leaves(param_labels)) if param_labels is not None else {"new"}
        self.has_loaded = "loaded" in groups

        ft = config.get("finetuning", {})
        enabled = bool(ft.get("enabled", False)) and self.has_loaded
        self.frozen_epochs = int(ft.get("frozen_epochs", 0) or 0) if enabled else 0
        self.warmup_epochs = int(ft.get("warmup_epochs", 0) or 0) if enabled else 0
        if self.frozen_epochs and self.warmup_epochs:
            # mutually exclusive — the reference's build_scheduler assert
            # (tasks/base.py:119) INTENDS this but its operator precedence
            # `not (a) and (b)` actually asserts warmup>0 whenever
            # finetuning; here the intended check: frozen would silently
            # swallow the configured warmup ramp otherwise
            raise ValueError(
                "finetuning.frozen_epochs and finetuning.warmup_epochs are "
                "mutually exclusive")
        if self.warmup_epochs:
            self.warmup_factors = np.linspace(
                float(ft.warmup_factor), 1.0, self.warmup_epochs)

        def make():
            return optax.inject_hyperparams(
                lambda learning_rate: _base_optimizer(self.name, learning_rate))(
                learning_rate=self.base_lr)

        self._grouped = param_labels is not None
        if param_labels is None:
            self._tx = make()
        else:
            transforms = {"new": make()}
            if "loaded" in groups:
                transforms["loaded"] = make()
            if "frozen" in groups:
                transforms["frozen"] = optax.set_to_zero()
            self._tx = optax.multi_transform(transforms, param_labels)
        if self.clip_norm > 0:
            # outside multi_transform: ONE global norm over the whole
            # gradient tree (float frozen groups contribute exact zeros
            # via stop_gradient, so trainable-only and full-tree norms
            # agree). NOT optax.clip_by_global_norm: quantized backbones
            # produce float0 gradients for int8/int4 kernels
            # (tasks/base.py allow_int=True, transformer.py float0
            # tangents), and float0 leaves reject all arithmetic —
            # clip_global_norm_float skips them.
            self._tx = optax.chain(
                clip_global_norm_float(self.clip_norm), self._tx)
        if self.accum_steps > 1:
            # outermost, so clipping sees the AVERAGED accumulated grad
            self._tx = grad_accumulation(self._tx, self.accum_steps,
                                         param_labels)
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

    def schedule_factor(self, epoch: int) -> float:
        """Per-epoch LR factor for ALL trainable groups (0-based epoch).
        Linear warmup over `lr_warmup_epochs`, then cosine/linear decay
        to `lr_min_factor` at the final epoch."""
        w = self.lr_warmup_epochs
        if w > 0 and epoch < w:
            return (epoch + 1) / w
        if self.schedule == "constant":
            return 1.0
        span = max(self.total_epochs - 1 - w, 1)
        t = min(max(epoch - w, 0), span) / span
        mf = self.lr_min_factor
        if self.schedule == "cosine":
            return mf + (1.0 - mf) * 0.5 * (1.0 + np.cos(np.pi * t))
        return 1.0 - (1.0 - mf) * t  # linear

    def _hyperparam_states(self, opt_state) -> dict:
        """Navigate the wrapper onion (MultiSteps -> chain(clip) ->
        multi_transform) down to the inject_hyperparams states, one per
        trainable group."""
        s = opt_state
        if self.accum_steps > 1:
            s = s.inner
        if self.clip_norm > 0:
            s = s[1]  # chain state: (clip_state, inner_state)
        if not self._grouped:
            return {"new": s}
        return {g: st.inner_state for g, st in s.inner_states.items()
                if g != "frozen"}

    def set_epoch(self, opt_state, epoch: int):
        sched = self.schedule_factor(epoch)
        if not self.has_loaded and self.schedule == "constant" \
                and self.lr_warmup_epochs == 0:
            return opt_state
        states = self._hyperparam_states(opt_state)
        lf = self.loaded_factor(epoch) if self.has_loaded else 1.0
        self.last_lrs = [self.base_lr * sched]
        if self.has_loaded:
            self.last_lrs.append(self.base_lr * sched * lf)
        # hyperparams dict entries are mutable in place on the state pytree
        states["new"].hyperparams["learning_rate"] = \
            jnp.asarray(self.base_lr * sched)
        if "loaded" in states:
            states["loaded"].hyperparams["learning_rate"] = \
                jnp.asarray(self.base_lr * sched * lf)
        return opt_state

    def get_last_lr(self) -> list[float]:
        return list(self.last_lrs)
