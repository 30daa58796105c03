"""Optimizer + LR schedule construction on optax.

Reference surface (tasks/base.py:87-141): adam / adamw(wd=0.01) /
sgd(momentum=0.9, nesterov) / ranger21|ranger (pytorch_optimizer.Ranger21,
implemented here from the published composition — see the Ranger21 block
below; the reference aliases "ranger" to Ranger21 at tasks/base.py:103 and
so do we; classic RAdam+Lookahead lives under "ranger_classic"); constant
scheduler; finetuning either
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


# ---------------------------------------------------------------------------
# Ranger21 (Wright & Demeure 2021) — the reference's `ranger21`/`ranger`
# optimizer (tasks/base.py:102-104, pytorch_optimizer.Ranger21). That
# package is not importable in this image, so the composition is
# implemented here from the published algorithm; each component below is
# unit-tested against its documented behavior (tests/test_ranger21.py).
# Components, in the order the torch step applies them:
#   1. adaptive gradient clipping (AGC, Brock et al. 2021): per-unit
#      g <- g * (clip * ||p||_unit / ||g||_unit) where ||g|| exceeds it;
#   2. gradient centralization (Yong et al. 2020): subtract the mean over
#      all-but-the-first axis for rank>=2 tensors;
#   3. gradient normalization: g / (std(g) + eps);
#   4. positive-negative momentum (Xie et al. 2021): two EMA buffers with
#      decay beta1^2 updated on alternating steps; effective momentum
#      ((1+b)*m_cur - b*m_prev) / sqrt((1+b)^2 + b^2) with b = 1.0;
#   5. second moment nu = EMA(g^2, beta2) with Adam bias correction and a
#      softplus(beta=50)-smoothed denominator;
#   6. stable weight decay (Xie et al. 2020): p *= 1 - lr*wd/sqrt(mean nu_hat)
#      where the mean runs over EVERY parameter scalar in the tree;
#   7. norm loss (Georgiou et al. 2021): p *= 1 - lr*2*f*(1 - 1/||p||_unit);
#   8. linear LR warmup over ~2/(1-beta2) steps and linear warmdown to
#      min_lr over the final 28% of `num_iterations`;
#   9. lookahead (k=5, alpha=0.5) on the updated fast weights.
# ---------------------------------------------------------------------------


def _unit_norm(x):
    """L2 norm per 'unit' (output row): over all-but-axis-0 for rank>=2
    tensors (keepdims, broadcastable back), whole-tensor for rank<=1."""
    if x.ndim <= 1:
        return jnp.sqrt(jnp.sum(jnp.square(x)))
    axes = tuple(range(1, x.ndim))
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=axes, keepdims=True))


def adaptive_grad_clip(p, g, clip: float = 1e-2, eps: float = 1e-3):
    """AGC (Brock et al. 2021): clip each unit's gradient norm to at most
    `clip` x the unit's parameter norm (parameter norm floored at `eps`)."""
    p_norm = jnp.maximum(_unit_norm(p), eps)
    g_norm = _unit_norm(g)
    max_norm = p_norm * clip
    scaled = g * (max_norm / jnp.maximum(g_norm, 1e-6))
    return jnp.where(g_norm > max_norm, scaled, g)


def centralize_gradient(g):
    """Gradient centralization: zero-mean over all-but-axis-0 (rank>=2)."""
    if g.ndim <= 1:
        return g
    axes = tuple(range(1, g.ndim))
    return g - jnp.mean(g, axis=axes, keepdims=True)


def normalize_gradient(g, eps: float = 1e-8):
    """Whole-tensor std normalization (size>2 tensors only, like the torch
    implementation, which needs >=2 dof for a std)."""
    if g.size <= 2:
        return g
    return g / (jnp.std(g) + eps)


def ranger21_lr(stepf, lr, num_warmup, warmdown_start, num_warmdown,
                min_lr):
    """Ranger21's internal LR schedule (factored out for unit tests):
    linear warmup over `num_warmup` steps, flat, then linear warmdown to
    `min_lr` from `warmdown_start` to `warmdown_start+num_warmdown`."""
    lr_warm = lr * jnp.minimum(1.0, stepf / num_warmup)
    prog = jnp.clip((stepf - warmdown_start) / max(num_warmdown, 1),
                    0.0, 1.0)
    return jnp.where(
        stepf > warmdown_start,
        jnp.maximum(lr_warm * (1.0 - prog) + min_lr * prog, min_lr),
        lr_warm)


class _Ranger21State(NamedTuple):
    count: jnp.ndarray
    pos_m: object   # PNM buffer updated on odd (1-based) steps
    neg_m: object   # PNM buffer updated on even steps
    nu: object      # second-moment EMA
    slow: object    # lookahead slow weights


def ranger21(learning_rate,
             num_iterations: int,
             betas=(0.9, 0.999),
             eps: float = 1e-8,
             weight_decay: float = 1e-4,
             agc_clip: float = 1e-2,
             agc_eps: float = 1e-3,
             norm_loss_factor: float = 1e-4,
             pnm_beta: float = 1.0,
             use_softplus: bool = True,
             beta_softplus: float = 50.0,
             num_warmup: int | None = None,
             num_warmdown: int | None = None,
             min_lr: float = 3e-5,
             lookahead_merge_time: int = 5,
             lookahead_alpha: float = 0.5) -> optax.GradientTransformation:
    """Ranger21 as one optax GradientTransformation (see block comment
    above). `num_iterations` must be the total optimizer-step count of the
    run (the reference computes len(train_dataloader) * epochs,
    tasks/base.py:103). Warmup defaults to ceil(2/(1-beta2)) capped at
    22% of the run; warmdown covers the final 28%, linear to `min_lr`.

    Non-float params (int-quantized kernels under allow_int=True, whose
    grads are float0) pass through with no state, like the rest of this
    module. Known deviation: under grouped param labels (multi_transform)
    the stable-weight-decay variance mean runs per GROUP, where the torch
    implementation averages across all param groups at once."""
    import math

    beta1, beta2 = float(betas[0]), float(betas[1])
    if num_warmup is None:
        num_warmup = math.ceil(2.0 / (1.0 - beta2))
        if num_warmup > num_iterations:
            num_warmup = max(1, math.ceil(0.22 * num_iterations))
    if num_warmdown is None:
        num_warmdown = math.ceil(0.28 * num_iterations)
    warmdown_start = max(num_iterations - num_warmdown, num_warmup)
    noise_norm = math.sqrt((1.0 + pnm_beta) ** 2 + pnm_beta ** 2)

    def _active(p):
        return (hasattr(p, "dtype")
                and jnp.issubdtype(p.dtype, jnp.floating))

    def init(params):
        def buf(p):
            return (jnp.zeros_like(p) if _active(p)
                    else jnp.zeros((0,), jnp.float32))
        # slow weights are a REAL copy (params are donated by train steps)
        return _Ranger21State(
            count=jnp.zeros([], jnp.int32),
            pos_m=jax.tree.map(buf, params),
            neg_m=jax.tree.map(buf, params),
            nu=jax.tree.map(buf, params),
            slow=jax.tree.map(
                lambda p: jnp.copy(p) if _active(p)
                else jnp.zeros((0,), jnp.float32), params))

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("ranger21 requires params in update() — "
                             "weight decay, norm loss and lookahead act "
                             "on the parameters")
        step = state.count + 1
        stepf = step.astype(jnp.float32)
        bc1 = 1.0 - beta1 ** stepf
        bc2 = 1.0 - beta2 ** stepf

        g_leaves, treedef = jax.tree.flatten(grads)
        p_leaves = treedef.flatten_up_to(params)
        pos_leaves = treedef.flatten_up_to(state.pos_m)
        neg_leaves = treedef.flatten_up_to(state.neg_m)
        nu_leaves = treedef.flatten_up_to(state.nu)
        slow_leaves = treedef.flatten_up_to(state.slow)

        def active(i):
            return (_active(p_leaves[i]) and hasattr(g_leaves[i], "dtype")
                    and g_leaves[i].dtype != jax.dtypes.float0)

        # pass 1 — condition gradients, update nu, accumulate the global
        # variance sum for stable weight decay
        cond, new_nu = [], []
        var_sum = jnp.zeros([], jnp.float32)
        n_scalars = 0
        for i, g in enumerate(g_leaves):
            if not active(i):
                cond.append(g)
                new_nu.append(nu_leaves[i])
                continue
            p = p_leaves[i]
            g = adaptive_grad_clip(p, g, agc_clip, agc_eps)
            g = normalize_gradient(centralize_gradient(g))
            nu = beta2 * nu_leaves[i] + (1.0 - beta2) * jnp.square(g)
            cond.append(g)
            new_nu.append(nu)
            var_sum = var_sum + jnp.sum(nu.astype(jnp.float32)) / bc2
            n_scalars += p.size
        # sqrt of the mean bias-corrected second moment over every scalar
        variance_normalized = jnp.sqrt(
            jnp.maximum(var_sum / max(n_scalars, 1), 1e-12))

        # internal LR schedule: linear warmup, linear warmdown to min_lr
        sched_lr = ranger21_lr(stepf, jnp.asarray(learning_rate, jnp.float32),
                               num_warmup, warmdown_start, num_warmdown,
                               min_lr)

        parity = (step % 2) == 1  # odd steps update pos_m
        sync = (step % lookahead_merge_time) == 0
        b1sq = beta1 ** 2
        wd_scale = sched_lr * weight_decay / variance_normalized

        updates, new_pos, new_neg, new_slow = [], [], [], []
        for i, g in enumerate(cond):
            if not active(i):
                updates.append(g)
                new_pos.append(pos_leaves[i])
                new_neg.append(neg_leaves[i])
                new_slow.append(slow_leaves[i])
                continue
            p = p_leaves[i]
            pos, neg = pos_leaves[i], neg_leaves[i]
            np_ = jnp.where(parity, b1sq * pos + (1.0 - b1sq) * g, pos)
            nn_ = jnp.where(parity, neg, b1sq * neg + (1.0 - b1sq) * g)
            cur = jnp.where(parity, np_, nn_)
            other = jnp.where(parity, nn_, np_)
            m_eff = ((1.0 + pnm_beta) * cur - pnm_beta * other) / noise_norm

            de_nom = jnp.sqrt(new_nu[i] / bc2) + eps
            if use_softplus:
                de_nom = jax.nn.softplus(beta_softplus * de_nom) \
                    / beta_softplus

            # norm loss: pull each unit's norm toward 1
            correction = 2.0 * norm_loss_factor \
                * (1.0 - 1.0 / (_unit_norm(p) + eps))
            # exact sequential form of the torch step:
            #   p = p*(1-lr*wd/varnorm)*(1-lr*correction) - step_size*m/denom
            scale = (1.0 - wd_scale) * (1.0 - sched_lr * correction)
            u = (p * (scale - 1.0)
                 - (sched_lr / bc1) * m_eff / de_nom).astype(p.dtype)

            fast = p + u
            slow = slow_leaves[i]
            ns = jnp.where(sync, slow + lookahead_alpha * (fast - slow),
                           slow).astype(slow.dtype)
            updates.append(jnp.where(sync, ns - p, u).astype(p.dtype))
            new_pos.append(np_)
            new_neg.append(nn_)
            new_slow.append(ns)

        unflat = treedef.unflatten
        return unflat(updates), _Ranger21State(
            count=step, pos_m=unflat(new_pos), neg_m=unflat(new_neg),
            nu=unflat(new_nu), slow=unflat(new_slow))

    return optax.GradientTransformation(init, update)


def _base_optimizer(name: str, lr, num_iterations=None):
    match name:
        case "adam":
            return optax.adam(lr)
        case "adamw":
            return optax.adamw(lr, weight_decay=0.01)
        case "sgd":
            return optax.sgd(lr, momentum=0.9, nesterov=True)
        case "ranger_classic":
            # classic Ranger = RAdam + Lookahead (kept under its own name;
            # the reference has no such optimizer).
            return lookahead(optax.radam(lr))
        case "ranger" | "ranger21":
            # reference: tasks/base.py:103 `case "ranger21" | "ranger"` —
            # BOTH names deliver pytorch_optimizer.Ranger21, so "ranger"
            # here must too (a reference config with optimizer="ranger"
            # would otherwise silently train differently).
            if num_iterations is None:
                raise ValueError(
                    "ranger21 needs the total optimizer-step count for its "
                    "warmup/warmdown schedule (the reference computes "
                    "len(train_dataloader) * epochs, tasks/base.py:103); "
                    "pass num_iterations to Optimizer(...)")
            return ranger21(lr, num_iterations=num_iterations)
        case _:
            raise ValueError(f"Invalid optimizer selection: {name}")


class Optimizer:
    def __init__(self, config, param_labels=None, num_iterations=None):
        t = config.training
        self.name = t.optimizer
        self.base_lr = float(t.learning_rate)
        self.num_iterations = num_iterations

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
                lambda learning_rate: _base_optimizer(
                    self.name, learning_rate, self.num_iterations))(
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
