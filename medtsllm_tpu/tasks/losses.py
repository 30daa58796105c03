"""Loss functions as pure jnp ops with batch-validity masking.

The reference uses torch loss modules with mean reduction
(tasks/forecasting.py:103-113 etc.). Our batch pipeline pads the final
batch to a fixed shape, so every loss here is computed per-sample and
mean-reduced over *valid* samples only — identical numerics to the
reference on full batches, correct on padded ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def _masked_mean(per_sample: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """per_sample: [B], valid: [B] bool -> scalar mean over valid rows."""
    v = valid.astype(per_sample.dtype)
    return jnp.sum(per_sample * v) / jnp.maximum(jnp.sum(v), 1.0)


def _per_sample(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[0], -1).mean(axis=1)


def mse(pred, target, valid):
    return _masked_mean(_per_sample((pred - target) ** 2), valid)


def mae(pred, target, valid):
    return _masked_mean(_per_sample(jnp.abs(pred - target)), valid)


def smooth_l1(pred, target, valid, beta: float = 1.0):
    d = jnp.abs(pred - target)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return _masked_mean(_per_sample(loss), valid)


def bce_with_logits(pred, target, valid):
    loss = optax.sigmoid_binary_cross_entropy(pred, target.astype(pred.dtype))
    return _masked_mean(_per_sample(loss), valid)


def cross_entropy(logits, labels, valid):
    """logits [B, L, n_classes], labels [B, L] int. (The reference permutes
    to channel-first for torch CE, semantic_segmentation.py:36-38; jax CE
    takes class-last directly.)"""
    loss = optax.softmax_cross_entropy_with_integer_labels(
        logits, labels.astype(jnp.int32))
    return _masked_mean(_per_sample(loss), valid)


def masked_point_loss(pred, target, mask, valid, kind: str = "mse"):
    """Imputation loss: mean error over the MASKED (held-out) points only.
    pred/target [B, L, C], mask [B, L, C] (1 = observed, 0 = held out)."""
    hold = 1.0 - mask.astype(pred.dtype)
    err = ((pred - target) ** 2 if kind == "mse"
           else jnp.abs(pred - target)) * hold
    B = pred.shape[0]
    per_sample = (err.reshape(B, -1).sum(axis=1)
                  / jnp.maximum(hold.reshape(B, -1).sum(axis=1), 1.0))
    return _masked_mean(per_sample, valid)


def jaccard_loss(pred, target, valid, binary: bool = True, eps: float = 1e-7):
    """Soft IoU loss (reference uses pytorch_optimizer.JaccardLoss,
    semantic_segmentation.py:130-131)."""
    if binary:
        p = jax.nn.sigmoid(pred).reshape(pred.shape[0], -1)
        t = target.astype(p.dtype).reshape(pred.shape[0], -1)
        inter = jnp.sum(p * t, axis=1)
        union = jnp.sum(p + t, axis=1) - inter
        loss = 1.0 - (inter + eps) / (union + eps)
    else:
        # pred [B, L, C] logits, target [B, L] int
        p = jax.nn.softmax(pred, axis=-1)
        t = jax.nn.one_hot(target, pred.shape[-1], dtype=p.dtype)
        inter = jnp.sum(p * t, axis=(1,))
        union = jnp.sum(p + t, axis=(1,)) - inter
        loss = jnp.mean(1.0 - (inter + eps) / (union + eps), axis=-1)
    return _masked_mean(loss, valid)


def lovasz_hinge(pred, target, valid):
    """Lovasz hinge for binary segmentation (reference
    pytorch_optimizer.LovaszHingeLoss, semantic_segmentation.py:132-133).
    Per-sample Lovasz extension computed with a fixed-length sort —
    shape-static, jit-friendly."""
    B = pred.shape[0]
    logits = pred.reshape(B, -1)
    labels = target.astype(logits.dtype).reshape(B, -1)

    def per_image(lg, lb):
        signs = 2.0 * lb - 1.0
        errors = 1.0 - lg * signs
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        lb_sorted = lb[order]
        gts = jnp.sum(lb_sorted)
        intersection = gts - jnp.cumsum(lb_sorted)
        union = gts + jnp.cumsum(1.0 - lb_sorted)
        jaccard = 1.0 - intersection / jnp.maximum(union, 1e-7)
        jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
        return jnp.sum(jax.nn.relu(errors_sorted) * jaccard)

    loss = jax.vmap(per_image)(logits, labels)
    return _masked_mean(loss, valid)


def build_loss(name: str, task: str, n_classes: int = 0):
    """Resolve a config loss name to (fn(pred, batch, valid) -> scalar).

    Mirrors the per-task loss tables: forecasting/recon/AD
    (forecasting.py:103-113), segmentation (segmentation.py:58-71),
    semantic segmentation (semantic_segmentation.py:123-136).
    """
    is_binary = n_classes == 2
    if task in ("forecasting",):
        target_key = "y"
    elif task in ("reconstruction", "anomaly_detection", "pretraining"):
        target_key = "x_enc"
    else:
        target_key = "labels"

    if task == "classification":
        # must precede the generic regression arms: loss="mse" would
        # otherwise match them and broadcast logits [B, C] against
        # integer labels [B]
        if name not in ("ce", "cross_entropy", "auto"):
            raise ValueError(
                f"classification requires a cross-entropy loss "
                f"(ce/cross_entropy/auto), got {name!r}")
        return lambda p, b, v: cross_entropy(p, b["labels"], v)

    if task == "imputation":
        # target rides in "y" (the UNmasked window; "x_enc" is pre-masked),
        # loss counts held-out points only
        assert name in ("mse", "mae"), \
            f"imputation supports mse/mae losses, got {name!r}"
        return lambda p, b, v: masked_point_loss(
            p, jax.lax.stop_gradient(b["y"]), b["mask"], v, kind=name)

    def regression(fn):
        def loss(pred, batch, valid):
            return fn(pred, jax.lax.stop_gradient(batch[target_key]), valid)
        return loss

    match name, task:
        case ("mse", _) if task != "segmentation":
            return regression(mse)
        case ("mae", _) if task != "segmentation":
            return regression(mae)
        case ("smooth_l1" | "smooth_mae", _):
            return regression(smooth_l1)
        case ("bce", "segmentation"):
            return lambda p, b, v: bce_with_logits(p, b["labels"], v)
        case ("mse" | "mae", "segmentation"):
            fn = mse if name == "mse" else mae
            return lambda p, b, v: fn(p, b["labels"].astype(p.dtype), v)
        case ("bce" | "ce" | "cross_entropy" | "auto", "semantic_segmentation") if is_binary:
            return lambda p, b, v: bce_with_logits(p, b["labels"], v)
        case ("ce" | "cross_entropy" | "auto", "semantic_segmentation"):
            return lambda p, b, v: cross_entropy(p, b["labels"], v)
        case ("iou" | "jaccard", _):
            return lambda p, b, v: jaccard_loss(p, b["labels"], v, binary=is_binary)
        case ("lovasz" | "lovasz-hinge", _) if is_binary:
            return lambda p, b, v: lovasz_hinge(p, b["labels"], v)
    raise ValueError(f"Invalid loss function selection: {name} for task {task}")
