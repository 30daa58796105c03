"""PatchTST: channel-independent patching + vanilla Transformer encoder.

Re-design of reference models/PatchTST.py:9-345 (paper arXiv 2211.14730).
All six per-task forward methods in the reference share the same
normalize -> patch -> encode -> reshape trunk; here it is one `_encode`.
Channel independence is expressed by folding channels into the batch dim —
a single big MXU-friendly batch, no per-channel loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.attention import AttentionLayer, FullAttention
from ..ops.embed import patch_unfold, positional_embedding
from ..ops.revin import masked_window_norm
from ..ops.transformer import Encoder, EncoderLayer


class LinearPatchEmbedding(nn.Module):
    """Patch + linear value embedding + sincos positions
    (PatchTST.py:363-388; unlike the medtsllm PatchEmbedding, the value
    embedding is a bias-free Linear, not a conv)."""

    d_model: int
    patch_len: int
    stride: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):  # [B, C, L]
        B, C, _ = x.shape
        patches = patch_unfold(x, self.patch_len, self.stride)  # [B,C,P,pl]
        P = patches.shape[2]
        patches = patches.reshape(B * C, P, self.patch_len)
        out = nn.Dense(self.d_model, use_bias=False, name="value_embedding")(patches)
        pe = jnp.asarray(positional_embedding(P, self.d_model))
        out = out + pe[None, :, :]
        return nn.Dropout(self.dropout)(out, deterministic=deterministic), C


class PatchTST(nn.Module):
    task: str
    seq_len: int
    pred_len: int
    enc_in: int
    num_class: int
    d_model: int
    d_ff: int
    n_heads: int
    e_layers: int
    patch_len: int
    stride: int
    dropout: float
    seg_mode: str | None = None

    supported_tasks = ("forecasting", "reconstruction", "anomaly_detection",
                       "imputation", "classification", "semantic_segmentation",
                       "segmentation")
    supported_modes = ("multivariate",)

    @classmethod
    def from_config(cls, config, dataset):
        mc = config.models.patchtst
        assert mc.covariate_mode == "independent", \
            "Only independent covariate mode is supported for PatchTST"
        task = config.task
        if task == "forecasting":
            pred_len = config.pred_len
        else:
            assert config.pred_len == config.history_len
            pred_len = 0
        n_classes = (dataset.n_classes
                     if task in ("classification", "semantic_segmentation") else 0)
        return cls(
            task=task,
            seq_len=config.history_len,
            pred_len=pred_len,
            enc_in=dataset.n_features,
            num_class=n_classes,
            d_model=mc.d_model,
            d_ff=mc.d_ff,
            n_heads=mc.n_heads,
            e_layers=mc.e_layers,
            patch_len=mc.patching.patch_len,
            stride=mc.patching.stride,
            dropout=config.training.dropout,
            seg_mode=(config.tasks.segmentation.mode
                      if task == "segmentation" else None),
        )

    @property
    def n_patches(self) -> int:
        return int((self.seq_len - self.patch_len) / self.stride + 2)

    def _normalize(self, x_enc):
        """Non-stationary-Transformer window norm (PatchTST.py:126-130):
        mean detached, stdev not."""
        means = jax.lax.stop_gradient(jnp.mean(x_enc, axis=1, keepdims=True))
        x = x_enc - means
        stdev = jnp.sqrt(jnp.var(x, axis=1, keepdims=True) + 1e-5)
        return x / stdev, means, stdev

    def _encode(self, x, *, deterministic, mask=None):
        """normalize -> patch -> transformer -> [B, C, d_model, P].
        With `mask` (imputation), statistics cover observed points only
        (reference PatchTST.py:157-166)."""
        if mask is not None:
            x, means, stdev = masked_window_norm(x, mask)
        else:
            x, means, stdev = self._normalize(x)
        x = jnp.swapaxes(x, 1, 2)  # [B, C, L]
        enc, n_vars = LinearPatchEmbedding(
            self.d_model, self.patch_len, self.stride, self.dropout,
            name="patch_embedding")(x, deterministic=deterministic)
        layers = tuple(
            EncoderLayer(
                AttentionLayer(
                    FullAttention(mask_flag=False, attention_dropout=self.dropout,
                                  output_attention=True),
                    self.d_model, self.n_heads),
                self.d_model, self.d_ff, dropout=self.dropout,
                activation="gelu", name=f"encoder_layer_{i}")
            for i in range(self.e_layers))
        enc, _ = Encoder(layers, name="encoder")(enc, deterministic=deterministic)
        enc = enc.reshape(-1, n_vars, enc.shape[-2], enc.shape[-1])
        enc = jnp.transpose(enc, (0, 1, 3, 2))  # [B, C, d_model, P]
        return enc, means, stdev

    def _regression_head(self, enc, target_window, *, deterministic):
        """Per-variable FlattenHead (PatchTST.py:348-360): [B,C,d,P] ->
        [B, target, C]."""
        flat = enc.reshape(*enc.shape[:2], -1)  # [B, C, d*P]
        out = nn.Dense(target_window, name="head")(flat)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return jnp.swapaxes(out, 1, 2)  # [B, target, C]

    @nn.compact
    def __call__(self, inputs: dict, training: bool = False):
        det = not training
        x_enc = inputs["x_enc"]
        mask = inputs.get("mask") if self.task == "imputation" else None
        enc, means, stdev = self._encode(x_enc, deterministic=det, mask=mask)

        if self.task == "forecasting":
            out = self._regression_head(enc, self.pred_len, deterministic=det)
            out = out * stdev[:, 0:1, :] + means[:, 0:1, :]
            return out[:, -self.pred_len:, :]
        if self.task in ("reconstruction", "anomaly_detection", "imputation"):
            out = self._regression_head(enc, self.seq_len, deterministic=det)
            return out * stdev[:, 0:1, :] + means[:, 0:1, :]
        if self.task == "classification":
            flat = enc.reshape(enc.shape[0], -1)
            flat = nn.Dropout(self.dropout)(flat, deterministic=det)
            return nn.Dense(self.num_class, name="projection")(flat)
        if self.task == "semantic_segmentation":
            flat = enc.reshape(enc.shape[0], -1)
            n_out = self.num_class if self.num_class > 2 else 1
            out = nn.Dense(self.seq_len * n_out, name="projection")(flat)
            if self.num_class > 2:
                # KNOWN REFERENCE BUG not replicated: the reference
                # reshapes to (B, self.pred_len, C) with pred_len
                # hard-zeroed for non-forecasting (PatchTST.py:44,279) and
                # crashes; seq_len is the intended target
                out = out.reshape(out.shape[0], self.seq_len, self.num_class)
                if not training:
                    out = nn.softmax(out, axis=-1)
            elif not training:
                out = nn.sigmoid(out)
            return out
        if self.task == "segmentation":
            flat = enc.reshape(enc.shape[0], -1)
            out = nn.Dense(self.seq_len, name="projection")(flat)
            if not training and self.seg_mode == "boundary-prediction":
                out = nn.sigmoid(out)
            return out
        raise ValueError(f"Invalid task for PatchTST: {self.task}")
