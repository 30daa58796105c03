"""TimesNet: top-k period folding + inception 2D convs.

Re-design of reference models/TimesNet.py:9-330 (paper TimesNet, ICLR'23).
The period-dependent dynamic reshape is replaced by the static-shape
gather-conv in ops/inception.py — no per-forward host sync (the reference
does `.cpu().numpy()` on the FFT output every step, TimesNet.py:328).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.embed import DataEmbedding
from ..ops.revin import masked_window_norm
from ..ops.inception import (InceptionBlockV1, fft_for_period,
                             fold_conv_valid_mask)


class TimesBlock(nn.Module):
    """One period-folding block (TimesNet.py:254-318): for each of the top-k
    periods, fold -> inception conv x2 (GELU between) -> unfold; aggregate
    with softmax(amplitude) weights; residual."""

    d_model: int
    d_ff: int
    num_kernels: int
    top_k: int

    @nn.compact
    def __call__(self, x):  # [B, T, d_model]
        B, T, N = x.shape
        periods, period_weight = fft_for_period(x, self.top_k)

        conv1 = InceptionBlockV1(self.d_ff, self.num_kernels, name="conv1")
        conv2 = InceptionBlockV1(self.d_model, self.num_kernels, name="conv2")

        # the reference runs conv -> gelu -> conv on the FOLDED image, so
        # conv2 reads conv1's (nonzero) outputs in the zero-padded rows
        # whenever T % period != 0 (TimesNet.py:267-307). Carry a 2T
        # buffer between the stages (total padded length <= 2T-1 for any
        # period <= T) and crop to T only after conv2 — parity verified by
        # test_reference_oracle_systems.py::test_timesblock_period_fold.
        xbuf = jnp.concatenate([x, jnp.zeros_like(x)], axis=1)  # [B, 2T, N]
        res = []
        for i in range(self.top_k):
            mid = conv1(xbuf, periods[i], seq_len=T, out_len=2 * T)
            mid = nn.gelu(mid, approximate=False)
            # zero beyond the padded image so conv2's zero-'same'-padding
            # reads match the reference
            mid = jnp.where(
                fold_conv_valid_mask(2 * T, T, periods[i])[None, :, None],
                mid, 0.0)
            out = conv2(mid, periods[i], seq_len=T, out_len=T)
            res.append(out)
        res = jnp.stack(res, axis=-1)  # [B, T, N, k]

        w = jax.nn.softmax(period_weight.astype(x.dtype), axis=1)  # [B, k]
        res = jnp.sum(res * w[:, None, None, :], axis=-1)
        return res + x


class TimesNet(nn.Module):
    task: str
    seq_len: int
    pred_len: int
    enc_in: int
    c_out: int
    num_class: int
    d_model: int
    d_ff: int
    e_layers: int
    top_k: int
    num_kernels: int
    dropout: float
    seg_mode: str | None = None

    supported_tasks = ("forecasting", "reconstruction", "anomaly_detection",
                       "imputation", "classification", "semantic_segmentation",
                       "segmentation")
    supported_modes = ("multivariate",)

    @classmethod
    def from_config(cls, config, dataset):
        mc = config.models.timesnet
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
            c_out=dataset.n_features,
            num_class=n_classes,
            d_model=mc.d_model,
            d_ff=mc.d_ff,
            e_layers=mc.e_layers,
            top_k=mc.top_k,
            num_kernels=mc.num_kernels,
            dropout=config.training.dropout,
            seg_mode=(config.tasks.segmentation.mode
                      if task == "segmentation" else None),
        )

    def _normalize(self, x_enc):
        means = jax.lax.stop_gradient(jnp.mean(x_enc, axis=1, keepdims=True))
        x = x_enc - means
        stdev = jnp.sqrt(jnp.var(x, axis=1, keepdims=True) + 1e-5)
        return x / stdev, means, stdev

    def _backbone(self, x, deterministic, extend_to=None):
        enc = DataEmbedding(self.d_model, embed_type="timeF", freq="s",
                            dropout=self.dropout, name="enc_embedding")(
            x, None, deterministic=deterministic)
        if extend_to is not None:
            # align temporal dimension before the blocks (TimesNet.py:95-98)
            enc = jnp.swapaxes(
                nn.Dense(extend_to, name="predict_linear")(
                    jnp.swapaxes(enc, 1, 2)), 1, 2)
        norm = nn.LayerNorm(name="layer_norm")  # shared (TimesNet.py:61,100)
        for i in range(self.e_layers):
            enc = TimesBlock(self.d_model, self.d_ff, self.num_kernels,
                             self.top_k, name=f"block_{i}")(enc)
            enc = norm(enc)
        return enc

    @nn.compact
    def __call__(self, inputs: dict, training: bool = False):
        det = not training
        x_enc = inputs["x_enc"]

        if self.task == "forecasting":
            x, means, stdev = self._normalize(x_enc)
            total = self.seq_len + self.pred_len
            enc = self._backbone(x, det, extend_to=total)
            out = nn.Dense(self.c_out, name="projection")(enc)
            out = out * stdev[:, 0:1, :] + means[:, 0:1, :]
            return out[:, -self.pred_len:, :]

        if self.task in ("reconstruction", "anomaly_detection", "imputation"):
            mask = inputs.get("mask") if self.task == "imputation" else None
            if mask is not None:
                # mask-aware statistics over observed points only
                # (reference TimesNet.py:114-123)
                x, means, stdev = masked_window_norm(x_enc, mask)
            else:
                x, means, stdev = self._normalize(x_enc)
            enc = self._backbone(x, det)
            out = nn.Dense(self.c_out, name="projection")(enc)
            return out * stdev[:, 0:1, :] + means[:, 0:1, :]

        if self.task == "classification":
            enc = self._backbone(x_enc, det)
            out = nn.gelu(enc, approximate=False)
            out = nn.Dropout(self.dropout)(out, deterministic=det)
            out = out.reshape(out.shape[0], -1)
            return nn.Dense(self.num_class, name="projection")(out)

        if self.task in ("semantic_segmentation", "segmentation"):
            x, means, stdev = self._normalize(x_enc)
            enc = self._backbone(x, det)
            n_out = (self.num_class if self.task == "semantic_segmentation"
                     and self.num_class > 2 else 1)
            out = nn.Dense(n_out, name="projection")(enc)
            out = out.squeeze(-1) if n_out == 1 else out
            if not training:
                if self.task == "semantic_segmentation":
                    out = (nn.softmax(out, axis=-1) if self.num_class > 2
                           else nn.sigmoid(out))
                elif self.seg_mode == "boundary-prediction":
                    out = nn.sigmoid(out)
            return out
        raise ValueError(f"Invalid task for TimesNet: {self.task}")
