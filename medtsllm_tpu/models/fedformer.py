"""FEDformer: frequency-enhanced decomposition transformer.

Re-design of reference models/FEDformer.py:18-306 (ICML'22). The Fourier
version runs entirely in jnp complex64; the Wavelets version uses the
multiwavelet ops (Legendre filters precomputed on host at init, exactly as
the reference does with sympy, MultiWaveletCorrelation.py:31-170).

Precision: fp32 only, enforced in config validation like the reference
(tasks/base.py:272-273).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..ops.autocorr import AutoCorrelationLayer
from ..ops.autoformer import (
    AutoformerDecoder, AutoformerDecoderLayer, AutoformerEncoder,
    AutoformerEncoderLayer,
)
from ..ops.decomp import series_decomp
from ..ops.embed import DataEmbedding
from ..ops.fourier import FourierBlock, FourierCrossAttention, get_frequency_modes


class FEDformer(nn.Module):
    task: str
    seq_len: int
    label_len: int
    pred_len: int
    version: str
    modes: int
    index_enc: tuple
    index_dec: tuple
    index_cross_q: tuple
    index_cross_kv: tuple
    e_layers: int
    d_layers: int
    d_model: int
    n_heads: int
    d_ff: int
    moving_avg_kernel: int
    activation: str
    enc_in: int
    c_out: int
    num_class: int
    dropout: float
    seg_mode: str | None = None

    supported_tasks = ("forecasting", "anomaly_detection", "reconstruction",
                       "imputation", "classification", "semantic_segmentation",
                       "segmentation")
    supported_modes = ("multivariate",)

    @classmethod
    def from_config(cls, config, dataset):
        mc = config.models.fedformer
        task = config.task
        n_classes = (dataset.n_classes
                     if task in ("classification", "semantic_segmentation") else 0)
        seq_len = config.history_len
        pred_len = config.pred_len
        dec_len = seq_len // 2 + pred_len
        if task == "forecasting":
            # the reference sizes its decoder-side frequency blocks for
            # seq//2 + pred while feeding label_len + pred tokens
            # (FEDformer.py:97,115,122 vs :204-207) — they only agree when
            # label_len == seq_len//2; make the implicit contract explicit
            assert mc.label_len == seq_len // 2, (
                f"fedformer forecasting requires label_len == history_len//2 "
                f"(got {mc.label_len} != {seq_len // 2})")
        mode_select = mc.mode_select
        modes = mc.modes
        return cls(
            task=task,
            seq_len=seq_len,
            label_len=mc.label_len,
            pred_len=pred_len,
            version=mc.version,
            modes=modes,
            index_enc=tuple(get_frequency_modes(seq_len, modes, mode_select)),
            index_dec=tuple(get_frequency_modes(dec_len, modes, mode_select)),
            index_cross_q=tuple(get_frequency_modes(dec_len, modes, mode_select)),
            index_cross_kv=tuple(get_frequency_modes(seq_len, modes, mode_select)),
            e_layers=mc.e_layers,
            d_layers=mc.d_layers,
            d_model=mc.d_model,
            n_heads=mc.n_heads,
            d_ff=mc.d_ff,
            moving_avg_kernel=mc.moving_avg,
            activation=mc.activation,
            enc_in=dataset.n_features,
            c_out=dataset.n_features,
            num_class=n_classes,
            dropout=config.training.dropout,
            seg_mode=(config.tasks.segmentation.mode
                      if task == "segmentation" else None),
        )

    def _attention_blocks(self):
        dec_len = self.seq_len // 2 + self.pred_len
        if self.version == "Wavelets":
            from ..ops.wavelets import MultiWaveletTransform, MultiWaveletCross
            enc_self = MultiWaveletTransform(ich=self.d_model, L=1, base="legendre")
            dec_self = MultiWaveletTransform(ich=self.d_model, L=1, base="legendre")
            dec_cross = MultiWaveletCross(
                in_channels=self.d_model, out_channels=self.d_model,
                seq_len_q=dec_len, seq_len_kv=self.seq_len,
                modes=self.modes, ich=self.d_model, base="legendre",
                activation="tanh")
        else:
            enc_self = FourierBlock(
                in_channels=self.d_model, out_channels=self.d_model,
                seq_len=self.seq_len, index=self.index_enc,
                n_heads=self.n_heads)
            dec_self = FourierBlock(
                in_channels=self.d_model, out_channels=self.d_model,
                seq_len=dec_len, index=self.index_dec, n_heads=self.n_heads)
            dec_cross = FourierCrossAttention(
                in_channels=self.d_model, out_channels=self.d_model,
                seq_len_q=dec_len, seq_len_kv=self.seq_len,
                index_q=self.index_cross_q, index_kv=self.index_cross_kv,
                num_heads=self.n_heads)
        return enc_self, dec_self, dec_cross

    def _encoder(self, enc_self):
        layers = tuple(
            AutoformerEncoderLayer(
                AutoCorrelationLayer(enc_self, self.d_model, self.n_heads,
                                     name=f"enc_attn_{i}"),
                self.d_model, self.d_ff, moving_avg=self.moving_avg_kernel,
                dropout=self.dropout, activation=self.activation,
                name=f"enc_layer_{i}")
            for i in range(self.e_layers))
        return AutoformerEncoder(layers, name="encoder")

    def _decoder(self, dec_self, dec_cross):
        layers = tuple(
            AutoformerDecoderLayer(
                AutoCorrelationLayer(dec_self, self.d_model, self.n_heads,
                                     name=f"dec_self_{i}"),
                AutoCorrelationLayer(dec_cross, self.d_model, self.n_heads,
                                     name=f"dec_cross_{i}"),
                self.d_model, self.c_out, self.d_ff,
                moving_avg=self.moving_avg_kernel, dropout=self.dropout,
                activation=self.activation, name=f"dec_layer_{i}")
            for i in range(self.d_layers))
        return AutoformerDecoder(layers, self.c_out, name="decoder")

    @nn.compact
    def __call__(self, inputs: dict, training: bool = False):
        det = not training
        x_enc = inputs["x_enc"].astype(jnp.float32)
        enc_self, dec_self, dec_cross = self._attention_blocks()
        enc_embedding = DataEmbedding(self.d_model, embed_type="timeF",
                                      freq="s", dropout=self.dropout,
                                      name="enc_embedding")

        if self.task == "forecasting":
            # decomp init (FEDformer.py:199-218)
            mean = jnp.mean(x_enc, axis=1, keepdims=True)
            mean = jnp.repeat(mean, self.pred_len, axis=1)
            seasonal_init, trend_init = series_decomp(x_enc, self.moving_avg_kernel)
            trend_init = jnp.concatenate(
                [trend_init[:, -self.label_len:, :], mean], axis=1)
            seasonal_init = jnp.pad(
                seasonal_init[:, -self.label_len:, :],
                ((0, 0), (0, self.pred_len), (0, 0)))

            enc_out = enc_embedding(x_enc, None, deterministic=det)
            dec_embedding = DataEmbedding(self.d_model, embed_type="timeF",
                                          freq="s", dropout=self.dropout,
                                          name="dec_embedding")
            dec_out = dec_embedding(seasonal_init, None, deterministic=det)
            enc_out, _ = self._encoder(enc_self)(enc_out, deterministic=det)
            seasonal_part, trend_part = self._decoder(dec_self, dec_cross)(
                dec_out, enc_out, trend=trend_init, deterministic=det)
            out = trend_part + seasonal_part
            return out[:, -self.pred_len:, :]

        enc_out = enc_embedding(x_enc, None, deterministic=det)
        enc_out, _ = self._encoder(enc_self)(enc_out, deterministic=det)

        if self.task in ("anomaly_detection", "reconstruction", "imputation"):
            return nn.Dense(self.c_out, name="projection")(enc_out)
        if self.task == "classification":
            out = nn.gelu(enc_out, approximate=False)
            out = nn.Dropout(self.dropout)(out, deterministic=det)
            out = out.reshape(out.shape[0], -1)
            return nn.Dense(self.num_class, name="projection")(out)
        if self.task == "semantic_segmentation":
            out = nn.gelu(enc_out, approximate=False).reshape(enc_out.shape[0], -1)
            out_size = (self.pred_len * self.num_class if self.num_class > 2
                        else self.pred_len)
            out = nn.Dense(out_size, name="projection")(out)
            if self.num_class > 2:
                out = out.reshape(out.shape[0], self.pred_len, self.num_class)
                if not training:
                    out = nn.softmax(out, axis=-1)
            elif not training:
                out = nn.sigmoid(out)
            return out
        if self.task == "segmentation":
            out = nn.gelu(enc_out, approximate=False).reshape(enc_out.shape[0], -1)
            out = nn.Dense(self.seq_len, name="projection")(out)
            if not training and self.seg_mode == "boundary-prediction":
                out = nn.sigmoid(out)
            return out
        raise ValueError(f"Invalid task for FEDformer: {self.task}")
