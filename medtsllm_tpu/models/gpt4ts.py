"""GPT4TS: frozen GPT-2 backbone with per-task linear heads.

Re-design of reference models/gpt4ts.py:10-246 ("One Fits All"). Only
ln/wpe (+ optionally mlp) backbone params train (gpt4ts.py:47-53).

Notes vs the reference:
- the 768 feature pad is cfg.d_model (the reference hardcodes GPT-2's 768);
- the reference constructs its input DataEmbedding with
  c_in = enc_in*patch_size (gpt4ts.py:42) which only the classification
  path actually feeds — the other task paths feed enc_in channels and
  would crash a fixed-c_in conv; here the embedding derives c_in from the
  task's actual input (flax convs are input-shape agnostic).
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.embed import DataEmbedding, patch_unfold
from ..ops.revin import masked_window_norm
from .llm.loader import resolve_config
from .llm.transformer import TransformerDecoder


class GPT4TS(nn.Module):
    task: str
    seq_len: int
    pred_len: int
    enc_in: int
    c_out: int
    num_class: int
    d_model: int
    d_ff: int
    llm_id: str
    gpt_layers: int
    train_mlp: bool
    patch_size: int
    stride: int
    dropout: float
    cache_dir: str | None = None
    seg_mode: str | None = None

    supported_tasks = ("forecasting", "imputation", "reconstruction",
                       "anomaly_detection", "classification",
                       "semantic_segmentation", "segmentation")
    supported_modes = ("multivariate", "univariate")

    @classmethod
    def from_config(cls, config, dataset):
        mc = config.models.gpt4ts
        task = config.task
        if task == "forecasting":
            pred_len = config.pred_len
        else:
            assert config.pred_len == config.history_len
            pred_len = 0
        n_classes = (dataset.n_classes
                     if task in ("classification", "semantic_segmentation") else 0)
        cache_dir = config.get("paths", {}).get("llm_path") or None
        if cache_dir in ("", "none"):
            cache_dir = None
        return cls(
            task=task,
            seq_len=config.history_len,
            pred_len=pred_len,
            enc_in=dataset.n_features,
            c_out=dataset.n_features,
            num_class=n_classes,
            d_model=mc.d_model,
            d_ff=mc.d_ff,
            llm_id=mc.get("llm", "gpt2"),
            gpt_layers=mc.gpt_layers,
            train_mlp=mc.train_mlp,
            patch_size=mc.patching.patch_len,
            stride=mc.patching.stride,
            dropout=config.training.dropout,
            cache_dir=cache_dir,
            seg_mode=(config.tasks.segmentation.mode
                      if task == "segmentation" else None),
        )

    @property
    def patch_num(self) -> int:
        return (self.seq_len + self.pred_len - self.patch_size) // self.stride + 2

    def _backbone(self):
        cfg, _ = resolve_config(self.llm_id, self.cache_dir, self.gpt_layers)
        return TransformerDecoder(cfg, name="gpt2"), cfg

    def _normalize(self, x_enc):
        means = jax.lax.stop_gradient(jnp.mean(x_enc, axis=1, keepdims=True))
        x = x_enc - means
        stdev = jax.lax.stop_gradient(
            jnp.sqrt(jnp.var(x, axis=1, keepdims=True) + 1e-5))
        return x / stdev, means, stdev

    @nn.compact
    def __call__(self, inputs: dict, training: bool = False):
        det = not training
        x_enc = inputs["x_enc"]
        B = x_enc.shape[0]
        gpt2, cfg = self._backbone()
        d_llm = cfg.d_model

        def pad_to_dllm(x):
            return jnp.pad(x, ((0, 0), (0, 0), (0, d_llm - x.shape[-1])))

        if self.task == "forecasting":
            x, means, stdev = self._normalize(x_enc)
            enc = DataEmbedding(self.d_model, embed_type="timeF", freq="h",
                                dropout=self.dropout, name="enc_embedding")(
                x, None, deterministic=det)
            total = self.seq_len + self.pred_len
            enc = jnp.swapaxes(nn.Dense(total, name="predict_linear_pre")(
                jnp.swapaxes(enc, 1, 2)), 1, 2)
            out = gpt2(inputs_embeds=pad_to_dllm(enc), deterministic=det)
            out = out[:, :, :self.d_ff]
            out = nn.Dense(self.c_out, name="out_layer")(out)
            out = out * stdev[:, 0:1, :] + means[:, 0:1, :]
            return out[:, -self.pred_len:, :]

        if self.task in ("anomaly_detection", "reconstruction"):
            # seg_num=1 normalization degenerates to per-point (gpt4ts.py:155-161)
            x, means, stdev = self._normalize(x_enc)
            out = gpt2(inputs_embeds=pad_to_dllm(x), deterministic=det)
            out = out[:, :, :self.d_ff]
            out = nn.Dense(self.c_out, name="out_layer")(out)
            return out * stdev + means

        if self.task == "imputation":
            mask = inputs.get("mask")
            if mask is not None:
                # mask-aware statistics (reference gpt4ts.py:105-112)
                x, means, stdev = masked_window_norm(x_enc, mask)
            else:
                x, means, stdev = self._normalize(x_enc)
            enc = DataEmbedding(self.d_model, embed_type="timeF", freq="h",
                                dropout=self.dropout, name="enc_embedding")(
                x, None, deterministic=det)
            out = gpt2(inputs_embeds=pad_to_dllm(enc), deterministic=det)
            out = nn.LayerNorm(name="ln_proj")(out)
            out = nn.Dense(self.c_out, name="out_layer")(out)
            return out * stdev + means

        if self.task == "classification":
            patches = patch_unfold(jnp.swapaxes(x_enc, 1, 2),
                                   self.patch_size, self.stride)  # [B,M,N,p]
            tokens = jnp.transpose(patches, (0, 2, 3, 1)).reshape(
                B, patches.shape[2], -1)  # [B, N, p*M] (gpt4ts.py:180-183)
            enc = DataEmbedding(self.d_model, embed_type="timeF", freq="h",
                                dropout=self.dropout, name="enc_embedding")(
                tokens, None, deterministic=det)
            out = gpt2(inputs_embeds=pad_to_dllm(enc), deterministic=det)
            out = nn.gelu(out, approximate=False).reshape(B, -1)
            out = nn.LayerNorm(name="ln_proj")(out)
            out = nn.Dropout(0.1)(out, deterministic=det)
            return nn.Dense(self.num_class, name="out_layer")(out)

        if self.task in ("semantic_segmentation", "segmentation"):
            x, means, stdev = self._normalize(x_enc)
            enc = DataEmbedding(self.d_model, embed_type="timeF", freq="h",
                                dropout=self.dropout, name="enc_embedding")(
                x, None, deterministic=det)
            out = gpt2(inputs_embeds=pad_to_dllm(enc), deterministic=det)
            out = out[:, :, :self.d_ff]
            n_out = (self.num_class
                     if self.task == "semantic_segmentation" and self.num_class > 2
                     else 1)
            out = nn.Dense(n_out, name="out_layer")(out)
            out = out.squeeze(-1) if n_out == 1 else out
            if not training:
                if self.task == "semantic_segmentation":
                    out = (nn.softmax(out, axis=-1) if self.num_class > 2
                           else nn.sigmoid(out))
                elif self.seg_mode == "boundary-prediction":
                    out = nn.sigmoid(out)
            return out
        raise ValueError(f"Invalid task for GPT4TS: {self.task}")

    # -- trainer hooks -----------------------------------------------------

    def param_labels(self, params):
        """Backbone frozen except ln/wpe (+mlp when train_mlp)
        (gpt4ts.py:47-53)."""
        train_mlp = self.train_mlp

        def label(path, _):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if not name.startswith("gpt2/") and name != "gpt2":
                return "new"
            if re.search(r"ln_|/wpe$|^gpt2/wpe", name):
                return "new"
            if train_mlp and "/mlp/" in name:
                return "new"
            return "frozen"
        return jax.tree_util.tree_map_with_path(label, params)

    def pretrained_param_loader(self):
        """Trainer hook: load HF gpt2 weights into the backbone subtree."""
        from .llm.loader import find_snapshot, load_backbone

        def load(params):
            if find_snapshot(self.llm_id, self.cache_dir) is None:
                import warnings
                warnings.warn(
                    f"LLM {self.llm_id!r}: no local weights found — using "
                    f"random init (shapes/throughput faithful; task quality "
                    f"not meaningful)")
                return params
            _, loaded, _ = load_backbone(self.llm_id, self.cache_dir,
                                         self.gpt_layers)
            params = dict(params)
            params["gpt2"] = loaded
            return params
        return load
