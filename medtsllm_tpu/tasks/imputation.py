"""Imputation task: reconstruct randomly held-out points.

The reference ships imputation branches in every baseline model
(dlinear.py:80, gpt4ts.py:102, TimesNet.py:113, PatchTST.py:156,
FEDformer.py:220 — the Time-Series-Library protocol: the model receives
the pre-masked window plus the observation mask and mask-aware
normalization statistics) but, as with classification, registers no task
trainer to drive them. This trainer completes the protocol:

  - the window is element-wise masked at `tasks.imputation.mask_rate`
    (mask 1 = observed, 0 = held out); the model input `x_enc` is the
    zero-filled masked window, `mask` rides along for the mask-aware
    normalization, and the unmasked window rides in `y` for the loss;
  - masks are deterministic per global window index (so eval scoring can
    regenerate them host-side) and salted by epoch in the train step (so
    training sees fresh masks each epoch, like the reference exp loop's
    per-batch rand);
  - loss and metrics count the HELD-OUT points only.
"""

from __future__ import annotations

import numpy as np

from .base import BaseTask


class ImputationTask(BaseTask):

    def _mask_for(self, indices, shape, salt: int = 0) -> np.ndarray:
        rate = float(self.config.get("tasks", {}).get("imputation", {})
                     .get("mask_rate", 0.25))
        seed = int(self.config.setup.seed)
        masks = np.empty((len(indices),) + shape, np.float32)
        for i, idx in enumerate(np.asarray(indices)):
            rng = np.random.default_rng(
                (seed + 1) * 1_000_003 + salt * 7_777_777 + int(idx))
            masks[i] = (rng.random(shape) >= rate)
        return masks

    def _with_mask(self, arrays: dict, salt: int = 0) -> dict:
        x = np.asarray(arrays["x_enc"])
        mask = self._mask_for(arrays["index"], x.shape[1:], salt=salt)
        arrays = dict(arrays)
        arrays["y"] = x  # unmasked target
        arrays["x_enc"] = x * mask  # zero-filled observed input
        arrays["mask"] = mask
        return arrays

    def model_inputs(self, batch: dict) -> dict:
        return self._with_mask(super().model_inputs(batch))

    def train_model_inputs(self, batch: dict) -> dict:
        arrays = super(ImputationTask, self).model_inputs(batch)
        return self._with_mask(arrays, salt=self.epoch)

    def _eval_split(self, pipeline, split):
        pred, target, mask = self.predict(pipeline)
        scores = {f"{split}/{k}": v
                  for k, v in self.score(pred, target, mask).items()}
        self.log_scores(scores)
        self.logger.log_figure(self.plot_predictions(pred, target, mask),
                               f"{split}/imputation")
        return scores

    def val(self):
        return self._eval_split(self.val_pipeline, "val")

    def test(self):
        return self._eval_split(self.test_pipeline, "test")

    def predict(self, pipeline):
        out = self.run_eval(pipeline, extra_keys=("x_enc", "index"))
        target = out["x_enc"]  # run_eval reads the RAW batch (unmasked)
        mask = self._mask_for(out["index"], target.shape[1:])
        return out["pred"], target, mask

    def score(self, pred, target, mask):
        hold = (1.0 - mask).astype(bool)
        diff = pred - target
        n_hold = max(int(hold.sum()), 1)
        return {
            "masked_mse": float((diff[hold] ** 2).sum() / n_hold),
            "masked_mae": float(np.abs(diff[hold]).sum() / n_hold),
            "full_mse": float((diff ** 2).mean()),
        }

    def plot_predictions(self, pred, target, mask, window: int = 0):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(12, 4))
        t = target[window, :, 0]
        p = pred[window, :, 0]
        m = mask[window, :, 0].astype(bool)
        xs = np.arange(len(t))
        ax.plot(xs, t, label="target", lw=0.8)
        ax.plot(xs, p, label="imputed", lw=0.8)
        ax.scatter(xs[~m], t[~m], s=10, c="red", label="held out")
        ax.legend(loc="upper right")
        fig.tight_layout()
        return fig
