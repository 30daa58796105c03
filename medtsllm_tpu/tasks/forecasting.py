"""Forecasting task (reference tasks/forecasting.py).

predict() stitches overlapping windows into one continuous series with a
single vectorized scatter (vs the reference per-sample loop,
forecasting.py:72-78), handles univariate mode, clip masks, and the
step>pred de-dup; scores are MSE/MAE.
"""

from __future__ import annotations

import numpy as np

from .base import BaseTask
from ..data import windowing as W


class ForecastTask(BaseTask):

    def val(self):
        preds, targets = self.predict(self.val_pipeline)
        scores = {f"val/{k}": v for k, v in self.score(preds, targets).items()}
        self.log_scores(scores)
        return scores

    def test(self):
        preds, targets = self.predict(self.test_pipeline)
        scores = {f"test/{k}": v for k, v in self.score(preds, targets).items()}
        self.log_scores(scores)
        return scores

    def predict(self, pipeline):
        dataset = pipeline.dataset
        ctx_len = self.config.history_len
        n_points = self.eval_n_points(dataset, include_history=True)
        n_features = dataset.real_features

        out = self.run_eval(pipeline, extra_keys=("y", "index"))
        pred = out["pred"].reshape(out["pred"].shape[0], self.config.pred_len, -1)
        target = out["y"].reshape(pred.shape)
        idx = out["index"]

        # predictions land at the *target* range start = x_start + ctx_len
        starts = np.asarray(dataset.x_starts(idx)) + ctx_len
        feats = dataset.features(idx) if dataset.univariate else None

        kw = dict(n_points=n_points, n_channels=n_features, features=feats)
        preds = W.stitch_windows(pred[..., 0] if feats is not None else pred,
                                 starts, **kw)
        targets = W.stitch_windows(target[..., 0] if feats is not None else target,
                                   starts, **kw)

        preds, targets = preds[ctx_len:], targets[ctx_len:]
        preds, targets = self.finalize_series(dataset, preds, targets)
        return preds, targets

    def score(self, pred, target):
        err = pred - target
        return {
            "mse": float(np.mean(err ** 2)),
            "mae": float(np.mean(np.abs(err))),
        }
