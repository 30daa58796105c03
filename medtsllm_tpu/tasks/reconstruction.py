"""Reconstruction task (reference tasks/reconstruction.py): same loop as
forecasting with target = input window; stitching at the input range."""

from __future__ import annotations

import numpy as np

from .base import BaseTask
from ..data import windowing as W


class ReconstructionTask(BaseTask):

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
        n_points = self.eval_n_points(dataset, include_history=False)
        n_features = dataset.real_features

        out = self.run_eval(pipeline, extra_keys=("x_enc", "index"))
        pred = out["pred"].reshape(out["pred"].shape[0], self.config.pred_len, -1)
        target = out["x_enc"].reshape(pred.shape)
        idx = out["index"]

        starts = np.asarray(dataset.x_starts(idx))
        feats = dataset.features(idx) if dataset.univariate else None
        kw = dict(n_points=n_points, n_channels=n_features, features=feats)
        preds = W.stitch_windows(pred[..., 0] if feats is not None else pred,
                                 starts, **kw)
        targets = W.stitch_windows(target[..., 0] if feats is not None else target,
                                   starts, **kw)
        return self.finalize_series(dataset, preds, targets)

    def score(self, pred, target):
        err = pred - target
        return {
            "mse": float(np.mean(err ** 2)),
            "mae": float(np.mean(np.abs(err))),
        }
