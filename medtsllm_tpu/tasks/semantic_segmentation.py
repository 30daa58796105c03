"""Semantic segmentation task (reference tasks/semantic_segmentation.py):
per-timestep classification with stitched per-class score series."""

from __future__ import annotations

import numpy as np
from sklearn.metrics import (
    accuracy_score, f1_score, jaccard_score, precision_score, recall_score,
)

from ..data import windowing as W
from .base import BaseTask


class SemanticSegmentationTask(BaseTask):

    def _eval_split(self, pipeline, split):
        preds, targets = self.predict(pipeline)
        scores = {f"{split}/{k}": v for k, v in self.score(preds, targets).items()}
        self.log_scores(scores)
        self.logger.log_figure(self.plot_predictions(preds, targets),
                               f"{split}/predictions")
        return scores

    def val(self):
        return self._eval_split(self.val_pipeline, "val")

    def test(self):
        return self._eval_split(self.test_pipeline, "test")

    def predict(self, pipeline):
        dataset = pipeline.dataset
        n_points = self.eval_n_points(dataset, include_history=False)
        n_classes = dataset.n_classes

        out = self.run_eval(pipeline, extra_keys=("labels", "index"))
        pred = out["pred"]  # [n, L] sigmoid (binary) or [n, L, C] softmax
        lbl = out["labels"].reshape(out["labels"].shape[0], -1)
        idx = out["index"]
        starts = np.asarray(dataset.x_starts(idx))

        # stitch per-class score series; binary fills class-1 then complements
        # (semantic_segmentation.py:101-107)
        if n_classes == 2:
            p1 = W.stitch_windows(pred.reshape(pred.shape[0], -1), starts, n_points)
            preds = np.stack([1 - p1, p1], axis=1)
        else:
            preds = W.stitch_windows(
                pred.reshape(pred.shape[0], self.config.pred_len, n_classes),
                starts, n_points, n_channels=n_classes)
        labels = W.stitch_windows(lbl.astype(np.float32), starts, n_points,
                                  fill=-1.0).astype(np.int64)

        preds, labels = self.finalize_series(dataset, preds, labels)
        assert not (labels < 0).any(), "unfilled labels after stitching"
        return preds, labels

    def score(self, pred_scores, target):
        avg_mode = "binary" if pred_scores.shape[1] == 2 else "macro"
        pred = pred_scores.argmax(axis=1).astype(np.int64)
        return {
            "accuracy": accuracy_score(target, pred),
            "f1": f1_score(target, pred, average=avg_mode, zero_division=0),
            "precision": precision_score(target, pred, average=avg_mode, zero_division=0),
            "recall": recall_score(target, pred, average=avg_mode, zero_division=0),
            "iou": jaccard_score(target, pred, average=avg_mode, zero_division=0),
        }

    def plot_predictions(self, pred_scores, targets, xrange=(0, 1000)):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        sl = slice(*xrange)
        fig, ax = plt.subplots(figsize=(12, 4))
        xs = np.arange(len(targets[sl]))
        ax.plot(xs, targets[sl], label="target", lw=0.8)
        if pred_scores.shape[1] == 2:
            ax.plot(xs, pred_scores[sl, 1], label="pred", lw=0.8)
        else:
            ax.plot(xs, pred_scores.argmax(axis=1)[sl], label="pred", lw=0.8)
        ax.legend(loc="upper right")
        fig.tight_layout()
        return fig
