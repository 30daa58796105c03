"""Anomaly detection task (reference tasks/anomaly_detection.py).

Reconstruction-based AD: stitch window reconstructions, per-point MSE score,
optional per-feature + moving-window normalization, quantile threshold
(auto / fixed / Bayesian-optimized F1), point-adjust evaluation (native C++
kernel), sklearn metrics, matplotlib prediction figure.
"""

from __future__ import annotations

import numpy as np
from sklearn.metrics import (
    accuracy_score, f1_score, jaccard_score, precision_score, recall_score,
    roc_auc_score,
)

from ..config import Config
from ..data import windowing as W
from .base import BaseTask
from .bayesopt import BayesianOptimization
from .postproc import adjust_anomalies, running_mean


class AnomalyDetectionTask(BaseTask):

    def __init__(self, run_id, config, newrun=True):
        self.task_config = config.tasks.anomaly_detection
        assert config.history_len == config.pred_len, \
            "Anomaly detection task requires history_len == pred_len"
        assert self.task_config.get("score_metric", "mse") == "mse"
        super().__init__(run_id, config, newrun)

    def _eval_split(self, pipeline, split):
        results = self.predict(pipeline, split=split)
        anom = self.score_anomalies(results.anomaly_preds, results.anomaly_labels,
                                    scores=results.anomaly_scores)
        recon = self.score(results.recon_preds, results.recon_targets)
        thresholds = {"anomaly_quantile": results.anomaly_quantile,
                      "anomaly_threshold": results.anomaly_threshold}
        scores = anom | recon | thresholds
        scores = {f"{split}/{k}": v for k, v in scores.items()}
        self.log_scores(scores)
        self.logger.log_figure(self.plot_predictions(results), f"{split}/predictions")
        return scores

    def val(self):
        return self._eval_split(self.val_pipeline, "val")

    def test(self):
        return self._eval_split(self.test_pipeline, "test")

    def predict(self, pipeline, split=None):
        dataset = pipeline.dataset
        n_points = self.eval_n_points(dataset, include_history=False)
        n_features = dataset.real_features

        out = self.run_eval(pipeline, extra_keys=("x_enc", "labels", "index"))
        pred = out["pred"].reshape(out["pred"].shape[0], self.config.pred_len, -1)
        target = out["x_enc"].reshape(pred.shape)
        lbl = out["labels"].reshape(out["labels"].shape[0], -1)
        idx = out["index"]

        starts = np.asarray(dataset.x_starts(idx))
        feats = dataset.features(idx) if dataset.univariate else None
        kw = dict(n_points=n_points, n_channels=n_features, features=feats)
        preds = W.stitch_windows(pred[..., 0] if feats is not None else pred,
                                 starts, **kw)
        targets = W.stitch_windows(target[..., 0] if feats is not None else target,
                                   starts, **kw)
        labels = W.stitch_windows(lbl.astype(np.float32), starts, n_points,
                                  fill=-1.0).astype(np.int64)

        preds, targets, labels = self.finalize_series(dataset, preds, targets, labels)
        assert not (labels < 0).any(), "unfilled labels after stitching"

        # per-point anomaly score (anomaly_detection.py:129-136)
        scores = (preds - targets) ** 2
        if self.task_config.normalize_by_feature:
            scores = scores / scores.mean(axis=0, keepdims=True)
        scores = np.nanmean(scores, axis=1)
        window = self.task_config.get("normalize_moving_window", 0)
        if window and window > 0:
            scores = scores / running_mean(scores, int(window))

        # threshold selection (anomaly_detection.py:138-150)
        thr_cfg = self.task_config.threshold
        match thr_cfg, split:
            case ("optimize", _):
                quantile = optimize_threshold(scores, labels)
            case ("optimize-test", "test"):
                quantile = optimize_threshold(scores, labels)
            case (("auto" | "optimize-test"), _):
                quantile = 1 - (labels.sum() / (n_points + self.train_dataset.n_points))
            case (float() | int(), _) if not isinstance(thr_cfg, bool):
                quantile = 1 - float(thr_cfg)
            case _:
                raise ValueError(f"Invalid threshold selection: {thr_cfg}")

        threshold = np.quantile(scores, quantile)
        anomalies = (scores > threshold).astype(np.int64)
        anomalies = adjust_anomalies(anomalies, labels)

        return Config({
            "recon_preds": preds,
            "recon_targets": targets,
            "anomaly_labels": labels,
            "anomaly_scores": scores,
            "anomaly_preds": anomalies,
            "anomaly_quantile": float(quantile),
            "anomaly_threshold": float(threshold),
        })

    def score(self, pred, target):
        err = pred - target
        return {
            "recon_mse": float(np.mean(err ** 2)),
            "recon_mae": float(np.mean(np.abs(err))),
        }

    def score_anomalies(self, pred, target, scores=None):
        # deliberate deviation: the reference feeds the BINARIZED,
        # point-adjusted predictions to roc_auc_score, which collapses
        # AUROC to a rescaled single-threshold accuracy; a ranking metric
        # needs the continuous anomaly scores (available right next to it)
        auroc_input = scores if scores is not None else pred
        return {
            "accuracy": accuracy_score(target, pred),
            "f1": f1_score(target, pred, average="binary", zero_division=0),
            "auroc": (roc_auc_score(target, auroc_input)
                      if len(np.unique(target)) > 1 else 0.5),
            "precision": precision_score(target, pred, average="binary", zero_division=0),
            "recall": recall_score(target, pred, average="binary", zero_division=0),
            "iou": jaccard_score(target, pred, average="binary", zero_division=0),
        }

    def plot_predictions(self, results, xrange=(0, 2000)):
        """Prediction overlay figure (reference uses plotly,
        anomaly_detection.py:194-204; matplotlib here — plotly is absent)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        preds, targets = results["recon_preds"], results["recon_targets"]
        sl = slice(*xrange)
        fig, ax = plt.subplots(figsize=(12, 4))
        xs = np.arange(*xrange)[: len(preds[sl])]
        for i in range(min(preds.shape[-1], 3)):
            ax.plot(xs, targets[sl, i], label=f"target-{i+1}", lw=0.8)
            ax.plot(xs, preds[sl, i], label=f"pred-{i+1}", lw=0.8)
        ax.legend(loc="upper right")
        fig.tight_layout()
        return fig


def optimize_threshold(scores: np.ndarray, labels: np.ndarray) -> float:
    """Bayesian-optimize the score quantile for F1
    (reference anomaly_detection.py:246-260: 10 init + 20 iters, q in
    [0.5, 1.0], random_state 0)."""

    def score_func(q):
        threshold = np.quantile(scores, q)
        anomalies = (scores > threshold).astype(np.int64)
        anomalies = adjust_anomalies(anomalies, labels)
        return f1_score(labels, anomalies, average="binary", zero_division=0)

    opt = BayesianOptimization(f=score_func, pbounds={"q": (0.5, 1.0)},
                               random_state=0, verbose=0)
    opt.maximize(init_points=10, n_iter=20)
    return opt.max["params"]["q"]
