"""Boundary segmentation task (reference tasks/segmentation.py).

Two modes: boundary-prediction (BCE on boundary indicators) and
steps-to-boundary (regress normalized distance). Post-processing via
scipy.signal.find_peaks with an auto / optimized / fixed distance
threshold; metrics: point MAE/RMSE/acc@d, segment mIoU / acc@iou.
"""

from __future__ import annotations

import numpy as np
import scipy.signal

from ..data import windowing as W
from .base import BaseTask
from .bayesopt import BayesianOptimization
from .postproc import all_pairs_iou, points_to_segments


class SegmentationTask(BaseTask):

    def __init__(self, run_id, config, newrun=True):
        self.segmentation_mode = config.tasks.segmentation.mode
        super().__init__(run_id, config, newrun)

    def _eval_split(self, pipeline, split: str):
        results = self.predict(pipeline)
        scores = {f"{split}/{k}": v for k, v in self.score(results).items()}
        self.log_scores(scores)
        return scores

    def val(self):
        return self._eval_split(self.val_pipeline, "val")

    def test(self):
        return self._eval_split(self.test_pipeline, "test")

    def predict(self, pipeline):
        dataset = pipeline.dataset
        n_points = self.eval_n_points(dataset, include_history=False)

        out = self.run_eval(pipeline, extra_keys=("labels", "index"))
        pred = out["pred"].reshape(out["pred"].shape[0], -1)
        lbl = out["labels"].reshape(pred.shape)
        starts = np.asarray(dataset.x_starts(out["index"]))

        preds = W.stitch_windows(pred, starts, n_points)
        int_targets = self.segmentation_mode == "boundary-prediction"
        targets = W.stitch_windows(lbl.astype(np.float32), starts, n_points,
                                   fill=-1.0)
        preds, targets = self.finalize_series(dataset, preds, targets)
        assert not (targets < 0).any(), "unfilled labels after stitching"
        if int_targets:
            targets = targets.astype(np.int64)

        if self.segmentation_mode == "boundary-prediction":
            return self.process_preds_boundary_prediction(preds, targets)
        elif self.segmentation_mode == "steps-to-boundary":
            return self.process_preds_steps_to_boundary(preds, targets)
        raise ValueError(f"Segmentation mode {self.segmentation_mode} not supported")

    def process_preds_boundary_prediction(self, preds, targets):
        """find_peaks with a min-distance threshold (segmentation.py:118-156)."""
        pred_scores = preds.copy()
        thr_cfg = self.config.tasks.segmentation.distance_thresh
        if thr_cfg == "auto":
            # 10th percentile of true segment lengths (segmentation.py:126-127)
            pts = np.flatnonzero(targets)
            seg_lens = np.diff(pts)
            if len(seg_lens) == 0:  # <2 true boundaries in this split
                distance_thresh = 1.0
            else:
                distance_thresh = float(
                    np.quantile(seg_lens.astype(np.float64), 0.1))
        elif thr_cfg == "optimize":
            est = targets.shape[0] / max(targets.sum(), 1)
            distance_thresh = optimize_threshold(pred_scores, targets, est)
        else:
            distance_thresh = float(thr_cfg)

        distance_thresh = max(distance_thresh, 1.0)
        pred_points = scipy.signal.find_peaks(pred_scores, distance=distance_thresh)[0]
        return self._package(pred_scores, preds, targets, pred_points)

    def process_preds_steps_to_boundary(self, preds, targets):
        """Peak/trough pairing of the sawtooth regression output
        (segmentation.py:158-194)."""
        pred_scores = preds.copy()
        targets = (targets == 0).astype(np.int64)
        threshold_est = targets.shape[0] / max(targets.sum(), 1)

        pts_max = scipy.signal.find_peaks(pred_scores, prominence=0.5)[0]
        pts_min = scipy.signal.find_peaks(-pred_scores, prominence=0.5)[0]
        pts_a, pts_b = ((pts_max, pts_min) if len(pts_max) >= len(pts_min)
                        else (pts_min, pts_max))

        if len(pts_b) > 0 and len(pts_a) > 0:
            # for each a-point, snap to nearest b-point if closer than est/2
            dists = np.abs(pts_b[None, :] - pts_a[:, None])
            closest = dists.argmin(axis=1)
            snap = dists[np.arange(len(pts_a)), closest] <= threshold_est / 2
            pred_points = np.where(snap, pts_b[closest], pts_a)
        else:
            pred_points = pts_a
        return self._package(pred_scores, preds, targets, pred_points)

    def _package(self, pred_scores, preds, targets, pred_points):
        pred_points = np.asarray(pred_points, dtype=np.int64)
        pred_labels = np.zeros_like(targets)
        pred_labels[pred_points] = 1
        label_points = np.flatnonzero(targets)
        n = len(pred_scores)
        return {
            "preds_raw": preds,
            "pred_points": pred_points,
            "pred_labels": pred_labels,
            "pred_segments": points_to_segments(pred_points, n),
            "labels": targets,
            "label_points": label_points,
            "label_segments": points_to_segments(label_points, n),
        }

    def score(self, results):
        pred_points = results["pred_points"]
        target_points = results["label_points"]
        if len(pred_points) == 0 or len(target_points) == 0:
            # degenerate split/epoch (flat predictions or no true
            # boundaries): return the FULL metric key set with worst-case
            # values so eval_metric lookups and loggers see a stable
            # schema every epoch
            worst = {"point_mae": float("inf"), "point_rmse": float("inf"),
                     "segment_miou": 0.0, "pred_label_ratio": 0.0}
            for thresh in (50, 100, 200):
                worst[f"point_acc@{thresh}"] = 0.0
            for thresh in (0.5, 0.75, 0.9):
                worst[f"segment_acc@{int(thresh*100)}iou"] = 0.0
            return worst

        point_dists = np.abs(pred_points.reshape(-1, 1) - target_points)
        segment_dists = all_pairs_iou(results["pred_segments"],
                                      results["label_segments"])

        metrics = {
            "point_mae": float(point_dists.min(axis=0).mean()),
            "point_rmse": float(np.sqrt((point_dists.astype(np.float64) ** 2)
                                        .min(axis=0).mean())),
            "segment_miou": float(segment_dists.max(axis=0).mean()),
            "pred_label_ratio": float(results["pred_labels"].sum()
                                      / max(results["labels"].sum(), 1)),
        }
        for thresh in (50, 100, 200):
            metrics[f"point_acc@{thresh}"] = float(
                (point_dists < thresh).any(axis=0).mean())
        for thresh in (0.5, 0.75, 0.9):
            metrics[f"segment_acc@{int(thresh*100)}iou"] = float(
                (segment_dists > thresh).any(axis=0).mean())
        return metrics


def optimize_threshold(pred_scores: np.ndarray, targets: np.ndarray,
                       est: float) -> float:
    """Bayesian-optimize the find_peaks distance for segment mIoU
    (reference segmentation.py:294-323: bounds [0.5est, 1.25est],
    5 init + 10 iters)."""
    target_points = np.flatnonzero(targets)
    target_segments = points_to_segments(target_points, len(pred_scores))

    def score_fn(thresh):
        pred_points = scipy.signal.find_peaks(pred_scores,
                                              distance=max(thresh, 1.0))[0]
        pred_segments = points_to_segments(pred_points, len(pred_scores))
        return float(all_pairs_iou(pred_segments, target_segments)
                     .max(axis=0).mean())

    opt = BayesianOptimization(f=score_fn,
                               pbounds={"thresh": (0.5 * est, 1.25 * est)},
                               random_state=0, verbose=0,
                               allow_duplicate_points=True)
    opt.maximize(init_points=5, n_iter=10)
    return opt.max["params"]["thresh"]
