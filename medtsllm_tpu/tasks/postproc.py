"""Host-side eval post-processing (SURVEY.md §2.8).

These run on gathered numpy arrays after the compiled eval step; they are
inherently sequential/host-bound (find_peaks, Bayesian optimization) and
deliberately stay off the device path.
"""

from __future__ import annotations

import numpy as np


def adjust_anomalies(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Point-adjust evaluation (reference tasks/anomaly_detection.py:207-237):
    any ground-truth anomaly segment containing at least one predicted point
    is marked fully predicted.

    Uses the native C++ kernel when available; the numpy path below is an
    exact vectorized equivalent of the reference loop — including its
    index-0 quirk: the backward fill `for j in range(i, 0, -1)` never
    visits index 0, so a GT segment starting at 0 keeps pred[0] as-is.
    """
    from ..native import adjust_anomalies_native
    pred = np.asarray(pred).astype(np.int32)
    gt = np.asarray(gt).astype(np.int32)
    out = adjust_anomalies_native(pred, gt)
    if out is not None:
        return out.astype(np.int64)

    g = gt.astype(bool)
    rising = np.flatnonzero(np.diff(np.concatenate([[0], g.view(np.int8)])) == 1)
    seg_id = np.cumsum(np.concatenate([[0], np.diff(g.astype(np.int8)) == 1]))
    hit = (pred.astype(bool)) & g
    if len(rising) == 0:
        return pred.astype(np.int64)
    seg_hit = np.zeros(seg_id.max() + 1, dtype=bool)
    np.maximum.at(seg_hit, seg_id[hit], True)
    filled = g & seg_hit[seg_id]
    adj = pred.astype(bool) | filled
    if g[0]:
        adj[0] = bool(pred[0])  # the reference never back-fills index 0
    return adj.astype(np.int64)


def running_mean(xs: np.ndarray, window_size: int) -> np.ndarray:
    """'same'-padded moving average (reference anomaly_detection.py:239-244;
    window forced odd)."""
    if window_size % 2 == 0:
        window_size += 1
    kernel = np.ones(window_size) / window_size
    pad = window_size // 2
    xp = np.pad(xs, pad, mode="constant")
    return np.convolve(xp, kernel, mode="valid")


def all_pairs_iou(segments1: np.ndarray, segments2: np.ndarray) -> np.ndarray:
    """Vectorized IoU between every pair of [start, end) segments
    (reference tasks/segmentation.py:263-275)."""
    s1, e1 = segments1[:, 0:1], segments1[:, 1:2]  # [n1, 1]
    s2, e2 = segments2[None, :, 0], segments2[None, :, 1]  # [1, n2]
    inter = np.maximum(np.minimum(e1, e2) - np.maximum(s1, s2), 0)
    union = (e1 - s1) + (e2 - s2) - inter
    return inter / union


def points_to_segments(points: np.ndarray, n: int) -> np.ndarray:
    """Boundary points -> consecutive [start, end) segments including the
    series edges (reference segmentation.py:142-146)."""
    pts = np.concatenate([[0], np.asarray(points, dtype=np.int64).ravel(), [n - 1]])
    return np.stack([pts[:-1], pts[1:]], axis=1)


def smooth_scores(pred_scores: np.ndarray, smoothing_window: int = 25,
                  smoothing_method: str = "mean") -> np.ndarray:
    """Replicate-padded sliding mean/max (reference segmentation.py:241-253)."""
    if smoothing_method not in ("mean", "max"):
        return pred_scores
    import math
    lpad = math.floor((smoothing_window - 1) / 2)
    rpad = math.ceil((smoothing_window - 1) / 2)
    xp = np.pad(pred_scores, (lpad, rpad), mode="edge")
    win = np.lib.stride_tricks.sliding_window_view(xp, smoothing_window)
    return win.mean(axis=-1) if smoothing_method == "mean" else win.max(axis=-1)


def find_peaks_threshold(pred_scores: np.ndarray, quantile: float = 0.5) -> np.ndarray:
    """Quantile-threshold peak centers (reference segmentation.py:255-261)."""
    thresh = np.quantile(pred_scores, quantile)
    above = (pred_scores > thresh).astype(np.int64)
    edges = np.flatnonzero(np.diff(above))
    edges = edges[: (len(edges) // 2) * 2].reshape(-1, 2)
    return edges.mean(axis=1).astype(np.int64)
