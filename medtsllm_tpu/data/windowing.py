"""Sliding-window index math as pure vectorized functions.

Re-derives the windowing semantics of reference datasets/base.py:116-335
(Forecast/Reconstruction/AnomalyDetection/Segmentation windowing + the
clip-aware variant) as stateless numpy index computations. Every function
is vectorized over window indices, so eval-time stitching is a single
scatter instead of the reference's per-sample Python loop
(tasks/forecasting.py:72-78).
"""

from __future__ import annotations

import numpy as np


class ForecastWindows:
    """Windows for forecasting: x = [i, i+hist), y = [i+hist, i+hist+pred).

    len = (n - hist - pred + 1) // step   (datasets/base.py:135-136)
    """

    def __init__(self, n_points: int, history_len: int, pred_len: int, step: int):
        self.n_points = n_points
        self.history_len = history_len
        self.pred_len = pred_len
        self.step = step
        self._len = max(0, (n_points - history_len - pred_len + 1) // step)

    def __len__(self) -> int:
        return self._len

    def x_starts(self, idx) -> np.ndarray:
        return np.asarray(idx) * self.step

    def y_starts(self, idx) -> np.ndarray:
        return self.x_starts(idx) + self.history_len

    def inverse_index(self, idx: int):
        """Reference-compatible single-index form (datasets/base.py:138-142)."""
        s = int(idx) * self.step
        return (s, s + self.history_len), (s + self.history_len, s + self.history_len + self.pred_len)


class AlignedWindows:
    """Windows where input and target cover the same range [i, i+pred).

    Used by reconstruction / anomaly detection / both segmentation tasks.
    len = (n - pred) // step + 1   (datasets/base.py:164-165)
    """

    def __init__(self, n_points: int, pred_len: int, step: int):
        self.n_points = n_points
        self.pred_len = pred_len
        self.step = step
        self._len = max(0, (n_points - pred_len) // step + 1)

    def __len__(self) -> int:
        return self._len

    def x_starts(self, idx) -> np.ndarray:
        return np.asarray(idx) * self.step

    def inverse_index(self, idx: int):
        s = int(idx) * self.step
        return (s, s + self.pred_len)


class ClipWindows:
    """Windows that never cross clip boundaries (datasets/base.py:284-335).

    `clip_ids` must be sorted non-decreasing. Exposes:
      - per-clip window counts and a cumsum index for global->local mapping,
      - `mask`: the boolean per-point mask marking points covered by
        exactly the evaluated portion of each window (base.py:310-318),
      - vectorized `x_starts` over arbitrary index arrays.
    """

    def __init__(self, clip_ids: np.ndarray, pred_len: int, step: int):
        clip_ids = np.asarray(clip_ids)
        if not (np.diff(clip_ids) >= 0).all():
            raise ValueError("clip_ids must be non-decreasing")

        self.pred_len = pred_len
        self.step = step
        self.n_points = len(clip_ids)

        # unique_consecutive equivalent
        change = np.flatnonzero(np.diff(clip_ids)) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(clip_ids)]])
        self.clip_lens = ends - starts
        self.clip_starts = starts  # == clip_lens_cumsum[:-1]

        self.clip_segs = (self.clip_lens - pred_len) // step + 1
        if (self.clip_segs < 1).any():
            raise ValueError(
                f"clip shorter than window: min clip len {self.clip_lens.min()} "
                f"< pred_len {pred_len}")
        self.clip_segs_cumsum = np.concatenate([[0], np.cumsum(self.clip_segs)])
        self._len = int(self.clip_segs_cumsum[-1])

        # per-point evaluated mask (base.py:310-318): within the covered span
        # of each clip, a point is evaluated iff (t % step) // pred == 0;
        # trailing remainder points are never evaluated.
        clip_pts = (self.clip_segs - 1) * step + pred_len
        remainder = self.clip_lens - clip_pts
        assert (remainder >= 0).all()
        proto = ((np.arange(int(clip_pts.max())) % step) // pred_len) == 0
        mask_parts = []
        for cp, rem in zip(clip_pts, remainder):
            mask_parts.append(proto[:cp])
            mask_parts.append(np.zeros(rem, dtype=bool))
        self.mask = np.concatenate(mask_parts)
        assert len(self.mask) == self.n_points

    def __len__(self) -> int:
        return self._len

    def x_starts(self, idx) -> np.ndarray:
        idx = np.asarray(idx)
        clip_idx = np.searchsorted(self.clip_segs_cumsum, idx, side="right") - 1
        local = idx - self.clip_segs_cumsum[clip_idx]
        return self.clip_starts[clip_idx] + local * self.step

    def inverse_index(self, idx: int):
        s = int(self.x_starts(int(idx)))
        return (s, s + self.pred_len)


class UnivariateWindows:
    """multi_2_uni wrapper (datasets/util.py:10-43): a C-feature dataset
    becomes C x len(base) univariate examples; window w of feature f has
    flat index w * C + f. inverse_index returns (time_range, feature)."""

    def __init__(self, base, n_features: int):
        self.base = base
        self.n_features = n_features
        self.pred_len = base.pred_len
        self.step = base.step
        self.n_points = base.n_points

    def __len__(self) -> int:
        return len(self.base) * self.n_features

    def split_index(self, idx):
        idx = np.asarray(idx)
        return idx // self.n_features, idx % self.n_features

    def x_starts(self, idx):
        w, _ = self.split_index(idx)
        return self.base.x_starts(w)

    def features(self, idx):
        return np.asarray(idx) % self.n_features

    def inverse_index(self, idx: int):
        w, f = int(idx) // self.n_features, int(idx) % self.n_features
        return self.base.inverse_index(w), int(f)

    @property
    def mask(self):
        return self.base.mask


def steps_to_boundary_labels(labels_binary: np.ndarray) -> np.ndarray:
    """Convert boundary indicators to normalized distance-to-next-boundary.

    Vectorized equivalent of the reference per-point loop
    (datasets/base.py:265-281): for each position i, with cp = the first
    changepoint >= i (the end of the sequence counts as a final
    changepoint) and seg_len = distance from the previous changepoint
    (sequence start for the first segment):  label[i] = (cp - i) / seg_len.
    """
    labels_binary = np.asarray(labels_binary)
    n = len(labels_binary)
    changepts = np.flatnonzero(labels_binary)
    changepts = np.append(changepts, n)

    # For position i the active changepoint is the first cp >= i, except that
    # position i == cp still belongs to the segment ending at cp (label 0).
    seg_idx = np.searchsorted(changepts, np.arange(n), side="left")
    cp = changepts[seg_idx]
    prev_cp = np.where(seg_idx > 0, changepts[np.maximum(seg_idx - 1, 0)], 0)
    seg_len = (cp - prev_cp).astype(np.float32)
    out = (cp - np.arange(n)) / seg_len
    return out.astype(np.float32)


def stitch_windows(
    values: np.ndarray,
    starts: np.ndarray,
    n_points: int,
    n_channels: int | None = None,
    features: np.ndarray | None = None,
    fill=np.nan,
    dtype=np.float32,
) -> np.ndarray:
    """Scatter per-window predictions back into one continuous series.

    Vectorized replacement for the reference per-sample stitching loop
    (tasks/forecasting.py:72-78): windows are written in index order, so
    later (higher-index) windows overwrite earlier ones on overlap, which
    matches sequential loop semantics.

    values: [n_windows, window_len] or [n_windows, window_len, C]
    starts: [n_windows] start positions
    features: optional [n_windows] feature column per window (univariate mode)
    """
    starts = np.asarray(starts)
    n_windows = len(starts)
    if n_windows == 0:
        shape = (n_points,) if n_channels is None else (n_points, n_channels)
        return np.full(shape, fill, dtype=dtype)
    window_len = values.shape[1]
    time_idx = starts[:, None] + np.arange(window_len)[None, :]  # [W, L]

    if n_channels is None:
        out = np.full((n_points,), fill, dtype=dtype)
        out[time_idx.ravel()] = values.reshape(n_windows * window_len)
    elif features is not None:
        out = np.full((n_points, n_channels), fill, dtype=dtype)
        feat_idx = np.broadcast_to(np.asarray(features)[:, None], time_idx.shape)
        out[time_idx.ravel(), feat_idx.ravel()] = values.reshape(-1)
    else:
        out = np.full((n_points, n_channels), fill, dtype=dtype)
        out[time_idx.ravel()] = values.reshape(n_windows * window_len, -1)
    return out


def dedup_eval_series(arr: np.ndarray, step: int, pred_len: int) -> np.ndarray:
    """step_size > pred_len de-duplication (tasks/anomaly_detection.py:115-123):
    cut to a multiple of step, then keep the first pred_len points of every
    step-sized block."""
    n = arr.shape[0]
    cutoff = n - (n % step)
    arr = arr[:cutoff]
    blocks = arr.reshape(-1, step, *arr.shape[1:])
    return blocks[:, :pred_len].reshape(-1, *arr.shape[1:])
