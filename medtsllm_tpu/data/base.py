"""Host-side dataset framework.

Rebuilds the reference dataset hierarchy (datasets/base.py) as one
numpy-backed class parameterized by task, with windowing delegated to the
pure index math in `windowing.py`. Emits fixed-shape numpy windows; the
batch pipeline (pipeline.py) turns them into fixed-shape device batches.
"""

from __future__ import annotations

import warnings
from pathlib import Path

import numpy as np

from . import windowing as W


class StandardScaler:
    """Per-feature z-score, fit on the train split only
    (reference datasets/base.py:82-90 uses sklearn's StandardScaler)."""

    def __init__(self):
        self.mean = None
        self.std = None

    def fit(self, x: np.ndarray) -> "StandardScaler":
        self.mean = np.mean(x, axis=0)
        self.std = np.std(x, axis=0)  # ddof=0, like sklearn
        self.std = np.where(self.std == 0.0, 1.0, self.std)
        return self

    def transform(self, x: np.ndarray) -> np.ndarray:
        return (x - self.mean) / self.std

    def inverse_transform(self, x: np.ndarray) -> np.ndarray:
        return x * self.std + self.mean


class TimeSeriesDataset:
    """One windowed time-series dataset for one (task, split).

    Subclasses (the dataset families in readers/) implement `get_data(split)`
    returning a dict with keys:
      data [n, C] float, labels? [n], timestamps? [n], clip_ids? [n],
      clip_descriptions? {clip_id: str}

    Class attributes:
      supported_tasks: tasks this family supports
      clip_tasks: subset of tasks that use clip-aware windowing
      description: dataset text description (used in LLM prompts)
      task_description: optional per-dataset task prompt override
    """

    supported_tasks: tuple = ()
    clip_tasks: tuple = ()
    description: str = ""
    task_description: str | None = None

    univariate = False
    data = None
    labels = None
    timestamps = None
    clip_ids = None
    clip_descriptions = None
    normalizer = None

    def __init__(self, config, split):
        self.config = config
        self.split = split
        self.task = config.task
        self.name = config.data.dataset

        self.task_config = config.get("tasks", {}).get(self.task, {})
        self.dataset_config = config.get("datasets", {}).get(self.name, {})
        self.data_config = config.data

        self.history_len = config.history_len
        self.pred_len = config.pred_len
        self.step_size = config.data.step
        if self.split == "test":
            # non-overlapping windows at test time (datasets/base.py:41-42)
            self.step_size = self.pred_len

        assert config.data.cols == "all"
        if self.task not in self.supported_tasks:
            raise ValueError(f"task {self.task} not supported by dataset {self.name}")

        self.load_data()
        self.build_windows()
        if self.task == "segmentation":
            self.convert_labels()

    # -- data loading ----------------------------------------------------

    def get_data(self, split=None) -> dict:
        raise NotImplementedError

    def load_data(self):
        got = self.get_data()
        self.data = np.asarray(got["data"], dtype=np.float64)
        self.data = self.normalize(self.data).astype(np.float32)
        if got.get("labels") is not None:
            labels = np.asarray(got["labels"])
            n_labels = len(np.unique(labels))
            self.labels = labels.astype(np.int64 if n_labels > 2 else np.int32)
        if got.get("timestamps") is not None:
            self.timestamps = np.asarray(got["timestamps"], dtype=np.float64)
        if got.get("clip_ids") is not None:
            self.clip_ids = np.asarray(got["clip_ids"], dtype=np.int32)
        if got.get("clip_descriptions") is not None:
            self.clip_descriptions = got["clip_descriptions"]

    def normalize(self, data: np.ndarray) -> np.ndarray:
        if not self.config.data.normalize:
            return data
        if self.normalizer is None:
            train = data if self.split == "train" else np.asarray(
                self.get_data("train")["data"], dtype=np.float64)
            self.normalizer = StandardScaler().fit(train)
        return self.normalizer.transform(data)

    def denormalize(self, data: np.ndarray) -> np.ndarray:
        return self.normalizer.inverse_transform(data)

    # -- windowing --------------------------------------------------------

    def build_windows(self):
        if self.task == "forecasting":
            if self.clip_dataset:
                raise ValueError("clip datasets do not support forecasting")
            self.windows = W.ForecastWindows(
                self.n_points, self.history_len, self.pred_len, self.step_size)
        elif self.clip_dataset:
            assert self.clip_ids is not None
            self.windows = W.ClipWindows(self.clip_ids, self.pred_len, self.step_size)
        else:
            assert self.pred_len == self.history_len, \
                f"{self.task} requires history_len == pred_len"
            self.windows = W.AlignedWindows(self.n_points, self.pred_len, self.step_size)

    @property
    def clip_dataset(self) -> bool:
        return self.task in self.clip_tasks

    @property
    def mask(self) -> np.ndarray:
        return self.windows.mask

    def convert_labels(self):
        mode = self.task_config.mode
        if mode == "steps-to-boundary":
            self.labels = W.steps_to_boundary_labels(self.labels)
        elif mode == "boundary-prediction":
            pass
        else:
            raise ValueError(f"Segmentation mode {mode} not supported")

    # -- item access -------------------------------------------------------

    def __len__(self) -> int:
        return len(self.windows)

    def inverse_index(self, idx: int):
        return self.windows.inverse_index(idx)

    def x_starts(self, idx) -> np.ndarray:
        """Vectorized window start positions (input range)."""
        return self.windows.x_starts(idx)

    def __getitem__(self, idx: int) -> dict:
        out = {}
        if self.task == "forecasting":
            x_range, y_range = self.windows.inverse_index(idx)
            out["x_enc"] = self.data[slice(*x_range)]
            out["y"] = self.data[slice(*y_range)]
        else:
            x_range = self.windows.inverse_index(idx)
            out["x_enc"] = self.data[slice(*x_range)]
            if self.task in ("anomaly_detection",) and self.labels is not None:
                out["labels"] = self.labels[slice(*x_range)]
            elif self.task in ("semantic_segmentation", "segmentation"):
                out["labels"] = self.labels[slice(*x_range)]
            elif self.task == "classification":
                out["labels"] = self.window_label(x_range)
        if self.clip_descriptions is not None:
            clip_id = int(self.clip_ids[x_range[0]])
            out["descriptions"] = self.clip_descriptions[clip_id]
        return out

    # -- properties ---------------------------------------------------------

    @property
    def n_points(self) -> int:
        return self.data.shape[0]

    @property
    def n_features(self) -> int:
        return self.data.shape[1]

    @property
    def real_features(self) -> int:
        return self.n_features

    def window_label(self, x_range) -> np.int64:
        """Per-window class label for the classification task.

        The reference defines no classification trainer (its models only
        expose classification heads, e.g. dlinear.py:86), so the window ->
        label rule is defined here: derived from the per-timestep labels by
        `tasks.classification.window_label`:
          - "majority" (default): most frequent label in the window
            (ties break to the lowest class id, deterministically);
          - "last": label at the final timestep (streaming-style);
          - "any": 1 if any timestep is nonzero, else 0 (binary presence,
            e.g. artifact detection).
        """
        seg = np.asarray(self.labels[slice(*x_range)])
        mode = self.task_config.get("window_label", "majority")
        if mode == "majority":
            return np.int64(np.bincount(seg).argmax())
        if mode == "last":
            return np.int64(seg[-1])
        if mode == "any":
            return np.int64((seg != 0).any())
        raise ValueError(f"Unknown classification window_label {mode!r}")

    @property
    def n_classes(self) -> int:
        if self.task == "semantic_segmentation":
            return len(np.unique(self.labels))
        if self.task == "classification":
            if self.task_config.get("window_label", "majority") == "any":
                return 2
            # max+1, not len(unique): non-contiguous label ids must still
            # map inside the head, and a split missing a class must not
            # shrink it (readers with a fixed class set should override)
            return int(np.max(self.labels)) + 1
        return 0

    # -- synthetic fallback --------------------------------------------------

    def data_root(self) -> Path:
        root = self.config.get("paths", {}).get("data")
        if root:
            return Path(root)
        return Path.cwd() / "data"

    def allow_synthetic(self) -> bool:
        return bool(self.data_config.get("allow_synthetic", True))

    def synthetic_fallback(self, split, exc=None) -> dict:
        """Used by readers when the real files are absent: generate a
        deterministic synthetic stand-in with the family's shape/semantics
        so the full pipeline runs without downloads."""
        if not self.allow_synthetic():
            raise FileNotFoundError(
                f"dataset {self.name} files not found under {self.data_root()} "
                f"and data.allow_synthetic is false") from exc
        warnings.warn(
            f"dataset {self.name}: real files not found under {self.data_root()}; "
            f"using synthetic fixture for split={split}")
        return self.generate_synthetic(split)

    def generate_synthetic(self, split) -> dict:
        raise NotImplementedError(
            f"{type(self).__name__} has no synthetic generator")


class Multi2UniDataset:
    """Univariate view over a multivariate dataset (datasets/util.py:10-43).

    len = len(base) * C; flat index w*C + f selects window w, feature f.
    """

    univariate = True

    def __init__(self, base: TimeSeriesDataset):
        self.base = base
        self.windows = W.UnivariateWindows(base.windows, base.n_features)
        # plumb through commonly used attributes
        for attr in ("config", "split", "task", "name", "task_config",
                     "dataset_config", "data_config", "history_len",
                     "pred_len", "step_size", "description",
                     "task_description", "labels", "clip_descriptions",
                     "clip_ids", "data", "normalizer"):
            setattr(self, attr, getattr(base, attr, None))

    def __len__(self):
        return len(self.base) * self.base.n_features

    @property
    def n_features(self):
        return 1

    @property
    def real_features(self):
        return self.base.n_features

    @property
    def n_points(self):
        return self.base.n_points

    @property
    def n_classes(self):
        return self.base.n_classes

    @property
    def clip_dataset(self):
        return self.base.clip_dataset

    @property
    def mask(self):
        return self.base.mask

    def inverse_index(self, idx: int):
        C = self.base.n_features
        return self.base.inverse_index(idx // C), idx % C

    def x_starts(self, idx):
        return self.windows.x_starts(idx)

    def features(self, idx):
        return self.windows.features(idx)

    def __getitem__(self, idx: int) -> dict:
        C = self.base.n_features
        item = self.base[idx // C]
        f = idx % C
        item["x_enc"] = item["x_enc"][:, f:f + 1]
        if "y" in item:
            item["y"] = item["y"][:, f:f + 1]
        return item
