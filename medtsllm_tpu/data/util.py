"""Dataset composition utilities: pretraining mixture.

Reference: datasets/util.py:46-118 (`PretrainingDataset`) — concatenates
several reconstruction datasets with per-dataset random downsampling and
pads/tiles features to a common width.
"""

from __future__ import annotations

import math

import numpy as np


class PretrainingDataset:
    """Mixture over several datasets, each rewired to reconstruction.

    Downsampling uses a seeded permutation per dataset
    (datasets/util.py:64-65); features are tiled/truncated to a common
    n_features (util.py:100-106).
    """

    supported_tasks = ("pretraining",)
    description = "This dataset consists of a mix of different biomedical time series datasets."
    univariate = False
    clip_dataset = False
    task_description = None
    clip_descriptions = None

    def __init__(self, datasets: dict, downsample_pct: float = 1.0,
                 n_features=None, seed: int = 0):
        self.datasets = list(datasets.values())
        self.dataset_names = list(datasets.keys())

        self.config = self.datasets[0].config
        self.split = self.datasets[0].split
        self.task = "pretraining"
        self.name = "pretrain:" + "+".join(self.dataset_names)

        self.task_config = self.config.get("tasks", {}).get(self.task, {})
        self.dataset_config = {}
        self.data_config = self.config.data

        rng = np.random.default_rng(seed)
        self.dataset_inds = [
            rng.permutation(len(ds))[:max(1, int(downsample_pct * len(ds)))]
            for ds in self.datasets]

        self.lens = [len(inds) for inds in self.dataset_inds]
        self.cumsums = np.concatenate([[0], np.cumsum(self.lens)])

        if n_features is None or n_features == "auto":
            n_features = max(ds.n_features for ds in self.datasets)
        self._n_features = int(n_features)

        self.pred_len = self.datasets[0].pred_len
        self.history_len = self.datasets[0].history_len
        self.step_size = self.datasets[0].step_size
        self.n_points = int(sum(self.step_size * l for l in self.lens))

    @property
    def n_features(self):
        return self._n_features

    @property
    def real_features(self):
        return self._n_features

    @property
    def n_classes(self):
        return 0

    def __len__(self):
        return int(sum(self.lens))

    def _locate(self, index: int):
        d = int(np.searchsorted(self.cumsums, index, side="right")) - 1
        local = index - int(self.cumsums[d])
        return d, int(self.dataset_inds[d][local])

    def adjust_n_features(self, x: np.ndarray) -> np.ndarray:
        if x.shape[1] < self._n_features:
            repeats = math.ceil(self._n_features / x.shape[1])
            x = np.tile(x, (1, repeats))
        return x[:, :self._n_features]

    def __getitem__(self, index: int) -> dict:
        d, local = self._locate(index)
        item = self.datasets[d][local]
        # per-clip descriptions exist only for some member datasets; a
        # mixed batch cannot collate heterogeneous keys (the reference's
        # default_collate has the same constraint), so the mixture exposes
        # only the per-dataset description
        item.pop("descriptions", None)
        item["x_enc"] = self.adjust_n_features(item["x_enc"])
        if "y" in item:
            item["y"] = self.adjust_n_features(item["y"])
        item["dataset"] = self.dataset_names[d]
        item["dataset_description"] = self.datasets[d].description
        return item

    def inverse_index(self, idx: int):
        """Mixture windows are laid out contiguously for stitching
        (datasets/util.py:115-118)."""
        s = idx * self.step_size
        return (s, s + self.pred_len)

    def x_starts(self, idx):
        return np.asarray(idx) * self.step_size
