"""Pure synthetic test-fixture family (no reference analog).

Supports every task with small, deterministic data so the full
train/val/test pipeline runs in unit tests without any files. Sizes are
configurable via [datasets.synthetic] {n_points, n_features, n_classes}.
"""

from __future__ import annotations

import numpy as np

from ..base import TimeSeriesDataset
from .. import synthetic as syn


class SyntheticFamily(TimeSeriesDataset):
    supported_tasks = ("forecasting", "reconstruction", "anomaly_detection",
                       "segmentation", "semantic_segmentation", "pretraining",
                       "classification", "imputation")
    description = "A synthetic sinusoid-mixture dataset used for testing."

    def get_data(self, split=None) -> dict:
        split = split or self.split
        return self.generate_synthetic(split)

    @property
    def clip_dataset(self):
        return bool(self.dataset_config.get("clips", False)) and self.task != "forecasting"

    @property
    def n_classes(self):
        if self.task == "semantic_segmentation":
            return int(self.dataset_config.get("n_classes", 2))
        if self.task == "classification":
            if self.task_config.get("window_label", "majority") == "any":
                return 2
            return int(self.dataset_config.get("n_classes", 2))
        return 0

    def generate_synthetic(self, split) -> dict:
        # val and test are DISTINCT series by design (like the ETT-style
        # continuous datasets, where val/test are different ranges —
        # unlike MSL/PSM/ECG whose val and test both read test.csv)
        key = split
        n = int(self.dataset_config.get("n_points", 2048))
        C = int(self.dataset_config.get("n_features", 3))
        rng = syn.rng_for(f"synthetic:{self.name}", key)
        data = syn.sine_mixture(rng, n, C, period_range=(16, 256), noise=0.1)
        out = {"data": data}
        if self.task == "anomaly_detection":
            if split != "train":
                out["data"], out["labels"] = syn.inject_anomalies(rng, data, rate=0.05)
        elif self.task == "segmentation":
            out["labels"] = syn.periodic_boundaries(rng, n, mean_period=100)
        elif self.task in ("semantic_segmentation", "classification"):
            out["labels"] = syn.segment_class_labels(
                rng, n, self.n_classes, mean_seg=64)
        if self.dataset_config.get("clips", False):
            n_clips = int(self.dataset_config.get("n_clips", 4))
            ids = np.repeat(np.arange(n_clips), n // n_clips)
            ids = np.pad(ids, (0, n - len(ids)), constant_values=n_clips - 1)
            out["clip_ids"] = ids
            out["clip_descriptions"] = syn.patient_descriptions(ids)
        return out
