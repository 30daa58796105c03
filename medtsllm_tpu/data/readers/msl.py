"""MSL (Mars Science Laboratory rover, NASA) family.

Reference: datasets/msl.py — .npy train/test arrays; anomaly labels from
MSL_test_label.npy on non-train splits (msl.py:30-41).
"""

from __future__ import annotations

import numpy as np

from ..base import TimeSeriesDataset
from .. import synthetic as syn


class MSLFamily(TimeSeriesDataset):
    supported_tasks = ("forecasting", "reconstruction", "anomaly_detection",
                       "imputation")
    description = ("The MSL (Mars Science Laboratory rover) dataset was created "
                   "by NASA and consists of telemetry data across 55 sensors on "
                   "the rover. The data is collected at 1 minute intervals and "
                   "spans a period of 78 Martian days. The dataset is labeled "
                   "with 143 anomalous intervals, each of which is labeled by an "
                   "expert as an incident, surprise, or an anomaly.")

    N_FEATURES = 55

    def get_data(self, split=None) -> dict:
        split = split or self.split
        base = self.data_root() / "msl"
        fn = "MSL_train.npy" if split == "train" else "MSL_test.npy"
        if (base / fn).exists():
            data = np.load(base / fn)
            labels = None
            if self.task == "anomaly_detection" and self.split != "train":
                labels = np.load(base / "MSL_test_label.npy").astype(int)
            return {"data": data, "labels": labels}
        return self.synthetic_fallback(split)

    def generate_synthetic(self, split) -> dict:
        key = "train" if split == "train" else "test"
        rng = syn.rng_for("msl", key)
        n = 12000 if key == "train" else 6000
        data = syn.sine_mixture(rng, n, self.N_FEATURES, noise=0.25)
        labels = None
        # inject only for anomaly detection (like dreams/synthetic):
        # forecasting/reconstruction/imputation eval must not run on an
        # anomaly-corrupted series drawn from a different distribution
        if key != "train" and self.task == "anomaly_detection":
            data, labels = syn.inject_anomalies(rng, data, rate=0.05,
                                                max_len=80)
        if self.split == "train":
            labels = None
        return {"data": data, "labels": labels}
