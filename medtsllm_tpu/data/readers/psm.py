"""PSM (Pooled Server Metrics, eBay) family.

Reference: datasets/psm.py — train/test CSVs with a dropped timestamp column
and nan_to_num; anomaly labels exist only for the non-train split
(psm.py:38-44). val and test both read test.csv.
"""

from __future__ import annotations

import numpy as np

from ..base import TimeSeriesDataset
from .. import synthetic as syn


class PSMFamily(TimeSeriesDataset):
    supported_tasks = ("forecasting", "reconstruction", "anomaly_detection",
                       "imputation")
    description = ("The PSM dataset is proposed by eBay and consists of 26 "
                   "dimensional data captured internally from application server "
                   "nodes. The dataset is used to predict the number of sessions "
                   "in the next 10 minutes based on the current and historical data.")

    N_FEATURES = 25

    def get_data(self, split=None) -> dict:
        split = split or self.split
        base = self.data_root() / "psm"
        fn = "train.csv" if split == "train" else "test.csv"
        if (base / fn).exists():
            import pandas as pd
            df = pd.read_csv(base / fn).drop(columns=["timestamp_(min)"])
            data = np.nan_to_num(df.values)
            labels = None
            if self.task == "anomaly_detection" and self.split != "train":
                ldf = pd.read_csv(base / "test_label.csv")
                labels = ldf.drop(columns=["timestamp_(min)"]).values[:, 0].astype(int)
            return {"data": data, "labels": labels}
        return self.synthetic_fallback(split)

    def generate_synthetic(self, split) -> dict:
        key = "train" if split == "train" else "test"
        rng = syn.rng_for("psm", key)
        n = 16000 if key == "train" else 8000
        data = syn.sine_mixture(rng, n, self.N_FEATURES, noise=0.3)
        labels = None
        # inject only for anomaly detection (see msl.py)
        if key != "train" and self.task == "anomaly_detection":
            data, labels = syn.inject_anomalies(rng, data, rate=0.03)
        if self.split == "train":
            labels = None
        return {"data": data, "labels": labels}
