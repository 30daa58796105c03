"""BIDMC family: ECG/PPG/respiration with annotated breath boundaries.

Reference: datasets/bidmc.py — train/test CSV with Time/patient_id/label
columns; segmentation labels are breath-boundary indicators.
"""

from __future__ import annotations

import numpy as np

from ..base import TimeSeriesDataset
from .. import synthetic as syn


class BIDMCFamily(TimeSeriesDataset):
    supported_tasks = ("forecasting", "reconstruction", "segmentation")
    description = ("The BIDMC dataset is a dataset of electrocardiogram (ECG), "
                   "pulse oximetry (photoplethysmogram, PPG) and impedance "
                   "pneumography respiratory signals acquired from intensive "
                   "care patients. Two annotators manually annotated individual "
                   "breaths in each recording using the impedance respiratory "
                   "signal.")

    N_FEATURES = 3  # ECG, PPG, RESP

    def get_data(self, split=None) -> dict:
        split = split or self.split
        base = self.data_root() / "bidmc"
        fn = "train.csv" if split == "train" else "test.csv"
        if (base / fn).exists():
            import pandas as pd
            df = pd.read_csv(base / fn)
            feature_cols = df.columns.difference(["Time", "patient_id", "label"])
            return {
                "data": df[feature_cols].values,
                "labels": df["label"].values.astype(int),
                "clip_ids": df["patient_id"].values.astype(int),
                "timestamps": df["Time"].values,
            }
        return self.synthetic_fallback(split)

    def generate_synthetic(self, split) -> dict:
        key = "train" if split == "train" else "test"
        rng = syn.rng_for("bidmc", key)
        n_clips = 5 if key == "train" else 2
        clip_len = 8000
        data, clip_ids = syn.clip_series(
            rng, n_clips, clip_len, self.N_FEATURES,
            clip_id_fn=lambda i: i if key == "train" else 50 + i,
            period_range=(150, 350), noise=0.08)
        n = len(data)
        labels = syn.periodic_boundaries(rng, n, mean_period=260)
        return {"data": data, "labels": labels, "clip_ids": clip_ids,
                "timestamps": np.arange(n, dtype=float) / 125.0}
