"""DREAMS (sleep PSG artifact) family.

Reference: datasets/dreams.py — v2 train/test CSVs; EEG/EOG/all feature and
label column selection via dataset config (dreams.py:18-33); the
semantic-segmentation variant takes an 80/20 time split of the *test* file
plus downsample_factor striding (dreams.py:85-134).
"""

from __future__ import annotations

import numpy as np

from ..base import TimeSeriesDataset
from .. import synthetic as syn

EEG_COLS = ["FP1-A1", "CZ-A1", "O1-A1", "FP2-A1", "O2-A1"]
EOG_COLS = ["EOG1-A1", "EOG2-A1"]



def _labeled_split(n: int, task: str, split: str) -> slice:
    """Row range of the labeled test file for one split.

    semantic_segmentation keeps the reference's 80/20 scheme where val and
    test are the same tail (dreams.py:110-116). classification is this
    framework's own task, so it gets a leak-free 3-way split: best-checkpoint
    selection (val) must not score the reported test rows."""
    if task == "classification":
        bounds = {"train": (0, int(n * 0.64)),
                  "val": (int(n * 0.64), int(n * 0.8)),
                  "test": (int(n * 0.8), n)}
        return slice(*bounds[split])
    split_pt = int(n * 0.8)
    return slice(None, split_pt) if split == "train" else slice(split_pt, None)


class DreamsFamily(TimeSeriesDataset):
    supported_tasks = ("forecasting", "reconstruction", "anomaly_detection",
                       "semantic_segmentation", "classification")
    description = ("The DREAMS database consists of digital 32-channel "
                   "polysomnographic recordings (PSG), acquired from patients "
                   "with different pathologies in a sleep hospital laboratory. "
                   "Muscle or movement artifacts on the electroencephalogram "
                   "(EEG) were annotated in microevents or in sleep stages by "
                   "several experts. Other provided physiological signals "
                   "include multiple electrooculogram (EOG) and electromyography "
                   "(EMG) channels, sampled at 200Hz.")

    @property
    def n_classes(self):
        if self.task in ("semantic_segmentation", "classification"):
            return 2  # binary artifact labels (dreams.py:136-138)
        return super().n_classes

    def _n_synth_features(self):
        sel = self.dataset_config.get("features", "eeg")
        return {"eeg": len(EEG_COLS), "eog": len(EOG_COLS), "all": 9}.get(sel, 5)

    def get_data(self, split=None) -> dict:
        split = split or self.split
        if "version" in self.dataset_config:
            assert self.dataset_config.version == "v2"
        base = self.data_root() / "dreams" / "v2"
        if (base / "test.csv").exists():
            return self._read_real(base, split)
        return self.synthetic_fallback(split)

    def _get_cols(self, allcols):
        lookup = {"eeg": EEG_COLS, "eog": EOG_COLS, "all": list(allcols)}
        feature_cols = lookup[self.dataset_config.features]
        label_col = {"eeg": "EEG_label", "eog": "EOG_label",
                     "all": "ALL_label"}[self.dataset_config.labels]
        return feature_cols, label_col

    def _read_real(self, base, split) -> dict:
        import pandas as pd
        if self.task in ("semantic_segmentation", "classification"):
            df = pd.read_csv(base / "test.csv")
        else:
            fn = "train.csv" if split == "train" else "test.csv"
            df = pd.read_csv(base / fn)
        allcols = df.columns.difference(["ts", "patient_ID"])
        feature_cols, label_col = self._get_cols(allcols)
        xs = df[feature_cols].values
        clip_ids = df["patient_ID"].values.astype(int)
        timestamps = df["ts"].values

        if self.task in ("semantic_segmentation", "classification"):
            ldf = pd.read_csv(base / "test_label.csv")
            # test.csv and test_label.csv are separate files: assert row
            # alignment before pairing (like ecg.py's time/patient checks)
            # — silent misalignment would train on wrong supervision
            assert len(ldf) == len(df), (
                f"dreams test_label.csv rows ({len(ldf)}) != test.csv "
                f"rows ({len(df)})")
            if "ts" in ldf.columns:
                assert (ldf["ts"].values == timestamps).all(), \
                    "dreams test_label.csv timestamps misaligned"
            labels = ldf[label_col].values.astype(int)
            sl = _labeled_split(xs.shape[0], self.task, split)
            xs, labels = xs[sl], labels[sl]
            clip_ids, timestamps = clip_ids[sl], timestamps[sl]
            sf = self.dataset_config.downsample_factor
            xs, labels = xs[::sf], labels[::sf]
            clip_ids, timestamps = clip_ids[::sf], timestamps[::sf]
            desc = pd.read_csv(base / "test_data_desc.csv", index_col=0)
        else:
            labels = None
            if split != "train":
                ldf = pd.read_csv(base / "test_label.csv")
                labels = ldf[label_col].values.astype(int)
            desc_fn = "train_data_desc.csv" if split == "train" else "test_data_desc.csv"
            desc = pd.read_csv(base / desc_fn, index_col=0)
        descriptions = desc["data_desc"].to_dict()
        descriptions = {k: f"Patient description: {v}" for k, v in descriptions.items()}
        return {"data": xs, "labels": labels, "clip_ids": clip_ids,
                "clip_descriptions": descriptions, "timestamps": timestamps}

    def generate_synthetic(self, split) -> dict:
        C = self._n_synth_features()
        if self.task in ("semantic_segmentation", "classification"):
            rng = syn.rng_for("dreams:semseg")
            n = 20000
            data = syn.sine_mixture(rng, n, C, period_range=(40, 400), noise=0.3)
            labels = syn.segment_class_labels(rng, n, 2, mean_seg=500)
            clip_ids = np.zeros(n, dtype=np.int64)
            sl = _labeled_split(n, self.task, split)
            sf = self.dataset_config.get("downsample_factor", 1)
            data, labels = data[sl][::sf], labels[sl][::sf]
            clip_ids = clip_ids[sl][::sf]
        else:
            key = "train" if split == "train" else "test"
            rng = syn.rng_for("dreams", key)
            n = 16000 if key == "train" else 8000
            data = syn.sine_mixture(rng, n, C, period_range=(40, 400), noise=0.3)
            labels = None
            if key != "train" and self.task == "anomaly_detection":
                data, labels = syn.inject_anomalies(rng, data, rate=0.04)
            clip_ids = np.zeros(len(data), dtype=np.int64)
        return {"data": data, "labels": labels, "clip_ids": clip_ids,
                "clip_descriptions": syn.patient_descriptions(clip_ids),
                "timestamps": np.arange(len(data), dtype=float) / 200.0}
