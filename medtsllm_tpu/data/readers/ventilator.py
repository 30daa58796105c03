"""Ventilator waveform family.

Reference: datasets/ventilator.py — forecasting/reconstruction pool all v1
clip CSVs with a 70/15/15 split (ventilator.py:38-50); semantic segmentation
and anomaly detection use hardcoded v4 train/test clip lists, labels from the
`label` column (AD: label < 0 is anomalous, ventilator.py:170); clip ids are
patient*100+clip (ventilator.py:183-188).
"""

from __future__ import annotations

import re

import numpy as np

from ..base import TimeSeriesDataset
from .. import synthetic as syn


def parse_clip_id(clip_string: str) -> int:
    m = re.match(r"patient_(\d+)_vent_w_(\d+)", clip_string)
    patient_id, clip_number = (int(g) for g in m.groups())
    return patient_id * 100 + clip_number


TRAIN_CLIPS_SEG = [
    "patient_572_vent_w_1_labeled", "patient_572_vent_w_2_labeled",
    "patient_572_vent_w_4_labeled", "patient_674_vent_w_1_labeled",
    "patient_674_vent_w_4_labeled", "patient_697_vent_w_1_labeled",
    "patient_697_vent_w_2_labeled",
]
TEST_CLIPS_SEG = [
    "patient_704_vent_w_1_labeled", "patient_709_vent_w_1_labeled",
    "patient_709_vent_w_2_labeled",
]
TRAIN_CLIPS_AD = TRAIN_CLIPS_SEG + [
    "patient_709_vent_w_1_labeled", "patient_709_vent_w_2_labeled",
]
TEST_CLIPS_AD = ["patient_704_vent_w_1_labeled"]


class VentilatorFamily(TimeSeriesDataset):
    supported_tasks = ("forecasting", "reconstruction",
                       "semantic_segmentation", "anomaly_detection")
    description = ("The dataset contains time-series data of airway pressure "
                   "and flow rate measurements collected from a mechanical "
                   "ventilator during the respiratory support of a fully sedated "
                   "patient. The data is sampled at a frequency of 100 Hz. The "
                   "airway pressure is measured in cmH2O and the flow rate is "
                   "measured in L/min.")

    N_FEATURES = 2

    @property
    def n_classes(self):
        if self.task == "semantic_segmentation":
            return 2  # ventilator.py:100-102
        return super().n_classes

    def get_data(self, split=None) -> dict:
        split = split or self.split
        if self.task in ("forecasting", "reconstruction"):
            return self._pooled(split)
        return self._clipped(split)

    # -- forecasting/reconstruction: pooled v1 csvs, 70/15/15 ---------------
    def _pooled(self, split) -> dict:
        base = self.data_root() / "ventilator" / "v1"
        files = sorted(base.glob("*.csv")) if base.exists() else []
        if files:
            import pandas as pd
            dfs = [pd.read_csv(f, usecols=["pressure", "flow"]) for f in files]
            full = pd.concat(dfs, ignore_index=True).values
        else:
            if not self.allow_synthetic():
                raise FileNotFoundError(f"no ventilator v1 csvs under {base}")
            rng = syn.rng_for("ventilator:v1")
            full = syn.sine_mixture(rng, 60000, self.N_FEATURES,
                                    period_range=(200, 500), noise=0.1)
        train_idx = int(0.7 * full.shape[0])
        val_idx = int(0.85 * full.shape[0])
        match split:
            case "train":
                return {"data": full[:train_idx]}
            case "val":
                return {"data": full[train_idx:val_idx]}
            case "test":
                return {"data": full[val_idx:]}
        raise ValueError(f"Invalid split: {split}")

    # -- semantic_segmentation / anomaly_detection: v4 labeled clips --------
    def _clipped(self, split) -> dict:
        if "version" in self.dataset_config:
            assert self.dataset_config.version == "v4"
            assert self.dataset_config.get("split_version", "v1") == "v1"
        base = self.data_root() / "ventilator" / "v4"
        if self.task == "anomaly_detection":
            clip_list = TRAIN_CLIPS_AD if split == "train" else TEST_CLIPS_AD
        else:
            clip_list = TRAIN_CLIPS_SEG if split == "train" else TEST_CLIPS_SEG
        if split == "inference":
            base = self.data_root() / "ventilator" / "v1"
            clip_list = sorted(f.stem for f in base.glob("*.csv"))
        if (not clip_list or not base.exists()
                or not (base / f"{clip_list[0]}.csv").exists()):
            return self.synthetic_fallback(split)

        import pandas as pd
        dfs = []
        for clip in clip_list:
            df = pd.read_csv(base / f"{clip}.csv")
            if split == "inference":
                # v1 clips carry no labels; the reference stamps -1 and
                # never reads df.label (ventilator.py:122-125)
                df["label"] = -1
            elif self.task == "anomaly_detection":
                if split == "train":
                    df = df[df.label >= 0]
                df["label"] = df["label"] < 0
            else:
                df = df[df.label >= 0]
            df["clip_id"] = parse_clip_id(clip)
            dfs.append(df)
        data = pd.concat(dfs, ignore_index=True)
        return {
            "data": data[["pressure", "flow"]].values,
            "labels": data["label"].values.astype(int),
            "clip_ids": data["clip_id"].values,
            "timestamps": data["dt"].values.astype(float),
        }

    def generate_synthetic(self, split) -> dict:
        key = "train" if split == "train" else "test"
        rng = syn.rng_for(f"ventilator:{self.task}", key)
        clips = TRAIN_CLIPS_SEG if key == "train" else TEST_CLIPS_SEG
        clip_ids_list = [parse_clip_id(c) for c in clips]
        clip_len = 6000
        data, clip_ids = syn.clip_series(
            rng, len(clips), clip_len, self.N_FEATURES,
            clip_id_fn=lambda i: clip_ids_list[i],
            period_range=(250, 450), noise=0.08)
        n = len(data)
        if self.task == "anomaly_detection":
            data, labels = syn.inject_anomalies(rng, data, rate=0.04, max_len=120)
        else:
            # breath-phase binary labels: inhale/exhale alternation
            labels = (syn.segment_class_labels(rng, n, 2, mean_seg=180))
        return {"data": data, "labels": labels, "clip_ids": clip_ids,
                "timestamps": np.arange(n, dtype=float) / 100.0}
