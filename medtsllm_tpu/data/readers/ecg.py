"""ECG (MIT-BIH Arrhythmia) family.

Reference: datasets/ecg.py — v2 CSVs under mit_ecg/v2/{anom,seg}; anomaly
variant carries per-patient clip ids + text descriptions (ecg.py:52-85);
segmentation variant additionally supports in-context example segments
pulled from between consecutive boundary labels (ecg.py:88-109).
"""

from __future__ import annotations

import numpy as np

from ..base import TimeSeriesDataset
from .. import synthetic as syn


class ECGMITFamily(TimeSeriesDataset):
    supported_tasks = ("forecasting", "reconstruction", "anomaly_detection", "segmentation")
    description = ("The MIT-BIH Arrhythmia Database contains excerpts of "
                   "two-channel ambulatory ECG from a mixed population of "
                   "inpatients and outpatients, digitized at 360 samples per "
                   "second per channel with 11-bit resolution over a 10 mV range.")

    N_FEATURES = 2

    def __init__(self, config, split):
        super().__init__(config, split)
        if "version" in self.dataset_config:
            assert self.dataset_config.version == "v2"

        # in-context example segments (ecg.py:92-96)
        self.examples_enabled = False
        if self.task == "segmentation" and config.model in ("timellm",
                                                            "medtsllm"):
            # the model's own section resolver (medtsllm before the
            # historical timellm alias) so dataset and model read the
            # SAME prompting config — opposite precedence here would let
            # one side attach examples the other never consumes
            from ...models.medtsllm import MedTsLLM
            prompting = MedTsLLM.model_config(config).get("prompting", {})
            self.examples_enabled = bool(prompting.get("examples", False))
            if self.examples_enabled:
                max_examples = prompting.get("example_pool", 1024)
                self.examples = self.get_examples(max_examples)
                self.n_examples = len(self.examples)
                if self.n_examples == 0:
                    raise ValueError(
                        "prompting.examples = true but the ECG labels "
                        "contain fewer than two boundary points — no "
                        "example segments can be sliced")

    def get_examples(self, n=None):
        """Slices of data between consecutive boundary labels (ecg.py:98-109).
        Called after convert_labels: boundary-prediction keeps the raw 0/1
        indicators (boundaries = nonzero); steps-to-boundary replaces them
        with distances-to-next-boundary, where boundaries are exactly the
        zeros."""
        mode = self.config.get("tasks", {}).get("segmentation", {}).get(
            "mode", "boundary-prediction")
        if mode == "steps-to-boundary":
            inds = np.flatnonzero(np.asarray(self.labels) == 0)
        else:
            inds = np.flatnonzero(self.labels)
        periods = np.stack([inds[:-1], inds[1:]], axis=1) if len(inds) > 1 \
            else np.zeros((0, 2), dtype=int)
        if n is not None:
            periods = periods[:n]
        return [self.data[a:b, :] for a, b in periods]

    def __getitem__(self, idx):
        item = super().__getitem__(idx)
        if self.examples_enabled:
            ex_idx = idx % self.n_examples
            item["examples"] = ("Example segment:", self.examples[ex_idx][None, ...])
        return item

    def get_data(self, split=None) -> dict:
        split = split or self.split
        sub = "seg" if self.task == "segmentation" else "anom"
        base = self.data_root() / "mit_ecg" / "v2" / sub
        fn = "train.csv" if split == "train" else "test.csv"
        if (base / fn).exists():
            return self._read_real(base, split)
        return self.synthetic_fallback(split)

    def _read_real(self, base, split) -> dict:
        import pandas as pd
        fn = "train.csv" if split == "train" else "test.csv"
        df = pd.read_csv(base / fn)
        out = {}
        if self.task == "segmentation":
            feature_cols = df.columns.difference(["time", "patient_id", "label"])
            out["data"] = df[feature_cols].values
            out["labels"] = df["label"].values.astype(int)
            out["clip_ids"] = df["patient_id"].values.astype(int)
        elif self.task == "anomaly_detection":
            feature_cols = df.columns.difference(["time", "patient_id"])
            out["data"] = df[feature_cols].values
            out["clip_ids"] = df["patient_id"].values.astype(int)
            if split != "train":
                ldf = pd.read_csv(base / "test_label.csv")
                assert (ldf["time"] == df["time"]).all()
                assert (ldf["patient_id"] == df["patient_id"]).all()
                out["labels"] = ldf.label.astype(int).values
        else:
            out["data"] = df.drop(columns=["time", "patient_id"]).values
            return out
        desc_fn = "train_data_desc.csv" if split == "train" else "test_data_desc.csv"
        desc = pd.read_csv(base / desc_fn, index_col=0)["data_desc"].to_dict()
        out["clip_descriptions"] = {k: f"Patient description: {v}" for k, v in desc.items()}
        return out

    def generate_synthetic(self, split) -> dict:
        key = "train" if split == "train" else "test"
        sub = "seg" if self.task == "segmentation" else "anom"
        rng = syn.rng_for(f"ecg:{sub}", key)
        n_clips = 6 if key == "train" else 3
        clip_len = 4000
        data, clip_ids = syn.clip_series(
            rng, n_clips, clip_len, self.N_FEATURES,
            clip_id_fn=lambda i: (100 + i) if key == "train" else (200 + i),
            period_range=(90, 130), noise=0.05)
        out = {"data": data, "clip_ids": clip_ids,
               "clip_descriptions": syn.patient_descriptions(clip_ids)}
        if self.task == "segmentation":
            out["labels"] = syn.periodic_boundaries(rng, len(data), mean_period=110)
        elif self.task == "anomaly_detection":
            if key != "train":
                out["data"], out["labels"] = syn.inject_anomalies(rng, data, rate=0.03)
            else:
                out["labels"] = None
        return out
