"""LUDB (Lund University ECG database) family.

Reference: datasets/ludb.py — single-lead 10s ECG clips with P/QRS/T wave
delineation; clip id = patient*100+lead (ludb.py:32-34); descriptions are a
patient x lead cross-product (ludb.py:44-52); the semantic-segmentation
variant is clip-windowed with fixed n_classes=4 and its own task prompt
(ludb.py:71-73).
"""

from __future__ import annotations

import numpy as np

from ..base import TimeSeriesDataset
from .. import synthetic as syn

LEADS = ["i", "ii", "iii", "avr", "avl", "avf",
         "v1", "v2", "v3", "v4", "v5", "v6"]


class LUDBFamily(TimeSeriesDataset):
    supported_tasks = ("forecasting", "reconstruction", "semantic_segmentation")
    clip_tasks = ("semantic_segmentation",)
    description = ("LUDB is an ECG signal database collected from subjects with "
                   "various cardiovascular diseases used for ECG delineation. "
                   "Cardiologists manually annotated boundaries of P, T waves "
                   "and QRS complexes. Each clip consists of a 10 second signal "
                   "from a single ECG lead, sampled at 500Hz.")

    N_FEATURES = 1

    @property
    def task_description(self):
        if self.task == "semantic_segmentation":
            return ("Segment the following ECG signal into P waves, T waves, "
                    "and QRS complexes.")
        return None

    @property
    def n_classes(self):
        if self.task == "semantic_segmentation":
            return 4  # background / P / QRS / T (ludb.py:72)
        return super().n_classes

    def get_data(self, split=None) -> dict:
        split = split or self.split
        if "version" in self.dataset_config:
            assert self.dataset_config.version == "v3"
        base = self.data_root() / "ludb"
        fn = "train.csv" if split == "train" else "test.csv"
        if (base / fn).exists():
            return self._read_real(base, split)
        return self.synthetic_fallback(split)

    def _read_real(self, base, split) -> dict:
        import pandas as pd
        fn = "train.csv" if split == "train" else "test.csv"
        df = pd.read_csv(base / fn)
        df.lead = df.lead.astype("category")
        df["lead_idx"], lead_cats = df.lead.factorize()
        df["clip_id"] = df.patient_id.values.astype(int) * 100 + df.lead_idx.values.astype(int)
        df.time = df.time.str.slice(start=14).astype(float)
        df = df.sort_values(["clip_id", "time"]).reset_index(drop=True)

        lead_desc = {k: f"ECG lead: {v}" for k, v in enumerate(lead_cats)}
        desc_fn = ("train_data_desc_cleaned.csv" if split == "train"
                   else "test_data_desc_cleaned.csv")
        pat_desc = pd.read_csv(base / desc_fn, index_col=0)["data_desc"].to_dict()
        pat_desc = {k: f"Patient information: {v}" for k, v in pat_desc.items()}
        descriptions = {(p * 100) + l: dp + "; " + dl
                        for p, dp in pat_desc.items()
                        for l, dl in lead_desc.items()}
        return {
            "data": df.ecg.values[:, np.newaxis],
            "labels": df.label.values.astype(int),
            "timestamps": df.time.values,
            "clip_ids": df.clip_id.values.astype(int),
            "clip_descriptions": descriptions,
        }

    def generate_synthetic(self, split) -> dict:
        key = "train" if split == "train" else "test"
        rng = syn.rng_for("ludb", key)
        n_patients = 8 if key == "train" else 3
        n_leads = 4  # subset of the 12 leads keeps the fixture small
        clip_len = 5000  # 10 s at 500 Hz
        datas, ids, labels = [], [], []
        for p in range(n_patients):
            pid = p if key == "train" else 100 + p
            for l in range(n_leads):
                seg = syn.sine_mixture(rng, clip_len, 1,
                                       period_range=(350, 550), noise=0.05)
                datas.append(seg)
                ids.append(np.full(clip_len, pid * 100 + l, dtype=np.int64))
                labels.append(syn.segment_class_labels(rng, clip_len, 4, mean_seg=120))
        data = np.concatenate(datas, axis=0)
        clip_ids = np.concatenate(ids)
        label_arr = np.concatenate(labels)
        descriptions = {
            int(cid): (f"Patient information: synthetic subject {int(cid) // 100}; "
                       f"ECG lead: {LEADS[int(cid) % 100]}")
            for cid in np.unique(clip_ids)}
        return {"data": data, "labels": label_arr, "clip_ids": clip_ids,
                "clip_descriptions": descriptions,
                "timestamps": np.arange(len(data), dtype=float) / 500.0}
