"""Real-file reader paths, exercised with miniature fixtures written in the
exact formats the reference consumes (SURVEY.md §2.3)."""

import numpy as np
import pandas as pd
import pytest

from medtsllm_tpu.data import get_dataset
from conftest import make_config


def _cfg(dataset, task, data_root, **kw):
    kw.setdefault("hist", 16)
    kw.setdefault("pred", 16)
    cfg = make_config(task=task, dataset=dataset, step=8, **kw)
    cfg["paths"] = {"data": str(data_root)}
    cfg.data.allow_synthetic = False
    return cfg


def test_ett_real(tmp_path):
    n = 20 * 30 * 24
    rng = np.random.default_rng(0)
    df = pd.DataFrame(rng.normal(size=(n, 7)),
                      columns=["HUFL", "HULL", "MUFL", "MULL", "LUFL",
                               "LULL", "OT"])
    df.insert(0, "date", pd.date_range("2016-07-01", periods=n, freq="h"))
    (tmp_path / "ett").mkdir()
    df.to_csv(tmp_path / "ett" / "ETTh1.csv", index=False)

    ds = get_dataset(_cfg("ETTh1", "forecasting", tmp_path), "train")
    assert ds.n_points == 12 * 30 * 24
    assert ds.n_features == 7
    ds_val = get_dataset(_cfg("ETTh1", "forecasting", tmp_path), "val")
    assert ds_val.n_points == 4 * 30 * 24


def test_psm_real(tmp_path):
    rng = np.random.default_rng(1)
    (tmp_path / "psm").mkdir()
    cols = ["timestamp_(min)"] + [f"f{i}" for i in range(25)]
    for fn, n in (("train.csv", 300), ("test.csv", 200)):
        df = pd.DataFrame(
            np.concatenate([np.arange(n)[:, None],
                            rng.normal(size=(n, 25))], axis=1), columns=cols)
        df.iloc[3, 5] = np.nan  # nan_to_num path (psm.py:21)
        df.to_csv(tmp_path / "psm" / fn, index=False)
    lbl = pd.DataFrame({"timestamp_(min)": np.arange(200),
                        "label": rng.integers(0, 2, 200)})
    lbl.to_csv(tmp_path / "psm" / "test_label.csv", index=False)

    cfg = _cfg("PSM", "anomaly_detection", tmp_path)
    ds = get_dataset(cfg, "test")
    assert ds.n_features == 25
    assert ds.labels is not None and len(ds.labels) == 200
    assert not np.isnan(ds.data).any()
    ds_train = get_dataset(cfg, "train")
    assert ds_train.labels is None


def test_msl_real(tmp_path):
    rng = np.random.default_rng(2)
    (tmp_path / "msl").mkdir()
    np.save(tmp_path / "msl" / "MSL_train.npy", rng.normal(size=(300, 55)))
    np.save(tmp_path / "msl" / "MSL_test.npy", rng.normal(size=(200, 55)))
    np.save(tmp_path / "msl" / "MSL_test_label.npy",
            rng.integers(0, 2, 200))
    ds = get_dataset(_cfg("MSL", "anomaly_detection", tmp_path), "val")
    assert ds.n_features == 55 and ds.labels is not None


def test_bidmc_real(tmp_path):
    rng = np.random.default_rng(3)
    (tmp_path / "bidmc").mkdir()
    for fn, n in (("train.csv", 240), ("test.csv", 120)):
        df = pd.DataFrame({
            "Time": np.arange(n) / 125.0,
            "patient_id": np.repeat([1, 2], n // 2),
            "RESP": rng.normal(size=n),
            "PLETH": rng.normal(size=n),
            "label": (rng.random(n) < 0.05).astype(int),
        })
        df.to_csv(tmp_path / "bidmc" / fn, index=False)
    ds = get_dataset(_cfg("bidmc", "segmentation", tmp_path), "train")
    assert ds.n_features == 2  # columns minus Time/patient_id/label
    assert ds.labels is not None


def test_ludb_real(tmp_path):
    rng = np.random.default_rng(4)
    (tmp_path / "ludb").mkdir()
    rows = []
    for patient in (1, 2):
        for lead in ("i", "ii"):
            for t in range(120):
                rows.append({
                    "time": f"0 days 00:00:{t / 500.0:09.6f}",
                    "patient_id": patient,
                    "lead": lead,
                    "ecg": float(rng.normal()),
                    "label": int(rng.integers(0, 4)),
                })
    df = pd.DataFrame(rows)
    for fn in ("train.csv", "test.csv"):
        df.to_csv(tmp_path / "ludb" / fn, index=False)
    for fn in ("train_data_desc_cleaned.csv", "test_data_desc_cleaned.csv"):
        pd.DataFrame({"data_desc": {1: "subject one", 2: "subject two"}}
                     ).rename_axis("patient_id").to_csv(tmp_path / "ludb" / fn)

    cfg = _cfg("ludb", "semantic_segmentation", tmp_path, hist=32, pred=32,
               loss="ce", eval_metric="iou", eval_dir="max")
    cfg["datasets"] = {"ludb": {"version": "v3"}}
    ds = get_dataset(cfg, "train")
    assert ds.n_classes == 4
    assert ds.clip_dataset
    # clip ids = patient*100 + lead index, windows never cross clips
    assert len(np.unique(ds.clip_ids)) == 4
    item = ds[0]
    assert "descriptions" in item and "Patient information" in item["descriptions"]


def test_ventilator_real(tmp_path):
    rng = np.random.default_rng(5)
    v4 = tmp_path / "ventilator" / "v4"
    v4.mkdir(parents=True)
    from medtsllm_tpu.data.readers.ventilator import TRAIN_CLIPS_SEG, TEST_CLIPS_SEG
    for clip in TRAIN_CLIPS_SEG + TEST_CLIPS_SEG:
        n = 100
        df = pd.DataFrame({
            "dt": np.arange(n) / 100.0,
            "pressure": rng.normal(size=n),
            "flow": rng.normal(size=n),
            "label": rng.integers(0, 2, n),
        })
        df.loc[:4, "label"] = -1  # unlabeled rows filtered (ventilator.py:122)
        df.to_csv(v4 / f"{clip}.csv", index=False)

    cfg = _cfg("ventilator", "semantic_segmentation", tmp_path, hist=16,
               pred=16, loss="auto", eval_metric="iou", eval_dir="max")
    cfg["datasets"] = {"ventilator": {"version": "v4", "split_version": "v1"}}
    ds = get_dataset(cfg, "train")
    assert ds.n_features == 2 and ds.n_classes == 2
    assert (ds.labels >= 0).all()  # label<0 rows dropped
    assert ds.n_points == 7 * 95


def test_ecg_real(tmp_path):
    rng = np.random.default_rng(6)
    anom = tmp_path / "mit_ecg" / "v2" / "anom"
    anom.mkdir(parents=True)
    n = 200
    for fn in ("train.csv", "test.csv"):
        df = pd.DataFrame({
            "time": np.arange(n),
            "patient_id": np.repeat([100, 101], n // 2),
            "ch1": rng.normal(size=n),
            "ch2": rng.normal(size=n),
        })
        df.to_csv(anom / fn, index=False)
    pd.DataFrame({"time": np.arange(n),
                  "patient_id": np.repeat([100, 101], n // 2),
                  "label": rng.integers(0, 2, n)}
                 ).to_csv(anom / "test_label.csv", index=False)
    for fn in ("train_data_desc.csv", "test_data_desc.csv"):
        pd.DataFrame({"data_desc": {100: "p100", 101: "p101"}}
                     ).rename_axis("patient_id").to_csv(anom / fn)

    cfg = _cfg("ECG", "anomaly_detection", tmp_path, eval_metric="f1",
               eval_dir="max")
    cfg["datasets"] = {"ECG": {"version": "v2"}}
    ds = get_dataset(cfg, "test")
    assert ds.n_features == 2
    assert ds.labels is not None
    assert ds.clip_descriptions[100].startswith("Patient description:")
