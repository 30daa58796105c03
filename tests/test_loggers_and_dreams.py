"""Logger run registry + DREAMS real-format reader."""

import json
import tomllib
from pathlib import Path

import numpy as np
import pandas as pd

from medtsllm_tpu.data import get_dataset
from medtsllm_tpu.tasks import get_trainer
from conftest import make_config


def test_run_registry_files(tmp_path):
    cfg = make_config(hist=32, pred=16, step=16)
    cfg["models"] = {"dlinear": {"individual": False, "moving_avg": 13}}
    cfg["paths"] = {"logdir": str(tmp_path)}
    cfg.datasets.synthetic.n_points = 256
    trainer = get_trainer("regrun", cfg)

    rundir = tmp_path / "regrun"
    assert (rundir / "config.toml").exists()
    assert (rundir / "config.json").exists()
    saved = tomllib.loads((rundir / "config.toml").read_text())
    assert saved["task"] == "forecasting"
    assert saved["models"]["dlinear"]["moving_avg"] == 13

    # config-updates merge (reference base_logger.py:45-56)
    trainer.logger.update_config({"training": {"note": "a"}})
    trainer.logger.update_config({"extra": 1})
    upd = tomllib.loads((rundir / "config-updates.toml").read_text())
    assert upd["training"]["note"] == "a" and upd["extra"] == 1
    assert json.loads((rundir / "config-updates.json").read_text())["extra"] == 1

    # latest/best checkpoints after an epoch
    trainer.train()
    trainer.log_end()
    assert (rundir / "checkpoints" / "latest.ckpt").exists()
    assert (rundir / "checkpoints" / "best.ckpt").exists()


def test_debug_logger_writes_nothing(tmp_path):
    cfg = make_config(hist=32, pred=16, step=16)
    cfg.DEBUG = True
    cfg["models"] = {"dlinear": {"individual": False, "moving_avg": 13}}
    cfg["paths"] = {"logdir": str(tmp_path)}
    cfg.datasets.synthetic.n_points = 256
    trainer = get_trainer("DEBUG-run", cfg)
    trainer.logger.save_state("latest")
    assert not (tmp_path / "DEBUG-run").exists()


def test_run_id_debug_prefix():
    from medtsllm_tpu.utils import get_run_id
    from medtsllm_tpu.config import Config
    assert get_run_id(Config({"DEBUG": True})).startswith("DEBUG-")
    assert not get_run_id(Config({"DEBUG": False})).startswith("DEBUG-")


def test_dreams_real(tmp_path):
    rng = np.random.default_rng(7)
    base = tmp_path / "dreams" / "v2"
    base.mkdir(parents=True)
    n = 400
    eeg_cols = ["FP1-A1", "CZ-A1", "O1-A1", "FP2-A1", "O2-A1"]
    for fn in ("train.csv", "test.csv"):
        df = pd.DataFrame({"ts": np.arange(n) / 200.0,
                           "patient_ID": np.ones(n, int)})
        for c in eeg_cols + ["EOG1-A1", "EOG2-A1"]:
            df[c] = rng.normal(size=n)
        df.to_csv(base / fn, index=False)
    lbl = pd.DataFrame({"ts": np.arange(n) / 200.0,
                        "patient_ID": np.ones(n, int),
                        "EEG_label": rng.integers(0, 2, n),
                        "EOG_label": rng.integers(0, 2, n),
                        "ALL_label": rng.integers(0, 2, n)})
    lbl.to_csv(base / "test_label.csv", index=False)
    for fn in ("train_data_desc.csv", "test_data_desc.csv"):
        pd.DataFrame({"data_desc": {1: "sleepy"}}
                     ).rename_axis("patient_ID").to_csv(base / fn)

    cfg = make_config(task="semantic_segmentation", dataset="dreams",
                      hist=16, pred=16, step=8, loss="auto",
                      eval_metric="iou", eval_dir="max")
    cfg["paths"] = {"data": str(tmp_path)}
    cfg.data.allow_synthetic = False
    cfg["datasets"] = {"dreams": {"version": "v2", "features": "eeg",
                                  "labels": "eeg", "downsample_factor": 2}}
    # semantic seg: 80/20 time split of the TEST file + striding
    ds_train = get_dataset(cfg, "train")
    ds_test = get_dataset(cfg, "test")
    assert ds_train.n_features == 5
    assert ds_train.n_points == int(n * 0.8) // 2
    assert ds_test.n_points == (n - int(n * 0.8) + 1) // 2
    assert ds_train.n_classes == 2

    # anomaly detection path: labels only off-train
    cfg2 = make_config(task="anomaly_detection", dataset="dreams",
                       hist=16, pred=16, step=8, eval_metric="f1",
                       eval_dir="max")
    cfg2["paths"] = {"data": str(tmp_path)}
    cfg2.data.allow_synthetic = False
    cfg2["datasets"] = {"dreams": {"version": "v2", "features": "eog",
                                   "labels": "eog"}}
    ds = get_dataset(cfg2, "val")
    assert ds.n_features == 2 and ds.labels is not None

    # classification: leak-free 3-way split of the labeled test file
    cfg3 = make_config(task="classification", dataset="dreams",
                       hist=16, pred=16, step=8, loss="ce",
                       eval_metric="f1", eval_dir="max")
    cfg3["paths"] = {"data": str(tmp_path)}
    cfg3.data.allow_synthetic = False
    cfg3["datasets"] = {"dreams": {"version": "v2", "features": "eeg",
                                   "labels": "eeg", "downsample_factor": 1}}
    cfg3["tasks"] = {"classification": {"window_label": "any"}}
    tr = get_dataset(cfg3, "train")
    va = get_dataset(cfg3, "val")
    te = get_dataset(cfg3, "test")
    assert tr.n_points == int(n * 0.64)
    assert va.n_points == int(n * 0.8) - int(n * 0.64)
    assert te.n_points == n - int(n * 0.8)
    # disjoint: timestamps from the shared test.csv must not overlap
    assert tr.timestamps.max() < va.timestamps.min() < va.timestamps.max() \
        < te.timestamps.min()
    assert te.n_classes == 2
    assert te[0]["labels"] in (0, 1)

def test_sync_save_survives_stale_async_error(tmp_path):
    """The preemption-handoff sync save must not be aborted by a stale
    async write error; the error surfaces (once) at the next
    wait_for_saves and is then cleared for the next run."""
    import pytest
    from medtsllm_tpu.runtime import checkpoint as ckpt

    bad = tmp_path / "nodir" / "x.ckpt"  # parent missing -> write fails
    ckpt.save_checkpoint(bad, {"w": np.zeros(2)}, {"epoch": 1}, async_=True)
    if ckpt._worker is not None:
        ckpt._save_queue.join()
    assert ckpt._save_errors

    good = tmp_path / "latest.ckpt"
    ckpt.save_checkpoint(good, {"w": np.ones(2)}, {"epoch": 2}, async_=False)
    assert good.exists(), "sync save aborted by the stale async error"

    with pytest.raises(RuntimeError, match="checkpoint write"):
        ckpt.wait_for_saves()
    ckpt.wait_for_saves()  # cleared: no cross-run leak


def test_restore_partial_skip_prefix_segment_match():
    from medtsllm_tpu.runtime.checkpoint import restore_partial
    tmpl = {"llm": {"k": np.zeros(2)}, "llm_adapter": {"k": np.zeros(2)}}
    saved = {"llm": {"k": np.ones(2)}, "llm_adapter": {"k": np.ones(2)}}
    merged, loaded = restore_partial(tmpl, saved, skip_prefixes=("llm",))
    np.testing.assert_array_equal(merged["llm"]["k"], 0)  # skipped
    np.testing.assert_array_equal(merged["llm_adapter"]["k"], 1)  # loaded
    assert loaded == ["llm_adapter/k"]


def test_tensorboard_update_config_list_values(tmp_path):
    cfg = make_config()
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.setup["logger"] = "tensorboard"
    cfg["models"] = {"dlinear": {"individual": False, "moving_avg": 13}}
    cfg.datasets.synthetic.n_points = 256
    trainer = get_trainer("tb-list", cfg)
    # lists crashed torch add_hparams before sanitization
    trainer.logger.update_config({"data": {"cols": ["HR", "SpO2"]}})
    trainer.log_end()
