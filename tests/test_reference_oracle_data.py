"""Executed DATA-LAYER parity oracles (VERDICT r3 item 2c).

The reference's dataset base classes (/root/reference/datasets/base.py:
116-335) are instantiated directly — concrete subclasses supply
`get_data` from an ETTh1-format fixture CSV (the same miniature format
tests/test_real_readers.py uses) — and compared window-for-window
against this framework's TimeSeriesDataset over identical raw arrays:
window counts, x/y/label contents, normalization (StandardScaler fit on
train), the test-split step override, steps-to-boundary label
conversion, clip-aware windowing and the clip evaluation mask.
"""

import sys

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

import datasets.base as ref_base  # noqa: E402  (reference package)

from medtsllm_tpu.config import Config  # noqa: E402
from medtsllm_tpu.data.base import TimeSeriesDataset  # noqa: E402


# ---------------------------------------------------------------------------
# fixture data: an ETTh1-format CSV, split 60/20/20 like a real reader
# ---------------------------------------------------------------------------


def _fixture_arrays(tmp_path, n=600, n_features=4, labels=None,
                    clip_lens=None, seed=5):
    rng = np.random.default_rng(seed)
    cols = {"date": pd.date_range("2020-01-01", periods=n, freq="h")}
    for i in range(n_features):
        cols[f"f{i}"] = rng.normal(size=n) * (i + 1) + i
    df = pd.DataFrame(cols)
    path = tmp_path / "fix.csv"
    df.to_csv(path, index=False)

    data = pd.read_csv(path).drop(columns=["date"]).values.astype(np.float64)
    splits = {"train": data[: int(0.6 * n)],
              "val": data[int(0.6 * n): int(0.8 * n)],
              "test": data[int(0.8 * n):]}
    raw = {s: {"data": d} for s, d in splits.items()}
    if labels is not None:
        lab = {"train": labels[: int(0.6 * n)],
               "val": labels[int(0.6 * n): int(0.8 * n)],
               "test": labels[int(0.8 * n):]}
        for s in raw:
            raw[s]["labels"] = lab[s]
    if clip_lens is not None:
        ids = np.concatenate([np.full(l, i, dtype=np.int32)
                              for i, l in enumerate(clip_lens)])
        for s, d in splits.items():
            raw[s]["clip_ids"] = ids[: len(d)]
            raw[s]["clip_descriptions"] = {
                int(i): f"clip {i}" for i in np.unique(ids[: len(d)])}
    return raw


class _RefCfg:
    def __init__(self, d):
        for k, v in d.items():
            setattr(self, k, _RefCfg(v) if isinstance(v, dict) else v)

    def get(self, key, default=None):
        return getattr(self, key, default)

    def __contains__(self, key):
        return hasattr(self, key)


def _cfg_dict(task, hist=48, pred=24, step=12, normalize=True,
              seg_mode="boundary-prediction"):
    if task != "forecasting":
        pred = hist
    return {
        "task": task, "model": "dlinear",
        "history_len": hist, "pred_len": pred,
        "data": {"dataset": "oracle", "mode": "multivariate",
                 "cols": "all", "normalize": normalize, "step": step},
        "datasets": {"oracle": {}},
        "tasks": {"segmentation": {"mode": seg_mode},
                  "anomaly_detection": {"threshold": "auto"}},
    }


def _ref_dataset(task_cls, raw, cfg_dict, split, clip=False):
    bases = ((ref_base.ClipDataset, task_cls) if clip else (task_cls,))

    class _Concrete(*bases):
        supported_tasks = [cfg_dict["task"]]

        def get_data(self, split_=None):
            return {k: (np.array(v) if isinstance(v, np.ndarray) else v)
                    for k, v in raw[split_ or self.split].items()}

    return _Concrete(_RefCfg(cfg_dict), split)


def _my_dataset(raw, cfg_dict, split, clip=False):
    task = cfg_dict["task"]

    class _Mine(TimeSeriesDataset):
        supported_tasks = (task,)
        clip_tasks = (task,) if clip else ()
        description = "oracle"

        def get_data(self, split_=None):
            return dict(raw[split_ or self.split])

    return _Mine(Config(cfg_dict), split)


def _compare_all_windows(ref_ds, my_ds, keys):
    assert len(my_ds) == len(ref_ds)
    for idx in range(len(ref_ds)):
        r = ref_ds[idx]
        m = my_ds[idx]
        for key in keys:
            rv = r[key]
            rv = rv.numpy() if torch.is_tensor(rv) else rv
            np.testing.assert_allclose(np.asarray(m[key], dtype=np.float64),
                                       np.asarray(rv, dtype=np.float64),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=f"idx={idx} key={key}")


@pytest.mark.parametrize("split", ["train", "val", "test"])
@pytest.mark.parametrize("normalize", [True, False])
def test_forecast_dataset_oracle(tmp_path, split, normalize):
    """Window math + StandardScaler normalization (fit on train even for
    val/test) + the test-split step override (base.py:41-42,116-142)."""
    raw = _fixture_arrays(tmp_path)
    cfg = _cfg_dict("forecasting", normalize=normalize)
    ref_ds = _ref_dataset(ref_base.ForecastDataset, raw, cfg, split)
    my_ds = _my_dataset(raw, cfg, split)
    assert len(ref_ds) > 0
    _compare_all_windows(ref_ds, my_ds, ["x_enc", "y"])


def test_reconstruction_dataset_oracle(tmp_path):
    raw = _fixture_arrays(tmp_path)
    cfg = _cfg_dict("reconstruction")
    ref_ds = _ref_dataset(ref_base.ReconstructionDataset, raw, cfg, "train")
    my_ds = _my_dataset(raw, cfg, "train")
    _compare_all_windows(ref_ds, my_ds, ["x_enc"])


def test_anomaly_labels_oracle(tmp_path):
    labels = (np.random.default_rng(6).uniform(size=600) < 0.1
              ).astype(np.int64)
    raw = _fixture_arrays(tmp_path, labels=labels)
    cfg = _cfg_dict("anomaly_detection")
    ref_ds = _ref_dataset(ref_base.AnomalyDetectionDataset, raw, cfg, "test")
    my_ds = _my_dataset(raw, cfg, "test")
    _compare_all_windows(ref_ds, my_ds, ["x_enc", "labels"])


def test_semantic_segmentation_oracle(tmp_path):
    labels = np.random.default_rng(7).integers(0, 4, size=600)
    raw = _fixture_arrays(tmp_path, labels=labels)
    cfg = _cfg_dict("semantic_segmentation")
    ref_ds = _ref_dataset(ref_base.SemanticSegmentationDataset, raw, cfg,
                          "train")
    my_ds = _my_dataset(raw, cfg, "train")
    _compare_all_windows(ref_ds, my_ds, ["x_enc", "labels"])
    assert ref_ds.n_classes == 4


@pytest.mark.parametrize("mode", ["boundary-prediction",
                                  "steps-to-boundary"])
def test_segmentation_label_conversion_oracle(tmp_path, mode):
    """convert_labels parity: the steps-to-boundary countdown loop
    (base.py:265-277) vs the vectorized steps_to_boundary_labels."""
    rng = np.random.default_rng(8)
    labels = np.zeros(600, dtype=np.int64)
    labels[np.sort(rng.choice(np.arange(5, 595), size=9, replace=False))] = 1
    raw = _fixture_arrays(tmp_path, labels=labels)
    cfg = _cfg_dict("segmentation", seg_mode=mode)
    ref_ds = _ref_dataset(ref_base.SegmentationDataset, raw, cfg, "train")
    my_ds = _my_dataset(raw, cfg, "train")
    np.testing.assert_allclose(
        np.asarray(my_ds.labels, dtype=np.float64),
        ref_ds.labels.numpy().astype(np.float64), rtol=1e-6, atol=1e-6)
    _compare_all_windows(ref_ds, my_ds, ["x_enc", "labels"])


@pytest.mark.parametrize("split", ["train", "test"])
def test_clip_dataset_oracle(tmp_path, split):
    """Clip-aware windowing: windows never cross clip boundaries; global
    index -> (clip, local window) via the cumsum tables; per-point
    evaluation mask (base.py:284-335). Ragged clip lengths exercise the
    remainder handling."""
    labels = np.random.default_rng(9).integers(0, 3, size=600)
    raw = _fixture_arrays(tmp_path, labels=labels,
                          clip_lens=[170, 155, 101, 174])
    cfg = _cfg_dict("semantic_segmentation", hist=16, pred=16, step=6)
    ref_ds = _ref_dataset(ref_base.SemanticSegmentationDataset, raw, cfg,
                          split, clip=True)
    my_ds = _my_dataset(raw, cfg, split, clip=True)
    assert len(ref_ds) > 0
    _compare_all_windows(ref_ds, my_ds, ["x_enc", "labels"])
    for idx in range(len(ref_ds)):
        assert ref_ds[idx]["descriptions"] == my_ds[idx]["descriptions"]
    np.testing.assert_array_equal(np.asarray(my_ds.mask),
                                  ref_ds.mask.numpy())
