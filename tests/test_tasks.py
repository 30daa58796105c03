"""Every task runs end-to-end with DLinear on synthetic data."""

import numpy as np
import pytest

from medtsllm_tpu.tasks import get_trainer
from medtsllm_tpu.tasks.postproc import adjust_anomalies, all_pairs_iou, running_mean
from conftest import make_config


def _cfg(task, tmp_path, **kw):
    cfg = make_config(task=task, model="dlinear", hist=32, pred=32, step=16, **kw)
    cfg["models"] = {"dlinear": {"individual": False, "moving_avg": 13}}
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 1
    cfg.datasets.synthetic.n_points = 768
    return cfg


def test_anomaly_detection(tmp_path):
    cfg = _cfg("anomaly_detection", tmp_path, eval_metric="f1", eval_dir="max")
    trainer = get_trainer("ad", cfg)
    trainer.train()
    scores = trainer.test()
    for k in ("test/accuracy", "test/f1", "test/auroc", "test/iou",
              "test/recon_mse", "test/anomaly_threshold"):
        assert k in scores
    assert 0 <= scores["test/f1"] <= 1


def test_anomaly_detection_fixed_threshold(tmp_path):
    cfg = _cfg("anomaly_detection", tmp_path)
    cfg.tasks.anomaly_detection.threshold = 0.05
    trainer = get_trainer("ad2", cfg)
    scores = trainer.test()
    assert scores["test/anomaly_quantile"] == pytest.approx(0.95)


def test_segmentation_boundary(tmp_path):
    cfg = _cfg("segmentation", tmp_path, loss="bce",
               eval_metric="segment_miou", eval_dir="max")
    trainer = get_trainer("seg", cfg)
    trainer.train()
    scores = trainer.test()
    assert "test/segment_miou" in scores and "test/point_mae" in scores
    assert 0 <= scores["test/segment_miou"] <= 1


def test_segmentation_steps_to_boundary(tmp_path):
    cfg = _cfg("segmentation", tmp_path, loss="mse",
               eval_metric="segment_miou", eval_dir="max")
    cfg.tasks.segmentation.mode = "steps-to-boundary"
    trainer = get_trainer("seg2", cfg)
    scores = trainer.test()
    assert "test/segment_miou" in scores


def test_semantic_segmentation_binary(tmp_path):
    cfg = _cfg("semantic_segmentation", tmp_path, loss="auto",
               eval_metric="iou", eval_dir="max")
    trainer = get_trainer("sem", cfg)
    trainer.train()
    scores = trainer.test()
    assert 0 <= scores["test/iou"] <= 1


def test_semantic_segmentation_multiclass(tmp_path):
    cfg = _cfg("semantic_segmentation", tmp_path, loss="ce",
               eval_metric="iou", eval_dir="max")
    cfg.datasets.synthetic.n_classes = 4
    trainer = get_trainer("sem4", cfg)
    trainer.train()
    scores = trainer.test()
    assert 0 <= scores["test/accuracy"] <= 1


def test_classification(tmp_path):
    cfg = _cfg("classification", tmp_path, loss="ce",
               eval_metric="accuracy", eval_dir="max")
    cfg.datasets.synthetic.n_classes = 3
    trainer = get_trainer("cls", cfg)
    trainer.train()
    scores = trainer.test()
    for k in ("test/accuracy", "test/f1", "test/precision", "test/recall"):
        assert k in scores
        assert 0 <= scores[k] <= 1
    assert "test/auroc" not in scores  # multiclass


def test_classification_binary_any(tmp_path):
    cfg = _cfg("classification", tmp_path, loss="auto",
               eval_metric="f1", eval_dir="max")
    cfg["tasks"] = {"classification": {"window_label": "any"}}
    trainer = get_trainer("cls2", cfg)
    scores = trainer.test()
    assert trainer.test_dataset.n_classes == 2
    assert "test/auroc" in scores


def test_classification_window_label_modes():
    from medtsllm_tpu.data import get_dataset
    cfg = make_config(task="classification", model="dlinear",
                      hist=32, pred=32, step=16, loss="ce")
    cfg.datasets.synthetic.n_points = 512
    cfg.datasets.synthetic.n_classes = 3
    for mode, rule in (
            ("majority", lambda seg: np.bincount(seg).argmax()),
            ("last", lambda seg: seg[-1]),
            ("any", lambda seg: int((seg != 0).any()))):
        cfg["tasks"] = {"classification": {"window_label": mode}}
        ds = get_dataset(cfg, "train")
        for idx in (0, 1, len(ds) - 1):
            x_range = ds.inverse_index(idx)
            seg = ds.labels[slice(*x_range)]
            assert ds[idx]["labels"] == rule(seg), (mode, idx)


def test_imputation(tmp_path):
    cfg = _cfg("imputation", tmp_path, loss="mse",
               eval_metric="masked_mse", eval_dir="min")
    cfg["tasks"] = {"imputation": {"mask_rate": 0.3}}
    trainer = get_trainer("imp", cfg)
    trainer.train()
    scores = trainer.test()
    for k in ("test/masked_mse", "test/masked_mae", "test/full_mse"):
        assert k in scores and np.isfinite(scores[k])
    # eval masks are deterministic per window index
    p1, t1, m1 = trainer.predict(trainer.test_pipeline)
    p2, t2, m2 = trainer.predict(trainer.test_pipeline)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(p1, p2)
    assert 0.2 < 1 - m1.mean() < 0.4  # ~mask_rate held out
    # train masks are salted by epoch (fresh masks each epoch)
    batch = next(iter(trainer.train_pipeline))
    trainer.epoch = 1
    a1 = trainer.train_model_inputs(batch)
    trainer.epoch = 2
    a2 = trainer.train_model_inputs(batch)
    assert not np.array_equal(a1["mask"], a2["mask"])
    np.testing.assert_array_equal(a1["y"], a2["y"])


def test_imputation_masked_norm_oracle():
    """masked_window_norm vs the reference torch formula
    (TimesNet.py:114-123) as a numpy loop oracle."""
    from medtsllm_tpu.ops.revin import masked_window_norm
    rng = np.random.default_rng(0)
    x_full = rng.normal(2.0, 3.0, size=(2, 16, 3)).astype(np.float32)
    mask = (rng.random((2, 16, 3)) >= 0.3).astype(np.float32)
    x_in = x_full * mask  # pre-masked input, like the exp loop
    got_x, got_mu, got_sd = (np.asarray(v) for v in
                             masked_window_norm(x_in, mask))
    for b in range(2):
        for c in range(3):
            obs = mask[b, :, c] == 1
            mu = x_full[b, obs, c].sum() / max(obs.sum(), 1)
            xc = (x_in[b, :, c] - mu) * mask[b, :, c]
            sd = np.sqrt((xc ** 2).sum() / max(obs.sum(), 1) + 1e-5)
            np.testing.assert_allclose(got_mu[b, 0, c], mu, rtol=1e-5)
            np.testing.assert_allclose(got_sd[b, 0, c], sd, rtol=1e-5)
            np.testing.assert_allclose(got_x[b, :, c], xc / sd, rtol=1e-4,
                                       atol=1e-5)


def test_imputation_loss_counts_held_out_only():
    import jax.numpy as jnp
    from medtsllm_tpu.tasks import losses as L
    loss = L.build_loss("mse", "imputation", 0)
    pred = jnp.zeros((2, 4, 1))
    y = jnp.ones((2, 4, 1))
    mask = jnp.asarray([[[1.0], [1.0], [0.0], [0.0]],
                        [[1.0], [1.0], [1.0], [1.0]]])
    valid = jnp.asarray([True, True])
    # sample 0: 2 held-out points, each err 1 -> 1.0; sample 1: none -> 0
    assert float(loss(pred, {"y": y, "mask": mask}, valid)) == 0.5
    # invalid rows are excluded
    valid = jnp.asarray([True, False])
    assert float(loss(pred, {"y": y, "mask": mask}, valid)) == 1.0


def test_pretraining_dataset_mixture(tmp_path):
    # the PretrainingTask trainer itself is exercised in test_medtsllm.py
    # (only MedTsLLM supports the pretraining task, like the reference);
    # here we check the mixture dataset contract
    from medtsllm_tpu.data import get_dataset
    from medtsllm_tpu.data.util import PretrainingDataset
    base = _cfg("reconstruction", tmp_path)
    mix = {}
    for name in ("a", "b"):
        cfg = base.copy()
        cfg.datasets.synthetic.n_features = 2 if name == "a" else 4
        mix[name] = get_dataset(cfg, "train")
    ds = PretrainingDataset(mix, downsample_pct=0.5, n_features="auto", seed=0)
    assert ds.n_features == 4
    item = ds[0]
    assert item["x_enc"].shape[1] == 4
    assert "dataset_description" in item
    assert len(ds) == sum(max(1, int(0.5 * len(d))) for d in mix.values())


# -- post-processing numerics ------------------------------------------------

def _reference_adjust(pred, gt):
    """Direct port of the reference numba loop for parity checking
    (tasks/anomaly_detection.py:215-237)."""
    pred, gt = pred.copy(), gt.copy()
    anomaly_state = False
    for i in range(len(gt)):
        if gt[i] == 1 and pred[i] == 1 and not anomaly_state:
            anomaly_state = True
            for j in range(i, 0, -1):
                if gt[j] == 0:
                    break
                if pred[j] == 0:
                    pred[j] = 1
            for j in range(i, len(gt)):
                if gt[j] == 0:
                    break
                if pred[j] == 0:
                    pred[j] = 1
        elif gt[i] == 0:
            anomaly_state = False
        if anomaly_state:
            pred[i] = 1
    return pred


def test_point_adjust_matches_reference_loop():
    rng = np.random.default_rng(0)
    for _ in range(20):
        gt = (rng.random(300) < 0.15).astype(np.int64)
        pred = (rng.random(300) < 0.1).astype(np.int64)
        expected = _reference_adjust(pred, gt)
        got = adjust_anomalies(pred, gt)
        np.testing.assert_array_equal(got, expected)


def test_point_adjust_numpy_path_index0_parity(monkeypatch):
    """The numpy fallback must reproduce the reference loop exactly —
    including its quirk that the backward fill never visits index 0, so
    a GT segment starting at 0 keeps pred[0] unfilled."""
    import medtsllm_tpu.native as native
    monkeypatch.setattr(native, "adjust_anomalies_native",
                        lambda p, g: None)  # force the numpy path
    gt = np.array([1, 1, 1, 1, 0, 1, 1], np.int64)
    pred = np.array([0, 0, 1, 0, 0, 0, 1], np.int64)
    got = adjust_anomalies(pred, gt)
    np.testing.assert_array_equal(got, _reference_adjust(pred.copy(), gt))
    assert got[0] == 0  # index-0 quirk preserved
    rng = np.random.default_rng(1)
    for _ in range(20):
        gt = (rng.random(300) < 0.15).astype(np.int64)
        gt[0] = 1  # exercise the segment-at-origin case every time
        pred = (rng.random(300) < 0.1).astype(np.int64)
        np.testing.assert_array_equal(adjust_anomalies(pred, gt),
                                      _reference_adjust(pred.copy(), gt))


def test_all_pairs_iou():
    s1 = np.array([[0, 10], [10, 20]])
    s2 = np.array([[5, 15]])
    iou = all_pairs_iou(s1, s2)
    assert iou.shape == (2, 1)
    np.testing.assert_allclose(iou[:, 0], [5 / 15, 5 / 15])


def test_running_mean_same_length():
    x = np.arange(50, dtype=np.float64)
    m = running_mean(x, 5)
    assert m.shape == x.shape
    np.testing.assert_allclose(m[10], x[8:13].mean())
