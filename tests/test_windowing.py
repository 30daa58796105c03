import numpy as np
import pytest

from medtsllm_tpu.data import windowing as W
from medtsllm_tpu.data import get_dataset, BatchPipeline
from conftest import make_config


def test_forecast_window_count():
    # len = (n - hist - pred + 1) // step (reference datasets/base.py:135-136)
    w = W.ForecastWindows(100, 24, 12, 4)
    assert len(w) == (100 - 24 - 12 + 1) // 4
    xr, yr = w.inverse_index(3)
    assert xr == (12, 36) and yr == (36, 48)
    assert list(w.x_starts([0, 1, 2])) == [0, 4, 8]


def test_aligned_window_count():
    w = W.AlignedWindows(100, 16, 8)
    assert len(w) == (100 - 16) // 8 + 1
    assert w.inverse_index(2) == (16, 32)


def test_clip_windows_never_cross_boundaries():
    clip_ids = np.array([0] * 50 + [1] * 34 + [2] * 70)
    w = W.ClipWindows(clip_ids, pred_len=16, step=8)
    # per-clip counts
    assert list(w.clip_segs) == [(50 - 16) // 8 + 1, (34 - 16) // 8 + 1, (70 - 16) // 8 + 1]
    assert len(w) == sum(w.clip_segs)
    for i in range(len(w)):
        s, e = w.inverse_index(i)
        assert clip_ids[s] == clip_ids[e - 1], f"window {i} crosses clips"
    # vectorized starts match scalar path
    starts = w.x_starts(np.arange(len(w)))
    assert all(starts[i] == w.inverse_index(i)[0] for i in range(len(w)))


def test_clip_mask_matches_reference_formula():
    clip_ids = np.array([0] * 50 + [1] * 34)
    pred, step = 16, 8
    w = W.ClipWindows(clip_ids, pred, step)
    # step < pred: every covered point evaluated, remainder masked out
    covered0 = (w.clip_segs[0] - 1) * step + pred
    assert w.mask[:covered0].all()
    assert not w.mask[covered0:50].any()


def test_clip_mask_step_gt_pred():
    clip_ids = np.zeros(100, dtype=int)
    w = W.ClipWindows(clip_ids, pred_len=8, step=24)
    # only first 8 of every 24 evaluated
    covered = (len(w) - 1) * 24 + 8
    m = w.mask
    for t in range(covered):
        assert m[t] == ((t % 24) // 8 == 0)


def test_steps_to_boundary_labels():
    # replicate the reference loop exactly (datasets/base.py:265-281)
    def reference_loop(labels_binary):
        changepts = np.where(labels_binary)[0]
        changepts = np.append(changepts, len(labels_binary))
        labels = np.zeros(len(labels_binary), dtype=np.float32)
        seg_len = changepts[0]
        for i in range(len(labels)):
            labels[i] = (changepts[0] - i) / seg_len
            if i == changepts[0]:
                changepts = changepts[1:]
                seg_len = changepts[0] - i
        return labels

    rng = np.random.default_rng(0)
    binary = (rng.random(500) < 0.02).astype(int)
    binary[0] = 0
    binary[100] = 1  # ensure at least one boundary
    expected = reference_loop(binary)
    got = W.steps_to_boundary_labels(binary)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_stitch_matches_sequential_loop():
    rng = np.random.default_rng(1)
    n, L, C = 200, 16, 3
    w = W.AlignedWindows(n, L, 8)
    vals = rng.normal(size=(len(w), L, C)).astype(np.float32)
    starts = w.x_starts(np.arange(len(w)))
    got = W.stitch_windows(vals, starts, n, n_channels=C)
    # sequential loop semantics: later windows overwrite
    exp = np.full((n, C), np.nan, dtype=np.float32)
    for i in range(len(w)):
        s, e = w.inverse_index(i)
        exp[s:e] = vals[i]
    np.testing.assert_array_equal(got, exp)


def test_dedup_eval_series():
    arr = np.arange(100, dtype=np.float32).reshape(-1, 1) * np.ones((1, 2), np.float32)
    out = W.dedup_eval_series(arr, step=24, pred_len=8)
    assert out.shape == (32, 2)
    np.testing.assert_array_equal(out[:8, 0], np.arange(8))
    np.testing.assert_array_equal(out[8:16, 0], np.arange(24, 32))


def test_pipeline_fixed_shapes():
    cfg = make_config()
    ds = get_dataset(cfg, "train")
    pipe = BatchPipeline(ds, batch_size=7, shuffle=True, seed=0)
    shapes = set()
    n_valid_total = 0
    for batch in pipe:
        shapes.add(batch["x_enc"].shape)
        n_valid_total += batch["valid"].sum()
    assert len(shapes) == 1  # fixed shape incl. final batch
    assert n_valid_total == len(ds)


def test_univariate_mode():
    cfg = make_config(**{"data.mode": "univariate"})
    ds = get_dataset(cfg, "val")
    assert ds.n_features == 1 and ds.real_features == 3
    item = ds[5]
    assert item["x_enc"].shape[-1] == 1
    (xr, yr), f = ds.inverse_index(5)
    assert f == 5 % 3


def test_test_split_forces_nonoverlap():
    cfg = make_config(step=4)
    ds = get_dataset(cfg, "test")
    assert ds.step_size == cfg.pred_len
