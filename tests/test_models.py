"""Model correctness tests: op-level oracles + e2e smoke per model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medtsllm_tpu.tasks import get_trainer
from conftest import make_config


def _cfg(model, task, tmp_path, **kw):
    cfg = make_config(task=task, model=model, hist=32, pred=32, step=16, **kw)
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 1
    cfg.training.batch_size = 4
    cfg.datasets.synthetic.n_points = 512
    cfg["models"] = {
        "dlinear": {"individual": False, "moving_avg": 13},
        "patchtst": {"d_model": 16, "d_ff": 32, "n_heads": 4, "e_layers": 2,
                     "covariate_mode": "independent",
                     "patching": {"patch_len": 8, "stride": 4}},
        "timesnet": {"d_model": 8, "d_ff": 16, "e_layers": 1, "top_k": 2,
                     "num_kernels": 3},
    }
    return cfg


# ---------------------------------------------------------------------------
# op oracles
# ---------------------------------------------------------------------------

def test_moving_avg_matches_torch_semantics():
    import torch
    from medtsllm_tpu.ops.decomp import moving_avg
    x = np.random.default_rng(0).normal(size=(2, 50, 3)).astype(np.float32)
    k = 13
    got = np.asarray(moving_avg(jnp.asarray(x), k))
    xt = torch.tensor(x)
    pad = (k - 1) // 2
    front = xt[:, :1, :].repeat(1, pad, 1)
    end = xt[:, -1:, :].repeat(1, pad, 1)
    xp = torch.cat([front, xt, end], dim=1)
    exp = torch.nn.functional.avg_pool1d(
        xp.permute(0, 2, 1), k, stride=1).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_revin_roundtrip():
    from medtsllm_tpu.ops.revin import revin_norm, revin_denorm
    x = jnp.asarray(np.random.default_rng(1).normal(2.0, 3.0, size=(4, 32, 5)))
    xn, stats = revin_norm(x)
    assert np.allclose(np.asarray(xn).mean(axis=1), 0, atol=1e-5)
    back = revin_denorm(xn, stats)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_patch_unfold_matches_torch():
    import torch
    from medtsllm_tpu.ops.embed import patch_unfold
    x = np.random.default_rng(2).normal(size=(2, 3, 32)).astype(np.float32)
    pl, st = 8, 4
    got = np.asarray(patch_unfold(jnp.asarray(x), pl, st))
    xt = torch.tensor(x)
    pad = xt[:, :, -1:].repeat(1, 1, st)
    xp = torch.cat([xt, pad], dim=-1)
    exp = xp.unfold(dimension=-1, size=pl, step=st).numpy()
    np.testing.assert_allclose(got, exp, atol=1e-6)
    # n_patches = (L - patch)/stride + 2 (reference medtsllm.py:52)
    assert got.shape[2] == (32 - pl) // st + 2


def test_full_attention_matches_manual_softmax():
    from medtsllm_tpu.ops.attention import FullAttention
    rng = np.random.default_rng(3)
    q = rng.normal(size=(2, 5, 2, 4)).astype(np.float32)
    k = rng.normal(size=(2, 7, 2, 4)).astype(np.float32)
    v = rng.normal(size=(2, 7, 2, 4)).astype(np.float32)
    attn = FullAttention(mask_flag=False, attention_dropout=0.0)
    out, _ = attn.apply({}, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    scores = np.einsum("blhe,bshe->bhls", q, k) / np.sqrt(4)
    a = np.exp(scores - scores.max(-1, keepdims=True))
    a = a / a.sum(-1, keepdims=True)
    exp = np.einsum("bhls,bshd->blhd", a, v)
    np.testing.assert_allclose(np.asarray(out), exp, atol=1e-5)


def test_fold_conv2d_matches_torch_conv2d():
    """The gather-conv on the folded grid must equal an actual 2D conv on
    the zero-padded folded image (what the reference computes,
    TimesNet.py:290-310)."""
    import torch
    from medtsllm_tpu.ops.inception import fold_conv2d
    rng = np.random.default_rng(4)
    B, T, Nin, Nout, K = 2, 30, 3, 5, 3
    period = 7
    x = rng.normal(size=(B, T, Nin)).astype(np.float32)
    w = rng.normal(size=(K, K, Nin, Nout)).astype(np.float32) * 0.1
    b = rng.normal(size=(Nout,)).astype(np.float32)

    got = np.asarray(fold_conv2d(jnp.asarray(x), jnp.asarray(period),
                                 jnp.asarray(w), jnp.asarray(b)))

    # torch oracle: zero-pad to cycles*period, fold, conv2d, unfold, crop
    cycles = -(-T // period)
    xp = np.zeros((B, cycles * period, Nin), np.float32)
    xp[:, :T] = x
    img = torch.tensor(xp.reshape(B, cycles, period, Nin)).permute(0, 3, 1, 2)
    wt = torch.tensor(w).permute(3, 2, 0, 1)  # [out, in, K, K]
    out = torch.nn.functional.conv2d(img, wt, torch.tensor(b), padding=K // 2)
    out = out.permute(0, 2, 3, 1).reshape(B, cycles * period, Nout)
    exp = out[:, :T].numpy()
    np.testing.assert_allclose(got, exp, atol=1e-4)


def test_fft_for_period_finds_planted_period():
    from medtsllm_tpu.ops.inception import fft_for_period
    t = np.arange(64)
    x = np.sin(2 * np.pi * t / 16)[None, :, None] * np.ones((2, 1, 3))
    periods, weight = fft_for_period(jnp.asarray(x, dtype=jnp.float32), k=2)
    assert 16 in np.asarray(periods)
    assert weight.shape == (2, 2)


# ---------------------------------------------------------------------------
# e2e smoke per model
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("model", ["patchtst", "timesnet"])
def test_model_forecasting(model, tmp_path):
    trainer = get_trainer(f"{model}-f", _cfg(model, "forecasting", tmp_path))
    trainer.train()
    scores = trainer.test()
    assert np.isfinite(scores["test/mse"])


@pytest.mark.parametrize("model", ["patchtst", "timesnet"])
def test_model_anomaly_detection(model, tmp_path):
    cfg = _cfg(model, "anomaly_detection", tmp_path,
               eval_metric="f1", eval_dir="max")
    trainer = get_trainer(f"{model}-ad", cfg)
    scores = trainer.test()
    assert 0 <= scores["test/f1"] <= 1


def test_patchtst_semantic_segmentation(tmp_path):
    cfg = _cfg("patchtst", "semantic_segmentation", tmp_path, loss="auto",
               eval_metric="iou", eval_dir="max")
    trainer = get_trainer("pt-sem", cfg)
    scores = trainer.val()
    assert 0 <= scores["val/iou"] <= 1


def test_timesnet_segmentation(tmp_path):
    cfg = _cfg("timesnet", "segmentation", tmp_path, loss="bce",
               eval_metric="segment_miou", eval_dir="max")
    trainer = get_trainer("tn-seg", cfg)
    scores = trainer.val()
    assert "val/segment_miou" in scores
