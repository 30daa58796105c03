"""Golden-shape + determinism checks over the model x task matrix
(SURVEY.md §4 test strategy item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medtsllm_tpu.data import get_dataset
from medtsllm_tpu.models import build_model, model_lookup
from conftest import make_config

ALL_TASKS = ("forecasting", "reconstruction", "anomaly_detection",
             "segmentation", "semantic_segmentation", "classification",
             "imputation")

MODEL_SECTIONS = {
    "dlinear": {"individual": False, "moving_avg": 13},
    "patchtst": {"d_model": 16, "d_ff": 32, "n_heads": 4, "e_layers": 1,
                 "covariate_mode": "independent",
                 "patching": {"patch_len": 8, "stride": 4}},
    "timesnet": {"d_model": 8, "d_ff": 16, "e_layers": 1, "top_k": 2,
                 "num_kernels": 2},
    "fedformer": {"version": "fourier", "mode_select": "low", "modes": 4,
                  "label_len": 16, "e_layers": 1, "d_layers": 1, "d_model": 16,
                  "n_heads": 8, "d_ff": 32, "moving_avg": 13,
                  "activation": "gelu"},
    "gpt4ts": {"llm": "gpt2-tiny", "d_model": 32, "d_ff": 32, "gpt_layers": 1,
               "train_mlp": False, "patching": {"patch_len": 8, "stride": 4}},
    "medtsllm": {"d_model": 8, "d_ff": 8, "n_heads": 2, "num_tokens": 16,
                 "covariate_mode": "concat",
                 "embedding_downsample_mode": "linear",
                 "patching": {"patch_len": 8, "stride": 4},
                 "prompting": {"dataset": True, "task": True, "clip": False,
                               "input_stats": False, "examples": False,
                               "input_stats_dim": 0,
                               "input_stats_select": "all"},
                 "llm": {"enabled": True, "llm": "llama-tiny",
                         "llm_layers": 1, "load_in_4bit": False,
                         "load_in_8bit": False}},
}

LOSS_FOR_TASK = {"forecasting": "mse", "reconstruction": "mse",
                 "anomaly_detection": "mse", "segmentation": "bce",
                 "semantic_segmentation": "auto", "classification": "ce",
                 "imputation": "mse"}

B, L, C = 2, 32, 3


def _forward(model_name, task):
    cfg = make_config(task=task, model=model_name, hist=L,
                      pred=(16 if task == "forecasting" else L), step=16,
                      loss=LOSS_FOR_TASK[task])
    cfg["models"] = {model_name: MODEL_SECTIONS[model_name]}
    cfg.datasets.synthetic.n_points = 256
    dataset = get_dataset(cfg, "train")
    model = build_model(cfg, dataset)
    item_keys = dataset[0]
    x = np.stack([item_keys["x_enc"], item_keys["x_enc"]])
    arrays = {"x_enc": jnp.asarray(x)}
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, arrays,
                        training=False)["params"]
    out_eval = model.apply({"params": params}, arrays, training=False)
    out_train = model.apply({"params": params}, arrays, training=True,
                            rngs={"dropout": rng})
    return cfg, dataset, np.asarray(out_eval), np.asarray(out_train)


@pytest.mark.parametrize("model_name", sorted(MODEL_SECTIONS))
@pytest.mark.parametrize("task", ALL_TASKS)
def test_forward_shapes(model_name, task):
    cls = model_lookup[model_name]
    if task not in cls.supported_tasks:
        pytest.skip(f"{model_name} does not support {task}")
    cfg, dataset, out_eval, out_train = _forward(model_name, task)
    pred_len = cfg.pred_len
    if task == "forecasting":
        assert out_eval.shape == (B, pred_len, C)
    elif task in ("reconstruction", "anomaly_detection", "imputation"):
        assert out_eval.shape == (B, L, C)
    elif task == "segmentation":
        assert out_eval.shape == (B, L)
        assert (out_eval >= 0).all() and (out_eval <= 1).all(), \
            "eval-mode boundary scores must be sigmoided"
        assert not ((out_train >= 0).all() and (out_train <= 1).all() and
                    np.allclose(out_train, out_eval)), \
            "train-mode must emit logits"
    elif task == "semantic_segmentation":
        assert out_eval.shape == (B, L)  # binary synthetic default
        assert (out_eval >= 0).all() and (out_eval <= 1).all()
    elif task == "classification":
        assert out_eval.shape == (B, dataset.n_classes)
    assert np.isfinite(out_eval).all()
    assert np.isfinite(out_train).all()


def test_semantic_segmentation_multiclass_shapes():
    for model_name in ("dlinear", "patchtst", "timesnet", "fedformer",
                       "medtsllm"):
        cfg = make_config(task="semantic_segmentation", model=model_name,
                          hist=L, pred=L, step=16, loss="ce")
        cfg["models"] = {model_name: MODEL_SECTIONS[model_name]}
        cfg.datasets.synthetic.n_points = 256
        cfg.datasets.synthetic.n_classes = 4
        dataset = get_dataset(cfg, "train")
        model = build_model(cfg, dataset)
        x = np.stack([dataset[0]["x_enc"]] * B)
        arrays = {"x_enc": jnp.asarray(x)}
        rng = jax.random.PRNGKey(0)
        params = model.init({"params": rng, "dropout": rng}, arrays,
                            training=False)["params"]
        out = np.asarray(model.apply({"params": params}, arrays,
                                     training=False))
        assert out.shape == (B, L, 4), f"{model_name}: {out.shape}"
        np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-4)


def test_determinism_same_seed():
    """Same config + seed => identical params and outputs (SURVEY §5.2)."""
    import medtsllm_tpu.utils as U
    for _ in range(2):
        U.set_seed(0)
    _, _, a1, _ = _forward("dlinear", "forecasting")
    _, _, a2, _ = _forward("dlinear", "forecasting")
    np.testing.assert_array_equal(a1, a2)


def test_two_stage_attention():
    from medtsllm_tpu.ops.crossformer import TwoStageAttentionLayer
    layer = TwoStageAttentionLayer(seg_num=4, factor=2, d_model=16, n_heads=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 4, 16)),
                    jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(params, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_masks():
    from medtsllm_tpu.ops.masks import prob_mask, triangular_causal_mask
    m = triangular_causal_mask(4)
    assert not m[3, 3] and m[0, 1]
    idx = jnp.asarray([[[0, 3]]])
    pm = prob_mask(4, idx, (1, 1, 2, 4))
    assert pm.shape == (1, 1, 2, 4)
    np.testing.assert_array_equal(np.asarray(pm[0, 0, 0]),
                                  [False, True, True, True])
