"""Prompt-prefix KV cache (serving fast path).

The reference re-tokenizes and re-computes the FULL prompt through the
backbone for every batch (reference models/medtsllm.py:386-439,321-350).
Here the constant prompt head [bos + dataset description (+ task under
`cache_order`)] is laid out at positions 0..P-1, computed once per eval
pass by `MedTsLLM.prefill`, and served from a per-layer KV cache — the
compiled eval step runs only the variable suffix + TS patch tokens.
Train and uncached eval embed the same head in-graph at the same
positions, so cached and uncached paths are numerically identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medtsllm_tpu.tasks import get_trainer
from conftest import make_config


def _cfg(tmp_path, llm="llama-tiny", *, input_stats=True, cache_order=False,
         prefix_cache=True, quant=0, task="reconstruction", **kw):
    cfg = make_config(task=task, model="medtsllm", hist=32, pred=32,
                      step=16, **kw)
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 1
    cfg.training.batch_size = 4
    cfg.datasets.synthetic.n_points = 384
    cfg["models"] = {"medtsllm": {
        "d_model": 16, "d_ff": 16, "n_heads": 4, "num_tokens": 32,
        "covariate_mode": "concat",
        "embedding_downsample_mode": "linear",
        "patching": {"patch_len": 8, "stride": 4},
        "prompting": {"dataset": True, "task": True, "clip": False,
                      "input_stats": input_stats, "examples": False,
                      "input_stats_dim": 0, "input_stats_select": "all",
                      "cache_order": cache_order},
        "llm": {"enabled": True, "llm": llm, "llm_layers": -1,
                "prefix_cache": prefix_cache,
                "load_in_4bit": quant == 4, "load_in_8bit": quant == 8},
    }}
    return cfg


@pytest.mark.parametrize("llm", ["llama-tiny", "gpt2-tiny", "mixtral-tiny",
                                 "opt-tiny", "neox-tiny"])
def test_cached_equals_uncached(tmp_path, llm):
    """Serving the prefix from the KV cache must reproduce the in-graph
    forward exactly (same layout, same positions — llama rotary offset
    and gpt2 wpe offset both covered; mixtral covers the MoE FFN, which
    routes per token and so is untouched by the KV split; opt covers the
    +2 learned-position offset, neox the partial-rotary offset and the
    parallel residual)."""
    trainer = get_trainer(f"pc-{llm}", _cfg(tmp_path, llm=llm))
    batch = next(iter(trainer.test_pipeline))
    arrays = trainer.model_inputs(batch)
    assert "prefix_ids" in arrays and arrays["prefix_ids"].ndim == 1
    cached = trainer.eval_model_inputs(batch)
    assert "prefix_kv" in cached and "prefix_ids" not in cached

    out_u = trainer.eval_step(trainer.params, arrays)
    out_c = trainer.eval_step(trainer.params, cached)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_c),
                               rtol=1e-4, atol=1e-5)


def test_cache_order_moves_task_into_head(tmp_path):
    """`cache_order` relocates the constant task description from the
    per-window suffix into the cacheable head (content-identical
    prompt, serving-friendly order)."""
    t0 = get_trainer("pc-o0", _cfg(tmp_path, cache_order=False))
    t1 = get_trainer("pc-o1", _cfg(tmp_path, cache_order=True))
    b0 = next(iter(t0.test_pipeline))
    b1 = next(iter(t1.test_pipeline))
    a0, a1 = t0.model_inputs(b0), t1.model_inputs(b1)
    p0, p1 = list(a0["prefix_ids"]), list(a1["prefix_ids"])
    # head grows by exactly the task-description tokens, as a suffix
    task_ids = t1.preprocessor._encode(
        f"Task: {t1.preprocessor.task_description} ")
    assert p1 == p0 + task_ids
    # and the per-window suffix shrank by the same tokens
    pad = t0.preprocessor.pad_id
    s0 = [t for t in a0["prompt_ids"][0].tolist() if t != pad]
    s1 = [t for t in a1["prompt_ids"][0].tolist() if t != pad]
    assert sorted(s0) == sorted(s1 + task_ids)


def test_prefix_cache_disable_and_pretraining(tmp_path):
    # config off -> reference single left-pad layout (no split)
    t = get_trainer("pc-off", _cfg(tmp_path, prefix_cache=False))
    arrays = t.model_inputs(next(iter(t.test_pipeline)))
    assert "prefix_ids" not in arrays
    # pretraining mixture: per-sample dataset descriptions -> no split
    cfg = _cfg(tmp_path, task="pretraining")
    cfg.tasks = {"pretraining": {"downsample_pct": 0.5, "n_features": 2}}
    cfg.data.dataset = "pretraining"
    tp = get_trainer("pc-pt", cfg)
    arrays = tp.model_inputs(next(iter(tp.train_pipeline)))
    assert "prefix_ids" not in arrays
    assert "prompt_ids" in arrays


def test_unsupported_backbones_do_not_split(tmp_path):
    # enc-dec: the bidirectional encoder sees the whole prompt — no
    # cacheable prefix exists
    t = get_trainer("pc-encdec", _cfg(tmp_path, llm="encdec-tiny"))
    arrays = t.model_inputs(next(iter(t.test_pipeline)))
    assert "prefix_ids" not in arrays
    assert not t.model.supports_prefix_cache


def test_mamba_prefix_state_cache(tmp_path):
    """SSM backbone: the cached prefix is an O(1) per-layer (conv tail,
    recurrence state) pair; resuming from it equals the full scan."""
    trainer = get_trainer("pc-mamba", _cfg(tmp_path, llm="mamba-tiny"))
    assert trainer.model.supports_prefix_cache
    batch = next(iter(trainer.test_pipeline))
    arrays = trainer.model_inputs(batch)
    assert "prefix_ids" in arrays
    cached = trainer.eval_model_inputs(batch)
    conv_tail, ssm_state = cached["prefix_kv"][0]
    assert conv_tail.shape[1] == trainer.model.llm_cfg.d_conv - 1
    assert ssm_state.shape[1] == trainer.model.llm_cfg.d_state

    out_u = trainer.eval_step(trainer.params, arrays)
    out_c = trainer.eval_step(trainer.params, cached)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_c),
                               rtol=1e-4, atol=1e-5)


def test_run_eval_populates_and_clears_cache(tmp_path):
    trainer = get_trainer("pc-e2e", _cfg(tmp_path))
    scores = trainer.val()
    assert trainer._prefix_kv_cache, "eval did not build the prefix cache"
    assert len(trainer._prefix_kv_cache) == 1  # one constant head
    assert np.isfinite(scores["val/mse"])
    # a later eval pass must rebuild (params may have changed: LoRA /
    # finetuned embeddings) — the cache is cleared at entry
    kv_old = next(iter(trainer._prefix_kv_cache.values()))
    trainer.val()
    kv_new = next(iter(trainer._prefix_kv_cache.values()))
    assert kv_old is not kv_new


def test_quantized_prefix_cache(tmp_path):
    """int8 backbone: prefill runs the same s8xs8 matmuls; cached ==
    uncached."""
    trainer = get_trainer("pc-q8", _cfg(tmp_path, quant=8))
    batch = next(iter(trainer.test_pipeline))
    out_u = trainer.eval_step(trainer.params, trainer.model_inputs(batch))
    out_c = trainer.eval_step(trainer.params, trainer.eval_model_inputs(batch))
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_c),
                               rtol=1e-4, atol=1e-5)


def test_sharded_prefix_cache(tmp_path):
    """DP x TP mesh eval with the cached head: prefix_kv replicates /
    stays on-device while batches shard over "data"."""
    cfg = _cfg(tmp_path)
    cfg.setup["tensor_parallel"] = 2
    cfg.setup["data_parallel"] = 4
    sharded = get_trainer("pc-mesh", cfg)
    assert sharded.mesh is not None
    single = get_trainer("pc-single", _cfg(tmp_path))

    batch = next(iter(single.test_pipeline))
    out_s = sharded.eval_step(
        sharded.params, sharded._device_batch(sharded.eval_model_inputs(batch)))
    out_1 = single.eval_step(single.params, single.eval_model_inputs(batch))
    # same seed -> same init -> same numerics up to collective reduction order
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_1),
                               rtol=1e-3, atol=1e-4)


def test_train_step_uses_split_layout(tmp_path):
    """The train graph embeds the same [head | pads | suffix | ts] layout
    (prefix_ids in-graph), so train and cached eval see identical
    sequences."""
    trainer = get_trainer("pc-train", _cfg(tmp_path))
    batch = next(iter(trainer.train_pipeline))
    arrays = trainer.model_inputs(batch)
    assert "prefix_ids" in arrays
    valid = jnp.asarray(batch["valid"])
    _, _, loss = trainer.train_step(trainer.params, trainer.opt_state,
                                    arrays, valid, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("llm", ["llama-tiny", "mamba-tiny"])
def test_train_step_cached_gradients(tmp_path, llm):
    """Frozen backbone + no LoRA: the train path may serve the prefix
    from cache — loss AND gradients of every trainable subtree must
    match the embedded-prefix graph (transformer KV cache and mamba
    state cache, whose h0-seeded scan carries a custom_vjp)."""
    trainer = get_trainer(f"pc-tg-{llm}", _cfg(tmp_path, llm=llm))
    assert trainer.model.train_prefix_cache_safe
    batch = next(iter(trainer.train_pipeline))
    arrays_emb = trainer.model_inputs(batch)
    arrays_kv = trainer.train_model_inputs(batch)
    assert "prefix_kv" in arrays_kv and "prefix_ids" not in arrays_kv
    valid = jnp.asarray(batch["valid"])
    key = jax.random.PRNGKey(7)

    def loss_of(arr):
        def f(p):
            pred = trainer.model.apply({"params": p}, arr, training=True,
                                       rngs={"dropout": key})
            return trainer.loss_fn(pred.astype(jnp.float32), arr, valid)
        return jax.value_and_grad(f, allow_int=True)(trainer.params)

    l1, g1 = loss_of(arrays_emb)
    l2, g2 = loss_of(arrays_kv)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for sub in ("output_projection", "reprogramming_layer",
                "patch_embedding", "mapping_layer"):
        for a, b in zip(jax.tree.leaves(g1[sub]), jax.tree.leaves(g2[sub])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("dtype", ["bfloat16", "mixed"])
def test_cached_equals_uncached_nonf32(tmp_path, dtype):
    """Non-f32 precision modes: the prefill embed dtype must match what
    the in-graph path feeds the LLM (f32 via flax promotion in BOTH these
    eval paths — tasks/base.py prefill_program), so cached and uncached
    agree to rounding."""
    cfg = _cfg(tmp_path)
    cfg.setup["dtype"] = dtype
    trainer = get_trainer(f"pc-{dtype}", cfg)
    batch = next(iter(trainer.test_pipeline))
    arrays = trainer.model_inputs(batch)
    cached = trainer.eval_model_inputs(batch)
    out_u = np.asarray(trainer.eval_step(trainer.params, arrays),
                       dtype=np.float32)
    out_c = np.asarray(trainer.eval_step(trainer.params, cached),
                       dtype=np.float32)
    tol = dict(rtol=2e-2, atol=2e-2) if dtype == "bfloat16" else \
        dict(rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out_u, out_c, **tol)


def test_train_cache_mixed_precision_gradients(tmp_path):
    """Mixed-precision train step (arrays AND params cast to bf16): the
    train-flavored prefill embeds at the compute dtype over the same
    cast params, keeping the cached loss/gradients aligned with the
    embedded-prefix graph."""
    cfg = _cfg(tmp_path)
    cfg.setup["dtype"] = "mixed"
    trainer = get_trainer("pc-mixed-train", cfg)
    assert trainer.model.train_prefix_cache_safe
    batch = next(iter(trainer.train_pipeline))
    arrays_emb = trainer.model_inputs(batch)
    arrays_kv = trainer.train_model_inputs(batch)
    assert "prefix_kv" in arrays_kv
    valid = jnp.asarray(batch["valid"])
    key = jax.random.PRNGKey(7)

    def loss_of(arr):
        def f(p):
            pc = trainer._cast_for_compute(p)
            ac = trainer._cast_for_compute(arr)
            pred = trainer.model.apply({"params": pc}, ac, training=True,
                                       rngs={"dropout": key})
            return trainer.loss_fn(pred.astype(jnp.float32), arr, valid)
        return jax.value_and_grad(f, allow_int=True)(trainer.params)

    l1, g1 = loss_of(arrays_emb)
    l2, g2 = loss_of(arrays_kv)
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-2)
    for sub in ("output_projection", "mapping_layer"):
        for a, b in zip(jax.tree.leaves(g1[sub]), jax.tree.leaves(g2[sub])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-2, atol=5e-2)


def test_lora_disables_train_cache(tmp_path):
    """LoRA adapts q/v, so the prefix KV is NOT constant during training
    — the train path must embed the head (eval still caches, rebuilt per
    pass)."""
    cfg = _cfg(tmp_path)
    cfg.models.medtsllm["lora"] = {"enabled": True, "rank": 4, "alpha": 8,
                                   "layers": "auto"}
    trainer = get_trainer("pc-lora", cfg)
    assert not trainer.model.train_prefix_cache_safe
    assert trainer.model.supports_prefix_cache
    batch = next(iter(trainer.train_pipeline))
    arrays = trainer.train_model_inputs(batch)
    assert "prefix_ids" in arrays and "prefix_kv" not in arrays


def test_examples_mode_keeps_reference_order(tmp_path):
    """With in-context examples the head stops at [bos, dataset] (example
    text is per-sample) and the task description stays in the suffix even
    under cache_order."""
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
                      "input_stats_select": "all", "cache_order": True},
        "llm": {"enabled": True, "llm": "llama-tiny", "llm_layers": 1,
                "load_in_4bit": False, "load_in_8bit": False},
    }}
    trainer = get_trainer("pc-ex", cfg)
    batch = next(iter(trainer.val_pipeline))
    assert "examples" in batch
    arrays = trainer.model_inputs(batch)
    assert "prefix_ids" in arrays  # bos + dataset still cacheable
    assert "example_ts" in arrays and "post_prompt_ids" in arrays
    # the task description tokens live in the post suffix, not the head
    task_ids = trainer.preprocessor._encode(
        f"Task: {trainer.preprocessor.task_description} ")
    head = list(arrays["prefix_ids"])
    assert head[-len(task_ids):] != task_ids
    # cached eval equals uncached eval in examples mode too
    out_u = trainer.eval_step(trainer.params, arrays)
    out_c = trainer.eval_step(trainer.params, trainer.eval_model_inputs(batch))
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_c),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# multi-entry per-clip prefix cache (round 4): the clip description joins
# the cacheable head, keyed per clip in a fixed-capacity LRU KV bank
# ---------------------------------------------------------------------------


def _clip_cfg(tmp_path, n_clips=4, slots=8, clip_head=True, **kw):
    cfg = _cfg(tmp_path, **kw)
    cfg.datasets.synthetic["clips"] = True
    cfg.datasets.synthetic["n_clips"] = n_clips
    p = cfg.models.medtsllm.prompting
    p["clip"] = True
    p["clip_head"] = clip_head
    p["clip_cache_slots"] = slots
    return cfg


def test_clip_head_layout(tmp_path):
    """With clip prompting on a clip dataset, the head becomes per-sample
    [B, P] rows = [bos + dataset + clip], and the per-window suffix
    drops the clip tokens (token ORDER unchanged vs the single-pad
    reference layout)."""
    t = get_trainer("pch-layout", _clip_cfg(tmp_path))
    batch = next(iter(t.test_pipeline))
    arrays = t.model_inputs(batch)
    assert arrays["prefix_ids"].ndim == 2
    assert arrays["prefix_ids"].shape[0] == len(batch["descriptions"])
    pb = t.preprocessor
    pad = pb.pad_id
    # head row b = constant head + clip tokens, left-padded
    const = sum((pb._encode(p) for p in
                 [pb.bos, f"Dataset: {pb.dataset_description} "]), [])
    for b, desc in enumerate(batch["descriptions"]):
        row = [x for x in arrays["prefix_ids"][b].tolist()]
        row_real = row[row.index(const[0]):] if const[0] in row else row
        expect = const + pb._encode(desc + " ")
        assert row_real == expect
    # suffix has no clip tokens: same suffix for same-stats windows
    # regardless of clip — checked via the no-clip-in-suffix property:
    off = get_trainer("pch-off", _clip_cfg(tmp_path, clip_head=False))
    b2 = next(iter(off.test_pipeline))
    a2 = off.model_inputs(b2)
    assert a2["prefix_ids"].ndim == 1  # old layout: constant head
    s_on = (arrays["prompt_ids"] != pad).sum()
    s_off = (a2["prompt_ids"] != pad).sum()
    assert s_on < s_off  # clip tokens left the computed suffix


def test_banked_eval_step_equals_gather_path(tmp_path):
    """eval_dispatch routes 2D clip heads through eval_step_banked (the
    bank row-gather runs IN-GRAPH, one dispatch — r5, BASELINE row 5q);
    outputs must equal the eval_model_inputs gather path bit-for-bit,
    and run_eval/val must serve through it unchanged."""
    t = get_trainer("pch-banked", _clip_cfg(tmp_path))
    batch = next(iter(t.test_pipeline))
    via_gather = t.eval_step(t.params, t.eval_model_inputs(batch))
    out = t.eval_dispatch(batch)
    kind, _ = t.eval_prepare(batch)
    assert kind == "banked"
    np.testing.assert_array_equal(np.asarray(out), np.asarray(via_gather))
    # the full stitched eval flows through eval_dispatch too
    scores = t.val()
    assert all(np.isfinite(v) for v in scores.values())


@pytest.mark.parametrize("llm", ["llama-tiny", "gpt2-tiny"])
def test_clip_cached_equals_uncached(tmp_path, llm):
    """Per-clip KV bank serving must equal the in-graph forward exactly."""
    t = get_trainer(f"pch-{llm}", _clip_cfg(tmp_path, llm=llm))
    batch = next(iter(t.test_pipeline))
    arrays = t.model_inputs(batch)
    assert arrays["prefix_ids"].ndim == 2
    cached = t.eval_model_inputs(batch)
    assert "prefix_kv" in cached and "prefix_ids" not in cached
    # per-sample KV rows (not a broadcast single head)
    assert jax.tree.leaves(cached["prefix_kv"])[0].shape[0] == \
        arrays["prefix_ids"].shape[0]
    out_u = t.eval_step(t.params, arrays)
    out_c = t.eval_step(t.params, cached)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_c),
                               rtol=1e-4, atol=1e-5)


def test_clip_bank_lru_eviction(tmp_path):
    """More clips than slots: the bank evicts LRU, never a row pinned by
    the current batch, and stays numerically exact after eviction and
    re-prefill."""
    t = get_trainer("pch-lru", _clip_cfg(tmp_path, n_clips=6, slots=2))
    seen = []
    for batch in t.test_pipeline:
        arrays = t.model_inputs(batch)
        if arrays.get("prefix_ids") is None:
            continue
        cached = t.eval_model_inputs(batch)
        out_u = t.eval_step(t.params, arrays)
        out_c = t.eval_step(t.params, cached)
        np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_c),
                                   rtol=1e-4, atol=1e-5)
        seen.extend(batch["descriptions"])
    assert len(set(seen)) == 6  # really cycled through all clips
    bank = [v for k, v in t._prefix_kv_cache.items()
            if isinstance(k, tuple) and k[0] == "clip_bank"]
    # effective capacity = max(configured slots, batch width): a batch
    # can pin up to B rows, so the bank never shrinks below B
    assert bank and len(bank[0]["slot_of"]) <= max(
        2, t.config.training.batch_size)


def test_clip_head_train_embeds_in_graph(tmp_path):
    """TRAIN keeps per-clip heads embedded in-graph (no bank thrash):
    train inputs carry prefix_ids, not prefix_kv — and one train step
    runs finite."""
    t = get_trainer("pch-train", _clip_cfg(tmp_path))
    batch = next(iter(t.train_pipeline))
    arrays = t.train_model_inputs(batch)
    assert "prefix_kv" not in arrays and arrays["prefix_ids"].ndim == 2
    import jax.numpy as jnp
    p, o, loss = t.train_step(t.params, t.opt_state,
                              t._device_batch(arrays),
                              jnp.asarray(batch["valid"]), t._next_rng())
    assert np.isfinite(float(loss))


def test_clip_head_full_eval_pass(tmp_path):
    """A whole stitched eval pass over a clip dataset with the bank on:
    scores finite, cache populated then cleared per-pass semantics."""
    t = get_trainer("pch-pass", _clip_cfg(tmp_path, n_clips=3))
    scores = t.val()
    assert all(np.isfinite(v) for v in scores.values())


def test_clip_bank_batch_wider_than_slots(tmp_path):
    """One batch spanning MORE distinct clips than the configured slot
    count must not deadlock the pinned-row eviction (regression: every
    slot pinned by the current batch left min() over an empty candidate
    set). The bank grows to at least the batch width and serving stays
    numerically exact."""
    t = get_trainer("pch-wide", _clip_cfg(tmp_path, n_clips=12, slots=2))
    checked = 0
    for batch in t.test_pipeline:
        arrays = t.model_inputs(batch)
        if arrays.get("prefix_ids") is None:
            continue
        if len(set(batch["descriptions"])) > 2:
            cached = t.eval_model_inputs(batch)  # crashed before the fix
            out_u = t.eval_step(t.params, arrays)
            out_c = t.eval_step(t.params, cached)
            np.testing.assert_allclose(np.asarray(out_u),
                                       np.asarray(out_c),
                                       rtol=1e-4, atol=1e-5)
            checked += 1
    assert checked  # the fixture really produced >slots clips per batch
