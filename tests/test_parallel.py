"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from medtsllm_tpu.tasks import get_trainer
from conftest import make_config


@pytest.fixture(autouse=True)
def needs_8_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def _cfg(tmp_path, tensor=2):
    cfg = make_config(task="reconstruction", model="medtsllm",
                      hist=32, pred=32, step=16)
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 1
    cfg.training.batch_size = 8
    cfg.datasets.synthetic.n_points = 256
    cfg.setup["tensor_parallel"] = tensor
    cfg["models"] = {"medtsllm": {
        "d_model": 16, "d_ff": 16, "n_heads": 4, "num_tokens": 32,
        "covariate_mode": "concat", "embedding_downsample_mode": "linear",
        "patching": {"patch_len": 8, "stride": 4},
        "prompting": {"dataset": True, "task": True, "clip": False,
                      "input_stats": False, "examples": False,
                      "input_stats_dim": 0, "input_stats_select": "all"},
        "llm": {"enabled": True, "llm": "llama-tiny", "llm_layers": -1,
                "load_in_4bit": False, "load_in_8bit": False},
    }}
    return cfg


def test_sharded_training_step_runs(tmp_path):
    trainer = get_trainer("shard", _cfg(tmp_path, tensor=2))
    assert trainer.mesh is not None
    assert dict(trainer.mesh.shape) == {"data": 4, "tensor": 2}
    # llm q_proj kernel must actually be sharded over tensor axis
    k = trainer.params["llm"]["h_0"]["attn"]["q_proj"]["base"]["kernel"]
    assert len(k.sharding.device_set) == 8
    trainer.train()
    scores = trainer.val()
    assert np.isfinite(scores["val/mse"])


def test_sharded_matches_single_device(tmp_path):
    """One sharded train epoch must match the unsharded run numerically."""
    cfg1 = _cfg(tmp_path / "a", tensor=1)
    cfg1.setup["tensor_parallel"] = 1
    cfg1.setup["data_parallel"] = 1
    t1 = get_trainer("single", cfg1)

    cfg2 = _cfg(tmp_path / "b", tensor=2)
    t2 = get_trainer("multi", cfg2)

    t1.train()
    t2.train()
    p1 = jax.device_get(t1.params["mapping_layer"]["kernel"])
    p2 = jax.device_get(t2.params["mapping_layer"]["kernel"])
    np.testing.assert_allclose(p1, p2, atol=2e-4)


def test_pure_data_parallel(tmp_path):
    """(8, 1) mesh: pure DP, no tensor sharding."""
    cfg = _cfg(tmp_path, tensor=1)
    cfg.setup["data_parallel"] = 8
    trainer = get_trainer("dp8", cfg)
    assert dict(trainer.mesh.shape) == {"data": 8, "tensor": 1}
    trainer.train()
    assert np.isfinite(trainer.val()["val/mse"])


def test_tensor_parallel_4(tmp_path):
    """(2, 4) mesh: deeper tensor sharding than the default (4, 2)."""
    trainer = get_trainer("tp4", _cfg(tmp_path, tensor=4))
    assert dict(trainer.mesh.shape) == {"data": 2, "tensor": 4}
    k = trainer.params["llm"]["h_0"]["attn"]["q_proj"]["base"]["kernel"]
    assert len(k.sharding.device_set) == 8
    trainer.train()
    assert np.isfinite(trainer.val()["val/mse"])


def test_tp4_matches_single_device(tmp_path):
    """TP=4 must be numerically equivalent to the unsharded run."""
    cfg1 = _cfg(tmp_path / "a", tensor=1)
    cfg1.setup["tensor_parallel"] = 1
    cfg1.setup["data_parallel"] = 1
    t1 = get_trainer("single4", cfg1)
    t2 = get_trainer("multi4", _cfg(tmp_path / "b", tensor=4))
    t1.train()
    t2.train()
    p1 = jax.device_get(t1.params["mapping_layer"]["kernel"])
    p2 = jax.device_get(t2.params["mapping_layer"]["kernel"])
    np.testing.assert_allclose(p1, p2, atol=2e-4)


def test_int8_quantized_sharded(tmp_path):
    """Int8 backbone (kernel_q + per-channel scale) sharded over tensor:
    the quantized kernels carry the same Megatron layout."""
    cfg = _cfg(tmp_path, tensor=2)
    cfg.models.medtsllm.llm["load_in_8bit"] = True
    trainer = get_trainer("q8shard", cfg)
    import jax.numpy as jnp
    kq = trainer.params["llm"]["h_0"]["attn"]["q_proj"]["base"]["kernel_q"]
    assert kq.dtype == jnp.int8
    assert len(kq.sharding.device_set) == 8
    # column-sharded over tensor: per-channel scale sharded the same way
    sc = trainer.params["llm"]["h_0"]["attn"]["q_proj"]["base"]["scale"]
    assert not sc.sharding.is_fully_replicated
    trainer.train()
    assert np.isfinite(trainer.val()["val/mse"])


def test_sharded_eval_stitch_score(tmp_path):
    """Sharded eval path end-to-end: predict -> window stitch -> threshold
    -> point-adjust metrics (anomaly detection exercises the full
    host-side post-processing on sharded predictions)."""
    cfg = _cfg(tmp_path, tensor=2)
    cfg["task"] = "anomaly_detection"
    cfg.training.eval_metric = "f1"
    cfg.training.eval_metric_direction = "max"
    cfg["tasks"] = {"anomaly_detection": {
        "threshold": "auto", "score_metric": "mse",
        "normalize_by_feature": False}}
    trainer = get_trainer("adshard", cfg)
    assert trainer.mesh is not None
    scores = trainer.test()
    for key in ("test/f1", "test/accuracy", "test/auroc"):
        assert np.isfinite(scores[key]), key


def test_t5_encdec_sharded(tmp_path):
    """Enc-dec backbone sharded over the tensor axis (t5 wi/wo rules)."""
    cfg = _cfg(tmp_path, tensor=2)
    cfg.models.medtsllm.llm["llm"] = "t5-tiny"
    trainer = get_trainer("t5shard", cfg)
    k = trainer.params["llm"]["enc_h_0"]["mlp"]["wi"]["kernel"]
    assert not k.sharding.is_fully_replicated
    trainer.train()
    assert np.isfinite(trainer.val()["val/mse"])


def test_pipeline_parallel_training_step(tmp_path):
    """dp2 x pp2 x tp2 mesh: the backbone layer stack lives stacked under
    h_stack sharded over "stage"; one train epoch + val must run and the
    stacked params must actually be stage-sharded."""
    cfg = _cfg(tmp_path, tensor=2)
    cfg.setup["pipeline_parallel"] = 2  # llama-tiny has 2 layers
    trainer = get_trainer("pp", cfg)
    assert dict(trainer.mesh.shape) == {"data": 2, "stage": 2, "tensor": 2}
    k = trainer.params["llm"]["h_stack"]["block"]["attn"]["q_proj"]["base"]["kernel"]
    assert k.shape[0] == 2  # stacked layer axis
    assert k.sharding.shard_shape(k.shape)[0] == 1  # one layer per stage
    trainer.train()
    assert np.isfinite(trainer.val()["val/mse"])


def test_pipeline_parallel_matches_single_device(tmp_path):
    """dp x pp x tp training must be numerically equivalent to the
    unsharded single-device run. The two layouts draw different init
    streams for the backbone (nn.scan split vs per-block paths), so the
    single-device backbone is transplanted into the pipeline layout
    (stack_decoder_tree — the same converter the HF loader uses)."""
    from medtsllm_tpu.models.llm.loader import stack_decoder_tree
    from medtsllm_tpu.parallel import shard_params

    cfg1 = _cfg(tmp_path / "a", tensor=1)
    cfg1.setup["tensor_parallel"] = 1
    cfg1.setup["data_parallel"] = 1
    # pipeline gates the cached-prefix train step off; run the reference
    # uncached too so the only difference is the parallelism
    cfg1.models.medtsllm.llm["prefix_cache"] = False
    cfg1.datasets.synthetic.n_points = 128  # one optimizer step
    t1 = get_trainer("ppsingle", cfg1)

    cfg2 = _cfg(tmp_path / "b", tensor=2)
    cfg2.setup["pipeline_parallel"] = 2
    cfg2.datasets.synthetic.n_points = 128
    t2 = get_trainer("ppmulti", cfg2)

    host = jax.device_get(t1.params)
    pp_params = dict(host)
    pp_params["llm"] = stack_decoder_tree(dict(host["llm"]), 2)
    t2.params = shard_params(pp_params, t2.mesh)
    t2.opt_state = t2.optimizer.init(t2.params)

    t1.train()
    t2.train()
    p1 = jax.device_get(t1.params["mapping_layer"]["kernel"])
    p2 = jax.device_get(t2.params["mapping_layer"]["kernel"])
    np.testing.assert_allclose(p1, p2, atol=2e-4)


def test_pipeline_parallel_quantized(tmp_path):
    """pp x tp x int8 together: the stacked quantized kernels keep their
    int8 dtype, gain the leading stage axis, and shard stage x tensor —
    the HBM story (each stage holds only its layers, each TP rank only
    its columns) must survive quantization."""
    import jax.numpy as jnp
    cfg = _cfg(tmp_path, tensor=2)
    cfg.setup["pipeline_parallel"] = 2
    cfg.models.medtsllm.llm["load_in_8bit"] = True
    trainer = get_trainer("ppq8", cfg)
    kq = trainer.params["llm"]["h_stack"]["block"]["attn"]["q_proj"]["base"]["kernel_q"]
    assert kq.dtype == jnp.int8 and kq.shape[0] == 2
    shard = kq.sharding.shard_shape(kq.shape)
    assert shard[0] == 1  # one layer per stage
    assert shard[-1] == kq.shape[-1] // 2  # columns split over tensor
    sc = trainer.params["llm"]["h_stack"]["block"]["attn"]["q_proj"]["base"]["scale"]
    assert sc.sharding.shard_shape(sc.shape)[0] == 1
    trainer.train()
    assert np.isfinite(trainer.val()["val/mse"])


def test_fsdp_shards_params_and_opt_state(tmp_path):
    """[setup] fsdp = true: ZeRO-3 layout. Large params shard one free dim
    over "data" (on top of the Megatron "tensor" sharding), the Adam
    moments mirror it, and the layout survives a train step (the
    with_sharding_constraint in train_step pins it)."""
    cfg = _cfg(tmp_path, tensor=2)
    cfg.setup["fsdp"] = True
    cfg.setup["fsdp_min_size"] = 64  # tiny test model: lower the cutoff
    trainer = get_trainer("fsdp", cfg)
    assert dict(trainer.mesh.shape) == {"data": 4, "tensor": 2}

    def data_sharded(leaf):
        spec = leaf.sharding.spec
        return any(ax == "data" or (isinstance(ax, tuple) and "data" in ax)
                   for ax in spec)

    k = trainer.params["llm"]["h_0"]["attn"]["q_proj"]["base"]["kernel"]
    assert data_sharded(k), k.sharding
    # tiny leaves below the cutoff stay replicated
    block = trainer.params["llm"]["h_0"]
    ln_tree = block.get("ln_1", block.get("input_layernorm"))
    (ln,) = jax.tree.leaves(ln_tree)
    assert not data_sharded(ln)
    # optimizer state mirrors the param layout (the ZeRO memory win)
    mu = None
    for leaf in jax.tree.leaves(trainer.opt_state):
        if getattr(leaf, "shape", None) == k.shape:
            mu = leaf
            break
    assert mu is not None and data_sharded(mu), "adam moment not fsdp-sharded"

    trainer.train()
    k2 = trainer.params["llm"]["h_0"]["attn"]["q_proj"]["base"]["kernel"]
    assert data_sharded(k2), "fsdp layout lost across the train step"
    assert np.isfinite(trainer.val()["val/mse"])


def test_fsdp_matches_single_device(tmp_path):
    """FSDP gather/reduce-scatter schedule must be numerically equivalent
    to the unsharded run."""
    cfg1 = _cfg(tmp_path / "a", tensor=1)
    cfg1.setup["tensor_parallel"] = 1
    cfg1.setup["data_parallel"] = 1
    t1 = get_trainer("fsdpsingle", cfg1)

    cfg2 = _cfg(tmp_path / "b", tensor=2)
    cfg2.setup["fsdp"] = True
    cfg2.setup["fsdp_min_size"] = 64
    t2 = get_trainer("fsdpmulti", cfg2)

    t1.train()
    t2.train()
    p1 = jax.device_get(t1.params["mapping_layer"]["kernel"])
    p2 = jax.device_get(t2.params["mapping_layer"]["kernel"])
    np.testing.assert_allclose(p1, p2, atol=2e-4)


def test_mamba_sharded_matches_single_device(tmp_path):
    """Mamba channel-parallel TP (the selective scan is elementwise over
    d_inner, so E shards across the tensor axis) must match the unsharded
    run numerically."""
    cfg1 = _cfg(tmp_path / "a", tensor=1)
    cfg1.models.medtsllm.llm["llm"] = "mamba-tiny"
    cfg1.setup["data_parallel"] = 1
    t1 = get_trainer("msingle", cfg1)

    cfg2 = _cfg(tmp_path / "b", tensor=2)
    cfg2.models.medtsllm.llm["llm"] = "mamba-tiny"
    t2 = get_trainer("mmulti", cfg2)
    k = t2.params["llm"]["h_0"]["in_proj"]["kernel"]
    assert not k.sharding.is_fully_replicated
    assert not t2.params["llm"]["h_0"]["A_log"].sharding.is_fully_replicated

    t1.train()
    t2.train()
    p1 = jax.device_get(t1.params["mapping_layer"]["kernel"])
    p2 = jax.device_get(t2.params["mapping_layer"]["kernel"])
    np.testing.assert_allclose(p1, p2, atol=2e-4)

def test_fsdp_checkpoint_resume(tmp_path):
    """FSDP runs must checkpoint and resume: from_run_id re-applies the
    mesh placement (tasks/base.py), so the restored params regain the
    ZeRO-3 layout and training continues."""
    cfg = _cfg(tmp_path, tensor=2)
    cfg.setup["fsdp"] = True
    cfg.setup["fsdp_min_size"] = 64
    trainer = get_trainer("fsdpckpt", cfg)
    trainer.train()
    val = trainer.val()["val/mse"]
    trainer.log_end()

    from medtsllm_tpu.tasks import task_lookup
    restored = task_lookup["reconstruction"].from_run_id(
        "fsdpckpt", basepath=str(tmp_path / "logs"))

    def data_sharded(leaf):
        return any(ax == "data" or (isinstance(ax, tuple) and "data" in ax)
                   for ax in leaf.sharding.spec)

    k = restored.params["llm"]["h_0"]["attn"]["q_proj"]["base"]["kernel"]
    assert data_sharded(k), "restore lost the fsdp layout"
    assert restored.val()["val/mse"] == pytest.approx(val, rel=1e-5)


def test_fsdp_composes_with_pipeline(tmp_path):
    """fsdp + pp: stacked pipeline leaves keep P('stage', ...) and gain a
    'data'-sharded free dim — ZeRO-3 within each stage group."""
    cfg = _cfg(tmp_path, tensor=1)
    cfg.setup["pipeline_parallel"] = 2
    cfg.setup["fsdp"] = True
    cfg.setup["fsdp_min_size"] = 64
    trainer = get_trainer("fsdppp", cfg)
    assert dict(trainer.mesh.shape) == {"data": 4, "stage": 2, "tensor": 1}

    def axes_of(leaf):
        out = set()
        for ax in leaf.sharding.spec:
            if isinstance(ax, tuple):
                out.update(ax)
            elif ax is not None:
                out.add(ax)
        return out

    stacked = [leaf for path, leaf in
               jax.tree_util.tree_flatten_with_path(trainer.params)[0]
               if "h_stack" in jax.tree_util.keystr(path)]
    assert stacked, "expected stacked pipeline params"
    both = [leaf for leaf in stacked
            if {"stage", "data"} <= axes_of(leaf)]
    assert both, "no stacked leaf is both stage- and fsdp-sharded"

    trainer.train()
    assert np.isfinite(trainer.val()["val/mse"])

def test_fsdp_composes_with_sp(tmp_path):
    """fsdp + tp_overlap: the sequence-parallel ring schedule runs manual
    over "tensor" only, so the ZeRO-3 "data" sharding on weights stays a
    GSPMD-auto axis — the two compose."""
    cfg = _cfg(tmp_path, tensor=2)
    cfg.setup["tp_overlap"] = True
    cfg.setup["fsdp"] = True
    cfg.setup["fsdp_min_size"] = 64
    trainer = get_trainer("fsdpsp", cfg)

    def data_sharded(leaf):
        return any(ax == "data" or (isinstance(ax, tuple) and "data" in ax)
                   for ax in leaf.sharding.spec)

    k = trainer.params["llm"]["h_0"]["attn"]["q_proj"]["base"]["kernel"]
    assert data_sharded(k)
    trainer.train()
    assert np.isfinite(trainer.val()["val/mse"])
