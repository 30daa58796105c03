"""bench.measure_steps: the floor-immune slope dispatch protocol.

The sandbox tunnel charges a per-readback floor that is session weather
(~1 ms to ~1 s measured 2026-08-19); the protocol times back-to-back
dispatch groups and reports the per-step slope between a shallow and a
deep group, which cancels the floor exactly (BASELINE.md "Dispatch
protocol"). These tests drive the real function with a fake clock."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


class FakeBackend:
    """dispatch() returns a step handle; collect() advances a virtual
    clock by floor + steps * step_cost, exactly like a queue-full device
    behind a fixed round-trip."""

    def __init__(self, monkeypatch, step_s, floor_s, jitter=None):
        self.t = 0.0
        self.step_s = step_s
        self.floor_s = floor_s
        self.jitter = jitter or (lambda: 0.0)
        self.max_outstanding = 0
        monkeypatch.setattr(bench.time, "perf_counter", lambda: self.t)

    def dispatch(self):
        return object()

    def collect(self, handles):
        self.max_outstanding = max(self.max_outstanding, len(handles))
        self.t += self.floor_s + len(handles) * self.step_s + self.jitter()
        return 0.0


@pytest.mark.parametrize("floor_s", [0.001, 0.031, 0.985])
def test_slope_cancels_any_floor(monkeypatch, floor_s):
    fb = FakeBackend(monkeypatch, step_s=0.050, floor_s=floor_s)
    per, sync = bench.measure_steps(fb.dispatch, fb.collect,
                                    iters=20, warmup=3)
    assert per == pytest.approx(0.050, rel=1e-6)
    # the sync number keeps the floor (continuity with old rows)
    assert sync == pytest.approx(0.050 + floor_s, rel=1e-6)


def test_depth_adapts_to_step_cost(monkeypatch):
    # sub-ms steps need a deep group for signal; long steps must not
    # explode the group length
    fast = FakeBackend(monkeypatch, step_s=0.002, floor_s=0.030)
    per, _ = bench.measure_steps(fast.dispatch, fast.collect, 20, 3)
    assert per == pytest.approx(0.002, rel=1e-6)
    assert fast.max_outstanding == 256  # capped deep group

    slow = FakeBackend(monkeypatch, step_s=0.400, floor_s=0.030)
    per, _ = bench.measure_steps(slow.dispatch, slow.collect, 20, 3)
    assert per == pytest.approx(0.400, rel=1e-6)
    assert slow.max_outstanding <= 16


def test_storm_windows_cannot_corrupt_the_slope(monkeypatch):
    """The 2026-08-19 failure mode: the tunnel floor alternates between
    calm (~30 ms) and storm (~1 s) WINDOWS within one run. min-of-depth
    with interleaved groups recovers the exact step as long as each
    depth sees one calm window."""
    fb = FakeBackend(monkeypatch, step_s=0.0015, floor_s=0.030)
    # storms are WINDOWS in time (seconds long), not per-call coin flips:
    # collects landing in the first 1.5 s of every 3 s virtual-time
    # window pay an extra ~1 s
    fb.jitter = lambda: (0.97 if (fb.t % 3.0) < 1.5 else 0.0)
    per, _ = bench.measure_steps(fb.dispatch, fb.collect, 20, 3)
    assert per == pytest.approx(0.0015, rel=1e-6)


def test_noise_floor_falls_back_conservative(monkeypatch):
    # adversarial jitter that makes the deep group FASTER than the
    # shallow one -> slope <= 0 -> fall back to group/depth (an upper
    # bound on the step, never a negative or zero time)
    state = {"n": 0}

    def jitter():
        state["n"] += 1
        return -0.5 if state["n"] % 2 else 0.5

    fb = FakeBackend(monkeypatch, step_s=0.001, floor_s=0.5, jitter=jitter)
    per, _ = bench.measure_steps(fb.dispatch, fb.collect, 20, 3)
    assert per > 0


def test_on_device_loop_estimator_runs_real_jax():
    """measure_eval_on_device: the storm-proof estimator (one dispatch +
    one readback per timing, loop-over-steps ON device with a traced
    trip count). Drive it with a real jitted step on CPU and check the
    contract: positive per-step, strictly below the sync time (which
    contains a dispatch + readback), and tolerant of integer-only
    inputs (no floating leaf to mix the index into)."""
    import jax
    import jax.numpy as jnp

    def step(params, arrays):
        return jnp.tanh(arrays["x_enc"] @ params["w"]).sum(axis=-1)

    params = {"w": jnp.ones((64, 64))}
    arrays = {"x_enc": jnp.ones((8, 64)), "index": jnp.arange(8)}
    per, sync = bench.measure_eval_on_device(step, params, arrays,
                                             iters=8, warmup=1)
    assert 0 < per < sync

    def int_step(params, arrays):
        return (arrays["index"] * params["k"]).astype(jnp.float32)

    per2, _ = bench.measure_eval_on_device(
        int_step, {"k": jnp.int32(3)}, {"index": jnp.arange(8)}, 8, 1)
    assert per2 > 0


def test_on_device_train_loop_threads_state_and_matches_host_loop():
    """measure_train_on_device: the carry threads (params, opt_state)
    through K real optimizer steps. Contract: positive per-step, the
    returned state equals what a host loop of the same steps/keys
    produces (so the measurement runs REAL training, not a stub), and
    inputs are donated (the caller adopts the returned buffers)."""
    import jax
    import jax.numpy as jnp
    import optax

    opt = optax.sgd(0.1)

    @jax.jit
    def train_step(params, opt_state, arrays, valid, rng):
        def loss_fn(p):
            pred = arrays["x_enc"] @ p["w"]
            noise = jax.random.normal(rng, pred.shape) * 0.0  # rng is used
            return (((pred + noise) - arrays["y"]) ** 2).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = {"w": jnp.ones((16, 4))}
    arrays = {"x_enc": jnp.ones((8, 16)), "y": jnp.zeros((8, 4))}
    valid = jnp.ones((8,), bool)
    base_rng = jax.random.PRNGKey(7)

    per, sync, p_out, o_out = bench.measure_train_on_device(
        train_step, params, opt.init(params), arrays, valid, base_rng,
        warmup=1)
    assert per > 0 and sync > 0

    # the returned state must show real optimizer steps ran through the
    # carry: with y=0 targets, SGD strictly shrinks the weight (the
    # input buffers were donated — all ones at init, so compare to 1.0)
    assert float(jnp.abs(p_out["w"]).mean()) < 1.0
    assert np.isfinite(float(jnp.abs(p_out["w"]).sum()))
    leaves = jax.tree.leaves(o_out)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves
               if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                         jnp.floating))


@pytest.mark.parametrize("configured,override,expect", [
    # auto downsizes HF ids that need a snapshot
    ("meta-llama/Llama-2-13b-hf", "auto", "llama-1b"),
    # auto downsizes the 7B even though it IS a preset (6.6B random-init
    # benched silently as a "config row" — the 2026-08-19 ludb incident)
    ("meta-llama/Llama-2-7b-hf", "auto", "llama-1b"),
    # auto keeps bench-sized presets (family-specific configs crash
    # under a llama-1b override)
    ("moe-8x1b", "auto", None),
    ("mamba-130m", "auto", None),
    ("llama-tiny", "auto", None),
    # explicit override always applies
    ("moe-8x1b", "llama-1b", "llama-1b"),
])
def test_config_bench_backbone_resolution(configured, override, expect):
    assert bench.resolve_bench_backbone(configured, override) == expect


def test_train_chaining_contract():
    """bench's train dispatch chains params/opt_state through successive
    dispatches, so back-to-back groups execute serially on device; the
    eval dispatch reuses constant inputs. Pin the contract: collect gets
    exactly the handles dispatch returned, in order."""
    log = []

    def dispatch():
        log.append("d")
        return len(log)

    def collect(handles):
        assert handles == sorted(handles)
        log.append(("c", len(handles)))
        return 0.0

    bench.measure_steps(dispatch, collect, iters=8, warmup=1)
    # first collect is the compile call with exactly one handle
    assert log[1] == ("c", 1)


def test_bench_e2e_streams_pipeline(tmp_path):
    """bench_e2e streams real batches through the PromptBuilder + the
    prefix-KV bank with async dispatch and one sync per pass; warm
    passes reuse the compiled step (host time < wall time, window count
    matches the val split)."""
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from conftest import make_config
    from medtsllm_tpu.tasks import get_trainer

    cfg = make_config(task="reconstruction", model="medtsllm",
                      hist=32, pred=32, step=16)
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.datasets.synthetic.n_points = 384
    cfg.training.batch_size = 4
    cfg["models"] = {"medtsllm": {
        "d_model": 16, "d_ff": 16, "n_heads": 4, "num_tokens": 32,
        "covariate_mode": "concat",
        "embedding_downsample_mode": "linear",
        "patching": {"patch_len": 8, "stride": 4},
        "prompting": {"dataset": True, "task": True, "clip": False,
                      "input_stats": True, "examples": False,
                      "input_stats_dim": 0, "input_stats_select": "all",
                      "cache_order": True},
        "llm": {"enabled": True, "llm": "llama-tiny", "llm_layers": -1,
                "prefix_cache": True},
    }}
    trainer = get_trainer("bench-e2e", cfg)
    warm_s, host_s, cold_s, n_win = bench.bench_e2e(
        trainer, trainer.params, min_windows=8, passes=2)
    assert n_win >= 8
    assert 0 < host_s <= warm_s
    assert cold_s >= warm_s * n_win  # cold pass carries the compiles
