"""Mamba SSM backbone (models/llm/mamba.py — the reference's optional
mamba-ssm slot, recommended.txt:6-7, skip-module hints medtsllm.py:160,168).
HF weight-level parity is in tests/test_hf_parity.py::test_mamba_parity."""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import make_config
from medtsllm_tpu.models.llm.mamba import selective_scan
from medtsllm_tpu.models.llm.loader import load_backbone
from medtsllm_tpu.tasks import get_trainer


def test_selective_scan_matches_naive_recurrence():
    rng = np.random.default_rng(0)
    B, L, E, N = 2, 37, 6, 4  # L deliberately not a multiple of chunk
    dA = np.exp(-np.abs(rng.normal(size=(B, L, E, N)))).astype(np.float32)
    dBx = rng.normal(size=(B, L, E, N)).astype(np.float32)
    h = np.zeros((B, E, N), np.float32)
    ref = []
    for t in range(L):
        h = dA[:, t] * h + dBx[:, t]
        ref.append(h.copy())
    ref = np.stack(ref, axis=1)
    got = np.asarray(selective_scan(jnp.asarray(dA), jnp.asarray(dBx),
                                    chunk=8))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fused_ssm_kernel_matches_reference_interpret():
    """The Pallas fused selective-scan kernel (interpret mode off-TPU)
    must match the XLA reference graph, including chunk padding
    (L=37 not a multiple of 16)."""
    from medtsllm_tpu.ops.pallas.selective_scan import (_ssm_pallas,
                                                        _ssm_reference)
    rng = np.random.default_rng(3)
    B, L, E, N = 2, 37, 128, 4
    dt = jnp.asarray(np.abs(rng.normal(size=(B, L, E))) * 0.1, jnp.float32)
    A_T = -jnp.asarray(np.abs(rng.normal(size=(N, E))), jnp.float32)
    Bs = jnp.asarray(rng.normal(size=(B, L, N)), jnp.float32)
    Cs = jnp.asarray(rng.normal(size=(B, L, N)), jnp.float32)
    xs = jnp.asarray(rng.normal(size=(B, L, E)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(E,)), jnp.float32)
    ref = np.asarray(_ssm_reference(dt, A_T, Bs, Cs, xs, D))
    got = np.asarray(_ssm_pallas(dt, A_T, Bs, Cs, xs, D, chunk=16,
                                 block_e=128, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fused_ssm_h0_kernel_matches_reference_interpret():
    """The h0-seeded kernel (serving path: resume from the cached prefix
    state) must equal running the full [prefix | region] sequence through
    the reference graph — interpret mode, so the CPU suite covers the
    kernel itself, not just the XLA fallback."""
    from medtsllm_tpu.ops.pallas.selective_scan import (_ssm_pallas_h0,
                                                        _ssm_reference,
                                                        selective_ssm_final)
    rng = np.random.default_rng(5)
    B, P, L, E, N = 2, 9, 37, 128, 4
    def mk(*s):
        return jnp.asarray(rng.normal(size=s), jnp.float32)
    dt = jnp.abs(mk(B, P + L, E)) * 0.1
    A_T = -jnp.abs(mk(N, E))
    Bs, Cs = mk(B, P + L, N), mk(B, P + L, N)
    xs = mk(B, P + L, E)
    D = mk(E)
    full = np.asarray(_ssm_reference(dt, A_T, Bs, Cs, xs, D))
    _, h0 = selective_ssm_final(dt[:, :P], A_T, Bs[:, :P], Cs[:, :P],
                                xs[:, :P], D)
    got = np.asarray(_ssm_pallas_h0(dt[:, P:], A_T, Bs[:, P:], Cs[:, P:],
                                    xs[:, P:], D, h0, chunk=16,
                                    block_e=128, interpret=True))
    np.testing.assert_allclose(got, full[:, P:], rtol=1e-5, atol=1e-5)


def test_fused_ssm_h0_grads_match_reference():
    """The h0-seeded scan's custom_vjp (cached-prefix TRAIN path): its
    gradients must equal jax.vjp of the reference graph with h0 held
    constant — on the interpret-mode kernel pair AND the XLA fallback.
    h0-as-constant is the right semantics because the cached train path
    requires a frozen backbone (train_prefix_cache_safe), so no
    trainable gradient flows through the prefix state."""
    from medtsllm_tpu.ops.pallas.selective_scan import (
        _ssm_pallas_bwd, _ssm_pallas_with_bounds, _ssm_reference,
        selective_ssm_final, selective_ssm_h0)
    rng = np.random.default_rng(11)
    B, P, L, E, N = 2, 9, 37, 128, 4
    def mk(*s):
        return jnp.asarray(rng.normal(size=s), jnp.float32)
    dt = jnp.abs(mk(B, P + L, E)) * 0.1
    A_T = -jnp.abs(mk(N, E))
    Bs, Cs = mk(B, P + L, N), mk(B, P + L, N)
    xs = mk(B, P + L, E)
    D = mk(E)
    _, h0 = selective_ssm_final(dt[:, :P], A_T, Bs[:, :P], Cs[:, :P],
                                xs[:, :P], D)
    g = mk(B, L, E)

    # oracle: the reference graph seeded with h0 as a closed-over
    # constant (exactly the cached-step semantics)
    def region(dt_r, at, bs_r, cs_r, xs_r, d):
        return _ssm_reference(dt_r, at, bs_r, cs_r, xs_r, d, h0=h0)
    _, vjp_ref = jax.vjp(region, dt[:, P:], A_T, Bs[:, P:], Cs[:, P:],
                         xs[:, P:], D)
    ref_grads = vjp_ref(g)

    # sanity on the oracle itself: vs the FULL-sequence graph (prefix
    # inputs fixed), every grad except dA_T matches — A_T is the one
    # input that also feeds h0, and it is frozen in the cached path
    def full(dt_r, at, bs_r, cs_r, xs_r, d):
        y = _ssm_reference(jnp.concatenate([dt[:, :P], dt_r], 1), at,
                           jnp.concatenate([Bs[:, :P], bs_r], 1),
                           jnp.concatenate([Cs[:, :P], cs_r], 1),
                           jnp.concatenate([xs[:, :P], xs_r], 1), d)
        return y[:, P:]
    _, vjp_full = jax.vjp(full, dt[:, P:], A_T, Bs[:, P:], Cs[:, P:],
                          xs[:, P:], D)
    full_grads = vjp_full(g)
    for i, (got, ref) in enumerate(zip(ref_grads, full_grads)):
        if i == 1:  # dA_T: differs by the through-prefix term
            continue
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    # XLA-fallback custom_vjp path
    _, vjp_h0 = jax.vjp(
        lambda *a: selective_ssm_h0(*a, h0), dt[:, P:], A_T, Bs[:, P:],
        Cs[:, P:], xs[:, P:], D)
    for got, ref in zip(vjp_h0(g), ref_grads):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    # interpret-mode kernel pair: h0-seeded bounds forward feeds the
    # unchanged backward kernel (first boundary = h0)
    y_k, hb = _ssm_pallas_with_bounds(dt[:, P:], A_T, Bs[:, P:], Cs[:, P:],
                                      xs[:, P:], D, chunk=16, block_e=128,
                                      interpret=True, h0=h0)
    full_y = np.asarray(_ssm_reference(dt, A_T, Bs, Cs, xs, D))
    np.testing.assert_allclose(np.asarray(y_k), full_y[:, P:],
                               rtol=1e-5, atol=1e-5)
    ddt, dx_ssm, dB, dC, dAT = _ssm_pallas_bwd(
        dt[:, P:], A_T, Bs[:, P:], Cs[:, P:], xs[:, P:], g, hb,
        chunk=16, block_e=128, interpret=True)
    dx = dx_ssm + D[None, None, :] * g
    dD = jnp.sum(g * xs[:, P:], axis=(0, 1))
    for got, ref in zip((ddt, dAT, dB, dC, dx, dD), ref_grads):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_fused_ssm_backward_kernel_matches_vjp_interpret():
    """The Pallas adjoint kernel (chunk recompute + reverse recurrence)
    must reproduce jax.vjp of the reference graph for all six inputs."""
    from medtsllm_tpu.ops.pallas.selective_scan import (
        _ssm_pallas_bwd, _ssm_pallas_with_bounds, _ssm_reference)
    rng = np.random.default_rng(5)
    B, L, E, N = 2, 37, 128, 4
    dt = jnp.asarray(np.abs(rng.normal(size=(B, L, E))) * 0.1, jnp.float32)
    A_T = -jnp.asarray(np.abs(rng.normal(size=(N, E))), jnp.float32)
    Bs = jnp.asarray(rng.normal(size=(B, L, N)), jnp.float32)
    Cs = jnp.asarray(rng.normal(size=(B, L, N)), jnp.float32)
    xs = jnp.asarray(rng.normal(size=(B, L, E)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(E,)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, L, E)), jnp.float32)

    y, hb = _ssm_pallas_with_bounds(dt, A_T, Bs, Cs, xs, D, chunk=8,
                                    block_e=128, interpret=True)
    y_ref, vjp = jax.vjp(_ssm_reference, dt, A_T, Bs, Cs, xs, D)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    ddt_r, dAT_r, dB_r, dC_r, dx_r, dD_r = vjp(g)
    ddt, dx_ssm, dB, dC, dAT = _ssm_pallas_bwd(
        dt, A_T, Bs, Cs, xs, g, hb, chunk=8, block_e=128, interpret=True)
    dx = dx_ssm + D[None, None, :] * g
    dD = jnp.sum(g * xs, axis=(0, 1))
    for got, ref in ((ddt, ddt_r), (dAT, dAT_r), (dB, dB_r), (dC, dC_r),
                     (dx, dx_r), (dD, dD_r)):
        scale = float(jnp.abs(ref).max()) + 1e-6
        np.testing.assert_allclose(np.asarray(got) / scale,
                                   np.asarray(ref) / scale,
                                   rtol=1e-4, atol=1e-5)


def test_backbone_causality_and_grads():
    """The SSM recurrence is strictly causal: perturbing a future input
    must not change earlier outputs. Grads finite + nonzero."""
    import warnings
    rng = np.random.default_rng(1)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        module, params, cfg = load_backbone("mamba-tiny")
    x = jnp.asarray(rng.normal(size=(1, 12, 64)), jnp.float32)
    out1 = module.apply({"params": params}, inputs_embeds=x)
    x2 = x.at[:, -1].add(5.0)
    out2 = module.apply({"params": params}, inputs_embeds=x2)
    np.testing.assert_allclose(np.asarray(out1[:, :-1]),
                               np.asarray(out2[:, :-1]), atol=1e-6)
    assert float(jnp.abs(out1[:, -1] - out2[:, -1]).max()) > 1e-3

    g = jax.grad(lambda p: module.apply({"params": p},
                                        inputs_embeds=x).sum())(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in leaves)
    assert any(float(jnp.abs(t).max()) > 0 for t in leaves)


def test_mamba_layer_truncation():
    """llm_layers truncation (reference medtsllm.py:145-146) applies to
    the SSM backbone too."""
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        module, params, cfg = load_backbone("mamba-tiny", llm_layers=1)
    assert cfg.n_layers == 1
    assert "h_0" in params and "h_1" not in params


def test_quantized_mamba_forward():
    """in/x/out projections run the int8 MXU path under quantize=8."""
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        module, params, cfg = load_backbone("mamba-tiny", quantize=8)
    assert params["h_0"]["in_proj"]["kernel_q"].dtype == jnp.int8
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 9, 64)),
                    jnp.float32)
    out = module.apply({"params": params}, inputs_embeds=x)
    assert out.shape == (2, 9, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_medtsllm_with_mamba_backbone(tmp_path):
    """Full flagship pipeline with the SSM backbone swapped in (the
    reference's AutoModel generality, medtsllm.py:175)."""
    cfg = make_config(task="reconstruction", model="medtsllm", step=16,
                      hist=32, pred=32)
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
                      "input_stats": False, "examples": False,
                      "input_stats_dim": 0, "input_stats_select": "all"},
        "llm": {"enabled": True, "llm": "mamba-tiny", "llm_layers": -1,
                "load_in_4bit": False, "load_in_8bit": False},
    }}
    trainer = get_trainer("m-mamba", cfg)
    assert "A_log" in trainer.params["llm"]["h_0"]
    # backbone frozen like any other LLM
    labels = trainer.model.param_labels(trainer.params)
    assert all(v == "frozen" for v in
               jax.tree_util.tree_leaves(labels["llm"]))
    trainer.train()
    scores = trainer.val()
    assert np.isfinite(scores["val/mse"])
