"""Executed parity oracles against the reference's own torch modules.

Every other parity claim in PARITY.md rests on a careful side-by-side
reading; these tests EXECUTE `/root/reference` modules (torch, CPU) with
weights copied into the flax twins and assert output equality to
tolerance. Covered oracles (VERDICT r2 item 4):

  - RevIN norm/denorm                (models/layers/RevIN.py:5-69)
  - series_decomp / moving_avg       (models/dlinear.py:138-170)
  - PatchEmbedding (conv token)      (models/layers/embed.py:166-197)
  - ReprogrammingLayer               (models/medtsllm.py:555-591)
  - FourierBlock                     (models/layers/FourierCorrelation.py:28-106)
  - AutoCorrelation (train variant)  (models/layers/AutoCorrelation.py:35-60)
  - DLinear full model               (models/dlinear.py:6-135)
  - PatchTST Encoder stack           (models/layers/Transformer_EncDec.py:29-83,
                                      SelfAttention_Family.py:55-90)

The reference's inference-path AutoCorrelation hardcodes `.cuda()`
(AutoCorrelation.py:79,120) so only the training variant can execute here.
reformer_pytorch is not installed; it is stubbed before importing
SelfAttention_Family (only LSHSelfAttention's name is needed).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Import /root/reference/models as a package (reformer stubbed)."""
    if "reformer_pytorch" not in sys.modules:
        stub = types.ModuleType("reformer_pytorch")

        class _LSH:  # only the NAME is imported at module scope
            def __init__(self, *a, **k):
                raise RuntimeError("stub")

        stub.LSHSelfAttention = _LSH
        sys.modules["reformer_pytorch"] = stub
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import models as ref_models  # noqa: F401  (reference package)
    import models.layers.RevIN as ref_revin
    import models.layers.embed as ref_embed
    import models.layers.FourierCorrelation as ref_fourier
    import models.layers.AutoCorrelation as ref_autocorr
    import models.layers.Transformer_EncDec as ref_encdec
    import models.layers.SelfAttention_Family as ref_attn
    import models.dlinear as ref_dlinear
    import models.medtsllm as ref_medtsllm
    return types.SimpleNamespace(
        revin=ref_revin, embed=ref_embed, fourier=ref_fourier,
        autocorr=ref_autocorr, encdec=ref_encdec, attn=ref_attn,
        dlinear=ref_dlinear, medtsllm=ref_medtsllm)


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def lin(mod):
    """torch nn.Linear -> flax Dense param dict."""
    out = {"kernel": t2j(mod.weight).T}
    if mod.bias is not None:
        out["bias"] = t2j(mod.bias)
    return out


def ln(mod):
    return {"scale": t2j(mod.weight), "bias": t2j(mod.bias)}


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


# ---------------------------------------------------------------- RevIN


@pytest.mark.parametrize("subtract_last", [False, True])
def test_revin_oracle(ref, subtract_last):
    from medtsllm_tpu.ops.revin import revin_norm, revin_denorm
    x = _rand(4, 32, 3, seed=1)
    m = ref.revin.RevIN(3, affine=False, subtract_last=subtract_last)
    xt = torch.from_numpy(x)
    ref_norm = m(xt, "norm")
    # denorm of an arbitrary head output, not just the identity round-trip
    y = torch.from_numpy(_rand(4, 32, 3, seed=2))
    ref_denorm = m(y, "denorm")

    xn, stats = revin_norm(jnp.asarray(x), subtract_last=subtract_last)
    np.testing.assert_allclose(np.asarray(xn), ref_norm.numpy(),
                               rtol=1e-5, atol=1e-5)
    got = revin_denorm(jnp.asarray(y.numpy()), stats)
    np.testing.assert_allclose(np.asarray(got), ref_denorm.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_revin_affine_oracle(ref):
    from medtsllm_tpu.ops.revin import revin_norm, revin_denorm, RevINAffine
    x = _rand(2, 16, 5, seed=3)
    m = ref.revin.RevIN(5, affine=True)
    with torch.no_grad():
        m.affine_weight.copy_(torch.from_numpy(_rand(5, seed=4)))
        m.affine_bias.copy_(torch.from_numpy(_rand(5, seed=5)))
    with torch.no_grad():
        ref_norm = m(torch.from_numpy(x), "norm")
        y = torch.from_numpy(_rand(2, 16, 5, seed=6))
        ref_denorm = m(y, "denorm")

    aff = RevINAffine(num_features=5)
    params = {"params": {"affine_weight": t2j(m.affine_weight),
                         "affine_bias": t2j(m.affine_bias)}}
    xn, stats = revin_norm(jnp.asarray(x))
    got_norm = aff.apply(params, xn, "norm")
    np.testing.assert_allclose(np.asarray(got_norm), ref_norm.numpy(),
                               rtol=1e-5, atol=1e-5)
    got_denorm = revin_denorm(aff.apply(params, jnp.asarray(y.numpy()),
                                        "denorm"), stats)
    np.testing.assert_allclose(np.asarray(got_denorm), ref_denorm.numpy(),
                               rtol=1e-4, atol=1e-4)


# -------------------------------------------------------- series_decomp


@pytest.mark.parametrize("kernel", [13, 25])
def test_series_decomp_oracle(ref, kernel):
    from medtsllm_tpu.ops.decomp import series_decomp
    x = _rand(3, 64, 4, seed=7)
    res_t, mean_t = ref.dlinear.series_decomp(kernel)(torch.from_numpy(x))
    res_j, mean_j = series_decomp(jnp.asarray(x), kernel)
    np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_j), res_t.numpy(),
                               rtol=1e-5, atol=1e-5)


# ------------------------------------------------------- PatchEmbedding


def test_patch_embedding_oracle(ref):
    """Conv token embedding over unfolded patches + sincos positions
    (embed.py:166-197). Weight map: torch Conv1d [d_model, patch_len, 3]
    -> flax Conv kernel [3, patch_len, d_model]."""
    from medtsllm_tpu.ops.embed import PatchEmbedding
    d_model, patch_len, stride = 16, 8, 4
    m = ref.embed.PatchEmbedding(d_model, patch_len, stride, dropout=0.0)
    m.eval()
    x = _rand(2, 3, 32, seed=8)  # [B, C, L]
    with torch.no_grad():
        ref_out, n_vars = m(torch.from_numpy(x))

    mine = PatchEmbedding(d_model=d_model, patch_len=patch_len,
                          stride=stride, dropout=0.0)
    conv_w = t2j(m.value_embedding.tokenConv.weight)  # [d_model, pl, 3]
    params = {"params": {"value_embedding": {
        "Conv_0": {"kernel": jnp.transpose(conv_w, (2, 1, 0))}}}}
    got, c = mine.apply(params, jnp.asarray(x), deterministic=True)
    assert c == n_vars == 3
    np.testing.assert_allclose(np.asarray(got), ref_out.numpy(),
                               rtol=1e-4, atol=1e-4)


# --------------------------------------------------- ReprogrammingLayer


def test_reprogramming_layer_oracle(ref):
    """Cross-attention from patches into the compressed text basis
    (medtsllm.py:555-591), dropout off."""
    from medtsllm_tpu.models.medtsllm import ReprogrammingLayer
    d_model, n_heads, d_keys, d_llm = 12, 4, 8, 24
    m = ref.medtsllm.ReprogrammingLayer(d_model, n_heads, d_keys, d_llm,
                                        attention_dropout=0.0)
    m.eval()
    target = _rand(2, 10, d_model, seed=9)
    source = _rand(50, d_llm, seed=10)
    with torch.no_grad():
        ref_out = m(torch.from_numpy(target), torch.from_numpy(source),
                    torch.from_numpy(source))

    mine = ReprogrammingLayer(n_heads=n_heads, d_keys=d_keys, d_llm=d_llm,
                              attention_dropout=0.0)
    params = {"params": {
        "query_projection": lin(m.query_projection),
        "key_projection": lin(m.key_projection),
        "value_projection": lin(m.value_projection),
        "out_projection": lin(m.out_projection)}}
    got = mine.apply(params, jnp.asarray(target), jnp.asarray(source),
                     jnp.asarray(source), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), ref_out.numpy(),
                               rtol=1e-4, atol=1e-4)


# ----------------------------------------------------------- FourierBlock


@pytest.mark.parametrize("mode_select", ["low", "random"])
def test_fourier_block_oracle(ref, mode_select):
    """rfft -> per-mode complex matmul (packed at enumeration position wi,
    FourierCorrelation.py:96-104) -> irfft. The 'random' case checks the
    packed layout where wi != i."""
    from medtsllm_tpu.ops.fourier import FourierBlock
    H, E, L, modes = 8, 4, 32, 6
    in_ch = out_ch = H * E
    method = "else" if mode_select == "low" else "random"
    np.random.seed(11)
    m = ref.fourier.FourierBlock(in_ch, out_ch, L, modes=modes,
                                 mode_select_method=method)
    m.eval()
    q = _rand(2, L, H, E, seed=12)
    with torch.no_grad():
        ref_out, _ = m(torch.from_numpy(q), None, None, None)

    mine = FourierBlock(in_channels=in_ch, out_channels=out_ch, seq_len=L,
                        index=tuple(m.index), n_heads=H)
    params = {"params": {"weights1": t2j(m.weights1),
                         "weights2": t2j(m.weights2)}}
    got, _ = mine.apply(params, jnp.asarray(q), None, None)
    np.testing.assert_allclose(np.asarray(got), ref_out.numpy(),
                               rtol=1e-4, atol=1e-4)


# -------------------------------------------------- AutoCorrelation (train)


def test_autocorrelation_train_oracle(ref):
    """Training-variant delay aggregation (AutoCorrelation.py:35-60);
    the inference variant hardcodes .cuda() and cannot execute here."""
    from medtsllm_tpu.ops.autocorr import AutoCorrelation
    B, L, H, E = 2, 32, 4, 8
    m = ref.autocorr.AutoCorrelation(mask_flag=False, factor=1,
                                     attention_dropout=0.0)
    m.train()
    q = _rand(B, L, H, E, seed=13)
    k = _rand(B, L, H, E, seed=14)
    v = _rand(B, L, H, E, seed=15)
    with torch.no_grad():
        ref_out, _ = m(torch.from_numpy(q), torch.from_numpy(k),
                       torch.from_numpy(v), None)

    mine = AutoCorrelation(mask_flag=False, factor=1, attention_dropout=0.0)
    got, _ = mine.apply({"params": {}}, jnp.asarray(q), jnp.asarray(k),
                        jnp.asarray(v), deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(got), ref_out.numpy(),
                               rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------- DLinear


class _RefCfg:
    """Minimal attribute-tree config for the reference model ctors."""

    def __init__(self, d):
        for k, v in d.items():
            setattr(self, k, _RefCfg(v) if isinstance(v, dict) else v)


def _ref_dlinear(ref, task, individual, n_features=3, n_classes=0,
                 seq=32, pred=16):
    cfg = _RefCfg({
        "task": task, "history_len": seq, "pred_len": pred,
        "models": {"dlinear": {"individual": individual, "moving_avg": 13}},
        "training": {"dropout": 0.0},
        "tasks": {"segmentation": {"mode": "boundary-prediction"}},
    })
    ds = types.SimpleNamespace(n_features=n_features, n_classes=n_classes)
    return ref.dlinear.DLinear(cfg, ds)


def _my_dlinear(task, individual, n_features=3, n_classes=0, seq=32, pred=16):
    from medtsllm_tpu.models.dlinear import DLinear
    return DLinear(task=task, seq_len=seq,
                   pred_len=pred if task == "forecasting" else seq,
                   channels=n_features, n_classes=n_classes,
                   individual=individual, moving_avg_kernel=13, dropout=0.0,
                   seg_mode="boundary-prediction" if task == "segmentation"
                   else None)


def _copy_dlinear(m, individual):
    if individual:
        sw = jnp.stack([t2j(l.weight).T for l in m.Linear_Seasonal])
        sb = jnp.stack([t2j(l.bias) for l in m.Linear_Seasonal])
        tw = jnp.stack([t2j(l.weight).T for l in m.Linear_Trend])
        tb = jnp.stack([t2j(l.bias) for l in m.Linear_Trend])
    else:
        sw, sb = t2j(m.Linear_Seasonal.weight).T, t2j(m.Linear_Seasonal.bias)
        tw, tb = t2j(m.Linear_Trend.weight).T, t2j(m.Linear_Trend.bias)
    params = {"seasonal_w": sw, "seasonal_b": sb,
              "trend_w": tw, "trend_b": tb}
    if hasattr(m, "projection"):
        params["projection"] = lin(m.projection)
    return {"params": params}


@pytest.mark.parametrize("individual", [False, True])
def test_dlinear_forecast_oracle(ref, individual):
    m = _ref_dlinear(ref, "forecasting", individual)
    m.eval()
    # break the 1/seq_len all-ones init so the oracle is non-trivial
    with torch.no_grad():
        for p in m.parameters():
            p.add_(torch.from_numpy(_rand(*p.shape, seed=16) * 0.1))
    x = _rand(2, 32, 3, seed=17)
    with torch.no_grad():
        ref_out = m({"x_enc": torch.from_numpy(x)})
    mine = _my_dlinear("forecasting", individual)
    got = mine.apply(_copy_dlinear(m, individual), {"x_enc": jnp.asarray(x)})
    np.testing.assert_allclose(np.asarray(got), ref_out.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("task,n_classes", [
    ("semantic_segmentation", 2),
    ("semantic_segmentation", 4),
    ("classification", 5),
    ("segmentation", 0),
])
def test_dlinear_heads_oracle(ref, task, n_classes):
    """Eval-mode head parity (the reference's flat TRAIN-mode multiclass
    output is a known unreplicated bug; eval shapes agree)."""
    m = _ref_dlinear(ref, task, individual=False, n_classes=n_classes)
    m.eval()
    with torch.no_grad():
        for p in m.parameters():
            p.add_(torch.from_numpy(_rand(*p.shape, seed=18) * 0.1))
    x = _rand(2, 32, 3, seed=19)
    with torch.no_grad():
        ref_out = m({"x_enc": torch.from_numpy(x)})
    mine = _my_dlinear(task, False, n_classes=n_classes)
    got = mine.apply(_copy_dlinear(m, False), {"x_enc": jnp.asarray(x)},
                     training=False)
    np.testing.assert_allclose(np.asarray(got), ref_out.numpy(),
                               rtol=1e-4, atol=1e-5)


# ------------------------------------------------- PatchTST Encoder stack


def test_transformer_encoder_oracle(ref):
    """2-layer post-norm encoder exactly as PatchTST builds it
    (PatchTST.py:71-93): FullAttention(mask_flag=False), gelu FFN via k=1
    convs, final LayerNorm."""
    from medtsllm_tpu.ops.attention import AttentionLayer, FullAttention
    from medtsllm_tpu.ops.transformer import Encoder, EncoderLayer
    d_model, n_heads, d_ff, n_layers = 16, 4, 32, 2

    ref_enc = ref.encdec.Encoder(
        [ref.encdec.EncoderLayer(
            ref.attn.AttentionLayer(
                ref.attn.FullAttention(False, 3, attention_dropout=0.0,
                                       output_attention=True),
                d_model, n_heads),
            d_model, d_ff, dropout=0.0, activation="gelu")
         for _ in range(n_layers)],
        norm_layer=torch.nn.LayerNorm(d_model))
    ref_enc.eval()
    x = _rand(2, 12, d_model, seed=20)
    with torch.no_grad():
        ref_out, _ = ref_enc(torch.from_numpy(x))

    layers = tuple(
        EncoderLayer(
            attention=AttentionLayer(
                inner_attention=FullAttention(mask_flag=False,
                                              attention_dropout=0.0,
                                              output_attention=True),
                d_model=d_model, n_heads=n_heads),
            d_model=d_model, d_ff=d_ff, dropout=0.0, activation="gelu")
        for _ in range(n_layers))
    mine = Encoder(attn_layers=layers, use_norm=True)

    def conv1x1(mod):  # torch Conv1d k=1 [out, in, 1] -> Dense [in, out]
        return {"kernel": t2j(mod.weight)[:, :, 0].T, "bias": t2j(mod.bias)}

    params = {"norm": ln(ref_enc.norm)}
    for i, rl in enumerate(ref_enc.attn_layers):
        params[f"attn_layers_{i}"] = {
            "attention": {
                "query_projection": lin(rl.attention.query_projection),
                "key_projection": lin(rl.attention.key_projection),
                "value_projection": lin(rl.attention.value_projection),
                "out_projection": lin(rl.attention.out_projection)},
            "conv1": conv1x1(rl.conv1),
            "conv2": conv1x1(rl.conv2),
            "norm1": ln(rl.norm1),
            "norm2": ln(rl.norm2)}
    got, _ = mine.apply({"params": params}, jnp.asarray(x),
                        deterministic=True)
    np.testing.assert_allclose(np.asarray(got), ref_out.numpy(),
                               rtol=1e-4, atol=1e-4)
