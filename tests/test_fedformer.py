"""FEDformer (Fourier + Wavelets) and frequency-domain op tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medtsllm_tpu.tasks import get_trainer
from conftest import make_config


def _cfg(task, tmp_path, version="Fourier", **kw):
    kw.setdefault("hist", 32)
    kw.setdefault("pred", 32)
    cfg = make_config(task=task, model="fedformer", step=16, **kw)
    cfg["paths"] = {"logdir": str(tmp_path / "logs")}
    cfg.training.epochs = 1
    cfg.training.batch_size = 4
    cfg.datasets.synthetic.n_points = 512
    cfg["models"] = {"fedformer": {
        "version": version, "mode_select": "low", "modes": 8,
        "label_len": 16, "e_layers": 2, "d_layers": 1, "d_model": 16,
        "n_heads": 8, "d_ff": 32, "moving_avg": 13, "activation": "gelu"}}
    return cfg


def test_fedformer_forecasting(tmp_path):
    cfg = _cfg("forecasting", tmp_path, hist=32, pred=16)
    cfg.pred_len = 16
    trainer = get_trainer("fed-f", cfg)
    trainer.train()
    scores = trainer.test()
    assert np.isfinite(scores["test/mse"])


def test_fedformer_reconstruction(tmp_path):
    trainer = get_trainer("fed-r", _cfg("reconstruction", tmp_path))
    scores = trainer.val()
    assert np.isfinite(scores["val/mse"])


def test_fourier_block_energy_packs_into_low_bins():
    """FourierBlock writes mode i's product at enumeration position wi
    (out_ft[..., wi] = f(x_ft[..., i]), FourierCorrelation.py:96-104):
    selected modes PACK into the lowest output bins regardless of which
    input modes were selected — identical to scatter-at-i only under
    'low' mode selection."""
    from medtsllm_tpu.ops.fourier import FourierBlock
    B, L, H, E = 2, 32, 4, 4
    index = (1, 3, 5)
    blk = FourierBlock(in_channels=16, out_channels=16, seq_len=L,
                       index=index, n_heads=H)
    q = jnp.asarray(np.random.default_rng(0).normal(size=(B, L, H, E)),
                    jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), q, q, q)
    out, _ = blk.apply(params, q, q, q)
    spec = np.fft.rfft(np.asarray(out), axis=-1)
    packed = list(range(len(index)))
    others = [i for i in range(L // 2 + 1) if i not in packed]
    assert np.abs(spec[..., others]).max() < 1e-3
    assert np.abs(spec[..., packed]).max() > 0


def test_autocorrelation_shapes_and_variants():
    from medtsllm_tpu.ops.autocorr import AutoCorrelation
    B, L, H, E = 2, 32, 4, 8
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, L, H, E)), jnp.float32)
    ac = AutoCorrelation(factor=1, attention_dropout=0.0)
    params = ac.init(jax.random.PRNGKey(0), q, q, q)
    v_inf, _ = ac.apply(params, q, q, q, deterministic=True)
    v_train, _ = ac.apply(params, q, q, q, deterministic=False)
    assert v_inf.shape == (B, L, H, E)
    assert v_train.shape == (B, L, H, E)
    assert np.isfinite(np.asarray(v_inf)).all()


def test_autocorrelation_delay_gather_matches_roll():
    """Shared-delay aggregation must equal the reference's roll loop
    (AutoCorrelation.py:50-58)."""
    from medtsllm_tpu.ops.autocorr import _delay_gather
    rng = np.random.default_rng(2)
    v = rng.normal(size=(2, 3, 4, 16)).astype(np.float32)
    delays = np.array([3, 7], dtype=np.int32)
    got = np.asarray(_delay_gather(jnp.asarray(v), jnp.asarray(delays)))
    for i, d in enumerate(delays):
        np.testing.assert_allclose(got[i], np.roll(v, -d, axis=-1), atol=1e-6)


def test_wavelet_filter_bank_orthogonality():
    """Legendre filter bank must satisfy perfect reconstruction:
    decompose then reconstruct a signal of dyadic length recovers it."""
    from medtsllm_tpu.ops.wavelets import filter_bank, _wavelet_transform, _even_odd
    k = 4
    ec_s, ec_d, rc_e, rc_o = (jnp.asarray(m) for m in filter_bank("legendre", k))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 3, k)), jnp.float32)
    d, s = _wavelet_transform(x, ec_d, ec_s)
    back = _even_odd(jnp.concatenate([s, d], axis=-1), rc_e, rc_o, k)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_multiwavelet_transform_forward():
    from medtsllm_tpu.ops.wavelets import MultiWaveletTransform
    B, L, H, E = 2, 16, 4, 4
    m = MultiWaveletTransform(ich=H * E, k=3, alpha=4, c=4, nCZ=1, L=0)
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(B, L, H, E)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), q, q, q)
    out, _ = m.apply(params, q, q, q)
    assert out.shape == (B, L, H, E)
    assert np.isfinite(np.asarray(out)).all()


def test_multiwavelet_cross_forward():
    from medtsllm_tpu.ops.wavelets import MultiWaveletCross
    B, Nq, S, H, E = 2, 24, 16, 4, 4
    m = MultiWaveletCross(in_channels=16, out_channels=16, seq_len_q=Nq,
                          seq_len_kv=S, modes=4, c=4, k=3, ich=H * E, L=0)
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(B, Nq, H, E)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, E)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), q, k, k)
    out, _ = m.apply(params, q, k, k)
    assert out.shape == (B, Nq, H * E)
    assert np.isfinite(np.asarray(out)).all()
