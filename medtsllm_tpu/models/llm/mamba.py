"""Mamba (selective SSM) backbone, TPU-native.

Fills the reference's optional Mamba slot: recommended.txt:6-7 lists
mamba-ssm/causal-conv1d and models/medtsllm.py:160,168 carries the
skip-module hints, but the reference never ships the CUDA kernels — any
`AutoModel` mamba checkpoint would fall back to HF's sequential "slow
path". Here the selective scan is rebuilt for XLA instead: a chunked
linear-recurrence scan (`lax.scan` carrying the [B, E, N] state across
fixed-size chunks, `lax.associative_scan` inside each chunk — O(L/c)
sequential steps, all shapes static), the depthwise causal conv as one
grouped `lax.conv`, and the projections as MXU matmuls (QuantDense when
the backbone is quantized). Matches HF `MambaModel` numerics — parity
is tested against a locally-built tiny snapshot in tests/test_hf_parity.py.

Drop-in backbone: same `embed` / `word_embeddings` / `__call__` surface
as TransformerDecoder, so MedTsLLM's fusion path (medtsllm.py setup) and
GPT4TS-style consumers work unchanged.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.pallas.selective_scan import selective_scan, selective_ssm
from .transformer import QuantDense, RMSNorm, remat_class

__all__ = ["MambaConfig", "MambaBlock", "MambaBackbone", "selective_scan"]


@dataclasses.dataclass(frozen=True)
class MambaConfig:
    vocab_size: int
    d_model: int
    n_layers: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: int | None = None  # None -> ceil(d_model / 16) (HF "auto")
    norm_eps: float = 1e-5
    use_bias: bool = False  # in/out projection bias (HF use_bias)
    use_conv_bias: bool = True
    style: str = "mamba"
    is_encoder_decoder: bool = False
    bos_token_id: int | None = 0
    eos_token_id: int | None = 0

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def rank(self) -> int:
        return self.dt_rank or math.ceil(self.d_model / 16)


class MambaBlock(nn.Module):
    """RMSNorm -> mixer -> residual (HF MambaBlock + MambaMixer slow path)."""

    cfg: MambaConfig
    dtype: object = None
    param_dtype: object = jnp.float32
    quantize: int = 0
    act_quant: bool = True

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.cfg
        E, N, R = cfg.d_inner, cfg.d_state, cfg.rank
        residual = x
        x = RMSNorm(eps=cfg.norm_eps, name="norm",
                    param_dtype=self.param_dtype)(x)

        def dense(features, use_bias, name):
            if self.quantize:
                return QuantDense(features, use_bias=use_bias,
                                  dtype=self.dtype, bits=self.quantize,
                                  act_quant=self.act_quant, name=name)
            return nn.Dense(features, use_bias=use_bias, dtype=self.dtype,
                            param_dtype=self.param_dtype, name=name)

        xz = dense(2 * E, cfg.use_bias, "in_proj")(x)  # [B, L, 2E]
        xs, z = jnp.split(xz, 2, axis=-1)

        # depthwise causal conv over L (kernel [K, 1, E], groups=E); left
        # pad K-1 so position t sees only t-K+1..t
        kernel = self.param("conv_kernel", nn.initializers.lecun_normal(),
                            (cfg.d_conv, 1, E), self.param_dtype)
        xc = jax.lax.conv_general_dilated(
            xs.astype(kernel.dtype), kernel,
            window_strides=(1,), padding=[(cfg.d_conv - 1, 0)],
            dimension_numbers=("NLC", "LIO", "NLC"),
            feature_group_count=E)
        if cfg.use_conv_bias:
            xc = xc + self.param("conv_bias", nn.initializers.zeros,
                                 (E,), self.param_dtype)
        xs = nn.silu(xc).astype(xz.dtype)

        dtbc = dense(R + 2 * N, False, "x_proj")(xs)  # [B, L, R+2N]
        dt, B_ssm, C_ssm = jnp.split(dtbc, [R, R + N], axis=-1)
        # dt_proj stays unquantized: softplus(dt W + bias) is the
        # discretization step size — bias-dominated and tiny
        dt = nn.Dense(E, dtype=self.dtype, param_dtype=self.param_dtype,
                      name="dt_proj")(dt)
        dt = jax.nn.softplus(dt.astype(jnp.float32))  # [B, L, E]

        a_log = self.param(
            "A_log",
            lambda k, s: jnp.log(jnp.broadcast_to(
                jnp.arange(1, N + 1, dtype=jnp.float32), s)),
            (E, N))
        A = -jnp.exp(a_log.astype(jnp.float32))  # [E, N]
        d_skip = self.param("D", nn.initializers.ones, (E,))
        # fused discretize+scan+contract: the [B, L, N, E] intermediates
        # never reach HBM (ops/pallas/selective_scan.py — the mamba-ssm
        # CUDA kernel's TPU-native counterpart)
        y = selective_ssm(dt, A.T, B_ssm.astype(jnp.float32),
                          C_ssm.astype(jnp.float32),
                          xs.astype(jnp.float32),
                          d_skip.astype(jnp.float32))        # [B,L,E]
        y = (y.astype(xz.dtype)) * nn.silu(z)
        return residual + dense(cfg.d_model, cfg.use_bias, "out_proj")(y)


class MambaBackbone(nn.Module):
    """Embedding + n_layers MambaBlocks + final RMSNorm; returns the last
    hidden state (HF MambaModel surface, like TransformerDecoder)."""

    cfg: MambaConfig
    lora: object = None  # accepted for interface parity; must be None
    remat: bool | str = False
    dtype: object = None
    param_dtype: object = jnp.float32
    quantize: int = 0
    act_quant: bool = True

    def setup(self):
        if self.lora is not None:
            raise ValueError("LoRA targets attention projections; the "
                             "mamba backbone has none — finetune with "
                             "llm.lora disabled")
        cfg = self.cfg
        self.wte = self.param("wte", nn.initializers.normal(0.02),
                              (cfg.vocab_size, cfg.d_model), self.param_dtype)
        block_cls = remat_class(MambaBlock, self.remat)
        self.blocks = [block_cls(cfg, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 quantize=self.quantize,
                                 act_quant=self.act_quant, name=f"h_{i}")
                       for i in range(cfg.n_layers)]
        self.norm = RMSNorm(eps=cfg.norm_eps, name="norm_f",
                            param_dtype=self.param_dtype)

    def embed(self, token_ids) -> jnp.ndarray:
        return jnp.take(self.wte, token_ids, axis=0)

    def word_embeddings(self) -> jnp.ndarray:
        return self.wte

    def __call__(self, inputs_embeds=None, input_ids=None, *,
                 deterministic: bool = True):
        x = self.embed(input_ids) if inputs_embeds is None else inputs_embeds
        for block in self.blocks:
            x = block(x, deterministic=deterministic)
        return self.norm(x)
