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

from ...ops.pallas.selective_scan import (selective_scan, selective_ssm,
                                          selective_ssm_final,
                                          selective_ssm_h0)
from .transformer import QuantDense, RMSNorm, _remat_block_call

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
    act_quant: bool | str = True

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, prefix_state=None,
                 return_state: bool = False):
        """``prefix_state`` (serving) = (conv_ctx [1|B, K-1, E],
        h0 [1|B, N, E]): resume the depthwise conv and the SSM recurrence
        from the cached prompt-prefix state. ``return_state`` (prefill)
        additionally returns this segment's (conv tail, final SSM state).
        The recurrence is associative, so resuming from the cached state
        is numerically the full-sequence scan (tests/test_prefix_cache.py)."""
        cfg = self.cfg
        E, N, R = cfg.d_inner, cfg.d_state, cfg.rank
        residual = x
        x = RMSNorm(eps=cfg.norm_eps, name="norm",
                    param_dtype=self.param_dtype)(x)

        def dense(features, use_bias, name):
            if self.quantize:
                return QuantDense(features, use_bias=use_bias,
                                  dtype=self.dtype, bits=self.quantize,
                                  act_quant=self.act_quant,
                                  codebook=getattr(cfg, "quant4_codebook",
                                                   "absmax"), name=name)
            return nn.Dense(features, use_bias=use_bias, dtype=self.dtype,
                            param_dtype=self.param_dtype, name=name)

        xz = dense(2 * E, cfg.use_bias, "in_proj")(x)  # [B, L, 2E]
        xs, z = jnp.split(xz, 2, axis=-1)
        B_, K = xs.shape[0], cfg.d_conv

        # depthwise causal conv over L (kernel [K, 1, E], groups=E); left
        # context = zeros (pad K-1) or the cached prefix tail, so position
        # t sees only t-K+1..t
        kernel = self.param("conv_kernel", nn.initializers.lecun_normal(),
                            (cfg.d_conv, 1, E), self.param_dtype)
        if return_state:
            # conv tail of the RAW pre-activation xs, zero-padded like the
            # conv's own left context when the segment is shorter than K-1
            conv_tail = jnp.pad(
                xs, ((0, 0), (K - 1, 0), (0, 0)))[:, -(K - 1):]
        if prefix_state is not None:
            ctx = jnp.broadcast_to(
                prefix_state[0].astype(xs.dtype), (B_, K - 1, E))
            conv_in = jnp.concatenate([ctx, xs], axis=1)
            pad_conv = [(0, 0)]
        else:
            conv_in = xs
            pad_conv = [(K - 1, 0)]
        xc = jax.lax.conv_general_dilated(
            conv_in.astype(kernel.dtype), kernel,
            window_strides=(1,), padding=pad_conv,
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
        args = (dt, A.T, B_ssm.astype(jnp.float32),
                C_ssm.astype(jnp.float32), xs.astype(jnp.float32),
                d_skip.astype(jnp.float32))
        h_final = None
        if return_state:
            y, h_final = selective_ssm_final(*args)          # [B,L,E]
        elif prefix_state is not None:
            y = selective_ssm_h0(*args, prefix_state[1])
        else:
            y = selective_ssm(*args)
        y = (y.astype(xz.dtype)) * nn.silu(z)
        out = residual + dense(cfg.d_model, cfg.use_bias, "out_proj")(y)
        if return_state:
            return out, (conv_tail, h_final)
        return out


class MambaBackbone(nn.Module):
    """Embedding + n_layers MambaBlocks + final RMSNorm; returns the last
    hidden state (HF MambaModel surface, like TransformerDecoder)."""

    cfg: MambaConfig
    lora: object = None  # accepted for interface parity; must be None
    remat: bool | str = False
    dtype: object = None
    param_dtype: object = jnp.float32
    quantize: int = 0
    act_quant: bool | str = True

    def setup(self):
        if self.lora is not None:
            raise ValueError("LoRA targets attention projections; the "
                             "mamba backbone has none — finetune with "
                             "llm.lora disabled")
        cfg = self.cfg
        self.wte = self.param("wte", nn.initializers.normal(0.02),
                              (cfg.vocab_size, cfg.d_model), self.param_dtype)
        self.blocks = [MambaBlock(cfg, dtype=self.dtype,
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
                 prefix_kv=None, deterministic: bool = True):
        """``prefix_kv`` (serving; name shared with TransformerDecoder):
        tuple of per-layer (conv_tail, ssm_state) from `prefill` — the
        SSM analogue of a KV cache, O(1)-size per layer."""
        x = self.embed(input_ids) if inputs_embeds is None else inputs_embeds
        if prefix_kv is None:
            call = _remat_block_call(self.remat, deterministic)
            for block in self.blocks:
                x = call(block, x)
        else:
            for i, block in enumerate(self.blocks):
                x = block(x, deterministic=deterministic,
                          prefix_state=prefix_kv[i])
        return self.norm(x)

    def prefill(self, inputs_embeds) -> tuple:
        """Run the stack over a prompt prefix [1, P, d]; returns per-layer
        (conv tail [1, K-1, E], SSM state [1, N, E]) to seed
        `__call__(prefix_kv=...)`."""
        x = inputs_embeds
        states = []
        for block in self.blocks:
            x, st = block(x, deterministic=True, return_state=True)
            states.append(st)
        return tuple(states)
