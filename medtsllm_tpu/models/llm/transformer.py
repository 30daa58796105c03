"""Decoder-only transformer backbones (GPT-2 / LLaMA / OPT / NeoX styles).

One module covers the decoder families the reference accepts via HF
AutoModel (models/medtsllm.py:175, models/gpt4ts.py:44):
  - gpt2: learned positions, pre-LN, fused qkv (Conv1D layout), tanh-GELU MLP
  - llama: RMSNorm, rotary positions, GQA-ready separate q/k/v, SwiGLU MLP
    (mistral/mixtral load as llama-style; mixtral adds the MoEMLP)
  - opt: learned positions at offset 2, pre-LN, biased q/k/v, relu MLP
  - neox (pythia): partial rotary (rotary_pct), parallel attention+FFN
    residual, per-head-packed qkv (deinterleaved by the loader), erf-GELU
  - bart (TransformerEncDec): post-LN enc-dec, learned positions at
    offset 2 per side, layernorm_embedding, erf-GELU, optional
    sqrt(d_model) embed scale

Attention runs through the Pallas flash kernel on TPU
(ops/pallas/flash_attention.py). LoRA adapters (reference peft usage,
medtsllm.py:187-204) are implemented as `lora_a`/`lora_b` params inside
LoRADense — the naming prefix is what the trainable/frozen partitioning
keys on.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ...ops.pallas.flash_attention import flash_attention
from ...ops.pallas.rope_attention import (fused_rope_attention,
                                          fused_rope_attention_supported,
                                          rope_tables)


@dataclasses.dataclass(frozen=True)
class LoraSpec:
    rank: int = 8
    alpha: int = 16
    dropout: float = 0.0
    rslora: bool = True
    # which projections get adapters; peft defaults: llama q/v, gpt2 c_attn
    targets: tuple = ("q", "v")

    @property
    def scaling(self) -> float:
        return (self.alpha / math.sqrt(self.rank) if self.rslora
                else self.alpha / self.rank)


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    style: str  # "gpt2" | "llama"
    vocab_size: int
    d_model: int
    n_layers: int
    n_heads: int
    d_ff: int
    n_kv_heads: int | None = None
    max_position: int = 2048
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    dropout: float = 0.0
    bos_token_id: int | None = None
    eos_token_id: int | None = None
    pad_token_id: int | None = None
    is_encoder_decoder: bool = False
    # t5-style extras (style == "t5"): explicit head dim, decoder depth,
    # relative-position buckets, gated FFN (t5 v1.1)
    d_head: int | None = None
    n_dec_layers: int | None = None
    rel_buckets: int = 32
    rel_max_distance: int = 128
    t5_gated: bool = False
    # mixtral-style sparse MoE FFN (n_experts > 1): top-k routed SwiGLU
    # experts; expert_capacity is the GShard capacity factor (0 = dropless)
    n_experts: int = 0
    n_experts_per_tok: int = 2
    expert_capacity: float = 0.0
    # Pallas grouped-GEMM expert dispatch (ops/pallas/grouped_matmul):
    # dropless (HF-exact, zero capacity padding) at routed-token cost.
    # Serving-only (the kernel has no vjp — train keeps the STE bmm),
    # under deterministic=True with integer-MXU experts: w8a8
    # (quantize=8 + act_quant) or, single-chip, W4A8 packed int4 with
    # the absmax codebook (r5 — the kernel contracts the nibbles).
    # Expert-parallel meshes run the w8 chain per-shard under shard_map
    # (_grouped_ep); within-expert TP / pipeline keep the bmm path.
    # Resolved from models.<m>.llm.moe_grouped ("auto" = on exactly when
    # those conditions hold on a tpu backend) by MedTsLLM.from_config.
    moe_grouped: bool = False
    # fuse q|k|v and gate|up into single wide matmuls (llama style).
    # MEASURED LOSS end-to-end at every batch tried (BASELINE.md: b4
    # 13.87 unfused vs 14.59 fused ms/window, b8 a wash, b80 113.4 vs
    # 99.7): XLA fuses each separate projection's epilogue into its
    # consumer, and the fused layout's s32 intermediate round-trip
    # costs more than the wide matmul saves. Kept for A/Bs
    # (bench --fuse-projections). Numerics are EXACTLY the separate
    # path's: the fused
    # kernel is the column-concat of the separate kernels and per-output-
    # channel quantization scales concatenate. Single-chip only
    # (Megatron TP rules key on the separate projection names).
    fused_projections: bool = False
    # 4-bit weight codebook: "absmax" (symmetric linear int4 — the fast
    # path, feeds the s8xs8 MXU matmul), or the bnb codebooks "fp4"
    # (the reference's BitsAndBytesConfig default,
    # /root/reference/models/medtsllm.py:162-173) / "nf4" (QLoRA) — a
    # 16-entry lookup before a bf16 matmul, exactly bnb's 4-bit GEMM
    # shape (bnb also dequantizes to the compute dtype; there is no
    # int4 tensor-core path on the A100 either)
    quant4_codebook: str = "absmax"
    # opt/neox-family extras (closing the reference's "any HF AutoModel"
    # breadth, medtsllm.py:175): MLP activation override, GPT-NeoX partial
    # rotary fraction and parallel attention+FFN residual
    act_fn: str = ""
    rotary_pct: float = 1.0
    parallel_residual: bool = False
    # bart: multiply token embeddings by sqrt(d_model) (HF
    # BartScaledWordEmbedding; applies to the input_ids path only, like HF)
    scale_embedding: bool = False

    @property
    def head_dim(self) -> int:
        return self.d_head or self.d_model // self.n_heads

    @property
    def kv_heads(self) -> int:
        return self.n_kv_heads or self.n_heads

    @property
    def ln_family(self) -> bool:
        """LayerNorm + biased projections (gpt2/opt/neox/bart), vs the
        RMSNorm bias-free llama family."""
        return self.style in ("gpt2", "opt", "neox", "bart")

    @property
    def learned_positions(self) -> bool:
        return self.style in ("gpt2", "opt")

    @property
    def pos_offset(self) -> int:
        """OPT/BART learned positions start at offset 2 (HF
        OPTLearnedPositionalEmbedding / BartLearnedPositionalEmbedding:
        padding_idx legacy)."""
        return 2 if self.style in ("opt", "bart") else 0

    @property
    def post_ln(self) -> bool:
        """BART block order: LayerNorm AFTER each residual add (HF
        BartEncoderLayer/BartDecoderLayer), vs pre-LN everywhere else."""
        return self.style == "bart"

    @property
    def rotary_dims(self) -> int:
        """Leading head dims that rotate (neox rotary_pct; full for llama)."""
        d = int(self.head_dim * self.rotary_pct)
        return d - (d % 2)


class RMSNorm(nn.Module):
    eps: float = 1e-5
    param_dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                       self.param_dtype)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        xn = x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return xn * w


def rotary_embedding(x, positions, theta: float, seq_axis: int = 2):
    """Apply RoPE (Llama half-split convention) along ``seq_axis``.

    x is [B, H, L, D] (seq_axis=2) or [B, L, H, D] (seq_axis=1).
    Angles/cos/sin are synthesized in f32 (position * inv_freq must not
    lose precision), then cast to x.dtype so the rotation runs at the
    compute precision. Call this BEFORE the head transpose (seq_axis=1,
    projection-output layout): profiling the 7B batch-80 serving graph
    showed XLA cloning the rotation into kLoop fusions that absorb the
    [B,L,H,D]->[B,H,L,D] transpose as strided element reads — ~45
    ms/step vs ~6 ms for the same math over contiguous rows."""
    D = x.shape[-1]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D))
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [L, D/2]
    shape = [1, 1, 1, D // 2]
    shape[seq_axis] = angles.shape[0]
    cos = jnp.cos(angles).reshape(shape).astype(x.dtype)
    sin = jnp.sin(angles).reshape(shape).astype(x.dtype)
    x1, x2 = x[..., : D // 2], x[..., D // 2:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                           axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _act_quant_matmul(xf, kq, scale, bits, int8_bwd=False):
    """Dynamic per-token int8 activation quantization + integer matmul.

    xf [..., K] f32, kq int8 weights ([K, N] or packed [ceil(K/2), N]),
    scale [N] f32 per-channel -> [..., N] f32.

    Forward: absmax-quantize x to int8, s8 x s8 -> s32 on the MXU (2x the
    bf16 FLOP rate on v5e), rescale. Backward: straight-through — the
    quantization is treated as identity and the gradient flows through
    the DEQUANTIZED weight (dx = g @ (kq * scale)^T), matching
    bitsandbytes' Linear8bitLt backward (the reference's finetune mode
    trains fusion layers BELOW the frozen int8 backbone, so dL/dx must
    survive the backbone; round() alone has zero gradient).

    int8_bwd (opt-in, `llm.int8_backward`): quantize the scale-folded
    upstream gradient per row and run dx on the s8 x s8 MXU too — the
    backward's matmuls at 2x the bf16 rate, one more quantization of an
    already-STE gradient (cos-sim vs the bf16 STE dx > 0.999, tested).
    """
    n_in = xf.shape[-1]
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax / 127.0, 1e-10)
    xq = jnp.round(xf / x_scale).astype(jnp.int8)
    if bits == 4 and n_in % 2 == 0:
        # w4a8 dispatch: XLA unpack-then-dot by default (measured fastest
        # at production M — quant_matmul.use_w4a8_kernel);
        # MEDTSLLM_W4A8_KERNEL=1 opts into the Pallas in-VMEM unpack
        # kernel (exact same integer results)
        from ...ops.pallas.quant_matmul import w4a8_matmul
        lead = xq.shape[:-1]
        return w4a8_matmul(xq.reshape(-1, n_in), kq,
                           x_scale.reshape(-1, 1), scale,
                           out_dtype=jnp.float32).reshape(*lead, -1)
    if bits == 8:
        # opt-in (MEDTSLLM_SMALLM_KERNEL=1) weight-streaming kernel for
        # small-M serving shapes. Measured 0.70-0.75x XLA at M=448 —
        # XLA's s8 dot is already at ~70% of the int8 compute bound
        # there, see ops/pallas/smallm_matmul.py — kept for A/Bs only.
        # Exact same integers + rescale as the XLA path below.
        from ...ops.pallas.smallm_matmul import (smallm_blocks,
                                                 smallm_supported,
                                                 w8a8_smallm_matmul_pallas)
        lead = xq.shape[:-1]
        m_flat = int(np.prod(lead)) if lead else 1
        if smallm_supported(m_flat, n_in, kq.shape[1]):
            out = w8a8_smallm_matmul_pallas(
                xq.reshape(m_flat, n_in), kq,
                x_scale.reshape(m_flat, 1), scale,
                out_dtype=jnp.float32,
                block_n=smallm_blocks(m_flat, n_in, kq.shape[1]))
            return out.reshape(*lead, -1)
    w = kq if bits == 8 else QuantDense.unpack4(kq, n_in)
    acc = jax.lax.dot_general(xq, w, (((xq.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (x_scale * scale[None, :])


def _act_quant_matmul_fwd(xf, kq, scale, bits, int8_bwd):
    return (_act_quant_matmul(xf, kq, scale, bits, int8_bwd),
            (xf.shape[-1], kq, scale))


def _act_quant_matmul_bwd(bits, int8_bwd, res, g):
    import numpy as _np
    n_in, kq, scale = res
    w = kq if bits == 8 else QuantDense.unpack4(kq, n_in)
    # fold the per-channel scale into g (O(M*N)) instead of materializing
    # the dequantized f32 weight (O(K*N)); XLA fuses the int8->f32
    # convert into the matmul read, preserving the HBM savings
    gs = g * scale[None, :].astype(g.dtype)
    if int8_bwd:
        # opt-in: per-row absmax quantization of gs, dx on the s8 MXU
        # (contract the N axis of the UNtransposed int8 weight)
        amax = jnp.max(jnp.abs(gs), axis=-1, keepdims=True)
        g_scale = jnp.maximum(amax.astype(jnp.float32) / 127.0, 1e-10)
        gq = jnp.round(gs.astype(jnp.float32) / g_scale).astype(jnp.int8)
        acc = jax.lax.dot_general(gq, w,
                                  (((g.ndim - 1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        dx = (acc.astype(jnp.float32) * g_scale).astype(g.dtype)
    else:
        dx = jax.lax.dot_general(gs, w.astype(g.dtype),
                                 (((g.ndim - 1,), (1,)), ((), ())))
    # int8 weights have no tangent space (float0); scale is frozen with
    # the backbone — zero cotangent
    d_kq = _np.zeros(kq.shape, jax.dtypes.float0)
    return dx, d_kq, jnp.zeros_like(scale)


_act_quant_matmul.defvjp(_act_quant_matmul_fwd, _act_quant_matmul_bwd)


# bnb 4-bit dequant codebooks (bitsandbytes functional.py create_normal_map
# / the FP4 sign-exponent-mantissa table; values are what bnb's CUDA
# dequant kernel emits, scaled by the blockwise absmax). NF4 is the QLoRA
# information-theoretically-optimal-for-N(0,1) map; FP4 is bnb's
# load_in_4bit default — the reference's configuration
# (/root/reference/models/medtsllm.py:162-173).
_NF4_TABLE = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0], dtype=np.float32)
_FP4_TABLE = np.array([  # code 0..7 positive, 8..15 the negated mirror
    0.0, 0.0052083333, 0.6666667, 1.0, 0.3333333, 0.5, 0.16666667, 0.25,
    -0.0, -0.0052083333, -0.6666667, -1.0, -0.3333333, -0.5, -0.16666667,
    -0.25], dtype=np.float32)
QUANT4_CODEBOOKS = {"nf4": _NF4_TABLE, "fp4": _FP4_TABLE}


class QuantDense(nn.Module):
    """Int8/int4 quantized Dense.

    TPU-native replacement for the reference's bitsandbytes 4/8-bit paths
    (models/medtsllm.py:162-173): per-output-channel absmax weight scales;
    int8 stores one weight per byte (4x less HBM than f32), int4 packs two
    weights per byte (8x) and unpacks with arithmetic shifts that XLA
    fuses into the matmul read.

    With ``act_quant`` (default, the analogue of bnb LLM.int8()'s int8
    GEMM), activations are dynamically quantized per token to int8 and the
    matmul runs as s8 x s8 -> s32 — on the v5e MXU that is ~2x the bf16
    FLOP rate — then rescaled by (per-token activation scale) x
    (per-channel weight scale). Without it, weights dequantize to the
    compute dtype (weight-only quantization: HBM savings, bf16 FLOPs).
    """

    features: int
    use_bias: bool = True
    dtype: object = None
    bits: int = 8
    act_quant: bool | str = True
    codebook: str = "absmax"  # 4-bit only: "absmax" | "nf4" | "fp4"

    @staticmethod
    def quantize(w: np.ndarray, bits: int = 8, codebook: str = "absmax"):
        """w [in, out] float -> (int8 storage, f32 scale [out]).
        bits=8: q [in, out]; bits=4: packed [ceil(in/2), out] split-halves
        (row p: logical row p in the high nibble, row p + ceil(in/2) in
        the low — see ops/pallas/quant_matmul.pack4_split).

        codebook "nf4"/"fp4" (bits=4): nearest-entry encode against the
        bnb table; storage is (code - 8) so the same int4 packing
        applies, scale is the per-output-channel absmax itself (the
        codebook spans [-1, 1]). bnb scales by flat block-64 absmax
        instead; per-channel is the TPU-friendly layout (the scale
        applies after the matmul) and is finer than block-64 whenever
        n_in >= 64."""
        import numpy as _np

        from ...ops.pallas.quant_matmul import pack4_split
        if codebook != "absmax":
            assert bits == 4 and codebook in QUANT4_CODEBOOKS
            table = QUANT4_CODEBOOKS[codebook]
            scale = _np.max(_np.abs(w), axis=0).astype(_np.float32)
            scale = _np.where(scale == 0, 1.0, scale)
            wn = w / scale[None, :]
            codes = _np.argmin(
                _np.abs(wn[..., None] - table[None, None, :]), axis=-1)
            return pack4_split((codes - 8).astype(_np.int8)), scale
        qmax = 127.0 if bits == 8 else 7.0
        absmax = _np.max(_np.abs(w), axis=0)
        scale = (absmax / qmax).astype(_np.float32)
        scale = _np.where(scale == 0, 1.0, scale)
        q = _np.clip(_np.round(w / scale[None, :]), -qmax, qmax).astype(_np.int8)
        if bits == 4:
            q = pack4_split(q)
        return q, scale

    @staticmethod
    def unpack4(packed: jnp.ndarray, n_in: int) -> jnp.ndarray:
        """[ceil(n_in/2), out] int8 -> [n_in, out] int8 in [-8, 7]."""
        from ...ops.pallas.quant_matmul import unpack4_split
        return unpack4_split(packed, n_in)

    @nn.compact
    def __call__(self, x):
        n_in = x.shape[-1]
        bits = self.bits
        cb = self.codebook if bits == 4 else "absmax"

        # random init: kernel_q and scale are separate flax params (so
        # they get independent init keys), so both use the SAME fixed
        # quantization scale — 3.5 sigma of the N(0, 0.02) init mapped
        # to qmax (values beyond 3.5 sigma clip, ~0.05%); a per-channel
        # absmax in init_q would silently disagree with the scale param
        qmax = 127.0 if bits == 8 else 7.0
        s_init = 3.5 * 0.02 / (1.0 if cb != "absmax" else qmax)

        def init_q(key, shape, _dtype=jnp.int8):
            import jax as _jax
            from ...ops.pallas.quant_matmul import pack4_split
            w = 0.02 * _jax.random.normal(key, (n_in, self.features), jnp.float32)
            if cb != "absmax":
                table = jnp.asarray(QUANT4_CODEBOOKS[cb])
                codes = jnp.argmin(jnp.abs(w[..., None] / s_init
                                           - table[None, None, :]), axis=-1)
                return pack4_split((codes - 8).astype(jnp.int8))
            q = jnp.clip(jnp.round(w / s_init), -qmax, qmax).astype(jnp.int8)
            if bits == 4:
                q = pack4_split(q)
            return q

        rows = n_in if bits == 8 else (n_in + 1) // 2
        kq = self.param("kernel_q", init_q, (rows, self.features))
        scale = self.param("scale",
                           lambda k, s: s_init * jnp.ones(s, jnp.float32),
                           (self.features,))
        cd = self.dtype or x.dtype
        if cb != "absmax":
            # bnb-style 4-bit GEMM: 16-entry codebook dequant, matmul at
            # the compute dtype (weight-only — codebook values are not
            # integers, so the s8xs8 MXU path does not apply; bnb's CUDA
            # path also dequantizes to bf16/f16 for the GEMM)
            codes = self.unpack4(kq, n_in).astype(jnp.int32) + 8
            table = jnp.asarray(QUANT4_CODEBOOKS[cb])
            w = jnp.take(table, codes, axis=0).astype(cd)
            y = (x.astype(cd) @ w) * scale.astype(cd)
        elif self.act_quant:
            # scale math in f32 regardless of compute dtype; backward is
            # the STE through the dequantized weight (_act_quant_matmul);
            # act_quant == "int8_bwd" runs dx on the s8 MXU too
            y = _act_quant_matmul(x.astype(jnp.float32), kq, scale,
                                  bits,
                                  self.act_quant == "int8_bwd").astype(cd)
        else:
            w = kq if bits == 8 else self.unpack4(kq, n_in)
            y = (x.astype(cd) @ w.astype(cd)) * scale.astype(cd)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(cd)
        return y


class LoRADense(nn.Module):
    """Dense with optional low-rank adapter: y = xW + b + scale * (x A) B.

    ``lora_out_mask`` (static 0/1 vector over the output features)
    restricts the adapter to a slice of a FUSED projection — gpt2's
    c_attn packs q|k|v in one matmul, and a LoraSpec targeting only some
    of them must not adapt the rest (masked lora_b columns stay zero:
    zero delta and zero gradient)."""

    features: int
    use_bias: bool = True
    lora: LoraSpec | None = None
    dtype: object = None
    param_dtype: object = jnp.float32
    quantize: int = 0  # 0 = off, 8 or 4 bits
    act_quant: bool | str = True  # int8 acts; "int8_bwd" = +s8 dx
    codebook: str = "absmax"  # 4-bit: "absmax" | "nf4" | "fp4"
    lora_out_mask: object = None  # static np vector [features] or None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.quantize:
            y = QuantDense(self.features, use_bias=self.use_bias,
                           dtype=self.dtype, bits=self.quantize,
                           act_quant=self.act_quant,
                           codebook=self.codebook, name="base")(x)
        else:
            y = nn.Dense(self.features, use_bias=self.use_bias, name="base",
                         dtype=self.dtype, param_dtype=self.param_dtype)(x)
        if self.lora is not None:
            a = self.param("lora_a",
                           nn.initializers.he_uniform(),
                           (x.shape[-1], self.lora.rank))
            b = self.param("lora_b", nn.initializers.zeros,
                           (self.lora.rank, self.features))
            xd = nn.Dropout(self.lora.dropout)(x, deterministic=deterministic)
            delta = (xd @ a.astype(x.dtype)) @ b.astype(x.dtype) * self.lora.scaling
            if self.lora_out_mask is not None:
                delta = delta * jnp.asarray(self.lora_out_mask, delta.dtype)
            y = y + delta
        return y


class Attention(nn.Module):
    cfg: DecoderConfig
    lora: LoraSpec | None = None
    dtype: object = None
    param_dtype: object = jnp.float32
    quantize: int = 0
    act_quant: bool | str = True
    causal: bool = True

    @nn.compact
    def __call__(self, x, kv=None, *, attn_bias=None, prefix_kv=None,
                 position_offset: int = 0, return_kv: bool = False,
                 deterministic: bool = True):
        """Self-attention over x, or cross-attention into `kv` (encoder
        output) when given — the enc-dec path (medtsllm.py:346-348).
        ``attn_bias`` [1, H, L, S] is the t5 relative-position bias.

        Prefix KV cache (serving): ``prefix_kv`` = (k, v) each
        [1 or B, KV, P, D] with rotary already applied at positions
        0..P-1; x is then the suffix at positions P.. (pass
        ``position_offset=P``) and attends the concatenated keys with the
        causal diagonal end-aligned — flash_attention's S>L semantics.
        ``return_kv`` additionally returns this call's (k, v) so a
        constant prompt prefix can be computed once and reused across
        every eval window (the reference recomputes it per batch)."""
        cfg = self.cfg
        B, L, _ = x.shape
        H, KV, D = cfg.n_heads, cfg.kv_heads, cfg.head_dim
        kv_src = x if kv is None else kv
        S = kv_src.shape[1]

        def proj(name, features, key, src, lora_out_mask=None):
            spec = self.lora if (self.lora and key in self.lora.targets) else None
            return LoRADense(features, use_bias=cfg.ln_family,
                             lora=spec, name=name, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             quantize=self.quantize,
                             act_quant=self.act_quant,
                             codebook=cfg.quant4_codebook,
                             lora_out_mask=lora_out_mask)(
                src, deterministic=deterministic)

        if cfg.style == "gpt2" and kv is None:
            # fused qkv: LoRA attaches when ANY of q/k/v is targeted,
            # with the adapter delta masked to the targeted thirds (a
            # targets=['v'] spec must adapt the v slice, not silently
            # train nothing)
            targeted = (tuple(t for t in ("q", "k", "v")
                              if t in self.lora.targets)
                        if self.lora else ())
            mask = None
            if targeted and targeted != ("q", "k", "v"):
                mask = np.repeat(
                    np.array([float(t in targeted)
                              for t in ("q", "k", "v")], np.float32),
                    cfg.d_model)
            qkv = proj("c_attn", 3 * cfg.d_model,
                       targeted[0] if targeted else "q", x,
                       lora_out_mask=mask)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        elif (cfg.style == "llama" and kv is None
              and getattr(cfg, "fused_projections", False)):
            # small-batch serving: one wide qkv matmul (see
            # DecoderConfig.fused_projections). GQA makes the slices
            # unequal: [H*D | KV*D | KV*D]. LoRA attaches like the gpt2
            # fused path, with the adapter delta masked to the targeted
            # slices.
            sizes = (H * D, KV * D, KV * D)
            targeted = (tuple(t for t in ("q", "k", "v")
                              if t in self.lora.targets)
                        if self.lora else ())
            mask = None
            if targeted and targeted != ("q", "k", "v"):
                mask = np.concatenate([
                    np.full(s, float(t in targeted), np.float32)
                    for t, s in zip(("q", "k", "v"), sizes)])
            qkv = proj("qkv_proj", sum(sizes),
                       targeted[0] if targeted else "q", x,
                       lora_out_mask=mask)
            q = qkv[..., :sizes[0]]
            k = qkv[..., sizes[0]:sizes[0] + sizes[1]]
            v = qkv[..., sizes[0] + sizes[1]:]
        else:
            q = proj("q_proj", H * D, "q", x)
            k = proj("k_proj", KV * D, "k", kv_src)
            v = proj("v_proj", KV * D, "v", kv_src)

        # cast to the compute dtype BEFORE the head split: the quantized
        # projections emit f32 (s32 accumulator x scales), and leaving
        # the cast to XLA lets rotary + transposes run in f32 (profiled
        # at ~2x the attention-core time in the bf16 serving step)
        if self.dtype is not None:
            q, k, v = (t.astype(self.dtype) for t in (q, k, v))
        q = q.reshape(B, L, H, D)
        k = k.reshape(B, S, KV, D)
        v = v.reshape(B, S, KV, D)

        if (kv is None and not return_kv
                and fused_rope_attention_supported(
                    cfg.style, H, KV, D, L, attn_bias is not None,
                    self.causal)):
            # fused rope + prefix-KV + attention kernel: one VMEM pass
            # in the projection layout — opt-in only
            # (MEDTSLLM_FUSED_ROPE_ATTN=1); measured LOSING to the XLA
            # path at the 7B serving shape, see the gate docstring in
            # ops/pallas/rope_attention.py
            positions = position_offset + jnp.arange(L)
            cos, sin = rope_tables(positions, D, cfg.rope_theta)
            pk, pv = prefix_kv if prefix_kv is not None else (None, None)
            out = fused_rope_attention(q, k, v, cos, sin, pk, pv,
                                       1.0 / math.sqrt(D))
            out = out.reshape(B, L, H * D)
            new_kv = None
        else:
            if cfg.style in ("llama", "neox") and kv is None:
                # rotate in the contiguous projection layout, THEN
                # transpose (see rotary_embedding: fusing the rotation
                # across the head transpose costs ~7x in strided reads).
                # neox rotates only the leading rotary_pct head dims
                # (HF GPTNeoXAttention partial rotary)
                positions = position_offset + jnp.arange(L)
                rot = cfg.rotary_dims

                def rope(t):
                    if rot == D:
                        return rotary_embedding(t, positions,
                                                cfg.rope_theta, seq_axis=1)
                    rotated = rotary_embedding(t[..., :rot], positions,
                                               cfg.rope_theta, seq_axis=1)
                    return jnp.concatenate([rotated, t[..., rot:]], axis=-1)

                q, k = rope(q), rope(k)

            q = q.transpose(0, 2, 1, 3)
            k = k.transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)

            new_kv = (k, v) if return_kv else None
            if prefix_kv is not None:
                pk, pv = prefix_kv  # [1 or B, KV, P, D], rotary applied
                pk = jnp.broadcast_to(pk.astype(k.dtype),
                                      (B,) + pk.shape[1:])
                pv = jnp.broadcast_to(pv.astype(v.dtype),
                                      (B,) + pv.shape[1:])
                k = jnp.concatenate([pk, k], axis=2)
                v = jnp.concatenate([pv, v], axis=2)

            # grouped-query attention (KV < H) folds into
            # flash_attention: the repeated K/V heads are broadcast,
            # never materialized
            out = flash_attention(q, k, v,
                                  causal=self.causal and kv is None,
                                  # t5 bakes 1/sqrt(d) into its init
                                  sm_scale=(1.0 if cfg.style == "t5"
                                            else None),
                                  bias=attn_bias)
            out = out.transpose(0, 2, 1, 3).reshape(B, L, H * D)

        o_spec = self.lora if (self.lora and "o" in self.lora.targets) else None
        name = "c_proj" if cfg.style == "gpt2" else "o_proj"
        out = LoRADense(cfg.d_model, use_bias=cfg.ln_family,
                        lora=o_spec, name=name, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        quantize=self.quantize,
                        act_quant=self.act_quant,
                        codebook=cfg.quant4_codebook)(
            out, deterministic=deterministic)
        # HF gpt2's resid_dropout sits AFTER c_proj (softmax-probs dropout
        # is intentionally not implemented — the flash kernel never
        # materializes the probs; eval numerics are unaffected)
        out = nn.Dropout(cfg.dropout)(out, deterministic=deterministic)
        return (out, new_kv) if return_kv else out


class MLP(nn.Module):
    cfg: DecoderConfig
    dtype: object = None
    param_dtype: object = jnp.float32
    quantize: int = 0
    act_quant: bool | str = True

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.cfg

        def dense(features, use_bias, name):
            if self.quantize:
                return QuantDense(features, use_bias=use_bias,
                                  dtype=self.dtype, bits=self.quantize,
                                  act_quant=self.act_quant,
                                  codebook=cfg.quant4_codebook, name=name)
            return nn.Dense(features, use_bias=use_bias, name=name,
                            dtype=self.dtype, param_dtype=self.param_dtype)

        if cfg.ln_family:  # gpt2 / opt / neox / bart: biased fc pair
            h = dense(cfg.d_ff, True, "c_fc")(x)
            # gpt2: HF "gelu_new" (tanh); opt: relu; neox/bart: HF "gelu"
            # (exact erf) — cfg.act_fn carries the snapshot's
            # activation_function/hidden_act override
            act = cfg.act_fn or {"gpt2": "gelu_tanh", "opt": "relu",
                                 "neox": "gelu", "bart": "gelu"}[cfg.style]
            if cfg.style == "gpt2":
                act = "gelu_tanh"
            acts = {"gelu_tanh": lambda v: nn.gelu(v, approximate=True),
                    # HF aliases for the tanh approximation
                    "gelu_new": lambda v: nn.gelu(v, approximate=True),
                    "gelu_fast": lambda v: nn.gelu(v, approximate=True),
                    "gelu_pytorch_tanh": lambda v: nn.gelu(v,
                                                           approximate=True),
                    "quick_gelu": lambda v: v * nn.sigmoid(1.702 * v),
                    "gelu": lambda v: nn.gelu(v, approximate=False),
                    "relu": nn.relu,
                    "silu": nn.silu, "swish": nn.silu}
            if act not in acts:
                raise NotImplementedError(
                    f"hidden activation {act!r} (from the snapshot's "
                    "activation_function/hidden_act) is not mapped; known: "
                    f"{sorted(acts)}")
            h = acts[act](h)
            h = dense(cfg.d_model, True, "c_proj")(h)
            return nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        if cfg.style == "t5":
            if cfg.t5_gated:  # t5 v1.1 gated-gelu (HF act "gelu_new": tanh)
                g = nn.gelu(dense(cfg.d_ff, False, "wi_0")(x),
                            approximate=True)
                h = g * dense(cfg.d_ff, False, "wi_1")(x)
            else:  # t5 v1.0 relu
                h = nn.relu(dense(cfg.d_ff, False, "wi")(x))
            h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
            return dense(cfg.d_model, False, "wo")(h)
        if getattr(cfg, "fused_projections", False):
            gu = dense(2 * cfg.d_ff, False, "gateup_proj")(x)
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = dense(cfg.d_ff, False, "gate_proj")(x)
            up = dense(cfg.d_ff, False, "up_proj")(x)
        return dense(cfg.d_model, False, "down_proj")(nn.silu(gate) * up)


def moe_capacity(n_tokens: int, n_experts: int, top_k: int,
                 factor: float) -> int:
    """Static per-expert slot count. factor <= 0 means dropless: top_k
    gives each token at most ONE slot per expert, so capacity = n_tokens
    is exact. Positive factors give the GShard bound ceil(k*T/E * f),
    rounded up to a multiple of 8 (lane-friendly), capped at T."""
    if factor <= 0:
        return n_tokens
    cap = math.ceil(top_k * n_tokens / n_experts * factor)
    cap = ((cap + 7) // 8) * 8
    return min(cap, n_tokens)


def router_aux_loss(router_probs, expert_index, n_experts: int):
    """Switch/Mixtral load-balancing auxiliary loss: E * sum_e f_e * P_e,
    where f_e is the per-TOKEN count of assignments landing on expert e
    (the [T, k, E] one-hot averaged over T, summed over k — sums to k
    like HF MixtralForCausalLM's load_balancing_loss_func, verified
    against the installed transformers) and P_e the mean router
    probability mass on e. Equals top_k at perfect balance. Sown by
    MoEMLP as intermediates/"router_aux_loss" — the flagship finetune
    mode freezes the backbone, so no trainer consumes it by default."""
    probs = router_probs.reshape(-1, n_experts).astype(jnp.float32)
    onehot = jax.nn.one_hot(expert_index.reshape(-1), n_experts,
                            dtype=jnp.float32)
    top_k = expert_index.size // probs.shape[0]
    f = jnp.mean(onehot, axis=0) * top_k  # mean over T, sum over k
    p = jnp.mean(probs, axis=0)
    return n_experts * jnp.sum(f * p)


def _pack_and_run_gmm(xt, src, dest, n_slots, ve, valid, V, bm, bn_f,
                      bn_d, wb, cd, interpret, kg, sg, ku, su, kd, sd):
    """Quantize-before-dispatch + gather-pack + the fused-requant gmm
    chain — shared by the single-device (_grouped) and EP (_grouped_ep)
    paths so the packing invariants live in ONE place: quantization
    round-trips through the compute dtype (bit-identical to the
    capacity-bmm fallback's quant inputs), rows pack by GATHER (the
    only scatter is the [V*bm] int32 inverse-permutation build — row
    scatters serialize on TPU), out-of-range ``dest`` slots drop from
    the permutation, and sentinel rows carry the 1e-10 scale floor.
    Returns the down-gmm output [V*bm, D_out] (f32)."""
    from medtsllm_tpu.ops.pallas.grouped_matmul import gmm, row_quant
    i32 = jnp.int32
    n_rows = xt.shape[0]
    xq_t, xs_t = row_quant(xt.astype(cd).astype(jnp.float32))
    inv = jnp.full(V * bm, n_slots, i32).at[dest].set(
        jnp.arange(n_slots, dtype=i32))  # tile tails / OOB -> sentinel
    tok = jnp.concatenate(  # packed row -> source token (n_rows = zeros)
        [src.astype(i32), jnp.full((1,), n_rows, i32)])[inv]
    xq = jnp.concatenate(
        [xq_t, jnp.zeros((1, xt.shape[1]), jnp.int8)], axis=0)[tok]
    xs = jnp.concatenate(
        [xs_t, jnp.full((1, 1), 1e-10, jnp.float32)], axis=0)[tok]
    # SwiGLU epilogue + requant fused in VMEM: the first gmm emits int8
    # rows with per-(row, F-tile) scales straight into the down gmm —
    # the [R, F] f32 activation never exists in HBM
    aq, as_ = gmm(xq, xs, (kg, ku), (sg, su), ve, valid, block_m=bm,
                  block_n=bn_f, interpret=interpret, fuse_silu=True,
                  emit_quant=True, w_bits=wb)
    (y,) = gmm(aq, as_, (kd,), (sd,), ve, valid, block_m=bm,
               block_n=bn_d, interpret=interpret, w_bits=wb)
    return y


def _unpack4_experts(packed, n_in):
    """[E, ceil(n_in/2), N] split-halves-packed int4 -> [E, n_in, N]
    int8 (quant_matmul.unpack4_split with a leading expert axis)."""
    hi = jnp.right_shift(packed, 4)  # arithmetic shift keeps sign
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    return jnp.concatenate([hi, lo], axis=1)[:, :n_in]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _act_quant_bmm(hf, kq, scale, int8_bwd=False):
    """Batched (per-expert) w8a8 matmul with dynamic per-row activation
    quantization: hf [E, C, K] f32, kq [E, K, N] int8, scale [E, N] f32
    -> [E, C, N] f32. Same semantics as _act_quant_matmul with a leading
    expert batch dim (s8 x s8 -> s32 on the MXU per expert); backward is
    the same straight-through estimator through the dequantized weight
    (int8_bwd: quantize the scale-folded gradient per row and run dh on
    the s8 MXU too — the llm.int8_backward opt-in)."""
    amax = jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax / 127.0, 1e-10)
    xq = jnp.round(hf / x_scale).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, kq, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (x_scale * scale[:, None, :])


def _act_quant_bmm_fwd(hf, kq, scale, int8_bwd):
    return _act_quant_bmm(hf, kq, scale, int8_bwd), (kq, scale)


def _act_quant_bmm_bwd(int8_bwd, res, g):
    import numpy as _np
    kq, scale = res
    gs = g * scale[:, None, :].astype(g.dtype)
    if int8_bwd:
        amax = jnp.max(jnp.abs(gs), axis=-1, keepdims=True)
        g_scale = jnp.maximum(amax.astype(jnp.float32) / 127.0, 1e-10)
        gq = jnp.round(gs.astype(jnp.float32) / g_scale).astype(jnp.int8)
        acc = jax.lax.dot_general(gq, kq, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.int32)
        dh = (acc.astype(jnp.float32) * g_scale).astype(g.dtype)
    else:
        dh = jax.lax.dot_general(gs, kq.astype(g.dtype),
                                 (((2,), (2,)), ((0,), (0,))))
    return (dh, _np.zeros(kq.shape, jax.dtypes.float0),
            jnp.zeros_like(scale))


_act_quant_bmm.defvjp(_act_quant_bmm_fwd, _act_quant_bmm_bwd)


class MoEMLP(nn.Module):
    """Mixtral-style sparse-MoE SwiGLU FFN, TPU-first static-shape dispatch.

    Closes the reference's AutoModel generality for MoE backbones
    (/root/reference/models/medtsllm.py:175 accepts any HF model id,
    including mixtral). HF semantics preserved exactly in the dropless
    regime: router softmax in f32, top-k of the PROBABILITIES,
    renormalized (MixtralSparseMoeBlock), parity-tested against
    transformers MixtralModel (tests/test_moe.py).

    Dispatch is scatter/gather into a static [E, C, d] buffer (no
    data-dependent shapes under jit): each (token, slot) computes its
    position within its expert via a cumsum over the one-hot assignment,
    slots beyond capacity fall into a trash row and contribute zero.
    Expert FFNs run as E-batched matmuls (einsum over the stacked
    [E, d, f] weights — MXU-batched, sharded P("expert", ...) under
    expert parallelism; within-expert Megatron column/row over "tensor").
    quantize=8 runs the per-expert w8a8 MXU path (_act_quant_bmm);
    quantize=4 stores packed int4 experts (absmax w4a8, or the bnb
    fp4/nf4 codebooks dequantized to the compute dtype — the same menu
    as the dense QuantDense path, since the reference's bnb
    load_in_4bit/8bit quantizes expert Linears like any other)."""

    cfg: DecoderConfig
    dtype: object = None
    param_dtype: object = jnp.float32
    quantize: int = 0
    act_quant: bool | str = True
    ep_mesh: object = None  # Mesh with an "expert" axis (EP constraints)

    def _grouped(self, xt, eid, pos, src, stacked, T, D):
        """Dropless grouped-GEMM expert pass (ops/pallas/grouped_matmul):
        rows packed per expert into tile-aligned groups, the kernel visits
        only occupied tiles — routed-token cost, zero drops, HF-exact
        routing whatever the skew. Returns the per-(token, slot) expert
        outputs [T*k, D] in compute dtype, or None when the shapes don't
        tile (caller falls back to the static-capacity bmm path)."""
        from medtsllm_tpu.ops.pallas.grouped_matmul import (
            gmm_metadata, gmm_visits, pick_block_n)
        cfg = self.cfg
        E, k, F = cfg.n_experts, cfg.n_experts_per_tok, cfg.d_ff
        # gate/up at the widest VMEM-safe tile (fewer activation
        # re-streams; 1408 beat 512 by 4% at the serving shape), down at
        # 1024 (halves the int8 activation re-streams; with emit_quant
        # 1.176 ms balanced vs 1.216 at 512 — tools/ab_grouped.py H rows,
        # 2026-08-20)
        bn_f, bn_d = pick_block_n(F, target=1408), pick_block_n(D, 1024)
        if not (bn_f and bn_d):
            return None
        # w4a8 experts (quantize=4, absmax): the kernel contracts the
        # split-halves PACKED weights directly — half the weight DMA.
        # Down-gmm chunk scales must not straddle the nibble boundary
        # (F // bn_f even) and both contraction dims must be even; the
        # down block caps at 512 — the i32 widen for the nibble shifts
        # at bnd=1024 blows VMEM and crashes the Mosaic compiler
        # (measured 2026-08-20; bnd=512 W4A8: 1.247 ms balanced)
        wb = 4 if self.quantize == 4 else 8
        if wb == 4:
            bn_d = pick_block_n(D, 512)
            if D % 2 or F % 2 or (F // bn_f) % 2 or not bn_d:
                return None
        cd = self.dtype or xt.dtype
        bm = 128  # tail padding E*bm/2 rows avg; A/B'd in tools/ab_grouped
        V = gmm_visits(T * k, E, bm)
        counts = jnp.zeros(E, jnp.int32).at[eid].add(1)
        ve, valid, row_off = gmm_metadata(counts, bm, V)
        dest = row_off[eid] + pos  # dropless: every slot lands in-bounds
        interpret = jax.default_backend() != "tpu"

        kg, sg = stacked("w_gate", D, F)
        ku, su = stacked("w_up", D, F)
        kd, sd = stacked("w_down", F, D)
        y = _pack_and_run_gmm(xt, src, dest, T * k, ve, valid, V, bm,
                              bn_f, bn_d, wb, cd, interpret,
                              kg, sg, ku, su, kd, sd)
        return y[dest].astype(cd)

    def _grouped_ep(self, x, top_i, weights, stacked, B, L, D):
        """Dropless grouped-GEMM experts under EXPERT PARALLELISM (r5).

        shard_map over the ep mesh: each (data, expert) shard packs only
        the slots routed to its LOCAL experts (non-local slots fall into
        the trash row), runs the same fused-requant gmm chain as the
        single-device path over its [E/ep, ...] weight block, applies
        the routing weights, and a single psum over "expert" completes
        every token's top-k mixture — expert weights never leave their
        shard (the same collective footprint as the capacity-bmm EP
        path, at routed-token cost and zero drops). Returns [B, L, D]
        in compute dtype, or None when shapes don't tile / the mesh has
        a tensor axis (within-expert TP stays on the bmm path)."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from medtsllm_tpu.ops.pallas.grouped_matmul import (
            gmm_metadata, gmm_visits, pick_block_n)
        cfg = self.cfg
        mesh = self.ep_mesh
        E, k, F = cfg.n_experts, cfg.n_experts_per_tok, cfg.d_ff
        ep = mesh.shape.get("expert", 1)
        dp = mesh.shape.get("data", 1)
        if (ep <= 1 or E % ep or B % dp
                or mesh.shape.get("tensor", 1) > 1
                or mesh.shape.get("stage", 1) > 1):
            # within-expert TP and pipeline-scanned stacks keep the bmm
            # path (the shard_map below owns only data x expert)
            return None
        E_l = E // ep
        bn_f, bn_d = pick_block_n(F, target=1408), pick_block_n(D, 1024)
        if not (bn_f and bn_d):
            return None
        cd = self.dtype or x.dtype
        bm = 128
        T_l = (B // dp) * L
        V = gmm_visits(T_l * k, E_l, bm)
        interpret = jax.default_backend() != "tpu"

        kg, sg = stacked("w_gate", D, F)
        ku, su = stacked("w_up", D, F)
        kd, sd = stacked("w_down", F, D)

        def shard_fn(xb, eidb, wb, kg, sg, ku, su, kd, sd):
            i32 = jnp.int32
            e0 = jax.lax.axis_index("expert").astype(i32) * E_l
            xt = xb.reshape(T_l, D)
            eid = eidb.reshape(T_l * k).astype(i32)
            w_slot = wb.reshape(T_l * k)
            src = jnp.repeat(jnp.arange(T_l, dtype=i32), k)

            local = (eid >= e0) & (eid < e0 + E_l)
            le = jnp.where(local, eid - e0, E_l)  # sentinel bucket E_l
            # local rank within each local expert (sentinel gets its own
            # cumsum bucket; its slots never land in a real tile)
            onehot = (le[:, None] == jnp.arange(E_l + 1, dtype=i32)[None]
                      ).astype(i32)
            pos = jnp.sum((jnp.cumsum(onehot, axis=0) - onehot) * onehot,
                          axis=-1)
            counts = jnp.zeros(E_l, i32).at[le].add(1)  # sentinel drops
            ve, valid, row_off = gmm_metadata(counts, bm, V)
            dest = jnp.where(local,
                             row_off[jnp.minimum(le, E_l - 1)] + pos,
                             V * bm)  # non-local -> dropped from inv

            y = _pack_and_run_gmm(xt, src, dest, T_l * k, ve, valid, V,
                                  bm, bn_f, bn_d, 8, cd, interpret,
                                  kg, sg, ku, su, kd, sd)
            # non-local slots: dest clamps into a real row on gather —
            # the local mask zeroes their contribution before the psum
            slot_out = y[jnp.minimum(dest, V * bm - 1)].astype(cd)
            wz = (w_slot * local.astype(jnp.float32)).astype(cd)
            out = (slot_out * wz[:, None]).reshape(T_l, k, D).sum(axis=1)
            out = jax.lax.psum(out, "expert")
            return out.reshape(B // dp, L, D)

        dspec = P("data", None, None)
        espec_w, espec_s = P("expert", None, None), P("expert", None)
        fn = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(dspec, dspec, dspec,
                      espec_w, espec_s, espec_w, espec_s,
                      espec_w, espec_s),
            out_specs=dspec, check_rep=False)
        return fn(x, top_i.reshape(B, L, k),
                  weights.reshape(B, L, k).astype(jnp.float32),
                  kg, sg, ku, su, kd, sd)

    def _ep_constrain(self, t, spec_prefix=("expert",)):
        """Pin the leading expert dim of a dispatch tensor to the mesh's
        "expert" axis: expert compute stays device-local and GSPMD's only
        EP collective is the combine psum (never a weight all-gather)."""
        if self.ep_mesh is None or self.is_initializing():
            return t
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P(*spec_prefix, *([None] * (t.ndim - len(spec_prefix))))
        return jax.lax.with_sharding_constraint(
            t, NamedSharding(self.ep_mesh, spec))

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.cfg
        E, k = cfg.n_experts, cfg.n_experts_per_tok
        if cfg.style != "llama":
            raise NotImplementedError(
                f"MoE FFN is llama/mixtral-style only; got {cfg.style!r}")
        if self.quantize not in (0, 4, 8):
            raise NotImplementedError(
                f"MoE experts support int8/int4 quantization; "
                f"got quantize={self.quantize}")
        B, L, D = x.shape
        T = B * L
        F = cfg.d_ff
        cd = self.dtype or x.dtype
        xt = x.reshape(T, D)

        gate_w = self.param("gate", nn.initializers.normal(0.02),
                            (D, E), self.param_dtype)
        logits = xt.astype(jnp.float32) @ gate_w.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        top_p, top_i = jax.lax.top_k(probs, k)  # [T, k]
        weights = top_p / jnp.sum(top_p, axis=-1, keepdims=True)
        self.sow("intermediates", "router_aux_loss",
                 router_aux_loss(probs, top_i, E))

        onehot = (top_i.reshape(T * k)[:, None]
                  == jnp.arange(E)[None, :]).astype(jnp.int32)  # [T*k, E]
        pos_all = jnp.cumsum(onehot, axis=0) - onehot
        pos = jnp.sum(pos_all * onehot, axis=-1)  # [T*k] rank within expert
        eid = top_i.reshape(T * k)
        src = jnp.repeat(jnp.arange(T), k)

        def stacked(name, d_in, d_out):
            if self.quantize in (4, 8):
                # per-expert per-output-channel int8 / packed int4
                # (QuantDense.quantize applied expert-wise by the
                # loader); random init mirrors QuantDense's fixed
                # 3.5-sigma scale. bits=4 stores split-halves packed rows
                # ([E, ceil(d_in/2), d_out]); fp4/nf4 codebooks encode
                # against the bnb table (scale = channel absmax)
                bits = self.quantize
                cb = cfg.quant4_codebook if bits == 4 else "absmax"
                qmax = 127.0 if bits == 8 else 7.0
                s_init = 3.5 * 0.02 / (1.0 if cb != "absmax" else qmax)
                rows = d_in if bits == 8 else (d_in + 1) // 2

                def init_q(key, shape, _dtype=jnp.int8):
                    from ...ops.pallas.quant_matmul import pack4_split
                    w = 0.02 * jax.random.normal(
                        key, (shape[0], d_in, d_out), jnp.float32)
                    if cb != "absmax":
                        table = jnp.asarray(QUANT4_CODEBOOKS[cb])
                        codes = jnp.argmin(
                            jnp.abs(w[..., None] / s_init
                                    - table[None, None, None, :]), axis=-1)
                        q = (codes - 8).astype(jnp.int8)
                    else:
                        q = jnp.clip(jnp.round(w / s_init),
                                     -qmax, qmax).astype(jnp.int8)
                    if bits == 4:
                        q = jnp.stack([pack4_split(q[e])
                                       for e in range(shape[0])])
                    return q

                kq = self.param(name + "_q", init_q, (E, rows, d_out))
                sc = self.param(
                    name + "_scale",
                    lambda _k, s: s_init * jnp.ones(s, jnp.float32),
                    (E, d_out))
                return kq, sc
            w = self.param(
                name,
                nn.initializers.lecun_normal(in_axis=-2, out_axis=-1,
                                             batch_axis=(0,)),
                (E, d_in, d_out), self.param_dtype)
            return w, None

        int_mxu = (self.quantize == 8
                   or (self.quantize == 4
                       and cfg.quant4_codebook == "absmax"))
        if (cfg.moe_grouped and deterministic and int_mxu
                and self.act_quant and not self.is_initializing()):
            if self.ep_mesh is None:
                y = self._grouped(xt, eid, pos, src, stacked, T, D)
                if y is not None:
                    return (y * weights.reshape(T * k)[:, None].astype(cd)
                            ).reshape(T, k, D).sum(axis=1).reshape(B, L, D)
            elif self.quantize == 8:  # EP chain is w8-only for now
                # expert-parallel serving: per-shard grouped chain under
                # shard_map, one psum combine (r5 — dropless at
                # routed-token cost on real multi-chip too)
                y = self._grouped_ep(x, top_i, weights, stacked, B, L, D)
                if y is not None:
                    return y

        C = moe_capacity(T, E, k, cfg.expert_capacity)
        keep = pos < C
        dest = jnp.where(keep, eid * C + pos, E * C)  # drops -> trash row

        buf = jnp.zeros((E * C + 1, D), cd).at[dest].set(
            xt[src].astype(cd))
        h = self._ep_constrain(buf[:E * C].reshape(E, C, D))

        def bmm(h_in, name, d_in, d_out):
            w, sc = stacked(name, d_in, d_out)
            if sc is not None:
                if self.quantize == 4:
                    if cfg.quant4_codebook != "absmax":
                        # bnb fp4/nf4: 16-entry table dequant, bf16 GEMM
                        # (codebook values are not integers — no s8 MXU
                        # path, matching bnb's own dequant-to-GEMM)
                        codes = (_unpack4_experts(w, d_in)
                                 .astype(jnp.int32) + 8)
                        table = jnp.asarray(QUANT4_CODEBOOKS[
                            cfg.quant4_codebook])
                        wd = jnp.take(table, codes, axis=0).astype(cd)
                        acc = jnp.einsum("ecd,edf->ecf",
                                         h_in.astype(cd), wd)
                        return acc * sc[:, None, :].astype(cd)
                    w = _unpack4_experts(w, d_in)  # s8 in [-7, 7]
                if self.act_quant:
                    return _act_quant_bmm(
                        h_in.astype(jnp.float32), w, sc,
                        self.act_quant == "int8_bwd").astype(cd)
                # weight-only: int8 dequant fused into the matmul read,
                # per-channel rescale applied on the (smaller) output
                acc = jnp.einsum("ecd,edf->ecf", h_in.astype(cd),
                                 w.astype(cd))
                return acc * sc[:, None, :].astype(cd)
            return jnp.einsum("ecd,edf->ecf", h_in, w.astype(cd))

        g = bmm(h, "w_gate", D, F)
        u = bmm(h, "w_up", D, F)
        out = bmm(nn.silu(g) * u, "w_down", F, D)  # [E, C, D]
        out = self._ep_constrain(out)

        out_flat = jnp.concatenate(
            [out.reshape(E * C, D), jnp.zeros((1, D), cd)], axis=0)
        w_slot = (weights.reshape(T * k) * keep.astype(jnp.float32))
        y = out_flat[dest] * w_slot[:, None].astype(cd)
        return y.reshape(T, k, D).sum(axis=1).reshape(B, L, D)


class Block(nn.Module):
    cfg: DecoderConfig
    lora: LoraSpec | None = None
    dtype: object = None
    param_dtype: object = jnp.float32
    quantize: int = 0
    act_quant: bool | str = True
    causal: bool = True
    cross: bool = False  # add a cross-attention sublayer (enc-dec decoder)
    ep_mesh: object = None  # Mesh with an "expert" axis (MoE FFN only)

    @nn.compact
    def __call__(self, x, enc_out=None, *, attn_bias=None, prefix_kv=None,
                 position_offset: int = 0, return_kv: bool = False,
                 deterministic: bool = True):
        cfg = self.cfg

        def norm(name_gpt2, name_llama):
            if cfg.ln_family:  # gpt2/opt/neox canonical ln_1/ln_2 names
                return nn.LayerNorm(epsilon=cfg.norm_eps, name=name_gpt2,
                                    dtype=self.dtype,
                                    param_dtype=self.param_dtype)
            return RMSNorm(eps=cfg.norm_eps, name=name_llama,
                           param_dtype=self.param_dtype)

        post = cfg.post_ln  # bart: LN after each residual add
        attn_out = Attention(cfg, self.lora, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             quantize=self.quantize, act_quant=self.act_quant,
                             causal=self.causal,
                             name="attn")(
            x if post else norm("ln_1", "input_layernorm")(x),
            attn_bias=attn_bias,
            prefix_kv=prefix_kv, position_offset=position_offset,
            return_kv=return_kv, deterministic=deterministic)
        new_kv = None
        if return_kv:
            attn_out, new_kv = attn_out
        if cfg.parallel_residual:
            # GPT-NeoX parallel form: x + attn(ln_1(x)) + mlp(ln_2(x)) —
            # both sublayers read the SAME input (HF use_parallel_residual)
            assert not self.cross
            mlp_out = MLP(cfg, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          quantize=self.quantize, act_quant=self.act_quant,
                          name="mlp")(norm("ln_2", "post_attention_layernorm")(x),
                                      deterministic=deterministic)
            x = x + attn_out + mlp_out
            return (x, new_kv) if return_kv else x
        x = x + attn_out
        if post:
            x = norm("ln_1", "input_layernorm")(x)
        if self.cross:
            cross_in = (x if post
                        else norm("ln_cross", "cross_attention_layernorm")(x))
            x = x + Attention(cfg, self.lora, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              quantize=self.quantize,
                              act_quant=self.act_quant, causal=False,
                              name="cross_attn")(
                cross_in, enc_out, deterministic=deterministic)
            if post:
                x = norm("ln_cross", "cross_attention_layernorm")(x)
        moe = cfg.n_experts and cfg.n_experts > 1
        mlp_cls = MoEMLP if moe else MLP
        extra = {"ep_mesh": self.ep_mesh} if moe else {}
        x = x + mlp_cls(cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                        quantize=self.quantize, act_quant=self.act_quant,
                        name="mlp", **extra)(
            x if post else norm("ln_2", "post_attention_layernorm")(x),
            deterministic=deterministic)
        if post:
            x = norm("ln_2", "post_attention_layernorm")(x)
        return (x, new_kv) if return_kv else x


def _dots_policy(moe: bool):
    """"dots" saving policy. Dense blocks: save only non-batched matmuls
    (projections) — attention score matmuls recompute. MoE blocks: every
    expert matmul is a BATCHED dot (leading E axis), so the no-batch-dims
    policy would save nothing in the FFN and silently degenerate to full
    recompute of the dominant FLOPs; use dots_saveable there (also keeps
    attention scores, trading some residency for not recomputing the
    expert matmuls)."""
    if moe:
        return jax.checkpoint_policies.dots_saveable
    return jax.checkpoint_policies.dots_with_no_batch_dims_saveable


def remat_class(cls: type, remat, moe: bool = False) -> type:
    """`cls` wrapped per the remat policy.

    False: save everything. True/"full": save nothing, recompute the whole
    block in backward (max memory saving, +1 forward of FLOPs — what
    torch.utils.checkpoint does in the reference's ecosystem). "dots":
    save matmul outputs (the MXU work) and recompute the rest — see
    _dots_policy for the dense/MoE split; for a frozen backbone this
    makes backward cost ~= one forward instead of two, at
    [B, L, ~4.5 d_model] extra residency per layer.
    """
    if not remat:
        return cls
    if remat == "dots":
        return nn.remat(cls, policy=_dots_policy(moe))
    return nn.remat(cls)


def _remat_block(remat, moe: bool = False) -> type:
    return remat_class(Block, remat, moe)


def _remat_block_call(remat, deterministic: bool, moe: bool = False):
    """Call-site remat for the decoder stack: only (block, x) cross the
    jax.checkpoint boundary — `deterministic` is CLOSED OVER (a traced
    bool would crash flax Dropout's `if deterministic` for dropout>0
    backbones like gpt2), and the serving kwargs (prefix_kv /
    position_offset / return_kv) never enter the checkpointed region;
    prefill and the cached eval path call the plain Block directly.
    Param paths are unchanged (the transform wraps the call, not the
    class)."""
    def call(block, x):
        return block(x, deterministic=deterministic)
    if not remat:
        return call
    if remat == "dots":
        return nn.remat(call, policy=_dots_policy(moe))
    return nn.remat(call)


class _PipeBlock(nn.Module):
    """nn.scan adapter around Block for pipeline parallelism: gives the
    layer stack STACKED params (one tree, leading [n_layers] axis, sharded
    P("stage", ...)) instead of per-layer h_i subtrees — the storage
    layout pipeline stages need (each stage holds only its layers' HBM).
    Deterministic by construction: the pipeline path is for frozen /
    dropout-free backbones (the reference's finetune mode freezes the
    LLM, /root/reference/models/medtsllm.py:162-173)."""

    cfg: DecoderConfig
    lora: LoraSpec | None = None
    dtype: object = None
    param_dtype: object = jnp.float32
    quantize: int = 0
    act_quant: bool | str = True
    ep_mesh: object = None  # threaded so pp x ep keeps EP constraints

    @nn.compact
    def __call__(self, x, _):
        return Block(self.cfg, self.lora, dtype=self.dtype,
                     param_dtype=self.param_dtype, quantize=self.quantize,
                     act_quant=self.act_quant, ep_mesh=self.ep_mesh,
                     name="block")(
            x, deterministic=True), None


class TransformerDecoder(nn.Module):
    """Returns the last hidden state, like HF `AutoModel` without an LM head
    (the reference only consumes `.last_hidden_state`, medtsllm.py:350).

    setup()-style so fusion models can both read the token table (`embed`,
    `word_embeddings` — the reference's llm.get_input_embeddings(),
    medtsllm.py:219,301) and run the stack in one apply.

    ``pipeline`` > 1 stages the layer stack over the mesh's "stage" axis
    (parallel/pipeline.py): params live stacked under ``h_stack`` and the
    forward streams microbatches through the stages. Composes with DP
    ("data", auto) and Megatron TP ("tensor", auto). Serving prefix-KV
    and in-graph dropout are gated off on this path.
    """

    cfg: DecoderConfig
    lora: LoraSpec | None = None
    remat: bool | str = False  # False | True/"full" | "dots"
    dtype: object = None  # compute dtype (None: infer by promotion)
    param_dtype: object = jnp.float32  # storage dtype
    quantize: int = 0  # projection quantization: 0 | 8 | 4 bits
    act_quant: bool | str = True  # int8 MXU matmul; "int8_bwd" = +s8 dx
    pipeline: int = 0  # pipeline stages (0/1 = off)
    pipeline_microbatches: int = 0  # 0 = auto (gcd(batch, 2*stages))
    pipeline_mesh: object = None  # jax.sharding.Mesh with a "stage" axis
    sp: bool = False  # sequence-parallel ring-collective TP (parallel/sp.py)
    sp_mesh: object = None  # jax.sharding.Mesh with a "tensor" axis
    ep_mesh: object = None  # jax.sharding.Mesh with an "expert" axis (MoE)

    def setup(self):
        cfg = self.cfg
        self.wte = self.param("wte", nn.initializers.normal(0.02),
                              (cfg.vocab_size, cfg.d_model), self.param_dtype)
        if cfg.learned_positions:  # gpt2 / opt (+pos_offset rows for opt)
            self.wpe = self.param("wpe", nn.initializers.normal(0.01),
                                  (cfg.max_position + cfg.pos_offset,
                                   cfg.d_model),
                                  self.param_dtype)
        if cfg.ln_family:  # gpt2 / opt / neox: final LayerNorm
            self.ln_f = nn.LayerNorm(epsilon=cfg.norm_eps, name="ln_f",
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype)
            self.embed_drop = nn.Dropout(cfg.dropout)
        else:
            self.norm = RMSNorm(eps=cfg.norm_eps, name="norm",
                                param_dtype=self.param_dtype)
        if self.pipeline and self.pipeline > 1:
            kwargs = dict(lora=self.lora, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          quantize=self.quantize, act_quant=self.act_quant,
                          ep_mesh=self.ep_mesh)
            self.h_stack = nn.scan(
                remat_class(_PipeBlock, self.remat,
                            moe=bool(cfg.n_experts and cfg.n_experts > 1)),
                variable_axes={"params": 0}, split_rngs={"params": True},
                length=cfg.n_layers)(cfg, name="h_stack", **kwargs)
            # unbound per-layer template for the pipeline's functional
            # block apply; constructed here (legal module context) and
            # stashed in a closure so flax doesn't register it as a child
            tmpl = Block(cfg, **kwargs)
            self._pipe_tmpl = (lambda t=tmpl: t)
        else:
            self.blocks = [Block(cfg, self.lora, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 quantize=self.quantize,
                                 act_quant=self.act_quant,
                                 ep_mesh=self.ep_mesh, name=f"h_{i}")
                           for i in range(cfg.n_layers)]
        if self.sp and self.sp_mesh is not None:
            from ...parallel.sp import sp_supported
            if self.pipeline and self.pipeline > 1:
                raise NotImplementedError(
                    "sequence-parallel TP and pipeline parallelism are "
                    "mutually exclusive (both re-schedule the layer stack)")
            if not sp_supported(cfg, self.lora, self.quantize, self.sp_mesh):
                raise NotImplementedError(
                    "sequence-parallel TP supports llama-style DENSE-FFN "
                    "backbones (no MoE) without LoRA, quantize in (0, 8), "
                    "heads divisible by the tensor axis; got "
                    f"style={cfg.style!r} n_experts={cfg.n_experts} "
                    f"lora={self.lora is not None} quantize={self.quantize} "
                    f"heads={cfg.n_heads}/{cfg.kv_heads} "
                    f"mesh={dict(self.sp_mesh.shape)}")

    def _pipeline_stack(self, x, deterministic: bool):
        """Run the layer stack in pipeline mode: microbatches stream over
        the mesh's "stage" axis (parallel/pipeline.py). During init (and
        without a mesh) the lifted scan runs the same stacked params
        sequentially — numerically identical, single-device."""
        cfg = self.cfg
        if not deterministic and cfg.dropout > 0:
            raise NotImplementedError(
                "pipeline parallelism requires a dropout-free backbone "
                "(the frozen-LLM finetune mode); got training dropout "
                f"{cfg.dropout} with pipeline={self.pipeline}")
        if self.is_initializing() or self.pipeline_mesh is None:
            x, _ = self.h_stack(x, None)
            return x
        import math

        from ...parallel.pipeline import pipeline_apply

        stacked = self.h_stack.variables["params"]["block"]
        tmpl = self._pipe_tmpl()

        def block_fn(p, h):
            return tmpl.apply({"params": p}, h, deterministic=True)

        mb = self.pipeline_microbatches or math.gcd(x.shape[0],
                                                    2 * self.pipeline)
        if self.remat == "dots":
            policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        else:
            policy = True if self.remat else None
        return pipeline_apply(block_fn, stacked, x, mesh=self.pipeline_mesh,
                              n_microbatches=mb, checkpoint_policy=policy)

    def embed(self, token_ids) -> jnp.ndarray:
        return jnp.take(self.wte, token_ids, axis=0)

    def word_embeddings(self) -> jnp.ndarray:
        return self.wte

    def __call__(self, inputs_embeds=None, input_ids=None, *,
                 prefix_kv=None, deterministic: bool = True):
        """``prefix_kv`` (serving fast path): tuple of per-layer (k, v)
        from `prefill` — inputs_embeds is then the suffix region at
        positions P..; numerically identical to running the full
        [prefix | suffix] sequence (tests/test_prefix_cache.py)."""
        cfg = self.cfg
        if inputs_embeds is None:
            inputs_embeds = self.embed(input_ids)
        x = inputs_embeds
        L = x.shape[1]
        offset = prefix_kv[0][0].shape[2] if prefix_kv is not None else 0

        if cfg.learned_positions:
            # opt positions start at 2 (HF OPTLearnedPositionalEmbedding).
            # KNOWN DEVIATION: HF derives OPT positions from the
            # attention-mask cumsum, so LEFT-padded real tokens keep
            # positions 2..n; here positions are a fixed arange over the
            # slot index. This framework left-pads prompts into grow-only
            # buckets and masks padded slots out of attention AND loss, so
            # within-framework numerics are self-consistent; HF parity is
            # exact for unpadded batches (tests/test_hf_parity.py) and
            # shifts by the pad count for padded ones.
            p0 = offset + cfg.pos_offset
            x = x + self.wpe[None, p0:p0 + L, :].astype(x.dtype)
        if cfg.ln_family:
            x = self.embed_drop(x, deterministic=deterministic)

        if self.pipeline and self.pipeline > 1:
            if prefix_kv is not None:
                raise NotImplementedError(
                    "prefix KV cache is not supported under pipeline "
                    "parallelism (cache layers live on different stages); "
                    "models gate it off (medtsllm.py can_prefix_cache)")
            x = self._pipeline_stack(x, deterministic)
        elif (self.sp and self.sp_mesh is not None
              and not self.is_initializing()):
            # sequence-parallel ring-collective TP (parallel/sp.py): the
            # whole stack runs token-sharded inside one shard_map over
            # "tensor"; param layout is IDENTICAL to the plain path
            # (init/checkpoints interchangeable). prefix_kv rides in
            # head-sharded (each device attends its local heads' prefix)
            from ...parallel.sp import sp_decoder_stack
            if not deterministic and cfg.dropout > 0:
                raise NotImplementedError(
                    "sequence-parallel TP requires a dropout-free "
                    "backbone (the frozen-LLM finetune mode); got "
                    f"training dropout {cfg.dropout}")
            layers = [self.variables["params"][f"h_{i}"]
                      for i in range(cfg.n_layers)]
            x = sp_decoder_stack(layers, x, cfg, self.sp_mesh,
                                 quantize=self.quantize,
                                 act_quant=self.act_quant,
                                 dtype=self.dtype, remat=self.remat,
                                 prefix_kv=prefix_kv)
        elif prefix_kv is None:
            call = _remat_block_call(self.remat, deterministic,
                                     moe=bool(self.cfg.n_experts
                                              and self.cfg.n_experts > 1))
            for block in self.blocks:
                x = call(block, x)
        else:
            # serving path: eval-only, no backward, so remat is moot and
            # the plain call keeps the extra kwargs out of jax.checkpoint
            for i, block in enumerate(self.blocks):
                x = block(x, deterministic=deterministic,
                          prefix_kv=prefix_kv[i], position_offset=offset)

        if cfg.ln_family:
            x = self.ln_f(x)
        else:
            x = self.norm(x)
        return x

    def prefill(self, inputs_embeds) -> tuple:
        """Run the stack over a prompt prefix [1, P, d] and return the
        per-layer post-rotary (k, v) pairs for `__call__(prefix_kv=...)`.
        Deterministic (eval-only — with LoRA the projections are
        trainable, so callers must rebuild the cache after updates)."""
        if self.pipeline and self.pipeline > 1:
            raise NotImplementedError(
                "prefill (prefix KV cache) is not supported under "
                "pipeline parallelism")
        x = inputs_embeds
        if self.cfg.learned_positions:
            p0 = self.cfg.pos_offset
            x = x + self.wpe[None, p0:p0 + x.shape[1], :].astype(x.dtype)
        kvs = []
        for block in self.blocks:
            x, kv = block(x, deterministic=True, return_kv=True)
            kvs.append(kv)
        return tuple(kvs)


def t5_relative_buckets(L: int, S: int, *, bidirectional: bool,
                        num_buckets: int, max_distance: int) -> jnp.ndarray:
    """T5 relative-position bucket ids [L, S] (HF t5 _relative_position_bucket
    semantics: log-spaced buckets beyond num_buckets//2, split by sign when
    bidirectional)."""
    ctx = jnp.arange(L, dtype=jnp.int32)[:, None]
    mem = jnp.arange(S, dtype=jnp.int32)[None, :]
    rel = mem - ctx  # key position - query position
    if bidirectional:
        nb = num_buckets // 2
        base = (rel > 0).astype(jnp.int32) * nb
        n = jnp.abs(rel)
    else:
        nb = num_buckets
        base = jnp.zeros_like(rel)
        n = jnp.maximum(-rel, 0)
    max_exact = nb // 2
    is_small = n < max_exact
    large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return base + jnp.where(is_small, n, large)


class TransformerEncDec(nn.Module):
    """Encoder-decoder backbone (the reference's is_encoder_decoder path,
    medtsllm.py:346-348: prompt embeddings feed the encoder, time-series
    embeddings feed the decoder; the decoder's last hidden state is
    consumed, like HF `.last_hidden_state`).

    style == "t5" reproduces HF T5Model semantics so real T5/FLAN-T5
    weights load (loader._hf_to_tree): T5LayerNorm (= RMSNorm), unscaled
    attention, shared relative-position bias computed from the first
    block's bucket table, relu or gated-gelu FFN. style == "bart"
    reproduces HF BartModel: post-LN blocks (cfg.post_ln), learned
    positions at offset 2 per side, layernorm_embedding after embed+pos,
    biased projections, erf-gelu FFN, optional sqrt(d_model) embed scale.
    gpt2/llama styles give a generic pre-LN enc-dec for random-init
    experimentation."""

    cfg: DecoderConfig
    lora: LoraSpec | None = None
    remat: bool | str = False  # False | True/"full" | "dots"
    dtype: object = None
    param_dtype: object = jnp.float32
    quantize: int = 0
    act_quant: bool | str = True

    def setup(self):
        cfg = self.cfg
        self.wte = self.param("wte", nn.initializers.normal(0.02),
                              (cfg.vocab_size, cfg.d_model), self.param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  quantize=self.quantize, act_quant=self.act_quant)
        block_cls = _remat_block(self.remat)
        self.enc_blocks = [block_cls(cfg, self.lora, causal=False,
                                     name=f"enc_h_{i}", **kw)
                           for i in range(cfg.n_layers)]
        n_dec = cfg.n_dec_layers or cfg.n_layers
        self.dec_blocks = [block_cls(cfg, self.lora, causal=True, cross=True,
                                     name=f"dec_h_{i}", **kw)
                           for i in range(n_dec)]
        if cfg.style == "bart":
            # post-LN blocks end with their own final_layer_norm, so there
            # is no stack-final norm; each side gets its own learned
            # position table (+2 offset rows) and layernorm_embedding
            self.enc_wpe = self.param("enc_wpe", nn.initializers.normal(0.01),
                                      (cfg.max_position + cfg.pos_offset,
                                       cfg.d_model), self.param_dtype)
            self.dec_wpe = self.param("dec_wpe", nn.initializers.normal(0.01),
                                      (cfg.max_position + cfg.pos_offset,
                                       cfg.d_model), self.param_dtype)
            self.enc_ln_emb = nn.LayerNorm(epsilon=cfg.norm_eps,
                                           dtype=self.dtype,
                                           param_dtype=self.param_dtype,
                                           name="enc_ln_emb")
            self.dec_ln_emb = nn.LayerNorm(epsilon=cfg.norm_eps,
                                           dtype=self.dtype,
                                           param_dtype=self.param_dtype,
                                           name="dec_ln_emb")
            self.embed_drop = nn.Dropout(cfg.dropout)
        elif cfg.style == "gpt2":
            self.enc_norm = nn.LayerNorm(epsilon=cfg.norm_eps,
                                         dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name="enc_ln_f")
            self.dec_norm = nn.LayerNorm(epsilon=cfg.norm_eps,
                                         dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name="dec_ln_f")
            self.wpe = self.param("wpe", nn.initializers.normal(0.01),
                                  (cfg.max_position, cfg.d_model),
                                  self.param_dtype)
        else:
            self.enc_norm = RMSNorm(eps=cfg.norm_eps,
                                    param_dtype=self.param_dtype,
                                    name="enc_norm")
            self.dec_norm = RMSNorm(eps=cfg.norm_eps,
                                    param_dtype=self.param_dtype,
                                    name="dec_norm")
        if cfg.style == "t5":
            # HF keeps these inside block 0's self-attention; every block
            # reuses block 0's computed bias
            init = nn.initializers.normal(0.02)
            self.enc_rel_bias = self.param(
                "enc_rel_bias", init, (cfg.rel_buckets, cfg.n_heads),
                self.param_dtype)
            self.dec_rel_bias = self.param(
                "dec_rel_bias", init, (cfg.rel_buckets, cfg.n_heads),
                self.param_dtype)

    def embed(self, token_ids) -> jnp.ndarray:
        e = jnp.take(self.wte, token_ids, axis=0)
        if self.cfg.scale_embedding:  # HF BartScaledWordEmbedding: the
            # scale lives inside embed_tokens, so it applies to the
            # input_ids path only (inputs_embeds bypass it, like HF)
            e = e * math.sqrt(self.cfg.d_model)
        return e

    def word_embeddings(self) -> jnp.ndarray:
        return self.wte

    def _rel_bias(self, table, L: int, *, bidirectional: bool, dtype):
        cfg = self.cfg
        buckets = t5_relative_buckets(
            L, L, bidirectional=bidirectional, num_buckets=cfg.rel_buckets,
            max_distance=cfg.rel_max_distance)
        bias = jnp.take(table, buckets, axis=0)  # [L, L, H]
        return bias.transpose(2, 0, 1)[None].astype(dtype)  # [1, H, L, L]

    def __call__(self, inputs_embeds=None, decoder_inputs_embeds=None,
                 input_ids=None, *, deterministic: bool = True):
        cfg = self.cfg
        enc = inputs_embeds if inputs_embeds is not None else self.embed(input_ids)
        if cfg.style == "gpt2":
            enc = enc + self.wpe[None, :enc.shape[1], :].astype(enc.dtype)
        elif cfg.style == "bart":
            p0 = cfg.pos_offset
            enc = enc + self.enc_wpe[None, p0:p0 + enc.shape[1],
                                     :].astype(enc.dtype)
            enc = self.embed_drop(self.enc_ln_emb(enc),
                                  deterministic=deterministic)
        enc_bias = (self._rel_bias(self.enc_rel_bias, enc.shape[1],
                                   bidirectional=True, dtype=enc.dtype)
                    if cfg.style == "t5" else None)
        for blk in self.enc_blocks:
            enc = blk(enc, attn_bias=enc_bias, deterministic=deterministic)
        if cfg.style != "bart":  # post-LN blocks end with their own norm
            enc = self.enc_norm(enc)

        dec = decoder_inputs_embeds
        if cfg.style == "gpt2":
            dec = dec + self.wpe[None, :dec.shape[1], :].astype(dec.dtype)
        elif cfg.style == "bart":
            p0 = cfg.pos_offset
            dec = dec + self.dec_wpe[None, p0:p0 + dec.shape[1],
                                     :].astype(dec.dtype)
            dec = self.embed_drop(self.dec_ln_emb(dec),
                                  deterministic=deterministic)
        dec_bias = (self._rel_bias(self.dec_rel_bias, dec.shape[1],
                                   bidirectional=False, dtype=dec.dtype)
                    if cfg.style == "t5" else None)
        for blk in self.dec_blocks:
            dec = blk(dec, enc, attn_bias=dec_bias,
                      deterministic=deterministic)
        return dec if cfg.style == "bart" else self.dec_norm(dec)
