"""MedTsLLM — the flagship model: frozen/LoRA LLM backbone fused with
patched time-series embeddings via a reprogramming cross-attention, plus
text prompts (dataset/clip/statistics/task descriptions).

Re-design of reference models/medtsllm.py:24-591, split TPU-first into:
  - `PromptBuilder` (host): builds per-sample prompt strings, computes
    input statistics in numpy (the reference computes them on-device then
    syncs with .tolist(), medtsllm.py:476-481), tokenizes, and LEFT-pads
    token ids to a growing bucket length so one compiled graph serves all
    batches (vs the reference's per-batch max-length pad + per-sample
    tokenize inside forward, medtsllm.py:328-339);
  - `MedTsLLM` (flax module, one jit graph): RevIN -> patch-unfold ->
    conv patch embedding -> vocab-mapped reprogramming cross-attention ->
    [prompt embeds | ts embeds] -> decoder-only LLM -> d_ff downsample ->
    FlattenHead -> covariate merge -> RevIN denorm.

Pad tokens are embedded and attended like the reference (no attention
mask is passed to the LLM there either, medtsllm.py:349-350).
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..ops.embed import PatchEmbedding
from ..ops.revin import masked_window_norm, revin_denorm, revin_norm
from .llm.loader import resolve_config
from .llm.tokenizer import get_tokenizer
from .llm.transformer import LoraSpec, TransformerDecoder

VOCAB_SUBSAMPLE_LIMIT = 100_000  # medtsllm.py:220-222


class ReprogrammingLayer(nn.Module):
    """Cross-attention from patch embeddings (queries) into a compressed
    text-token basis (keys/values) — medtsllm.py:555-591. (The
    reference's d_model arg only seeds its d_keys default and is dead
    when d_keys is given, as MedTsLLM always does — not carried here.)"""

    n_heads: int
    d_keys: int
    d_llm: int
    attention_dropout: float = 0.1

    @nn.compact
    def __call__(self, target, source, value, *, deterministic: bool = True):
        B, L, _ = target.shape
        S = source.shape[0]
        H = self.n_heads

        q = nn.Dense(self.d_keys * H, name="query_projection")(target)
        k = nn.Dense(self.d_keys * H, name="key_projection")(source)
        v = nn.Dense(self.d_keys * H, name="value_projection")(value)
        q = q.reshape(B, L, H, self.d_keys)
        k = k.reshape(S, H, self.d_keys)
        v = v.reshape(S, H, self.d_keys)

        scale = float(1.0 / np.sqrt(self.d_keys))
        if deterministic:
            # fused Pallas kernel: shared K/V basis resident in VMEM,
            # scores+softmax+mix in one pass (jnp fallback off-TPU).
            # Eval/inference only — the kernel has no custom_vjp, so the
            # training path (even at dropout 0) stays on the einsum
            # graph XLA can differentiate
            from ..ops.pallas.reprogramming import reprogramming_attention
            out = reprogramming_attention(q, k, v, scale).reshape(B, L, -1)
        else:
            scores = jnp.einsum("blhe,she->bhls", q, k)
            A = jax.nn.softmax(scale * scores, axis=-1)
            A = nn.Dropout(self.attention_dropout)(A,
                                                   deterministic=deterministic)
            out = jnp.einsum("bhls,she->blhe", A, v).reshape(B, L, -1)
        return nn.Dense(self.d_llm, name="out_projection")(out)


class MedTsLLM(nn.Module):
    task: str
    seq_len: int
    pred_len: int
    n_features: int
    n_classes: int
    n_outputs_per_step: int
    d_model: int
    d_ff: int
    n_heads: int
    num_tokens: int
    patch_len: int
    stride: int
    covariate_mode: str
    embedding_downsample_mode: str
    dropout: float
    llm_enabled: bool
    llm_cfg: object  # DecoderConfig
    llm_id: str = "gpt2"
    cache_dir: str | None = None
    lora: LoraSpec | None = None
    seg_mode: str | None = None
    remat: bool | str = False  # False | True/"full" | "dots"
    llm_dtype: str = "float32"  # backbone storage+compute dtype
    quantize: int = 0  # backbone quantization: 0 | 8 | 4 bits
    act_quant: bool | str = True  # int8 MXU matmul; "int8_bwd": s8 dx too
    prefix_cache: bool = True  # serving: cache the constant prompt head's KV
    pipeline: int = 0  # backbone pipeline-parallel stages (0/1 = off)
    pipeline_microbatches: int = 0  # 0 = auto
    pipeline_mesh: object = None  # Mesh with a "stage" axis (static attr)
    sp: bool = False  # sequence-parallel ring-collective TP (parallel/sp.py)
    sp_mesh: object = None  # Mesh with a "tensor" axis (static attr)
    ep_mesh: object = None  # Mesh with an "expert" axis (MoE backbones)

    supported_tasks = ("forecasting", "reconstruction", "anomaly_detection",
                       "semantic_segmentation", "segmentation", "pretraining",
                       "classification", "imputation")
    supported_modes = ("univariate", "multivariate")

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    @classmethod
    def model_config(cls, config):
        models = config.models
        return models.medtsllm if "medtsllm" in models else models.timellm

    @staticmethod
    def _resolve_act_quant(mc, quantize, llm_cfg):
        """models.<m>.llm.{int8_matmul, int8_backward} -> act_quant mode.

        int8_backward requires a path that actually RUNS the act-quant
        integer matmul: int8_matmul on, an integer-quantized backbone
        (quantize 8, or 4 with the absmax codebook — fp4/nf4 dequantize
        weight-only and never enter _act_quant_matmul). Raising beats a
        silent no-op (the moe_grouped gate above sets the precedent)."""
        int8_mm = bool(mc.llm.get("int8_matmul", True))
        if not mc.llm.get("int8_backward", False):
            return int8_mm
        codebook_4 = (quantize == 4
                      and getattr(llm_cfg, "quant4_codebook",
                                  "absmax") != "absmax")
        if not int8_mm or quantize not in (4, 8) or codebook_4:
            raise ValueError(
                "models.llm.int8_backward requires the s8 MXU matmul "
                "path: int8_matmul = true and load_in_8bit (or "
                "load_in_4bit with the absmax codebook) — got "
                f"int8_matmul={int8_mm}, quantize={quantize}"
                + (", codebook=fp4/nf4 (weight-only dequant)"
                   if codebook_4 else ""))
        return "int8_bwd"

    # (under [setup] tp_overlap the column ring matmuls honor int8_bwd;
    # the row-parallel reduce-scatter keeps its exact-s32 ring math with
    # the bf16 STE backward — parallel/sp.py::_make_row_mm)

    @classmethod
    def from_config(cls, config, dataset):
        mc = cls.model_config(config)
        task = config.task

        n_classes = (dataset.n_classes
                     if task in ("classification", "semantic_segmentation") else 0)
        if task in ("forecasting", "reconstruction", "anomaly_detection",
                    "pretraining", "imputation"):
            n_outputs_per_step = dataset.n_features
        elif task == "classification":
            # beyond-reference (like the trainer, tasks/classification.py):
            # one label per window — the FlattenHead projects straight to
            # n_classes logits (head_steps == 1), precedent
            # /root/reference/models/gpt4ts.py:178-194
            n_outputs_per_step = n_classes
        elif task == "semantic_segmentation":
            n_outputs_per_step = n_classes if n_classes > 2 else 1
        elif task == "segmentation":
            n_outputs_per_step = 1
            assert config.tasks.segmentation.mode in (
                "boundary-prediction", "steps-to-boundary")
        else:
            raise ValueError(f"Task {task} is not supported.")

        cache_dir = config.get("paths", {}).get("llm_path") or None
        if cache_dir in ("", "none"):
            cache_dir = None
        llm_cfg, _ = resolve_config(mc.llm.llm, cache_dir,
                                    mc.llm.get("llm_layers", -1))

        # MoE dispatch capacity (models.<m>.llm.expert_capacity): GShard
        # capacity factor for the static expert buffers; 0/unset =
        # dropless (HF-exact numerics; buffers grow with the token
        # count). Real mixtral snapshots default to dropless, so bound
        # it here for production batch sizes.
        cap = mc.llm.get("expert_capacity", None)
        if cap is not None:
            if getattr(llm_cfg, "n_experts", 0) <= 1:
                raise ValueError(
                    f"models.llm.expert_capacity set but backbone "
                    f"{mc.llm.llm!r} is not a MoE (n_experts <= 1)")
            import dataclasses
            llm_cfg = dataclasses.replace(llm_cfg,
                                          expert_capacity=float(cap))

        # models.<m>.llm.fuse_projections: fuse q|k|v and gate|up into
        # single wide matmuls. A/B-only — measured SLOWER end-to-end at
        # every batch tried (BASELINE.md "Fused q/k/v ... REVERTED").
        # Single-chip only: the Megatron TP rules and the sp ring path
        # key on the separate projection names.
        if mc.llm.get("fuse_projections", False) and mc.llm.enabled:
            if getattr(llm_cfg, "style", "") != "llama":
                raise ValueError(
                    f"models.llm.fuse_projections supports llama-style "
                    f"decoders; {mc.llm.llm!r} is "
                    f"{getattr(llm_cfg, 'style', '?')!r}")
            if (int(config.setup.get("tensor_parallel", 1) or 1) > 1
                    or config.setup.get("tp_overlap", False)):
                raise ValueError(
                    "models.llm.fuse_projections is a single-chip serving "
                    "layout — incompatible with tensor_parallel > 1 / "
                    "tp_overlap (TP sharding rules key on the separate "
                    "q/k/v and gate/up projection names)")
            import dataclasses
            llm_cfg = dataclasses.replace(llm_cfg, fused_projections=True)

        if int(config.setup.get("expert_parallel", 1) or 1) > 1 and not (
                mc.llm.enabled and getattr(llm_cfg, "n_experts", 0) > 1):
            raise ValueError(
                f"setup.expert_parallel > 1 requires a MoE backbone "
                f"(n_experts > 1); {mc.llm.llm!r} is dense — the expert "
                f"mesh axis would silently duplicate work")

        lora = None
        if "lora" in mc and mc.lora.enabled and mc.llm.enabled:
            assert mc.lora.get("layers", "auto") == "auto"
            targets = ("q", "v") if llm_cfg.style == "llama" else ("q",)
            lora = LoraSpec(rank=mc.lora.rank, alpha=mc.lora.alpha,
                            dropout=mc.lora.get("dropout", 0.0),
                            rslora=mc.lora.get("rslora", True),
                            targets=targets)

        covariate_mode = mc.covariate_mode
        known_modes = ("univariate", "independent", "concat", "interleave",
                       "add", "weighted-average", "merge-end")
        if covariate_mode not in known_modes:
            raise ValueError(f"Unknown covariate_mode {covariate_mode!r}; "
                             f"expected one of {known_modes}")
        if covariate_mode == "univariate":
            assert dataset.n_features == 1

        quantize = 8 if mc.llm.get("load_in_8bit", False) else 0
        if mc.llm.get("load_in_4bit", False):
            quantize = 4  # packed int4, two weights per byte
            # models.<m>.llm.quant_type: "int4" (default — symmetric
            # linear absmax feeding the s8xs8 MXU matmul, the fast path)
            # or the bnb codebooks "fp4" (the reference's bnb default,
            # medtsllm.py:162-173) / "nf4" (QLoRA) — 16-entry dequant
            # before a bf16 matmul, bnb-faithful numerics (measured
            # error table in tests/test_quantization.py / BASELINE.md)
            qt = str(mc.llm.get("quant_type", "int4")).lower()
            cb = {"int4": "absmax", "linear": "absmax",
                  "nf4": "nf4", "fp4": "fp4"}.get(qt)
            if cb is None:
                raise ValueError(
                    f"models.llm.quant_type must be int4/nf4/fp4; got {qt!r}")
            if cb != "absmax":
                import dataclasses
                llm_cfg = dataclasses.replace(llm_cfg, quant4_codebook=cb)

        # models.<m>.llm.moe_grouped: Pallas dropless grouped-GEMM expert
        # dispatch (ops/pallas/grouped_matmul) for the serving step —
        # HF-exact routing (zero drops) at routed-token cost instead of
        # the E*C capacity-padded bmm. "auto" (default) = on exactly when
        # the kernel applies: MoE backbone, w8a8 experts (load_in_8bit +
        # int8_matmul), single device (the kernel carries no GSPMD
        # partitioning rules). Train steps and EP meshes always keep the
        # static-capacity bmm path (transformer.MoEMLP gates on
        # deterministic + ep_mesh).
        mg = mc.llm.get("moe_grouped", "auto")
        if getattr(llm_cfg, "n_experts", 0) > 1 and mc.llm.enabled:
            # the grouped kernel's MXU contraction is integer-only:
            # w8a8, or (r5) w4a8 with absmax-packed int4 experts (the
            # kernel contracts the packed nibbles — half the weight DMA)
            int_mxu = (bool(mc.llm.get("int8_matmul", True))
                       and (quantize == 8
                            or (quantize == 4
                                and getattr(llm_cfg, "quant4_codebook",
                                            "absmax") == "absmax")))
            single = jax.device_count() == 1
            on_tpu = jax.default_backend() == "tpu"
            ep_cfg = int(config.setup.get("expert_parallel", 0) or 0) > 1
            if mg == "auto":
                # auto only where the kernel is actually a win: Pallas
                # interpret mode on CPU is orders of magnitude slower
                # than the bmm path. Single-device uses the plain
                # grouped chain; an expert_parallel mesh uses the
                # shard_map EP chain (r5, w8 only) — both serving-only.
                mg = int_mxu and on_tpu and (single or
                                             (ep_cfg and quantize == 8))
            if mg and not int_mxu:
                raise ValueError(
                    "models.llm.moe_grouped requires integer-MXU experts "
                    "(load_in_8bit, or load_in_4bit with the absmax "
                    "codebook, with int8_matmul) — the grouped kernel's "
                    "contraction is s8 x s8 only")
            if mg and ep_cfg and quantize != 8:
                raise ValueError(
                    "models.llm.moe_grouped under expert_parallel is "
                    "w8a8-only (the shard_map EP chain does not carry "
                    "the packed-int4 contraction); use load_in_8bit or "
                    "drop the expert axis for single-chip w4a8 serving")
            if mg and not single and not ep_cfg:
                warnings.warn(
                    "models.llm.moe_grouped forced true with "
                    f"{jax.device_count()} devices and no expert_parallel "
                    "axis — the non-EP grouped kernel has no GSPMD "
                    "partitioning rules; inputs must stay unsharded "
                    "(single-device placement). Use [setup] "
                    "expert_parallel for the sharded dropless path")
            if mg and not on_tpu:
                warnings.warn(
                    "models.llm.moe_grouped forced true on a non-TPU "
                    "backend — the Pallas kernel runs in interpret mode "
                    "(correct but very slow); intended for tests only")
            if mg:
                import dataclasses
                llm_cfg = dataclasses.replace(llm_cfg, moe_grouped=True)
        elif mg not in ("auto", False):
            # explicitly DISABLING on a non-MoE backbone is a no-op, not an
            # error (e.g. `bench.py --moe-grouped off` on a dense model)
            raise ValueError(
                f"models.llm.moe_grouped set but backbone {mc.llm.llm!r} "
                f"is not an enabled MoE (n_experts <= 1 or llm disabled)")

        # pipeline parallelism ([setup] pipeline_parallel): stages the
        # backbone's layer stack over the mesh's "stage" axis
        pipeline = int(config.setup.get("pipeline_parallel", 0) or 0)
        pipeline_mesh = None
        if pipeline > 1 and mc.llm.enabled:
            from ..parallel import mesh_from_config
            pipeline_mesh = mesh_from_config(config)
            assert pipeline_mesh is not None and \
                "stage" in pipeline_mesh.shape, (
                    "setup.pipeline_parallel > 1 requires a mesh with a "
                    "stage axis (enough devices for data*stage*tensor)")

        # [setup] tp_overlap: run the backbone stack sequence-parallel
        # with ring collective matmuls (parallel/sp.py) instead of
        # GSPMD-auto TP — hides the TP collectives inside the MXU matmuls
        sp = bool(config.setup.get("tp_overlap", False))
        sp_mesh = None
        if sp and mc.llm.enabled:
            from ..parallel import mesh_from_config
            sp_mesh = mesh_from_config(config)
            assert sp_mesh is not None and \
                sp_mesh.shape.get("tensor", 1) > 1, (
                    "setup.tp_overlap requires tensor_parallel > 1")

        # [setup] expert_parallel: the MoE dispatch buffers get explicit
        # P("expert", ...) sharding constraints so expert compute stays
        # local (GSPMD combines with one psum over "expert" instead of
        # gathering expert weights)
        ep_mesh = None
        if (int(config.setup.get("expert_parallel", 1) or 1) > 1
                and mc.llm.enabled
                and getattr(llm_cfg, "n_experts", 0) > 1
                and pipeline <= 1):
            from ..parallel import mesh_from_config
            ep_mesh = mesh_from_config(config)
            assert ep_mesh is not None and "expert" in ep_mesh.shape

        return cls(
            task=task,
            seq_len=config.history_len,
            pred_len=config.pred_len,
            n_features=dataset.n_features,
            n_classes=n_classes,
            n_outputs_per_step=n_outputs_per_step,
            d_model=mc.d_model,
            d_ff=mc.d_ff,
            n_heads=mc.n_heads,
            num_tokens=mc.num_tokens,
            patch_len=mc.patching.patch_len,
            stride=mc.patching.stride,
            covariate_mode=covariate_mode,
            embedding_downsample_mode=mc.embedding_downsample_mode,
            dropout=config.training.dropout,
            llm_enabled=mc.llm.enabled,
            llm_cfg=llm_cfg,
            llm_id=mc.llm.llm,
            cache_dir=cache_dir,
            lora=lora,
            seg_mode=(config.tasks.segmentation.mode
                      if task == "segmentation" else None),
            remat=mc.llm.get("remat", False),
            quantize=quantize,
            # act_quant carries the backward mode too: "int8_bwd"
            # (llm.int8_backward, opt-in) quantizes the upstream gradient
            # per row and runs dx on the s8 MXU — same plumbing as the
            # forward act-quant flag (truthiness unchanged). Fail fast on
            # meaningless combinations (the flag would otherwise be a
            # silent no-op and the user would believe it trains int8-bwd)
            act_quant=cls._resolve_act_quant(mc, quantize, llm_cfg),
            prefix_cache=bool(mc.llm.get("prefix_cache", True)),
            pipeline=(pipeline if mc.llm.enabled else 0),
            pipeline_microbatches=int(
                config.setup.get("pipeline_microbatches", 0) or 0),
            pipeline_mesh=pipeline_mesh,
            sp=(sp and mc.llm.enabled),
            sp_mesh=sp_mesh,
            ep_mesh=ep_mesh,
            # the reference loads the LLM at the configured dtype
            # (medtsllm.py:149-157); "mixed" here stores the frozen backbone
            # directly at bf16 — it never updates
            llm_dtype={"bfloat16": "bfloat16", "bf16": "bfloat16",
                       "mixed": "bfloat16", "float16": "float16",
                       "half": "float16", "fp16": "float16",
                       }.get(str(config.setup.get("dtype", "float32")),
                             "float32"),
        )

    # derived sizes (medtsllm.py:52,71-87)
    @property
    def base_n_patches(self) -> int:
        return int((self.seq_len - self.patch_len) / self.stride + 2)

    @property
    def n_patches(self) -> int:
        n = self.base_n_patches
        return n * self.n_features if self.covariate_mode == "interleave" else n

    @property
    def d_llm(self) -> int:
        return self.llm_cfg.d_model

    @property
    def head_steps(self) -> int:
        """Time steps the FlattenHead emits: pred_len, except
        classification's single per-window label row."""
        return 1 if self.task == "classification" else self.pred_len

    @property
    def n_outputs(self) -> int:
        return self.n_outputs_per_step * self.head_steps

    @property
    def vocab_indices(self):
        V = self.llm_cfg.vocab_size
        if V > VOCAB_SUBSAMPLE_LIMIT:
            return np.linspace(0, V - 1, VOCAB_SUBSAMPLE_LIMIT).astype(np.int32)
        return None

    # ------------------------------------------------------------------
    # flax graph
    # ------------------------------------------------------------------

    def setup(self):
        lp = jnp.dtype(self.llm_dtype)
        llm_cls = TransformerDecoder
        extra = {}
        if getattr(self.llm_cfg, "style", "") == "mamba":
            from .llm.mamba import MambaBackbone
            llm_cls = MambaBackbone
        elif getattr(self.llm_cfg, "is_encoder_decoder", False):
            from .llm.transformer import TransformerEncDec
            llm_cls = TransformerEncDec
        else:
            extra = dict(pipeline=self.pipeline,
                         pipeline_microbatches=self.pipeline_microbatches,
                         pipeline_mesh=self.pipeline_mesh,
                         sp=self.sp, sp_mesh=self.sp_mesh,
                         ep_mesh=self.ep_mesh)
        if self.pipeline > 1 and llm_cls is not TransformerDecoder:
            raise NotImplementedError(
                f"pipeline parallelism supports decoder-only backbones; "
                f"{self.llm_id!r} is {llm_cls.__name__}")
        if self.sp and llm_cls is not TransformerDecoder:
            raise NotImplementedError(
                f"sequence-parallel TP supports llama-style decoder-only "
                f"backbones; {self.llm_id!r} is {llm_cls.__name__}")
        self.llm = llm_cls(
            self.llm_cfg, lora=self.lora, remat=self.remat,
            dtype=(None if lp == jnp.float32 else lp), param_dtype=lp,
            quantize=self.quantize, act_quant=self.act_quant, name="llm",
            **extra)
        self.patch_embedding = PatchEmbedding(
            self.d_model, self.patch_len, self.stride, self.dropout,
            pos_embed=False, name="patch_embedding")
        self.mapping_layer = nn.Dense(self.num_tokens, name="mapping_layer")
        self.reprogramming_layer = ReprogrammingLayer(
            self.n_heads, self.d_ff, self.d_llm,
            attention_dropout=self.dropout, name="reprogramming_layer")
        self.output_projection = nn.Dense(self.n_outputs,
                                          name="output_projection")
        if self.embedding_downsample_mode == "linear":
            self.embedding_downsample_layer = nn.Dense(
                self.d_ff, name="embedding_downsample_layer")
        elif self.embedding_downsample_mode == "average":
            assert self.d_llm % self.d_ff == 0
        if self.covariate_mode == "merge-end":
            self.feature_weighting = nn.Dense(
                self.n_outputs_per_step, name="feature_weighting")
        elif self.covariate_mode == "weighted-average":
            self.feature_weighting = nn.Dense(1, name="feature_weighting")
        if not self.llm_enabled:
            self.llm_replacement = nn.Sequential([
                nn.Dense(self.d_llm),
                # torch nn.GELU() default is exact erf (medtsllm.py:106)
                lambda v: nn.gelu(v, approximate=False),
                nn.Dense(self.d_ff), nn.LayerNorm()])

    def _downsample(self, dec_out):
        """d_llm -> d_ff backbone-output reduction (medtsllm.py:352-367);
        raises on unknown modes like the reference does."""
        if self.embedding_downsample_mode == "truncate":
            return dec_out[:, :, :self.d_ff]
        if self.embedding_downsample_mode == "linear":
            return self.embedding_downsample_layer(dec_out)
        if self.embedding_downsample_mode == "average":
            return dec_out.reshape(dec_out.shape[0], self.n_patches,
                                   self.d_ff, -1).mean(axis=-1)
        raise ValueError(f"Unknown embedding downsample mode "
                         f"{self.embedding_downsample_mode}")

    def _word_embeddings(self):
        wte = self.llm.word_embeddings()
        if self.vocab_indices is not None:
            wte = jnp.take(wte, jnp.asarray(self.vocab_indices), axis=0)
        # deliberate divergence: the reference re-wraps the subsampled
        # table in a TRAINABLE nn.Parameter for >100k vocabs
        # (medtsllm.py:219-224) and then drops it from state_dict — the
        # trained values are lost at save. Here the table is always
        # frozen, which matches what a reference checkpoint actually
        # preserves.
        return jax.lax.stop_gradient(wte)

    def encode_ts(self, x_enc, *, deterministic, mask=None):
        """RevIN -> patch embed -> reprogramming (medtsllm.py:263-297).
        Returns (enc [B', P, d_llm], revin stats). With `mask`
        (imputation), normalization statistics cover observed points only
        (the TSLib protocol, ops/revin.masked_window_norm)."""
        B, L, C = x_enc.shape
        if mask is not None:
            xn, means, stdev = masked_window_norm(x_enc, mask)
            stats = {"center": means, "stdev": stdev}
        else:
            xn, stats = revin_norm(x_enc)
        x = jnp.swapaxes(xn, 1, 2)  # [B, C, L]
        enc, _ = self.patch_embedding(x, deterministic=deterministic)
        # enc: [B*C, P, d_model]
        P = enc.shape[1]

        if self.covariate_mode == "concat":
            enc = enc.reshape(B, C, P, self.d_model)
            enc = jnp.transpose(enc, (0, 2, 1, 3)).reshape(B, P, C * self.d_model)

        wte = self._word_embeddings()
        source = self.mapping_layer(wte.T).T  # [num_tokens, d_llm]
        enc = self.reprogramming_layer(enc, source, source,
                                       deterministic=deterministic)

        if self.covariate_mode == "add":
            enc = enc.reshape(B, C, P, self.d_llm).mean(axis=1)
        elif self.covariate_mode == "weighted-average":
            enc = enc.reshape(B, C, P, self.d_llm)
            enc = jnp.transpose(enc, (0, 2, 3, 1))  # [B,P,d_llm,C]
            enc = self.feature_weighting(enc).squeeze(-1)
        elif self.covariate_mode == "interleave":
            enc = enc.reshape(B, C, -1, self.d_llm)
            enc = jnp.transpose(enc, (0, 2, 1, 3)).reshape(B, -1, self.d_llm)
        return enc, stats

    def __call__(self, inputs: dict, training: bool = False):
        det = not training
        x_enc = inputs["x_enc"]
        if x_enc.ndim == 2:
            x_enc = x_enc[..., None]
        B, L, C = x_enc.shape

        mask = inputs.get("mask") if self.task == "imputation" else None
        ts_emb, stats = self.encode_ts(x_enc, deterministic=det, mask=mask)

        # prompt order (medtsllm.py:424-437): [bos+dataset(+example text)]
        # -> example TS embedding -> [clip+stats+task+"Time series:"]
        parts = []
        prefix_kv = inputs.get("prefix_kv")
        prefix_ids = inputs.get("prefix_ids")
        if prefix_ids is not None:
            # the prompt head laid out at positions 0..P-1: 1D = the
            # batch-constant [bos + dataset description]; 2D [B, P] = the
            # per-clip head (constants + clip description, left-padded to
            # the head bucket). Train and uncached eval embed it here;
            # the serving path replaces it with `prefix_kv` from
            # `prefill` — numerically identical
            assert prefix_kv is None
            pe = self.llm.embed(prefix_ids).astype(ts_emb.dtype)
            if prefix_ids.ndim == 1:
                pe = jnp.broadcast_to(pe[None], (B,) + pe.shape)
            parts.append(pe)
        if prefix_kv is not None:
            assert self.supports_prefix_cache, \
                "prefix_kv requires a decoder-only transformer backbone"
        prompt_ids = inputs.get("prompt_ids")
        if prompt_ids is not None:
            parts.append(self.llm.embed(prompt_ids).astype(ts_emb.dtype))
        example_ts = inputs.get("example_ts")
        if example_ts is not None:
            assert self.covariate_mode not in ("independent", "merge-end"), \
                "in-context examples require a batch-preserving covariate mode"
            ex_emb, _ = self.encode_ts(example_ts.astype(x_enc.dtype),
                                       deterministic=det)
            parts.append(ex_emb)
        post_ids = inputs.get("post_prompt_ids")
        if post_ids is not None:
            parts.append(self.llm.embed(post_ids).astype(ts_emb.dtype))
        prompt_emb = (jnp.concatenate(parts, axis=1) if parts
                      else jnp.zeros((B, 0, self.d_llm), dtype=ts_emb.dtype))

        if self.covariate_mode in ("independent", "merge-end"):
            # per-channel rows through the LLM; prompt repeated per channel
            prompt_emb = jnp.repeat(prompt_emb, C, axis=0)
            if prefix_kv is not None:
                # per-clip KV rows ([B, ...]) repeat per channel too;
                # batch-constant rows ([1, ...]) broadcast in attention
                prefix_kv = jax.tree.map(
                    lambda t: (jnp.repeat(t, C, axis=0)
                               if t.shape[0] > 1 else t), prefix_kv)

        if self.llm_enabled and getattr(self.llm_cfg, "is_encoder_decoder", False):
            # enc-dec path (medtsllm.py:346-348): prompt -> encoder,
            # time-series embeddings -> decoder inputs
            assert prompt_emb.shape[1] > 0, \
                "encoder-decoder backbones require prompting enabled"
            dec_out = self.llm(inputs_embeds=prompt_emb,
                               decoder_inputs_embeds=ts_emb,
                               deterministic=det)
            dec_out = self._downsample(dec_out[:, -self.n_patches:, :])
        elif self.llm_enabled:
            enc = jnp.concatenate([prompt_emb, ts_emb], axis=1)
            if prefix_kv is not None:
                dec_out = self.llm(inputs_embeds=enc, prefix_kv=prefix_kv,
                                   deterministic=det)
            else:
                dec_out = self.llm(inputs_embeds=enc, deterministic=det)
            dec_out = self._downsample(dec_out[:, -self.n_patches:, :])
        else:
            # ablation path (medtsllm.py:103-109): a small MLP replaces the
            # LLM + downsample
            enc = jnp.concatenate([prompt_emb, ts_emb], axis=1)
            dec_out = self.llm_replacement(enc)[:, -self.n_patches:, :]

        # FlattenHead (medtsllm.py:541-552) on [B, d_ff, P]
        dec_out = jnp.swapaxes(dec_out, 1, 2)
        dec_out = dec_out.reshape(dec_out.shape[0], -1)
        dec_out = self.output_projection(dec_out)  # [B', n_outputs]

        steps = self.head_steps
        if self.covariate_mode == "independent":
            dec_out = dec_out.reshape(B, C, steps, self.n_outputs_per_step)
            dec_out = dec_out.mean(axis=1)
        elif self.covariate_mode == "merge-end":
            dec_out = dec_out.reshape(B, C, steps, self.n_outputs_per_step)
            dec_out = jnp.transpose(dec_out, (0, 2, 3, 1)).reshape(B, steps, -1)
            dec_out = self.feature_weighting(dec_out)
        else:
            dec_out = dec_out.reshape(B, steps, self.n_outputs_per_step)

        if self.task == "classification":
            return dec_out[:, 0]  # [B, n_classes] logits (trainer softmaxes)
        if self.task in ("forecasting", "reconstruction", "anomaly_detection",
                         "pretraining", "imputation"):
            dec_out = revin_denorm(dec_out, stats)
        else:
            dec_out = dec_out.squeeze(-1) if dec_out.shape[-1] == 1 else dec_out

        # eval-time activations (medtsllm.py:248-261)
        if not training:
            if self.task == "semantic_segmentation":
                dec_out = (nn.softmax(dec_out, axis=-1) if self.n_classes > 2
                           else nn.sigmoid(dec_out))
            elif self.task == "segmentation" and self.seg_mode == "boundary-prediction":
                dec_out = nn.sigmoid(dec_out)
        return dec_out

    # ------------------------------------------------------------------
    # prefix KV cache (serving)
    # ------------------------------------------------------------------

    @property
    def supports_prefix_cache(self) -> bool:
        """Decoder-only transformers cache per-layer causal-attention K/V;
        the mamba backbone caches its O(1) per-layer (conv tail, SSM
        state) instead. The enc-dec path does not qualify: its encoder is
        bidirectional, so every prompt token sees the whole prompt.
        Pipeline parallelism gates it off too: the cached layers live on
        different stages (transformer.py prefill raises). Sequence-parallel
        TP (tp_overlap) composes: the ring schedule covers the suffix
        region's projections and the prefix K/V enter the shard_map
        head-sharded (parallel/sp.py::sp_decoder_stack prefix_kv) — the
        two serving levers stack on multi-chip TP."""
        return (self.llm_enabled and self.prefix_cache
                and self.pipeline <= 1
                and not getattr(self.llm_cfg, "is_encoder_decoder", False)
                and getattr(self.llm_cfg, "style", "") in ("gpt2", "llama",
                                                           "opt", "neox",
                                                           "mamba"))

    @property
    def train_prefix_cache_safe(self) -> bool:
        """The TRAIN step may also serve the prefix from cache when the
        cached values are constants of the optimization: no LoRA (LoRA
        adapts the q/v projections, so prefix K/V would change every
        step) and no backbone dropout (the embedded-prefix path would
        drop out prefix rows during training; the cache is computed
        deterministically). The flagship finetune mode — frozen (often
        int8) backbone + trainable fusion layers below it
        (medtsllm.py:162-173,231-233) — qualifies: gradients w.r.t. every
        trainable param are identical with the prefix as constant K/V
        (tests/test_prefix_cache.py::test_train_step_cached_gradients).
        Mamba qualifies too: selective_ssm_h0 carries a custom_vjp whose
        backward resumes from the recorded chunk boundaries (the first
        boundary IS the cached state), with a zero cotangent for the
        constant h0."""
        return (self.supports_prefix_cache and self.lora is None
                and getattr(self.llm_cfg, "dropout", 0.0) == 0.0)

    def prefill(self, prefix_ids, embed_dtype=jnp.float32):
        """Per-layer (k, v) for a prompt head — computed once per eval run
        (1D constant head, reused for every window) or once per CLIP
        (2D [N, P] per-clip head rows, banked by tasks/base.py), where
        the reference re-runs the full prompt through the 7B backbone
        per batch. ``embed_dtype`` must match what `__call__` would feed
        the LLM (ts_emb's dtype — f32 everywhere except the
        mixed-precision train step, whose caller must also cast the
        params; see tasks/base.py prefill_program) so cached and
        uncached paths are bit-identical."""
        emb = self.llm.embed(prefix_ids).astype(embed_dtype)
        if prefix_ids.ndim == 1:
            emb = emb[None]
        return self.llm.prefill(emb)

    # ------------------------------------------------------------------
    # trainer hooks
    # ------------------------------------------------------------------

    def param_labels(self, params):
        """LLM backbone frozen (lora_a/lora_b train when enabled); all
        fusion-layer params train (medtsllm.py:231-233)."""
        def label(path, _):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if name.startswith("llm/") or name == "llm":
                if "lora_" in name:
                    return "new"
                return "frozen"
            return "new"
        return jax.tree_util.tree_map_with_path(label, params)

    def checkpoint_tree(self, params):
        """Exclude the frozen LLM from checkpoints (medtsllm.py:235-246);
        LoRA adapters are kept (the reference saves them to a separate
        file via save_pretrained)."""
        out = {k: v for k, v in params.items() if k != "llm"}
        if self.lora is not None and "llm" in params:
            lora = _filter_tree(params["llm"], lambda p: "lora_" in p)
            if lora:
                out["llm"] = lora
        return out

    def drop_pretrained_heads(self, saved: dict) -> dict:
        """Pretrain->finetune transfer drops the output head
        (medtsllm.py:515-527; word embeddings are never checkpointed here)."""
        saved = dict(saved)
        saved.pop("output_projection", None)
        saved.pop("word_embeddings", None)
        return saved

    def pretrained_param_loader(self):
        from .llm.loader import find_snapshot, load_backbone

        def load(params):
            if not self.llm_enabled:
                return params
            if find_snapshot(self.llm_id, self.cache_dir) is None:
                # no local weights: the trainer's own init already produced
                # the (warned-about) random backbone — skip a second init
                import warnings
                warnings.warn(
                    f"LLM {self.llm_id!r}: no local weights found — using "
                    f"random init (shapes/throughput faithful; task quality "
                    f"not meaningful)")
                return params
            _, loaded, _ = load_backbone(
                self.llm_id, self.cache_dir, self.llm_cfg.n_layers,
                lora=self.lora, dtype=jnp.dtype(self.llm_dtype),
                quantize=self.quantize, act_quant=self.act_quant,
                pipeline=self.pipeline,
                fuse_projections=getattr(self.llm_cfg,
                                         "fused_projections", False))
            params = dict(params)
            params["llm"] = loaded
            return params
        return load

    @classmethod
    def make_preprocessor(cls, config, dataset, model):
        return PromptBuilder(config, dataset, model)


def _filter_tree(tree: dict, pred) -> dict:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            sub = _filter_tree(v, pred)
            if sub:
                out[k] = sub
        elif pred(str(k)):
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# host-side prompt construction
# ---------------------------------------------------------------------------

def calculate_lags(x: np.ndarray, n_lags: int = 5) -> np.ndarray:
    """Top-k FFT autocorrelation lags (medtsllm.py:530-538), numpy."""
    x = np.transpose(x, (0, 2, 1)) if x.ndim == 3 else x[:, None, :]
    q = np.fft.rfft(x, axis=-1)
    corr = np.fft.irfft(q * np.conj(q), n=x.shape[-1], axis=-1)
    mean_value = corr.mean(axis=1)
    return np.argsort(-mean_value, axis=-1, kind="stable")[:, :n_lags]


def _fmt_float(v):
    if isinstance(v, (list, np.ndarray)):
        return "[" + ", ".join(_fmt_float(x) for x in v) + "]"
    return f"{float(v):.3f}"


def _fmt_trend(v):
    if isinstance(v, (list, np.ndarray)):
        return "[" + ", ".join(_fmt_trend(x) for x in v) + "]"
    return "upward" if v else "downward"


class PromptBuilder:
    """Host-side batch preprocessor: prompt text -> token ids, fixed-bucket
    left padding, input statistics (medtsllm.py:386-495)."""

    N_LAGS = 5

    def __init__(self, config, dataset, model: MedTsLLM):
        self.model = model
        mc = MedTsLLM.model_config(config)
        prompting = mc.get("prompting")
        if prompting is None:
            self.cfg = {"dataset": True, "clip": True, "input_stats": True,
                        "task": True, "examples": False,
                        "input_stats_dim": 0, "input_stats_select": "all",
                        "cache_order": False, "clip_head": True,
                        "clip_cache_slots": 8}
        else:
            self.cfg = {
                "dataset": prompting.get("dataset", True),
                "clip": prompting.get("clip", True),
                "input_stats": prompting.get("input_stats", True),
                "task": prompting.get("task", True),
                "examples": prompting.get("examples", False),
                "input_stats_dim": prompting.get("input_stats_dim", 0),
                "input_stats_select": prompting.get("input_stats_select", "all"),
                # serving option (deviation from the reference prompt
                # ORDER, medtsllm.py:424-437, content identical): put the
                # constant task description before the per-window parts so
                # the KV-cacheable head covers [bos, dataset, task] and the
                # computed region shrinks to [clip, stats, "Time series:"]
                # — the standard constant-parts-first serving layout
                "cache_order": prompting.get("cache_order", False),
                # multi-entry per-clip prefix cache: clip/patient
                # descriptions come from a small FINITE set (reference
                # datasets/ecg.py:75-78, ludb patient x lead), so the
                # clip part joins the cacheable head — per-sample
                # [B, P] prefix ids, served from an LRU KV bank keyed by
                # clip (tasks/base.py::_prefix_kv). Token ORDER is
                # unchanged (clip already precedes stats in the
                # reference layout); only padding moves buckets.
                "clip_head": prompting.get("clip_head", True),
                "clip_cache_slots": int(prompting.get("clip_cache_slots",
                                                      8)),
            }
        self.enabled = model.llm_enabled and any(
            self.cfg[k] for k in ("dataset", "clip", "input_stats", "task",
                                  "examples"))
        if not model.llm_enabled and any(
                self.cfg[k] for k in ("dataset", "clip", "input_stats",
                                      "task", "examples")):
            warnings.warn("llm.enabled=false: prompts are disabled")

        cache_dir = config.get("paths", {}).get("llm_path") or None
        self.tokenizer = get_tokenizer(mc.llm.llm, cache_dir,
                                       vocab_size=model.llm_cfg.vocab_size)
        self.pad_id = self.tokenizer.pad_token_id
        if self.pad_id is None:
            self.pad_id = self.tokenizer.eos_token_id or 0
        self.bos = getattr(self.tokenizer, "bos_token", None)

        self.dataset_description = dataset.description
        self.task_description = self._task_description(config, dataset)
        self.max_bucket = 16  # grows monotonically; few recompiles
        # prefix split (serving): emit the constant [bos + dataset] prompt
        # head as separate unpadded `prefix_ids` so eval can KV-cache it;
        # the variable remainder gets a finer-granularity bucket (the
        # whole point is fewer computed tokens per window)
        self.split_prefix = getattr(model, "supports_prefix_cache", False)
        self.max_bucket_suffix = 16
        self.max_bucket_post = 16
        self._cache: dict[str, list[int]] = {}
        if self.cfg["examples"] and getattr(dataset, "examples", None):
            # fixed example length from the DATASET's pool median — NOT
            # from whichever batch arrives first, so runs are reproducible
            # under shuffling/batch-size changes (the pool holds raw
            # [len, C] arrays; batches carry (text, tensor) pairs)
            med = int(np.median([np.asarray(e).shape[0]
                                 for e in dataset.examples]))
            self.example_len = min(model.seq_len,
                                   max(model.patch_len, med))

    def _task_description(self, config, dataset) -> str:
        override = getattr(dataset, "task_description", None)
        if override:
            return override
        task, seq, pred = config.task, config.history_len, config.pred_len
        if task in ("forecasting", "pretraining"):
            return (f"Forecast the next {pred} steps given the previous "
                    f"{seq} steps of data.")
        if task in ("anomaly_detection", "reconstruction"):
            return (f"Reconstruct the past {seq} steps of data as accurately "
                    f"as possible using the following information.")
        if task == "semantic_segmentation":
            return (f"Classify the past {seq} steps of data as accurately as "
                    f"possible using the following information.")
        if task == "segmentation":
            return (f"Identify the change points in the past {seq} steps of "
                    f"data to segment the sequence.")
        # beyond-reference tasks (the reference prompts stop at its five)
        if task == "classification":
            return (f"Classify the past {seq} steps of data into a single "
                    f"category using the following information.")
        if task == "imputation":
            return (f"Fill in the missing values in the past {seq} steps of "
                    f"data using the following information.")
        raise ValueError(f"Task {task} is not supported.")

    def _encode(self, text: str) -> list[int]:
        if text not in self._cache:
            if len(self._cache) >= 4096:  # evict BEFORE insert: the new
                self._cache.clear()       # entry must survive the clear
            self._cache[text] = list(self.tokenizer(text).input_ids)
        return self._cache[text]

    def _stats_prompts(self, x: np.ndarray) -> list[str]:
        """Input-statistics prompt (medtsllm.py:441-495), numpy on host."""
        if x.ndim == 2:
            x = x[..., None]
        if self.cfg["input_stats_select"] != "all":
            # the reference asserts the same (medtsllm.py:446): "all" is
            # the only value its stats prompt ever supported
            raise ValueError("prompting.input_stats_select only supports "
                             "'all' (reference medtsllm.py:446)")
        dim = self.cfg["input_stats_dim"]
        if dim == "all":
            insert, s = "per feature", "s"
        else:
            insert, s = f"feature {dim}", ""
            x = x[:, :, int(dim)]

        mins = x.min(axis=1)
        maxs = x.max(axis=1)
        # torch.median picks the LOWER middle element for even n (the
        # reference's torch.median(xs, dim=1)); np.median would average
        # the two middle values and change the prompt text
        L_ = x.shape[1]
        medians = np.sort(x.astype(np.float32), axis=1)[:, (L_ - 1) // 2]
        trends = np.diff(x, axis=1).sum(axis=1) > 0
        lags = calculate_lags(x.astype(np.float64), self.N_LAGS)

        prompts = []
        for b in range(x.shape[0]):
            lag_list = [int(v) for v in lags[b]]
            prompts.append(
                f"Input statistics ({insert}): "
                f"min value{s} = {_fmt_float(mins[b])}, "
                f"max value{s} = {_fmt_float(maxs[b])}, "
                f"median value{s} = {_fmt_float(medians[b])}, "
                f"the trend of input is {_fmt_trend(trends[b])}, "
                f"the top {self.N_LAGS} lags are {lag_list}.")
        return prompts

    def build_prompts(self, batch: dict):
        """(pre_parts, post_parts): ordered prompt strings per sample
        before/after the in-context example slot (medtsllm.py:386-439);
        the example tensor itself is handled separately."""
        x = np.asarray(batch["x_enc"])
        bs = x.shape[0]
        if not self.enabled:
            return [[] for _ in range(bs)], [[] for _ in range(bs)]

        dataset_prompt = (f"Dataset: {self.dataset_description}"
                          if self.cfg["dataset"] else "")
        clip_prompts = (list(batch.get("descriptions", [""] * bs))
                        if self.cfg["clip"] else [""] * bs)
        stats_prompts = (self._stats_prompts(x)
                         if self.cfg["input_stats"] else [""] * bs)
        task_prompt = f"Task: {self.task_description}" if self.cfg["task"] else ""
        if "dataset_description" in batch:  # pretraining mixture meta
            per_sample_ds = [f"Dataset: {d}" if self.cfg["dataset"] else ""
                             for d in batch["dataset_description"]]
        else:
            per_sample_ds = [dataset_prompt] * bs

        bos = self.bos if self.bos is not None else ""
        has_examples = self.cfg["examples"] and "examples" in batch
        example_texts = ([e[0] for e in batch["examples"]]
                         if has_examples else [""] * bs)

        # cache_order (serving): the constant task description joins the
        # cacheable head instead of trailing the per-window stats; with
        # in-context examples the head is broken anyway, so keep the
        # reference order there
        task_in_head = (self.cfg["cache_order"] and task_prompt
                        and not has_examples)
        clip_in_head = self.clip_in_head(batch)

        pre_prompts, post_prompts = [], []
        for b in range(bs):
            pre = [bos, per_sample_ds[b]]
            if task_in_head:
                pre.append(task_prompt)
            if clip_in_head:
                # clip joins the (per-clip) cacheable head; the token
                # order is the reference's either way — clip precedes
                # stats (medtsllm.py:424-437)
                pre.append(clip_prompts[b])
            if has_examples:
                pre.append(example_texts[b])
            post = ["" if clip_in_head else clip_prompts[b],
                    stats_prompts[b],
                    "" if task_in_head else task_prompt,
                    "Time series:"]
            pre = [p for p in pre if p != ""]
            post = [p for p in post if p != ""]
            pre = [(p + " " if i != 0 else p) for i, p in enumerate(pre)]
            post = [p + " " for p in post]
            pre_prompts.append(pre)
            post_prompts.append(post)
        return pre_prompts, post_prompts

    def _pad_ids(self, ids: list[list[int]], bucket: int) -> np.ndarray:
        out = np.full((len(ids), bucket), self.pad_id, dtype=np.int32)
        for b, seq in enumerate(ids):
            out[b, bucket - len(seq):] = seq  # LEFT pad (medtsllm.py:304-311)
        return out

    def _bucket_for(self, maxlen: int) -> int:
        while self.max_bucket < maxlen:
            self.max_bucket *= 2
        return self.max_bucket

    def _bucket_suffix(self, maxlen: int) -> int:
        # multiples of 16 (not powers of two): the split suffix is what
        # the backbone actually computes per window, so granularity is
        # throughput; stats-driven length jitter lands in 1-2 buckets
        self.max_bucket_suffix = max(self.max_bucket_suffix,
                                     ((maxlen + 15) // 16) * 16)
        return self.max_bucket_suffix

    def clip_in_head(self, batch: dict) -> bool:
        """Whether the clip description joins the cacheable head (per-clip
        prefix KV bank). Requires the split-prefix serving layout, clip
        prompting with per-window descriptions actually present, no
        in-context examples (they break the head), no per-sample dataset
        prompts (pretraining mixture), and a transformer backbone (the
        mamba state cache stays single-entry for now)."""
        return bool(
            self.split_prefix and self.cfg["clip"] and self.cfg["clip_head"]
            and "descriptions" in batch
            and "dataset_description" not in batch
            and not (self.cfg["examples"] and "examples" in batch)
            and getattr(self.model.llm_cfg, "style", "") != "mamba")

    def _head_part_count(self, batch: dict) -> int:
        """Leading parts of `pre` that form the cacheable head: bos + the
        dataset description (+ the task description under `cache_order`)
        (+ the per-clip description under `clip_head` — the one PER-SAMPLE
        head part, served from the clip KV bank). Never the in-context
        example text, never the pretraining mixture's per-sample dataset
        prompts."""
        if not self.split_prefix or "dataset_description" in batch:
            return 0
        has_examples = self.cfg["examples"] and "examples" in batch
        return (int(bool(self.bos)) + int(bool(self.cfg["dataset"]))
                + int(bool(self.cfg["task"] and self.cfg["cache_order"]
                           and not has_examples))
                + int(self.clip_in_head(batch)))

    def __call__(self, batch: dict) -> dict:
        from ..utils import ARRAY_BATCH_KEYS
        arrays = {k: v for k, v in batch.items()
                  if k in ARRAY_BATCH_KEYS}
        if not self.enabled:
            return arrays
        pre_prompts, post_prompts = self.build_prompts(batch)
        if not pre_prompts or not (pre_prompts[0] or post_prompts[0]):
            return arrays

        has_examples = self.cfg["examples"] and "examples" in batch
        n_head = self._head_part_count(batch)
        per_clip_head = self.clip_in_head(batch)
        head_ids: list[int] = []
        has_head = False
        if n_head:
            # per-part tokenization means splitting at a part boundary
            # preserves the exact token stream of the combined prompt
            if per_clip_head:
                # per-sample head rows [B, P] (constant parts + the clip
                # description), left-padded into a grow-only head bucket;
                # served from the per-clip KV bank at eval
                head_rows = [sum((self._encode(p) for p in parts[:n_head]),
                                 []) for parts in pre_prompts]
                arrays["prefix_ids"] = self._pad_ids(
                    head_rows, self._bucket_head(max(map(len, head_rows))))
                has_head = True
            else:
                head_ids = sum((self._encode(p)
                                for p in pre_prompts[0][:n_head]), [])
                if head_ids:
                    arrays["prefix_ids"] = np.asarray(head_ids,
                                                      dtype=np.int32)
                    has_head = True
            pre_prompts = [parts[n_head:] for parts in pre_prompts]
        pre_ids = [sum((self._encode(p) for p in parts), [])
                   for parts in pre_prompts]
        post_ids = [sum((self._encode(p) for p in parts), [])
                    for parts in post_prompts]

        if has_examples:
            if any(map(len, pre_ids)) or not has_head:
                arrays["prompt_ids"] = self._pad_ids(
                    pre_ids, (self._bucket_suffix if has_head else
                              self._bucket_for)(max(map(len, pre_ids))))
            arrays["example_ts"] = self._example_tensor(batch)
            arrays["post_prompt_ids"] = self._pad_ids(
                post_ids, self._bucket_post(max(map(len, post_ids))))
        else:
            # single remainder, single left pad; without a split head this
            # is exactly the reference layout (medtsllm.py:304-311)
            ids = [a + b for a, b in zip(pre_ids, post_ids)]
            if any(map(len, ids)) or not has_head:
                arrays["prompt_ids"] = self._pad_ids(
                    ids, (self._bucket_suffix if has_head else
                          self._bucket_for)(max(map(len, ids))))
        return arrays

    def _bucket_head(self, maxlen: int) -> int:
        # 16-granular grow-only bucket for per-clip head rows; the head is
        # prefill-computed once per clip (not per window), so granularity
        # costs cache memory, not serving throughput
        self.max_bucket_head = max(getattr(self, "max_bucket_head", 16),
                                   ((maxlen + 15) // 16) * 16)
        return self.max_bucket_head

    def _bucket_post(self, maxlen: int) -> int:
        # 16-granular like _bucket_suffix (the post region — clip/stats/
        # task under the reference order — is backbone-computed per
        # window too, and typically the longer split part; a pow2 bucket
        # would compute up to ~2x the needed suffix tokens)
        self.max_bucket_post = max(self.max_bucket_post,
                                   ((maxlen + 15) // 16) * 16)
        return self.max_bucket_post

    def _example_tensor(self, batch: dict) -> np.ndarray:
        """In-context example segments (reference ecg.py:139-166), crop/tile
        to one static example length fixed at __init__ from the dataset's
        pool median (reproducible under shuffling/batch-size changes)."""
        tensors = [np.asarray(e[1])[0] for e in batch["examples"]]
        if not hasattr(self, "example_len"):
            # dataset exposed no .examples pool at init yet batches carry
            # examples: derive the length from model constants only —
            # NOT from whichever batch arrives first (that would change
            # with the shuffle seed, the non-determinism __init__ fixes)
            self.example_len = min(self.model.seq_len,
                                   max(self.model.patch_len,
                                       self.model.seq_len // 4))
        fixed = self.example_len
        out = np.zeros((len(tensors), fixed, tensors[0].shape[-1]), np.float32)
        for i, t in enumerate(tensors):
            if t.shape[0] >= fixed:
                out[i] = t[:fixed]
            else:
                reps = -(-fixed // t.shape[0])
                out[i] = np.tile(t, (reps, 1))[:fixed]
        return out
