"""BaseTask: the training-loop runtime.

TPU-first redesign of reference tasks/base.py:25-306. The reference's
per-batch Python loop with eager ops becomes:
  - one jit-compiled `train_step` (forward + loss + backward + optimizer)
    with donated params/opt_state — a single XLA graph per run,
  - one jit-compiled `eval_step`,
  - a host-side fixed-shape batch pipeline feeding both,
  - vectorized window stitching for predictions (no per-sample loop).

Lifecycle parity: seed -> datasets -> model -> optimizer/scheduler -> loss ->
logger; SIGUSR1 writes a `latest` checkpoint and exits 0 (base.py:277-281);
`from_run_id` rehydrates a run from its config.toml + checkpoint
(base.py:283-306).
"""

from __future__ import annotations

import signal
import sys
import tomllib
import warnings
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config, validate_config
from ..data import BatchPipeline, get_dataset
from ..data import windowing as W
from ..loggers import get_logger
from ..models import build_model
from ..runtime.checkpoint import load_checkpoint, restore_partial, save_checkpoint  # noqa: F401
from ..runtime.optim import Optimizer
from ..utils import (ARRAY_BATCH_KEYS,  # noqa: F401 (re-export)
                     Precision, count_params, set_seed)
from . import losses as L


class BaseTask:
    task: str = ""

    def __init__(self, run_id, config, newrun=True):
        validate_config(config)
        self.run_id = run_id
        self.config = config
        self.newrun = newrun
        self.task = config.task

        from ..runtime import profiler
        profiler.configure_from(config)
        self.profile_dir = config.get("setup", {}).get("profile_dir")

        self.precision = Precision(config.setup.dtype)
        self.root_rng = set_seed(config.setup.seed)
        self._step_rng = self.root_rng

        self.build_datasets()
        self.build_pipelines()

        self.model = build_model(config, self.train_dataset)
        self.preprocessor = (
            type(self.model).make_preprocessor(config, self.train_dataset,
                                               self.model)
            if hasattr(type(self.model), "make_preprocessor") else None)
        self.params = self.init_params()
        self.load_pretrained()
        self.apply_sharding()

        self.optimizer = self.build_optimizer()
        self.opt_state = self.optimizer.init(self.params)
        self.loss_fn = self.build_loss()

        accum = self.optimizer.accum_steps
        if accum > 1:
            # accumulation windows span epoch boundaries; only the final
            # partial window of the RUN is dropped. A run shorter than
            # one window would silently train nothing — fail fast.
            total = len(self.train_pipeline) * int(config.training.epochs)
            if total < accum:
                raise ValueError(
                    f"grad_accum_steps={accum} exceeds the total micro-batch "
                    f"count {total} ({len(self.train_pipeline)} steps/epoch x "
                    f"{config.training.epochs} epochs): no optimizer step "
                    "would ever fire")
            if total % accum:
                warnings.warn(
                    f"grad_accum_steps={accum}: the final {total % accum} "
                    f"micro-batches of the run accumulate but never apply "
                    "(partial windows are dropped at end of training)")

        self.epoch = 1
        self.step = 0
        self._step_in_flight = False
        self._preempt_requested = False
        self._prefix_kv_cache = {}
        self._prefill_jits = {}

        metric_dir = config.training.eval_metric_direction
        self.best_score = float("inf") if metric_dir == "min" else float("-inf")

        self.logger = get_logger(self, config, newrun)
        try:
            signal.signal(signal.SIGUSR1, self.handle_termination)
        except ValueError:
            pass  # not on the main thread (tests)

        self._compile_steps()

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    def build_datasets(self):
        self.train_dataset = get_dataset(self.config, "train")
        self.val_dataset = get_dataset(self.config, "val")
        self.test_dataset = get_dataset(self.config, "test")

    def build_pipelines(self):
        bs = self.config.training.batch_size
        seed = self.config.setup.seed
        self.train_pipeline = BatchPipeline(self.train_dataset, bs, shuffle=True, seed=seed)
        self.val_pipeline = BatchPipeline(self.val_dataset, bs, shuffle=False)
        self.test_pipeline = BatchPipeline(self.test_dataset, bs, shuffle=False)

    def init_params(self):
        init_rng, self.root_rng = jax.random.split(self.root_rng)
        batch = next(iter(BatchPipeline(self.train_dataset,
                                        self.config.training.batch_size)))
        arrays = self.model_inputs(batch)
        variables = self.model.init(
            {"params": init_rng, "dropout": init_rng}, arrays, training=False)
        params = variables["params"]
        if hasattr(self.model, "pretrained_param_loader"):
            # swap in pretrained backbone weights (HF snapshot or random
            # init); subtree replacement only — no host roundtrip of the
            # full tree
            params = self.model.pretrained_param_loader()(dict(params))

        self.param_label_tree = (self.model.param_labels(params)
                                 if hasattr(self.model, "param_labels")
                                 else jax.tree.map(lambda _: "new", params))
        params = self._apply_param_dtype(params)
        n_total = count_params(params)
        n_frozen = sum(
            int(np.prod(np.shape(p))) for p, l in zip(
                jax.tree.leaves(params), jax.tree.leaves(self.param_label_tree))
            if l == "frozen")
        print(f"Total number of parameters: {n_total:,}")
        print(f"Number of trainable parameters: {n_total - n_frozen:,}")
        return params

    def _apply_param_dtype(self, params):
        """Storage precision policy (SURVEY.md §5.9):
        - bf16/fp16: all float params stored in that dtype (the reference's
          model.to(dtype), tasks/base.py:41);
        - "mixed": fp32 trainable params + bf16 compute, and FROZEN params
          stored directly in bf16 — they never update, storing them at
          compute precision halves backbone memory (the reference keeps
          them fp32 and autocasts every step).
        """
        pd = self.precision.param_dtype

        def cast(p, label):
            if not jnp.issubdtype(p.dtype, jnp.floating):
                return p
            if pd != jnp.float32:
                return p.astype(pd)
            if self.precision.mixed and label == "frozen":
                return p.astype(self.precision.compute_dtype)
            return p

        return jax.tree.map(cast, params, self.param_label_tree)

    def build_optimizer(self):
        labels = self.param_label_tree
        if self.finetuning:
            loaded = set(self.loaded_params)

            def overlay(path, label):
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                if label == "frozen":
                    return label
                return "loaded" if name in loaded else label
            labels = jax.tree_util.tree_map_with_path(
                lambda p, l: overlay(p, l), labels)
        if set(jax.tree.leaves(labels)) == {"new"}:
            labels = None
        # ranger21's internal warmup/warmdown schedule needs the run's total
        # optimizer-step count (reference tasks/base.py:103:
        # len(train_dataloader) * epochs)
        num_iter = (len(self.train_pipeline)
                    * int(self.config.training.epochs))
        return Optimizer(self.config, labels, num_iterations=num_iter)

    def build_loss(self):
        n_classes = getattr(self.train_dataset, "n_classes", 0)
        return L.build_loss(self.config.training.loss, self.task, n_classes)

    def load_pretrained(self):
        """Pretrain->finetune transfer (tasks/base.py:143-155)."""
        if "finetuning" not in self.config or not self.config.finetuning.enabled:
            self.finetuning = False
            self.loaded_params = []
            return
        assert self.config.model in ("timellm", "medtsllm"), \
            "Only MedTsLLM supports finetuning"
        cfg = self.config.finetuning
        self.finetuning = True
        path = (self.logdir_base() / cfg.pretrained_id / "checkpoints"
                / f"{cfg.pretrained_ckpt}.ckpt")
        saved, _meta = load_checkpoint(path)
        saved = self.model.drop_pretrained_heads(saved)
        merged, loaded = restore_partial(
            jax.device_get(self.params), saved)
        self.params = jax.tree.map(jnp.asarray, merged)
        self.loaded_params = loaded

    def apply_sharding(self):
        """Multi-chip layout (SURVEY.md §5.8): params sharded per the
        Megatron-style rules over ("data","tensor"); batches shard over
        "data" in `_device_batch`. `[setup] fsdp = true` additionally
        shards every large param (and, via the optimizer-state mirror,
        the Adam moments) over "data" — the ZeRO-3 layout for full
        pretraining, where replicated optimizer state would dominate HBM.
        Single-device runs skip this."""
        from ..parallel import mesh_from_config, shard_params
        from ..parallel.sharding import FSDP_MIN_SIZE
        self.mesh = mesh_from_config(self.config)
        if self.mesh is None:
            return
        data_size = self.mesh.shape["data"]
        assert self.config.training.batch_size % data_size == 0, (
            f"batch_size {self.config.training.batch_size} must divide over "
            f"data axis {data_size}")
        setup = self.config.get("setup", {})
        self.params = shard_params(
            self.params, self.mesh,
            fsdp=bool(setup.get("fsdp", False)),
            fsdp_min_size=int(setup.get("fsdp_min_size", FSDP_MIN_SIZE)))

    def _device_batch(self, arrays: dict) -> dict:
        if getattr(self, "mesh", None) is None:
            return arrays
        from ..parallel import shard_batch
        return shard_batch(arrays, self.mesh)

    def logdir_base(self) -> Path:
        base = self.config.get("paths", {}).get("logdir")
        return Path(base) if base else Path.cwd() / "outputs" / "logs"

    # ------------------------------------------------------------------
    # compiled step functions
    # ------------------------------------------------------------------

    def model_inputs(self, batch: dict) -> dict:
        """Host-side batch -> jit-traceable dict. Models with text inputs
        install a preprocessor (tokenization stays outside the graph)."""
        if self.preprocessor is not None:
            return self.preprocessor(batch)
        return {k: v for k, v in batch.items() if k in ARRAY_BATCH_KEYS}

    def train_model_inputs(self, batch: dict) -> dict:
        """Train-side inputs: when the prefix cache is constant w.r.t.
        the optimization (frozen backbone, no LoRA, no backbone dropout —
        model.train_prefix_cache_safe), the train step also serves the
        prompt head from cache: same loss, same gradients, ~30% fewer
        computed tokens per step at the flagship shape."""
        arrays = self.model_inputs(batch)
        if ("prefix_ids" in arrays
                and getattr(self.model, "train_prefix_cache_safe", False)
                and np.asarray(arrays["prefix_ids"]).ndim == 1):
            # 1D constant heads only: per-clip (2D) heads stay embedded
            # in-graph for training — shuffled batches hit random clips
            # and would thrash the LRU KV bank (prefilling B heads per
            # step costs more than computing them in the suffix)
            arrays["prefix_kv"] = self._prefix_kv(
                np.asarray(arrays.pop("prefix_ids")), train=True)
        return arrays

    def eval_model_inputs(self, batch: dict) -> dict:
        """Eval-side inputs: the constant prompt head (`prefix_ids`) is
        swapped for its cached per-layer KV, so the compiled eval step
        computes only the variable suffix + TS tokens per window. The
        cache is rebuilt per eval pass (trivial cost) because LoRA /
        finetuned embeddings may have updated the backbone between
        epochs."""
        arrays = self.model_inputs(batch)
        ids = arrays.pop("prefix_ids", None)
        if ids is not None:
            arrays["prefix_kv"] = self._prefix_kv(np.asarray(ids))
        return arrays

    def eval_prepare(self, batch: dict):
        """Host side of eval_dispatch: preprocessing + prompt-head
        resolution (bank fill for clip heads). Returns an opaque
        prepared tuple for eval_dispatch — split out so benches can time
        host prep separately from the device dispatch."""
        arrays = self.model_inputs(batch)
        ids = arrays.pop("prefix_ids", None)
        if ids is not None:
            ids = np.asarray(ids)
            if ids.ndim == 2 and getattr(self, "mesh", None) is None:
                bank_kv, slots = self._clip_bank_lookup(ids, False, False)
                return ("banked", (bank_kv, slots, arrays))
            arrays["prefix_kv"] = self._prefix_kv(ids)
        return ("plain", self._device_batch(arrays))

    def eval_dispatch(self, batch: dict = None, prepared=None):
        """Serve one eval batch with the fewest device dispatches.

        Per-clip 2D heads (single-device) route through the BANKED eval
        step: the LRU bank fill runs host-side, then ONE jit call does
        the row gather in-graph + the forward — vs eval_model_inputs'
        separate gather dispatch and materialized [B, ...] KV buffer
        (each extra dispatch costs ~0.5 ms of tunnel serialization on
        the clip row — BASELINE row 5q's residual). Everything else
        (1D constant heads, no-prompt models, sharded meshes — the bank
        is an unsharded device-resident tree) keeps the eval_step path.
        Numerics identical either way (tested)."""
        if prepared is None:
            prepared = self.eval_prepare(batch)
        kind, payload = prepared
        if kind == "banked":
            bank_kv, slots, arrays = payload
            return self.eval_step_banked(self.params, bank_kv, slots,
                                         arrays)
        return self.eval_step(self.params, payload)

    def prefill_program(self, train: bool = False):
        """The jitted prefill matching the consuming step's numerics
        EXACTLY (MedTsLLM.prefill contract: embed_dtype == ts_emb.dtype):
        batches are f32 and the fusion layers run flax promotion against
        the params, so ts_emb is f32 in every eval step and every
        non-mixed train step — regardless of a bf16 param_dtype. The one
        exception is the mixed-precision TRAIN step, which casts arrays
        AND params to the compute dtype before apply; its prefill embeds
        at the compute dtype over the same cast params (cast inside the
        jit — XLA fuses it into the reads)."""
        mixed_train = train and self.precision.mixed
        key = ("train" if mixed_train else "eval")
        jit = self._prefill_jits.get(key)
        if jit is None:
            model = self.model
            if mixed_train:
                cd = self.precision.compute_dtype
                cast = self._cast_for_compute

                def fn(p, i):
                    return model.apply({"params": cast(p)}, i, cd,
                                       method=type(model).prefill)
            else:
                def fn(p, i):
                    return model.apply({"params": p}, i, jnp.float32,
                                       method=type(model).prefill)
            jit = jax.jit(fn)
            self._prefill_jits[key] = jit
        return jit

    def _prefix_kv(self, ids: np.ndarray, train: bool = False):
        mixed_train = train and self.precision.mixed
        if ids.ndim == 1:
            key = (ids.tobytes(), mixed_train)
            kv = self._prefix_kv_cache.get(key)
            if kv is None:
                kv = self.prefill_program(train)(self.params,
                                                 jnp.asarray(ids))
                self._prefix_kv_cache[key] = kv
            return kv
        return self._clip_prefix_kv(ids, mixed_train, train)

    # -- multi-entry per-clip prefix KV bank (serving) --------------------
    #
    # Clip/patient descriptions come from a small finite set (reference
    # datasets/ecg.py:75-78), so each distinct head row [P] is prefilled
    # ONCE and banked; eval batches gather their rows from the bank. The
    # bank is a fixed-capacity LRU (prompting.clip_cache_slots): eval
    # windows are position-ordered, so a clip's windows arrive
    # consecutively and a handful of slots gets ~every hit; capacity
    # bounds HBM (per-clip KV at 7B is ~1 MB/token). Fixed capacity also
    # means the gather/set programs compile exactly once per head bucket.

    def _clip_cache_slots(self) -> int:
        try:
            mc = type(self.model).model_config(self.config)
            return max(2, int(mc.get("prompting", {})
                              .get("clip_cache_slots", 8)))
        except Exception:
            return 8

    def _clip_prefix_kv(self, ids: np.ndarray, mixed_train: bool,
                        train: bool):
        bank_kv, slots = self._clip_bank_lookup(ids, mixed_train, train)
        return self._bank_gather(bank_kv, slots)

    def _clip_bank_lookup(self, ids: np.ndarray, mixed_train: bool,
                          train: bool):
        """Fill bank misses (prefill + LRU eviction) for a [B, P] batch
        of clip-head rows; returns (bank_kv, slots [B] int32) — callers
        either gather host-side (`_bank_gather`) or feed both straight
        into the BANKED eval step (gather in-graph, one dispatch)."""
        import functools
        key = ("clip_bank", ids.shape[1], mixed_train)
        bank = self._prefix_kv_cache.get(key)
        if bank is None:
            # capacity >= batch width: a batch can pin at most B rows, so
            # cap >= B guarantees the LRU eviction below always has an
            # unpinned candidate (cap < B deadlocked: every slot pinned
            # by the current batch)
            cap = max(self._clip_cache_slots(), ids.shape[0])
            bank = {"slot_of": {}, "row_of": {}, "last_use": {},
                    "kv": None, "tick": 0, "cap": cap}
            self._prefix_kv_cache[key] = bank
        elif bank["cap"] < ids.shape[0]:  # a wider batch arrived later
            grow = ids.shape[0] - bank["cap"]
            if bank["kv"] is not None:
                bank["kv"] = jax.tree.map(
                    lambda t: jnp.concatenate(
                        [t, jnp.zeros((grow,) + t.shape[1:], t.dtype)]),
                    bank["kv"])
            bank["cap"] = ids.shape[0]
        if not hasattr(self, "_bank_gather"):
            self._bank_gather = jax.jit(
                lambda kv, idx: jax.tree.map(
                    lambda t: jnp.take(t, idx, axis=0), kv))
            self._bank_set = jax.jit(
                functools.partial(
                    lambda kv, row, slot: jax.tree.map(
                        lambda t, r: t.at[slot].set(r[0]), kv, row)),
                donate_argnums=0)
        prefill = self.prefill_program(train)

        slots = []
        for b in range(ids.shape[0]):
            rb = ids[b].tobytes()
            slot = bank["slot_of"].get(rb)
            if slot is None:
                row_kv = prefill(self.params, jnp.asarray(ids[b:b + 1]))
                if bank["kv"] is None:
                    cap = bank["cap"]
                    bank["kv"] = jax.tree.map(
                        lambda t: jnp.zeros((cap,) + t.shape[1:], t.dtype),
                        row_kv)
                if len(bank["slot_of"]) < bank["cap"]:
                    slot = len(bank["slot_of"])
                else:  # evict the least-recently-used clip
                    # rows already gathered THIS batch are pinned (a batch
                    # wider than the bank must not evict its own rows)
                    pinned = set(slots)
                    slot = min((s for s in bank["last_use"]
                                if s not in pinned),
                               key=bank["last_use"].__getitem__)
                    bank["slot_of"].pop(bank["row_of"][slot])
                bank["kv"] = self._bank_set(bank["kv"], row_kv, slot)
                bank["slot_of"][rb] = slot
                bank["row_of"][slot] = rb
            bank["tick"] += 1
            bank["last_use"][slot] = bank["tick"]
            slots.append(slot)
        return bank["kv"], jnp.asarray(slots, jnp.int32)

    def checkpoint_params(self):
        """Param tree to persist; models can exclude frozen backbones
        (reference medtsllm.py:235-246)."""
        params = jax.device_get(self.params)
        if hasattr(self.model, "checkpoint_tree"):
            return self.model.checkpoint_tree(params)
        return params

    def _cast_for_compute(self, tree):
        cd = self.precision.compute_dtype
        return jax.tree.map(
            lambda x: x.astype(cd) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree)

    def _compile_steps(self):
        model = self.model
        loss_fn = self.loss_fn
        mixed = self.precision.mixed
        labels = self.param_label_tree
        # Pin updated params to the layout apply_sharding chose. Without
        # the constraint GSPMD is free to re-layout step outputs; with it
        # the FSDP case lowers to the canonical ZeRO-3 schedule (per-layer
        # all-gather on use, reduce-scatter on the gradient) and TP/EP
        # layouts survive the step verbatim.
        param_shardings = (
            None if getattr(self, "mesh", None) is None
            else jax.tree.map(lambda x: x.sharding, self.params))

        # MoE pretraining: add the sown Switch/Mixtral load-balancing
        # loss (models/llm/transformer.py::router_aux_loss, HF
        # load_balancing_loss_func semantics) — without it experts
        # collapse when the router TRAINS. Off by default; pointless for
        # the frozen-backbone finetune mode (router grads are pruned).
        aux_coef = float(
            self.config.training.get("router_aux_coef", 0) or 0)

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, arrays, valid, rng):
            def compute_loss(p):
                # stop_gradient on frozen leaves lets XLA prune their whole
                # backward paths (the reference sets requires_grad=False)
                p = jax.tree.map(
                    lambda x, l: jax.lax.stop_gradient(x) if l == "frozen" else x,
                    p, labels)
                if mixed:
                    p = self._cast_for_compute(p)
                    arr = self._cast_for_compute(arrays)
                else:
                    arr = arrays
                if aux_coef:
                    pred, state = model.apply(
                        {"params": p}, arr, training=True,
                        rngs={"dropout": rng}, mutable=["intermediates"])
                else:
                    pred = model.apply({"params": p}, arr, training=True,
                                       rngs={"dropout": rng})
                pred = pred.astype(jnp.float32)
                loss = loss_fn(pred, arrays, valid)
                if aux_coef:
                    aux = [jnp.mean(leaf) for path, leaf
                           in jax.tree_util.tree_flatten_with_path(state)[0]
                           if "router_aux_loss" in jax.tree_util.keystr(path)]
                    if not aux:
                        raise ValueError(
                            "training.router_aux_coef set but the model "
                            "sowed no router_aux_loss — not a MoE backbone")
                    loss = loss + aux_coef * jnp.mean(jnp.stack(aux))
                return loss

            # allow_int: int8-quantized backbone params are frozen and get
            # float0 grads, which apply_updates leaves untouched
            loss, grads = jax.value_and_grad(compute_loss, allow_int=True)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = jax.tree.map(
                lambda p, u: (p if not jnp.issubdtype(p.dtype, jnp.floating)
                              else optax.apply_updates(p, u)),
                params, updates)
            if param_shardings is not None:
                params = jax.lax.with_sharding_constraint(
                    params, param_shardings)
            return params, opt_state, loss

        @jax.jit
        def eval_step(params, arrays):
            # eval runs in param precision: the reference applies autocast
            # only inside train loops (tasks/forecasting.py:22)
            return model.apply({"params": params}, arrays, training=False)

        @jax.jit
        def eval_step_banked(params, bank_kv, slots, arrays):
            # per-clip serving: the LRU bank's row gather happens
            # IN-GRAPH (XLA fuses the [B]-row take into the attention
            # reads) — one dispatch per batch instead of gather + eval,
            # and the gathered [B, ...] KV buffer never materializes in
            # HBM. Numerics identical to eval_step(prefix_kv=gather(...))
            kv = jax.tree.map(lambda t: jnp.take(t, slots, axis=0),
                              bank_kv)
            return model.apply({"params": params},
                               dict(arrays, prefix_kv=kv), training=False)

        self.train_step = train_step
        self.eval_step = eval_step
        self.eval_step_banked = eval_step_banked

    def _next_rng(self):
        self._step_rng, out = jax.random.split(self._step_rng)
        return out

    # ------------------------------------------------------------------
    # shared train loop (identical across reference tasks up to the loss)
    # ------------------------------------------------------------------

    def train(self):
        from ..runtime import profiler
        step_in_run = 0
        # resume-aware: from_run_id restores self.epoch = completed + 1,
        # so a preempted run continues instead of restarting from 0
        for epoch in range(self.epoch - 1, self.config.training.epochs):
            print(f"Epoch {epoch + 1}/{self.config.training.epochs}")
            self.opt_state = self.optimizer.set_epoch(self.opt_state, epoch)
            pending_loss = None
            pending_n = 0
            from ..data.pipeline import prefetch
            for batch in prefetch(iter(self.train_pipeline)):
                arrays = self._device_batch(self.train_model_inputs(batch))
                valid = jnp.asarray(batch["valid"])
                # profile step 2 (the first post-compile step) when
                # configured — one representative steady-state step
                with profiler.trace(self.profile_dir if step_in_run == 2 else None):
                    # donation window: SIGUSR1 arriving while the inputs
                    # are donated must defer the checkpoint to the safe
                    # point below (handle_termination)
                    self._step_in_flight = True
                    self.params, self.opt_state, loss = self.train_step(
                        self.params, self.opt_state, arrays, valid,
                        self._next_rng())
                    self._step_in_flight = False
                    if self._preempt_requested:
                        self._save_and_exit()
                    if step_in_run == 2 and self.profile_dir:
                        jax.block_until_ready(loss)
                # sync the PREVIOUS step's loss: host logging overlaps the
                # current step's device execution (the reference syncs every
                # step via loss.item(), forecasting.py:30)
                if pending_loss is not None:
                    self.log_step(float(pending_loss), pending_n)
                pending_loss = loss
                pending_n = int(batch["valid"].sum())
                step_in_run += 1
            if pending_loss is not None:
                self.log_step(float(pending_loss), pending_n)
            val_scores = self.val()
            self.log_epoch(val_scores)

    # ------------------------------------------------------------------
    # shared eval machinery
    # ------------------------------------------------------------------

    def run_eval(self, pipeline, extra_keys=()):
        """Run the compiled eval step over a pipeline; returns dict with
        stacked per-window arrays: pred [n, ...] + requested batch keys."""
        preds, extras = [], {k: [] for k in extra_keys}
        pending = None  # one-deep pipeline: host readback overlaps compute
        self._prefix_kv_cache.clear()  # params may have changed since

        def drain(item):
            out_dev, valid = item
            out = np.asarray(jax.device_get(out_dev))
            preds.append(out[valid])

        from ..data.pipeline import prefetch
        for batch in prefetch(iter(pipeline)):
            out_dev = self.eval_dispatch(batch)
            v = batch["valid"]
            for k in extra_keys:
                extras[k].append(np.asarray(batch[k])[v])
            if pending is not None:
                drain(pending)
            pending = (out_dev, v)
        if pending is not None:
            drain(pending)
        result = {"pred": np.concatenate(preds)}
        for k in extra_keys:
            result[k] = np.concatenate(extras[k])
        return result

    def eval_n_points(self, dataset, include_history: bool) -> int:
        """Full-series buffer length (tasks/forecasting.py:59,
        anomaly_detection.py:92)."""
        if dataset.clip_dataset:
            return dataset.n_points
        n_windows = len(dataset)
        if dataset.univariate:
            # len(dataset) counts window x feature pairs; the time axis only
            # spans the underlying windows. (The reference formula ignores
            # this and would overallocate, forecasting.py:59 — univariate
            # eval is unused in its configs.)
            n_windows //= dataset.real_features
        n = self.config.pred_len + (n_windows - 1) * dataset.step_size
        if include_history:
            n += self.config.history_len
        return n

    def finalize_series(self, dataset, *series):
        """Apply the clip mask or step>pred de-dup (tasks/forecasting.py:83-90)
        and assert completeness."""
        step, pred = dataset.step_size, self.config.pred_len
        out = []
        for arr in series:
            if dataset.clip_dataset:
                arr = arr[dataset.mask]
            elif step > pred:
                arr = W.dedup_eval_series(arr, step, pred)
            out.append(arr)
        for arr in out:
            if np.issubdtype(arr.dtype, np.floating):
                assert not np.isnan(arr).any(), "unfilled points after stitching"
        return out if len(out) > 1 else out[0]

    # ------------------------------------------------------------------
    # abstract per-task pieces
    # ------------------------------------------------------------------

    def val(self):
        raise NotImplementedError

    def test(self):
        raise NotImplementedError

    def predict(self, pipeline):
        raise NotImplementedError

    def score(self, pred, target):
        raise NotImplementedError

    # ------------------------------------------------------------------
    # logging / checkpointing / lifecycle (reference base.py:213-306)
    # ------------------------------------------------------------------

    def log_end(self):
        from ..runtime.checkpoint import wait_for_saves
        wait_for_saves()  # async checkpoint writes must be durable
        self.logger.log_end()

    def log_step(self, loss, n_valid: int | None = None):
        # count real samples: the padded final batch carries B rows but
        # only n_valid of them are data
        self.step += (self.config.training.batch_size
                      if n_valid is None else n_valid)
        self.logger.log_scores({"train/loss": loss})

    def log_epoch(self, scores=None, **kwscores):
        lrs = self.optimizer.get_last_lr()
        lr_scores = {"train/lr": lrs[0]}
        if len(lrs) > 1:
            lr_scores["train/finetune_lr"] = lrs[1]

        scores = dict(scores or {}) | kwscores | lr_scores
        self.logger.log_scores(scores)

        # epoch/best_score update BEFORE the saves so the checkpoint meta
        # is the correct resume point: a `latest` written at the end of
        # epoch N resumes at N + 1 with this epoch's best already counted
        self.epoch += 1
        metric = "val/" + self.config.training.eval_metric
        metric_dir = self.config.training.eval_metric_direction
        improved = ((metric_dir == "min" and scores[metric] < self.best_score)
                    or (metric_dir == "max" and scores[metric] > self.best_score))
        if improved:
            self.best_score = scores[metric]

        self.logger.save_state("latest")
        if improved and self.config.training.get("save_best", True):
            self.logger.save_state("best")

    def log_scores(self, scores=None, **kwscores):
        self.logger.log_scores(dict(scores or {}) | kwscores)

    def handle_termination(self, signum, frame):
        print("Interrupted!")
        if getattr(self, "_step_in_flight", False):
            # self.params currently points at donated (deleted) buffers —
            # defer the save to the train loop's safe point
            self._preempt_requested = True
            return
        self._save_and_exit()

    def _save_and_exit(self):
        self.logger.save_state("latest", async_=False)  # durable before exit
        self.log_end()
        sys.exit(0)

    @classmethod
    def from_run_id(cls, run_id, cfg=None, ckpt="latest", basepath=None):
        ckpt = ckpt or "latest"
        basepath = (Path(basepath) / run_id if basepath is not None
                    else Path.cwd() / "outputs" / "logs" / run_id)
        config = Config(tomllib.loads((basepath / "config.toml").read_text()))
        if cfg is not None:
            # deep merge: a {'training': {'epochs': 20}} override tweaks
            # one field instead of replacing the whole [training] table
            config = config.merge(cfg)

        trainer = cls(run_id, config, newrun=False)

        saved, meta = load_checkpoint(basepath / "checkpoints" / f"{ckpt}.ckpt")
        merged, _ = restore_partial(jax.device_get(trainer.params), saved)
        trainer.params = jax.tree.map(jnp.asarray, merged)
        # re-apply the mesh placement the restore just replaced with
        # default-device host arrays, and rebuild optimizer state from
        # the restored (and re-sharded) params
        trainer.apply_sharding()
        trainer.opt_state = trainer.optimizer.init(trainer.params)
        trainer.epoch = meta["epoch"]
        trainer.step = meta["step"]
        if "best_score" in meta:
            trainer.best_score = meta["best_score"]
        return trainer
