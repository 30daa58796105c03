"""AOT serving export: the compiled eval step as a deployable artifact.

The reference has no deployment story — its models exist only inside the
torch process that built them (train.py:8-30 / test.py:8-37 re-run the
full Python stack). On TPU the natural serving artifact is the exported
XLA program: `jax.export` serializes the jitted eval step (and, when the
model serves the prompt-prefix KV cache, the prefill program) as
version-stable StableHLO that executes WITHOUT the model code — load it
with `load_serving` (or any StableHLO runtime) next to the checkpointed
params and serve.

Artifact layout (one directory):
    eval_step.jaxexport   exported eval step: call(params, arrays) -> preds
    prefill.jaxexport     (when prefix-cached) call(params, prefix_ids)
                          -> per-layer KV to pass as arrays["prefix_kv"]
    manifest.json         shapes, dtypes, platforms, calling convention
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _specs(tree):
    def spec(x):
        sharding = getattr(x, "sharding", None)
        # uncommitted host arrays (numpy) carry no sharding; committed
        # device arrays (sharded params, prefix KV) keep theirs so the
        # exported program records the mesh layout
        if sharding is not None and not isinstance(
                sharding, jax.sharding.Sharding):
            sharding = None
        return jax.ShapeDtypeStruct(jnp.shape(x), _canonical_dtype(x),
                                    sharding=sharding)
    return jax.tree.map(spec, tree)


def _canonical_dtype(x):
    # the dtype jnp.asarray(x) WOULD produce (f64 host arrays
    # canonicalize to f32) without moving any data: no device_put of
    # host batches over the tunnel, no device->host readback of params
    if isinstance(x, jax.Array):
        return x.dtype  # already canonical
    dt = getattr(x, "dtype", None)
    if dt is None:
        dt = np.asarray(x).dtype  # python scalars/lists only
    return jax.dtypes.canonicalize_dtype(dt)


def _spec_manifest(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp):
            [list(np.shape(leaf)), str(_canonical_dtype(leaf))]
        for kp, leaf in flat
    }


def export_serving(trainer, out_dir, batch=None) -> dict:
    """Export `trainer`'s serving programs to `out_dir`. Returns the
    manifest. Uses one real batch to fix the compiled shapes (the
    pipeline emits fixed-shape batches, so one graph serves all batches
    of the run's batch_size)."""
    from jax import export as jexport

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    if batch is None:
        batch = next(iter(trainer.val_pipeline))
    # sharded trainers: place the batch the way the live eval step sees
    # it, so the exported program records the mesh layout (params carry
    # their NamedShardings already); the artifact then requires the same
    # number of devices at load (manifest "nr_devices")
    arrays = trainer._device_batch(trainer.eval_model_inputs(batch))

    # Pallas kernels (flash attention from 512 aligned tokens, the mamba
    # selective scan always) lower to `tpu_custom_call`, which is not on
    # jax.export's cross-version-stable allowlist — allow it explicitly.
    # The artifact then pins the exporting jax/libtpu version for those
    # kernels (recorded in the manifest); programs without Pallas calls
    # keep full version stability.
    checks = [jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")]
    exp = jexport.export(trainer.eval_step, disabled_checks=checks)(
        _specs(trainer.params), _specs(arrays))
    (out / "eval_step.jaxexport").write_bytes(exp.serialize())

    mesh = getattr(trainer, "mesh", None)
    manifest = {
        "model": trainer.config.model,
        "task": trainer.config.task,
        "platforms": list(exp.platforms),
        "nr_devices": int(exp.nr_devices),
        "mesh": dict(mesh.shape) if mesh is not None else None,
        "jax_version": jax.__version__,
        "version_note": "tpu_custom_call (Pallas kernels) allowed: if the "
                        "program contains any, it pins the exporting "
                        "jax/libtpu version",
        "batch_size": int(trainer.config.training.batch_size),
        "calling_convention": "eval_step.call(params, arrays) -> preds",
        "arrays": _spec_manifest(arrays),
        "prefix_cached": "prefix_kv" in arrays,
    }

    if "prefix_kv" in arrays:
        # the artifact takes the per-layer KV as an input, so the
        # deployment rebuilds it once per weight load via the exported
        # prefill program (trainer._prefix_kv created the jit above).
        # Two prompt-head layouts (tasks/base.py::_prefix_kv):
        #   1D [P]    — constant head, prefilled once per weight load;
        #   2D [B, P] — PER-CLIP head rows (clip prompting): export the
        #               prefill at ROW shape [1, P] — deployments prefill
        #               each distinct clip row once, bank the results
        #               (the host-side LRU in tasks/base.py:339-419), and
        #               stack the batch's rows along axis 0 to form
        #               arrays["prefix_kv"].
        ids = np.asarray(trainer.model_inputs(batch)["prefix_ids"])
        per_clip = ids.ndim == 2
        pids_shape = (1, ids.shape[1]) if per_clip else ids.shape
        pexp = jexport.export(trainer.prefill_program(train=False),
                              disabled_checks=checks)(
            _specs(trainer.params),
            jax.ShapeDtypeStruct(pids_shape, jnp.asarray(ids).dtype))
        (out / "prefill.jaxexport").write_bytes(pexp.serialize())
        manifest["prefill"] = {
            "calling_convention": (
                "prefill.call(params, prefix_ids[1, P]) -> one clip row; "
                "bank rows per distinct clip (LRU), stack the batch's "
                "rows on axis 0 -> arrays['prefix_kv']" if per_clip else
                "prefill.call(params, prefix_ids) -> arrays['prefix_kv']"),
            "prefix_ids_shape": list(pids_shape),
            "per_clip": per_clip,
        }

    (out / "manifest.json").write_text(json.dumps(manifest, indent=1))
    return manifest


def load_serving(out_dir) -> dict:
    """Load an exported serving directory -> dict with `eval_step`
    (callable), optional `prefill` (callable) and the `manifest`."""
    from jax import export as jexport

    out = Path(out_dir)
    loaded = {
        "manifest": json.loads((out / "manifest.json").read_text()),
        "eval_step": jexport.deserialize(
            (out / "eval_step.jaxexport").read_bytes()).call,
    }
    pf = out / "prefill.jaxexport"
    if pf.exists():
        loaded["prefill"] = jexport.deserialize(pf.read_bytes()).call
    return loaded


def verify_roundtrip(trainer, out_dir, batch=None) -> float:
    """Serve one batch through the deserialized artifact and through the
    live trainer; returns the max abs difference (must be 0 — same XLA
    program)."""
    if batch is None:
        batch = next(iter(trainer.val_pipeline))
    loaded = load_serving(out_dir)
    arrays = trainer._device_batch(trainer.eval_model_inputs(batch))
    if "prefill" in loaded:
        ids = np.asarray(trainer.model_inputs(batch)["prefix_ids"])
        arrays = dict(arrays)
        if loaded["manifest"].get("prefill", {}).get("per_clip"):
            # per-clip convention: prefill each DISTINCT row once through
            # the exported program, then stack the batch's rows (what the
            # host-side LRU bank does in the live trainer)
            row_kv = {}
            for b in range(ids.shape[0]):
                key = ids[b].tobytes()
                if key not in row_kv:
                    row_kv[key] = loaded["prefill"](
                        trainer.params, jnp.asarray(ids[b:b + 1]))
            rows = [row_kv[ids[b].tobytes()] for b in range(ids.shape[0])]
            arrays["prefix_kv"] = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *rows)
        else:
            arrays["prefix_kv"] = loaded["prefill"](trainer.params,
                                                    jnp.asarray(ids))
    got = loaded["eval_step"](trainer.params, arrays)
    want = trainer.eval_step(trainer.params, arrays)
    return float(jnp.max(jnp.abs(jnp.asarray(got) - jnp.asarray(want))))
