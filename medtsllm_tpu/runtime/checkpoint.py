"""Checkpoint save/restore.

Reference semantics (loggers/base_logger.py:29-43, tasks/base.py:283-306):
`latest` written every epoch, `best` on metric improvement; checkpoints hold
{run_id, epoch, step, datetime, model params}; frozen LLM weights excluded
so checkpoints stay small and the LLM is re-materialized at resume.

Format: flax msgpack serialization of the param pytree + a JSON meta header
in a single file. Writes are atomic (tmp + rename) so SIGUSR1 preemption
(tasks/base.py:277-281) can't corrupt the latest checkpoint.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from pathlib import Path

import jax
import numpy as np
from flax import serialization

# all async writes run on ONE ordered worker thread: concurrent threads
# per save could os.replace() out of order, leaving an OLDER epoch as
# `latest`/`best` — a single FIFO queue makes completion order == submit
# order. Sync saves drain the queue first for the same reason.
_save_queue: queue.Queue = queue.Queue()
_save_errors: list[BaseException] = []
_worker_lock = threading.Lock()
_worker: threading.Thread | None = None


def _write(path: Path, params_host, meta: dict):
    blob = serialization.to_bytes(params_host)
    header = json.dumps(meta).encode()
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        f.write(blob)
    os.replace(tmp, path)


def _drain():
    while True:
        item = _save_queue.get()
        try:
            if item is None:
                return
            _write(*item)
        except BaseException as e:  # surfaced by wait_for_saves
            _save_errors.append(e)
        finally:
            _save_queue.task_done()


def _ensure_worker():
    global _worker
    with _worker_lock:
        if _worker is None or not _worker.is_alive():
            _worker = threading.Thread(target=_drain, daemon=True)
            _worker.start()


def save_checkpoint(path, params, meta: dict, async_: bool = False):
    """Atomic checkpoint write. With async_=True the device->host transfer
    happens now but serialization+IO run on the ordered background worker
    (Orbax-style async save, SURVEY.md §5.3) so training continues
    immediately; writes to the same path land in submit order."""
    path = Path(path)
    params_host = jax.device_get(params)
    if not async_:
        # a pending async save of the same path must not clobber this
        # sync write afterwards (e.g. the SIGUSR1 preemption save) —
        # drain for ORDERING only. A stale async error must not abort
        # the one save that has to succeed (the preemption handoff);
        # it will still surface at the next wait_for_saves().
        if _worker is not None and _worker.is_alive():
            _save_queue.join()
        _write(path, params_host, meta)
        return
    _ensure_worker()
    _save_queue.put((path, params_host, meta))


def wait_for_saves():
    """Block until all async checkpoint writes are durable (called before
    process exit / preemption handoff). Raises on any write error — a run
    must not report a clean finish with no checkpoint on disk. The error
    list is cleared: errors belong to the run that waited, not to the
    next trainer constructed in the same process."""
    if _worker is not None and _worker.is_alive():
        _save_queue.join()
    if _save_errors:
        errors, _save_errors[:] = list(_save_errors), []
        raise RuntimeError(
            f"{len(errors)} async checkpoint write(s) failed: "
            + "; ".join(repr(e) for e in errors)) from errors[0]


def load_checkpoint(path, params_template=None):
    """Returns (params, meta). If `params_template` is given, the stored
    tree is restored onto it (strict shape/dtype checking by flax);
    otherwise a raw nested-dict of numpy arrays is returned."""
    path = Path(path)
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(n).decode())
        blob = f.read()
    if params_template is not None:
        params = serialization.from_bytes(params_template, blob)
    else:
        params = serialization.msgpack_restore(blob)
    return params, meta


def restore_partial(template: dict, saved: dict, skip_prefixes=()):
    """Non-strict restore (reference load_state_dict(strict=False) +
    unexpected-key assert, tasks/base.py:300-301): every saved leaf must
    exist in the template (no unexpected keys); missing template leaves keep
    their current values. `skip_prefixes` match whole path segments
    ("llm" skips "llm/..." but not "llm_adapter/...").
    Returns (merged, loaded_paths)."""
    loaded = []

    def _skipped(path):
        return any(path == p or path.startswith(p + "/")
                   for p in skip_prefixes)

    def walk(tmpl, sv, prefix):
        out = dict(tmpl)
        for k, v in sv.items():
            path = f"{prefix}/{k}" if prefix else str(k)
            if _skipped(path):
                continue
            if k not in tmpl:
                raise KeyError(f"Unexpected key in checkpoint: {path}")
            if isinstance(v, dict):
                out[k] = walk(tmpl[k], v, path)
            else:
                arr = np.asarray(v)
                if tuple(arr.shape) != tuple(np.shape(tmpl[k])):
                    raise ValueError(
                        f"Shape mismatch for {path}: "
                        f"{arr.shape} vs {np.shape(tmpl[k])}")
                out[k] = arr.astype(tmpl[k].dtype) if hasattr(tmpl[k], "dtype") else arr
                loaded.append(path)
        return out

    return walk(template, saved, ""), loaded
