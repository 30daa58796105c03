"""Tracing / profiling (SURVEY.md §5.1 — absent in the reference).

Two facilities, both config-gated under [setup]:
  - `profile_dir`: capture a jax.profiler trace of the first training
    steps (viewable in TensorBoard / Perfetto),
  - `debug_nans`: enable jax NaN checking (SURVEY.md §5.2).

Plus a lightweight step timer for throughput lines.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def configure_from(config) -> None:
    setup = config.get("setup", {})
    if setup.get("debug_nans", False):
        jax.config.update("jax_debug_nans", True)


@contextlib.contextmanager
def trace(profile_dir: str | None):
    """jax.profiler trace capture around a code region (no-op if None)."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with device sync; reports windows/sec."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None):
        if sync_on is not None:
            # host readback, not block_until_ready: on the tunneled axon
            # backend block_until_ready can return before execution right
            # after compile (bench.py syncs the same way)
            np.asarray(jax.tree.leaves(sync_on)[0]).ravel()[:1]
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.times:
            return {}
        t = np.asarray(self.times[1:] or self.times)  # drop compile step
        return {
            "steps": len(t),  # the stat basis (compile step excluded)
            "p50_step_s": float(np.percentile(t, 50)),
            "windows_per_sec": float(self.batch_size / np.percentile(t, 50)),
        }
