"""Debug logger: prints but never writes checkpoints or run files
(reference loggers/debug_logger.py)."""

from __future__ import annotations

import json

from .base import BaseLogger
from ..config import summarize_config


class DebugLogger(BaseLogger):
    def __init__(self, trainer, config, newrun=True):
        # intentionally skip BaseLogger.__init__: no run dir writes
        self.trainer = trainer
        self.config = config
        print("Run ID:", trainer.run_id)
        print("Config:")
        print(json.dumps(summarize_config(config).to_dict(), indent="\t"))

    def log_end(self):
        print("Done!")

    def log_scores(self, scores={}, **kwscores):
        scores = dict(scores) | kwscores
        if len(scores) == 1 and "train/loss" in scores:
            return
        print(f"Epoch: {self.trainer.epoch}, step: {self.trainer.step}, scores: {scores}")

    def save_state(self, name, async_=True):
        pass

    def update_config(self, cfg):
        print("Config updated:", cfg)
