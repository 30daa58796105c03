"""Weights & Biases logger (reference loggers/wandb_logger.py:12-56).
Import is gated in loggers/__init__.py; wandb is optional."""

from __future__ import annotations

import wandb

from .base import BaseLogger
from ..config import get_logging_tags, summarize_config


class WandBLogger(BaseLogger):
    def __init__(self, trainer, config, newrun=True):
        super().__init__(trainer, config, newrun)
        mode = "disabled" if config.get("DEBUG", False) else "online"
        self.run = wandb.init(
            project="med-time-llm",
            id=trainer.run_id,
            resume="allow" if not newrun else None,
            config=summarize_config(config).to_dict(),
            tags=get_logging_tags(config),
            mode=mode,
        )

    def log_end(self):
        self.run.finish()

    def log_scores(self, scores={}, **kwscores):
        scores = dict(scores) | kwscores
        scores["epoch"] = self.trainer.epoch
        self.run.log(scores, step=self.trainer.step)

    def log_figure(self, fig, name):
        self.run.log({name: wandb.Image(fig)}, step=self.trainer.step)
