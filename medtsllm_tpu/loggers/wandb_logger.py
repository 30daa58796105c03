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
            name=trainer.run_id,
            id=trainer.run_id,
            dir=str(self.logdir),
            resume="allow",
            job_type="training",
            config=summarize_config(config).to_dict(),
            tags=get_logging_tags(config),
            mode=mode,
        )
        self.log_code()

    def log_code(self):
        """Code snapshot upload (reference wandb_logger.py:39-56)."""
        from pathlib import Path
        basepath = Path(__file__).parent.parent.parent
        excluded = [basepath / d for d in
                    (".wandb", "wandb", ".venv", "tmp", "outputs", ".git")]

        def exclude_fn(path, root):
            p = Path(root) / path
            return any(e in p.parents for e in excluded)

        try:
            self.run.log_code(str(basepath), exclude_fn=exclude_fn)
        except Exception:
            pass

    def log_end(self):
        self.run.finish()

    def log_scores(self, scores={}, **kwscores):
        self.run.log({"epoch": self.trainer.epoch,
                      "step": self.trainer.step} | dict(scores) | kwscores)

    def log_figure(self, fig, name):
        self.run.log({name: wandb.Image(fig)})

    def update_config(self, cfg):
        super().update_config(cfg)
        self.run.config.update(cfg if isinstance(cfg, dict) else cfg.to_dict())
