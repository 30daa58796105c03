"""TensorBoard logger (reference loggers/tensorboard_logger.py)."""

from __future__ import annotations

from .base import BaseLogger


class TensorboardLogger(BaseLogger):
    def __init__(self, trainer, config, newrun=True):
        super().__init__(trainer, config, newrun)
        from torch.utils.tensorboard import SummaryWriter
        self.writer = SummaryWriter(log_dir=str(self.logdir / "tensorboard"))
        self.writer.add_hparams(self.summarized_config_flat(), {}, run_name=".")

    def log_end(self):
        self.writer.close()

    def log_scores(self, scores={}, **kwscores):
        self.writer.add_scalar("epoch", self.trainer.epoch, self.trainer.step)
        for key, value in (dict(scores) | kwscores).items():
            self.writer.add_scalar(key, value, self.trainer.step)

    def log_figure(self, fig, name):
        try:
            self.writer.add_figure(name, fig, self.trainer.step)
        except Exception:
            pass

    def update_config(self, cfg):
        super().update_config(cfg)
        from ..config import flatten_dict
        # same list->string sanitization as __init__ (torch's hparams()
        # rejects list values, e.g. data.cols = ["HR", "SpO2"])
        flat = {k: (", ".join(map(str, v)) if isinstance(v, list) else v)
                for k, v in flatten_dict(cfg).items()}
        self.writer.add_hparams(flat, {}, run_name=".")
