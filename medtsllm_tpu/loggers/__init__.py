"""Run-registry loggers (reference loggers/__init__.py:7-18)."""

from __future__ import annotations

from .base import BaseLogger  # noqa: F401
from .print_logger import PrintLogger
from .debug_logger import DebugLogger
from .tensorboard_logger import TensorboardLogger


def get_logger(trainer, config, newrun=True):
    if config.get("DEBUG", False):
        return DebugLogger(trainer, config, newrun)
    match config.setup.logger:
        case "wandb":
            try:
                from .wandb_logger import WandBLogger
                return WandBLogger(trainer, config, newrun)
            except ImportError:
                import warnings
                warnings.warn("wandb not installed; falling back to tensorboard logger")
                return TensorboardLogger(trainer, config, newrun)
        case "tensorboard":
            return TensorboardLogger(trainer, config, newrun)
        case "print" | "none":
            return PrintLogger(trainer, config, newrun)
        case _:
            raise ValueError(f"Unknown logger: {config.setup.logger}")
