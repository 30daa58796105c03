"""BaseLogger: run directory registry + checkpointing.

Reference loggers/base_logger.py:8-67. The run dir layout is preserved:
outputs/logs/<run_id>/{config.toml, config.json, checkpoints/<name>.ckpt}.
Checkpoints store the flax param pytree (msgpack) + run metadata; the
frozen LLM and word-embedding weights are excluded like the reference
(models/medtsllm.py:235-246) via the model's `checkpoint_filter`.
"""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path

from ..config import dumps_toml, flatten_dict, summarize_config


class BaseLogger:
    def __init__(self, trainer, config, newrun=True):
        self.trainer = trainer
        self.config = config
        self.newrun = newrun

        basepath = config.get("paths", {}).get("logdir")
        basepath = Path(basepath) if basepath else Path.cwd() / "outputs" / "logs"

        self.logdir = basepath / trainer.run_id
        self.logdir.mkdir(parents=True, exist_ok=True)

        if newrun:
            cfg = config.to_dict()
            (self.logdir / "config.toml").write_text(dumps_toml(cfg))
            (self.logdir / "config.json").write_text(json.dumps(cfg, indent="\t"))

    def save_state(self, name: str, async_: bool = True):
        from ..runtime.checkpoint import save_checkpoint
        ckptdir = self.logdir / "checkpoints"
        ckptdir.mkdir(parents=True, exist_ok=True)
        save_checkpoint(
            ckptdir / f"{name}.ckpt",
            params=self.trainer.checkpoint_params(),
            meta={
                "run_id": self.trainer.run_id,
                "epoch": self.trainer.epoch,
                "step": self.trainer.step,
                # so a resumed run doesn't demote `best` to a worse epoch
                "best_score": float(self.trainer.best_score),
                "datetime": datetime.now().isoformat(),
            },
            async_=async_,
        )

    def update_config(self, cfg):
        if not isinstance(cfg, dict):
            cfg = cfg.to_dict()
        path = self.logdir / "config-updates.toml"
        if path.exists():
            import tomllib
            cfg = tomllib.loads(path.read_text()) | cfg
        path.write_text(dumps_toml(cfg))
        (self.logdir / "config-updates.json").write_text(json.dumps(cfg, indent="\t"))

    def log_end(self):
        pass

    def log_scores(self, scores={}, **kwscores):
        pass

    def log_figure(self, fig, name):
        pass

    def summarized_config_flat(self):
        cfg = flatten_dict(summarize_config(self.config).to_dict())
        return {k: (", ".join(map(str, v)) if isinstance(v, list) else v)
                for k, v in cfg.items()}
