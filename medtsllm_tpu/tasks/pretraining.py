"""Pretraining task (reference tasks/pretraining.py): reconstruction over a
mixture of 4 dataset families rewired to task="reconstruction"."""

from __future__ import annotations

from .reconstruction import ReconstructionTask
from ..data import get_dataset
from ..data.util import PretrainingDataset

PRETRAIN_DATASETS = ["ECG", "ventilator", "bidmc", "ludb"]


class PretrainingTask(ReconstructionTask):

    def build_datasets(self):
        splits = {"train": {}, "val": {}, "test": {}}
        for name in PRETRAIN_DATASETS:
            cfg = self.config.copy()
            cfg.data.dataset = name
            cfg.task = "reconstruction"
            for split in splits:
                splits[split][name] = get_dataset(cfg, split)

        pcfg = self.config.tasks.pretraining
        seed = self.config.setup.seed
        kw = dict(downsample_pct=pcfg.downsample_pct,
                  n_features=pcfg.n_features, seed=seed)
        self.train_dataset = PretrainingDataset(splits["train"], **kw)
        self.val_dataset = PretrainingDataset(splits["val"], **kw)
        self.test_dataset = PretrainingDataset(splits["test"], **kw)
