"""ETT (Electricity Transformer Temperature) family.

Reference: datasets/ett.py — one CSV per variant (ETTh1/h2/m1/m2), fixed
12/4/4-month index splits over the hourly series (ett.py:20-22).
"""

from __future__ import annotations

import numpy as np

from ..base import TimeSeriesDataset
from .. import synthetic as syn


class ETTFamily(TimeSeriesDataset):
    supported_tasks = ("forecasting", "reconstruction", "imputation")
    description = ("The Electricity Transformer Temperature (ETT) is a crucial "
                   "indicator in the electric power long-term deployment.")

    N_FEATURES = 7

    def split_ranges(self):
        # 12 / 4 / 4 months of hourly data (datasets/ett.py:20-22); the
        # minutely variants (ETTm*) use the same row counts in the reference.
        train = (0, 12 * 30 * 24)
        val = (train[1], train[1] + 4 * 30 * 24)
        test = (val[1], val[1] + 4 * 30 * 24)
        return {"train": train, "val": val, "test": test}

    def get_data(self, split=None) -> dict:
        split = split or self.split
        path = self.data_root() / "ett" / f"{self.name}.csv"
        if path.exists():
            import pandas as pd
            df = pd.read_csv(path, parse_dates=["date"], index_col="date")
            full = df.values
        else:
            full = self.synthetic_series()
        ranges = self.split_ranges()
        if split not in ranges:
            raise ValueError(f"Invalid split: {split}")
        return {"data": full[slice(*ranges[split])]}

    def synthetic_series(self) -> np.ndarray:
        if not self.allow_synthetic():
            raise FileNotFoundError(f"ETT csv missing under {self.data_root()}")
        rng = syn.rng_for(f"ett:{self.name}")
        n = 20 * 30 * 24  # covers train+val+test ranges
        return syn.sine_mixture(rng, n, self.N_FEATURES,
                                period_range=(24, 24 * 30), noise=0.2)
