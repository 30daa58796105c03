"""Data layer: windowed time-series datasets + fixed-shape batch pipeline.

Reference surface: datasets/__init__.py:14-38 (`dataset_lookup`,
`get_dataset(config, split)`), rebuilt around numpy host arrays and
vectorized window index math so eval stitching needs no per-sample loop.
"""

from .base import TimeSeriesDataset  # noqa: F401
from .registry import dataset_lookup, get_dataset  # noqa: F401
from .pipeline import BatchPipeline  # noqa: F401
