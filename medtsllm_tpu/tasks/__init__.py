"""Task-trainer registry (reference tasks/__init__.py:9-20)."""

from __future__ import annotations


def _lookup():
    from .forecasting import ForecastTask
    from .reconstruction import ReconstructionTask
    from .anomaly_detection import AnomalyDetectionTask
    from .segmentation import SegmentationTask
    from .semantic_segmentation import SemanticSegmentationTask
    from .pretraining import PretrainingTask
    from .classification import ClassificationTask
    from .imputation import ImputationTask
    return {
        "forecasting": ForecastTask,
        "reconstruction": ReconstructionTask,
        "anomaly_detection": AnomalyDetectionTask,
        "segmentation": SegmentationTask,
        "semantic_segmentation": SemanticSegmentationTask,
        "pretraining": PretrainingTask,
        "classification": ClassificationTask,
        "imputation": ImputationTask,
    }


class _TaskLookup(dict):
    def __missing__(self, key):
        self.update(_lookup())
        return dict.__getitem__(self, key)


task_lookup = _TaskLookup()


def get_trainer(run_id, config):
    try:
        cls = task_lookup[config.task]
    except KeyError:
        raise ValueError(f"Unknown task {config.task!r}") from None
    return cls(run_id, config)
