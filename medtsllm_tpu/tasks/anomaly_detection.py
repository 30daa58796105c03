"""Placeholder: implemented later this round."""

from .base import BaseTask


class AnomalyDetectionTask(BaseTask):
    def __init__(self, *a, **kw):
        raise NotImplementedError("AnomalyDetectionTask is not implemented yet")
