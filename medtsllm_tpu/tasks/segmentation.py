"""Placeholder: implemented later this round."""

from .base import BaseTask


class SegmentationTask(BaseTask):
    def __init__(self, *a, **kw):
        raise NotImplementedError("SegmentationTask is not implemented yet")
