"""Placeholder: implemented later this round."""

from .base import BaseTask


class SemanticSegmentationTask(BaseTask):
    def __init__(self, *a, **kw):
        raise NotImplementedError("SemanticSegmentationTask is not implemented yet")
