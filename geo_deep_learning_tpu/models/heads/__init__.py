"""Segmentation heads."""

from geo_deep_learning_tpu.models.heads.fcn import FCNHead
from geo_deep_learning_tpu.models.heads.segmentation import SegmentationHead

__all__ = ["FCNHead", "SegmentationHead"]
