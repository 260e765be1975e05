"""Segmentation model assemblies."""

from geo_deep_learning_tpu.models.segmentation.unetpp import UnetPlusPlus

__all__ = ["UnetPlusPlus"]
