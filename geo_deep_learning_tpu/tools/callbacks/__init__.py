"""Callbacks (API-parity path)."""

from geo_deep_learning_tpu.tools.callbacks.segmentation_visualization import (
    VisualizationCallback,
)

__all__ = ["VisualizationCallback"]
