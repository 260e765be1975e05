"""Inference: sliding-window full-scene segmentation, model export."""

from geo_deep_learning_tpu.inference.sliding_window import (
    SlidingWindowConfig,
    predict_scene,
    sliding_window_logits,
)

__all__ = ["SlidingWindowConfig", "predict_scene", "sliding_window_logits"]
