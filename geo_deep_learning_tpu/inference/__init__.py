"""Inference: sliding-window full-scene segmentation, model export."""

from geo_deep_learning_tpu.inference.sliding_window import (
    SlidingWindowConfig,
    predict_scene,
    sliding_window_logits,
    sliding_window_logits_halo,
    sliding_window_logits_sharded,
)

__all__ = [
    "SlidingWindowConfig",
    "predict_scene",
    "sliding_window_logits",
    "sliding_window_logits_halo",
    "sliding_window_logits_sharded",
]
