"""Necks bridging single-resolution encoders to pyramid decoders."""

from geo_deep_learning_tpu.models.necks.multilevel import MultiLevelNeck

__all__ = ["MultiLevelNeck"]
