"""Model primitives (API-parity path).

Reference equivalent: ``models/utils.py`` (ConvModule :10-52, PPM :55-93,
resize :96-137, patch_first_conv :140-181). Implementations live in their
TPU-native homes; this module mirrors the reference's import layout.
"""

from geo_deep_learning_tpu.models.convert import patch_first_conv
from geo_deep_learning_tpu.models.layers import PPM, ConvModule, adaptive_avg_pool
from geo_deep_learning_tpu.ops.resize import resize

__all__ = ["PPM", "ConvModule", "adaptive_avg_pool", "patch_first_conv", "resize"]
