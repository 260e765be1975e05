"""UNet++ segmentation assembly: ResNet encoder → nested decoder → head.

Reference capability: ``smp.UnetPlusPlus(encoder_name, in_channels,
encoder_weights, classes)`` as wired in
tasks_with_models/segmentation_unetplus.py:126-131. Head is a 3x3 conv on
the full-resolution decoder output (smp's SegmentationHead default).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from geo_deep_learning_tpu.models.base import SegmentationOutput
from geo_deep_learning_tpu.models.decoders.unetpp import UnetPlusPlusDecoder
from geo_deep_learning_tpu.models.encoders.resnet import ResNetEncoder


class UnetPlusPlus(nn.Module):
    encoder_name: str = "resnet34"
    num_classes: int = 1
    decoder_channels: tuple[int, ...] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> SegmentationOutput:
        feats = ResNetEncoder(
            variant=self.encoder_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="encoder",
        )(x, train=train)
        out = UnetPlusPlusDecoder(
            decoder_channels=self.decoder_channels,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="decoder",
        )(feats, train=train)
        logits = nn.Conv(
            self.num_classes,
            (3, 3),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="head",
        )(out)
        return SegmentationOutput(out=logits.astype(jnp.float32), aux=None)
