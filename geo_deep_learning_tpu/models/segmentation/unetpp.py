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
from geo_deep_learning_tpu.models.layers import (
    torch_default_bias_init,
    torch_default_kernel_init,
)
from geo_deep_learning_tpu.models.decoders.unetpp import (
    PackedConv3x3,
    UnetPlusPlusDecoder,
)
from geo_deep_learning_tpu.models.encoders.resnet import ResNetEncoder
from geo_deep_learning_tpu.ops.s2d import depth_to_space


class UnetPlusPlus(nn.Module):
    """``packed_tail`` (default on) executes the full-resolution decoder
    block AND the head in 2x2 space-to-depth layout (ops/s2d.py): exact
    same math and param tree, but the MXU sees 4x wider GEMMs at 1/4 the
    spatial size — the stride-1 stages were measured memory-bound with a
    >75%-idle MXU (BASELINE.md)."""

    encoder_name: str = "resnet34"
    num_classes: int = 1
    decoder_channels: tuple[int, ...] = (256, 128, 64, 32, 16)
    packed_tail: bool = True
    packed_column: bool = False  # see UnetPlusPlusDecoder.packed_column
    # exact-math execution A/B knobs, forwarded to UnetPlusPlusDecoder
    # (packed_column takes precedence over merged_skips — see the decoder)
    up2_factored: bool = True
    merged_skips: bool = True
    wpacked_column: bool = False  # see UnetPlusPlusDecoder.wpacked_column
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
            packed_tail=self.packed_tail,
            packed_column=self.packed_column,
            up2_factored=self.up2_factored,
            merged_skips=self.merged_skips,
            wpacked_column=self.wpacked_column,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="decoder",
        )(feats, train=train)
        if self.packed_tail:
            logits = depth_to_space(
                PackedConv3x3(
                    self.num_classes,
                    self.decoder_channels[-1],
                    use_bias=True,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="head",
                )(out)
            )
        else:
            logits = nn.Conv(
                self.num_classes,
                (3, 3),
                kernel_init=torch_default_kernel_init(),
                bias_init=torch_default_bias_init(
                    9 * self.decoder_channels[-1]
                ),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="head",
            )(out)
        return SegmentationOutput(out=logits.astype(jnp.float32), aux=None)
