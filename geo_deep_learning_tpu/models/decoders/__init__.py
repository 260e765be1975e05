"""Decoders: UperNet (PPM+FPN), SegFormer all-MLP, UNet++ nested skips."""

from geo_deep_learning_tpu.models.decoders.segformer_mlp import SegFormerMLPDecoder
from geo_deep_learning_tpu.models.decoders.unetpp import UnetPlusPlusDecoder
from geo_deep_learning_tpu.models.decoders.upernet import UperNetDecoder

__all__ = ["SegFormerMLPDecoder", "UnetPlusPlusDecoder", "UperNetDecoder"]
