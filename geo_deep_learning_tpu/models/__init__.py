"""Flax model zoo: encoders, necks, decoders, heads, and assemblies.

Reference capability map (SURVEY.md §2.1):

- encoders: ResNet/ResNeXt (UNet++), MixTransformer B0-B5 (+ dynamic-channel
  variant), DOFAv2 wavelength-conditioned ViT
- necks: MultiLevelNeck
- decoders: UNet++ dense nested skips, UperNet (PPM+FPN), SegFormer all-MLP
- heads: 1x1 segmentation head, FCN aux head
- assemblies: UNetPlusPlus, SegFormerSegmentationModel, DOFASegmentationModel
"""

from geo_deep_learning_tpu.models.base import SegmentationOutput

__all__ = ["SegmentationOutput"]
