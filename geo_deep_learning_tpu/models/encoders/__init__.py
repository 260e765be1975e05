"""Encoders: ResNet/ResNeXt, MixTransformer (MiT), DOFA ViT."""

from geo_deep_learning_tpu.models.encoders.resnet import ResNetEncoder, resnet_configs

__all__ = ["ResNetEncoder", "resnet_configs"]
