"""ResNet / ResNeXt encoders (Flax, NHWC) for UNet++.

The reference obtains these from ``segmentation_models_pytorch``'s encoder
zoo (reference tasks_with_models/segmentation_unetplus.py:126-131,
``encoder_name="resnet34"`` etc.); we implement the torchvision-compatible
topology natively so ImageNet checkpoints convert 1:1
(see ``models/convert.py``).

Returns a 5-level pyramid [stride 2, 4, 8, 16, 32] — the feature contract
UNet++'s dense decoder consumes. Convs run in the compute dtype (bf16 on
TPU) and BatchNorm statistics in f32.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from geo_deep_learning_tpu.models.layers import (
    maybe_bn_barrier,
    torch_default_kernel_init,
)

Dtype = Any


def _bn(train: bool, dtype, name: str):
    bn = nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )
    # stats-decoupling A/B hook (GDL_BN_BARRIER=1, layers.maybe_bn_barrier)
    return lambda y: bn(maybe_bn_barrier(y))


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (ResNet-18/34)."""

    features: int
    strides: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        # explicit (1,1) padding: torch pads symmetrically; SAME would pad
        # (0,1) for stride-2, shifting activations
        y = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)],
            use_bias=False, kernel_init=torch_default_kernel_init(), dtype=self.dtype, param_dtype=self.param_dtype,
            name="conv1",
        )(x)
        y = _bn(train, self.dtype, "bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, kernel_init=torch_default_kernel_init(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv2",
        )(y)
        y = _bn(train, self.dtype, "bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, kernel_init=torch_default_kernel_init(), dtype=self.dtype, param_dtype=self.param_dtype,
                name="downsample_conv",
            )(residual)
            residual = _bn(train, self.dtype, "downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 - 3x3(groups) - 1x1 residual block (ResNet-50+ / ResNeXt)."""

    features: int  # bottleneck width
    strides: int = 1
    groups: int = 1
    expansion: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        out_features = self.features * self.expansion
        y = nn.Conv(
            self.features, (1, 1), use_bias=False, kernel_init=torch_default_kernel_init(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv1",
        )(x)
        y = _bn(train, self.dtype, "bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)],
            feature_group_count=self.groups, use_bias=False, kernel_init=torch_default_kernel_init(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv2",
        )(y)
        y = _bn(train, self.dtype, "bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(
            out_features, (1, 1), use_bias=False, kernel_init=torch_default_kernel_init(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv3",
        )(y)
        y = _bn(train, self.dtype, "bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                out_features, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, kernel_init=torch_default_kernel_init(), dtype=self.dtype, param_dtype=self.param_dtype,
                name="downsample_conv",
            )(residual)
            residual = _bn(train, self.dtype, "downsample_bn")(residual)
        return nn.relu(y + residual)


@dataclass(frozen=True)
class ResNetConfig:
    block: str  # "basic" | "bottleneck"
    layers: tuple[int, int, int, int]
    groups: int = 1
    width_per_group: int = 64


resnet_configs: dict[str, ResNetConfig] = {
    "resnet18": ResNetConfig("basic", (2, 2, 2, 2)),
    "resnet34": ResNetConfig("basic", (3, 4, 6, 3)),
    "resnet50": ResNetConfig("bottleneck", (3, 4, 6, 3)),
    "resnet101": ResNetConfig("bottleneck", (3, 4, 23, 3)),
    "resnet152": ResNetConfig("bottleneck", (3, 8, 36, 3)),
    "resnext50_32x4d": ResNetConfig("bottleneck", (3, 4, 6, 3), groups=32, width_per_group=4),
    "resnext101_32x8d": ResNetConfig("bottleneck", (3, 4, 23, 3), groups=32, width_per_group=8),
}


class ResNetEncoder(nn.Module):
    """torchvision-topology ResNet returning a 5-level feature pyramid.

    ``in_channels`` may differ from 3; weight conversion handles first-conv
    re-plumbing (the reference's ``patch_first_conv``, models/utils.py:140-181).
    """

    variant: str = "resnet34"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        cfg = resnet_configs[self.variant]
        if cfg.block == "basic":
            return (64, 64, 128, 256, 512)
        return (64, 256, 512, 1024, 2048)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> list[jnp.ndarray]:
        cfg = resnet_configs[self.variant]
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False, kernel_init=torch_default_kernel_init(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv1",
        )(x)
        x = _bn(train, self.dtype, "bn1")(x)
        x = nn.relu(x)
        c1 = x  # stride 2
        # torch MaxPool2d(3, 2, padding=1): pad with -inf so padding never wins
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        feats = [c1]
        widths = (64, 128, 256, 512)
        for stage, (blocks, width) in enumerate(zip(cfg.layers, widths)):
            for b in range(blocks):
                strides = 2 if (stage > 0 and b == 0) else 1
                if cfg.block == "basic":
                    x = BasicBlock(
                        width, strides=strides,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"layer{stage + 1}_{b}",
                    )(x, train=train)
                else:
                    bottleneck_width = width * cfg.width_per_group * cfg.groups // 64
                    x = Bottleneck(
                        bottleneck_width, strides=strides, groups=cfg.groups,
                        expansion=(width * 4) // bottleneck_width,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"layer{stage + 1}_{b}",
                    )(x, train=train)
            feats.append(x)
        return feats  # strides [2, 4, 8, 16, 32]
