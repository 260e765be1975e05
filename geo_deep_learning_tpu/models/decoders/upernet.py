"""UperNet decoder: PPM over the deepest level + FPN top-down fusion.

Reference equivalent: ``models/decoders/upernet.py:9-152`` (mmseg-derived).
Structure: PPM(pool 1,2,3,6) + bottleneck on the last level; 1x1 lateral
convs on shallower levels; top-down add with bilinear upsampling; 3x3 fpn
convs; upsample all to the finest level; concat; 3x3 fuse. Optional
``scale_modules`` builds a ConvTranspose pyramid from uniform-resolution
plain-ViT taps.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from geo_deep_learning_tpu.models.layers import ConvModule, PPM
from geo_deep_learning_tpu.models.layers import (
    torch_default_bias_init,
    torch_default_kernel_init,
)
from geo_deep_learning_tpu.ops.fused_upconv import resize_conv3x3_factored
from geo_deep_learning_tpu.ops.resize import resize


class _ConvKernel(nn.Module):
    """Bare ``kernel`` param in its own scope (mirrors ``nn.Conv``'s
    param path/init so the split-fused bottleneck is checkpoint-identical
    to the ConvModule it replaces)."""

    shape: tuple[int, ...]
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "kernel", torch_default_kernel_init(), self.shape, self.param_dtype
        )


class _FusedBottleneck(nn.Module):
    """ConvModule twin (3x3 conv + BN + ReLU, param tree identical to
    ``ConvModule(channels, (3,3))``) for ``conv3x3(concat(parts resized
    to target))``: the conv of a concat is the SUM of per-part convs, and
    each upsampled part's conv runs through
    ``ops.fused_upconv.resize_conv3x3_factored`` so its channel GEMM
    executes at SOURCE resolution (ratio^2 x fewer positions) and the
    resized intermediates never exist. Exact same math as resize + concat
    + conv (up to f32 reassociation); checkpoints/converters see one
    ordinary ``conv/kernel`` over the concatenated channels.

    Reference composition: ``models/decoders/upernet.py:128-152``.
    """

    features: int
    align_corners: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        parts: Sequence[jnp.ndarray],
        target_hw: tuple[int, int],
        train: bool = False,
    ) -> jnp.ndarray:
        cin = sum(p.shape[-1] for p in parts)
        # ConvModule stores the kernel under "{name}/conv/kernel"; declare
        # it inside a child scope "conv" for checkpoint compatibility
        kernel = _ConvKernel(
            (3, 3, cin, self.features), self.param_dtype, name="conv"
        )()
        k = kernel.astype(self.dtype)
        total = None
        off = 0
        for p in parts:
            ksl = k[:, :, off : off + p.shape[-1]]
            off += p.shape[-1]
            if tuple(p.shape[1:3]) == tuple(target_hw):
                y = jax.lax.conv_general_dilated(
                    p.astype(self.dtype),
                    ksl,
                    (1, 1),
                    "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            else:
                y = resize_conv3x3_factored(
                    p.astype(self.dtype),
                    ksl,
                    None,
                    tuple(target_hw),
                    self.align_corners,
                )
            total = y if total is None else total + y
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(total)
        return nn.relu(x)


class UperNetDecoder(nn.Module):
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    channels: int = 256
    align_corners: bool = True
    scale_modules: bool = False
    fuse_bottleneck: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, inputs: Sequence[jnp.ndarray], train: bool = False
    ) -> jnp.ndarray:
        if self.scale_modules:
            # plain-ViT taps are all at one resolution; build a pyramid
            d0 = inputs[0].shape[-1]
            convt_init = dict(
                kernel_init=nn.initializers.variance_scaling(
                    1.0 / 3.0, "fan_out", "uniform"
                ),
            )
            x0 = nn.ConvTranspose(
                d0 // 2, (2, 2), strides=(2, 2),
                bias_init=torch_default_bias_init(4 * (d0 // 2)), **convt_init,
                dtype=self.dtype, param_dtype=self.param_dtype, name="fpn1_up1",
            )(inputs[0])
            x0 = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=jnp.float32, name="fpn1_bn",
            )(x0)
            x0 = nn.gelu(x0)
            x0 = nn.ConvTranspose(
                d0 // 4, (2, 2), strides=(2, 2),
                bias_init=torch_default_bias_init(4 * (d0 // 4)), **convt_init,
                dtype=self.dtype, param_dtype=self.param_dtype, name="fpn1_up2",
            )(x0)
            d1 = inputs[1].shape[-1]
            x1 = nn.ConvTranspose(
                d1 // 2, (2, 2), strides=(2, 2),
                bias_init=torch_default_bias_init(4 * (d1 // 2)), **convt_init,
                dtype=self.dtype, param_dtype=self.param_dtype, name="fpn2_up",
            )(inputs[1])
            x2 = inputs[2]
            x3 = nn.max_pool(inputs[3], (2, 2), strides=(2, 2))
            inputs = [x0, x1, x2, x3]

        # laterals for all but the deepest level
        laterals = [
            ConvModule(
                self.channels,
                kernel_size=(1, 1),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"lateral{i}",
            )(x, train=train)
            for i, x in enumerate(inputs[:-1])
        ]
        # PPM + bottleneck on the deepest level
        top = inputs[-1]
        psp_outs = [top, *PPM(
            pool_scales=self.pool_scales,
            channels=self.channels,
            align_corners=self.align_corners,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="ppm",
        )(top, train=train)]
        laterals.append(
            ConvModule(
                self.channels,
                kernel_size=(3, 3),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="bottleneck",
            )(jnp.concatenate(psp_outs, axis=-1), train=train)
        )

        # top-down pathway
        n = len(laterals)
        for i in range(n - 1, 0, -1):
            prev_hw = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + resize(
                laterals[i],
                size=prev_hw,
                method="bilinear",
                align_corners=self.align_corners,
            )

        fpn_outs = [
            ConvModule(
                self.channels,
                kernel_size=(3, 3),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"fpn_conv{i}",
            )(laterals[i], train=train)
            for i in range(n - 1)
        ]
        fpn_outs.append(laterals[-1])
        target_hw = fpn_outs[0].shape[1:3]
        if self.fuse_bottleneck:
            return _FusedBottleneck(
                self.channels,
                align_corners=self.align_corners,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="fpn_bottleneck",
            )(fpn_outs, tuple(target_hw), train=train)
        for i in range(n - 1, 0, -1):
            fpn_outs[i] = resize(
                fpn_outs[i],
                size=target_hw,
                method="bilinear",
                align_corners=self.align_corners,
            )
        fused = jnp.concatenate(fpn_outs, axis=-1)
        return ConvModule(
            self.channels,
            kernel_size=(3, 3),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fpn_bottleneck",
        )(fused, train=train)
