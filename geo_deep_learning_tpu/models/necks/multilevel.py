"""Multi-level neck: ViT taps → FPN-style pyramid.

Reference equivalent: ``models/necks/multilevel_neck.py:70-160``. Per level:
1x1 lateral conv → bilinear rescale by ``scales[i]`` → 3x3 conv. The
reference's ConvModules here carry no norm/activation by default
(norm_cfg=None, act_cfg=None), so these are plain convs.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from geo_deep_learning_tpu.ops.resize import resize


class MultiLevelNeck(nn.Module):
    """``use_norm_act=True`` adds BN+ReLU to each ConvModule — the wiring the
    DOFA assembly uses (reference models/segmentation/dofa.py:56-62 passes
    ``norm_cfg={"type": "BN"}, act_cfg={"type": "ReLU"}``)."""

    out_channels: Sequence[int]
    scales: Sequence[float] = (0.5, 1, 2, 4)
    use_norm_act: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, inputs: Sequence[jnp.ndarray], train: bool = False
    ) -> tuple[jnp.ndarray, ...]:
        from geo_deep_learning_tpu.models.layers import ConvModule

        def conv(features, kernel, name):
            if self.use_norm_act:
                # the reference neck's ConvModule keeps the conv BIAS even
                # with BN (nn.Conv2d default bias=True,
                # necks/multilevel_neck.py:44-54) — unlike models/utils.py's
                # ConvModule (bias=False); match it for weight parity
                return lambda x: ConvModule(
                    features,
                    kernel_size=kernel,
                    use_bias=True,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=name,
                )(x, train=train)
            return nn.Conv(
                features,
                kernel,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=name,
            )

        laterals = [
            conv(self.out_channels[i], (1, 1), f"lateral{i}")(x)
            for i, x in enumerate(inputs)
        ]
        if len(laterals) == 1:
            laterals = [laterals[0]] * len(self.scales)
        outs = []
        for i, scale in enumerate(self.scales):
            x = laterals[i]
            if scale != 1:
                x = resize(x, scale_factor=float(scale), method="bilinear")
            outs.append(conv(self.out_channels[i], (3, 3), f"conv{i}")(x))
        return tuple(outs)
