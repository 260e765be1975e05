"""FCN auxiliary head.

Reference equivalent: ``models/heads/fcn_head.py:9-84`` (mmseg-style):
``num_convs`` x (3x3 conv + BN + ReLU) → optional concat-input fuse →
2-D dropout → 1x1 classifier.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from geo_deep_learning_tpu.models.layers import (
    ConvModule,
    torch_default_bias_init,
    torch_default_kernel_init,
)


class FCNHead(nn.Module):
    channels: int = 256
    in_index: int = -1
    num_convs: int = 2
    num_classes: int = 19
    dropout_ratio: float = 0.1
    concat_input: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        inputs: jnp.ndarray | Sequence[jnp.ndarray],
        train: bool = False,
    ) -> jnp.ndarray:
        x = inputs[self.in_index] if isinstance(inputs, (list, tuple)) else inputs
        feats = x
        for i in range(self.num_convs):
            feats = ConvModule(
                self.channels,
                kernel_size=(3, 3),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"conv{i}",
            )(feats, train=train)
        if self.num_convs == 0:
            feats = x
        if self.concat_input:
            feats = ConvModule(
                self.channels,
                kernel_size=(3, 3),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv_cat",
            )(jnp.concatenate([x, feats], axis=-1), train=train)
        if self.dropout_ratio > 0:
            feats = nn.Dropout(self.dropout_ratio, deterministic=not train)(feats)
        return nn.Conv(
            self.num_classes,
            (1, 1),
            kernel_init=torch_default_kernel_init(),
            bias_init=torch_default_bias_init(feats.shape[-1]),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="cls_seg",
        )(feats)
