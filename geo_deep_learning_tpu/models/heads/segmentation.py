"""1x1 convolution segmentation head.

Reference equivalent: ``models/heads/segmentation_head.py:16-26``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from geo_deep_learning_tpu.models.layers import (
    torch_default_bias_init,
    torch_default_kernel_init,
)


class SegmentationHead(nn.Module):
    """Project decoder features to class logits with a 1x1 conv."""

    num_classes: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # reference uses a raw torch Conv2d (torch-default init)
        return nn.Conv(
            self.num_classes,
            (1, 1),
            kernel_init=torch_default_kernel_init(),
            bias_init=torch_default_bias_init(x.shape[-1]),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
