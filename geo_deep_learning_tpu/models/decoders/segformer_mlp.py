"""SegFormer all-MLP decoder.

Reference equivalent: ``models/decoders/segformer_mlp.py:22-130``. Each of
the 4 encoder features is linearly projected to ``embedding_dim``, bilinearly
upsampled to the finest (1/4) resolution, concatenated in [c4, c3, c2, c1]
order, fused with a bias-free 1x1 conv + BN + ReLU, dropped out, and
classified with a 1x1 conv. ``embedding_dim`` defaults: 256 for b0/b1,
768 for larger MiT variants (reference :40-44).

NHWC note: the reference's per-level ``MLP`` flattens HW and applies a
Linear; in channel-last layout that is exactly a 1x1 conv / last-axis
Dense — no permutes needed, and XLA maps it straight onto the MXU.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from geo_deep_learning_tpu.models.layers import (
    torch_default_bias_init,
    torch_default_kernel_init,
)
from geo_deep_learning_tpu.ops.resize import resize


class SegFormerMLPDecoder(nn.Module):
    num_classes: int
    embedding_dim: int = 256
    dropout_ratio: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], train: bool = False
    ) -> jnp.ndarray:
        c1, c2, c3, c4 = feats
        target_hw = c1.shape[1:3]
        projected = []
        for i, c in enumerate((c4, c3, c2, c1), start=1):
            # reference MLP projections are raw torch Linears (default init)
            p = nn.Dense(
                self.embedding_dim,
                kernel_init=torch_default_kernel_init(),
                bias_init=torch_default_bias_init(c.shape[-1]),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"linear_c{5 - i}",
            )(c)
            if p.shape[1:3] != target_hw:
                p = resize(p, size=target_hw, method="bilinear")
            projected.append(p)
        x = jnp.concatenate(projected, axis=-1)
        x = nn.Conv(
            self.embedding_dim,
            (1, 1),
            use_bias=False,
            kernel_init=torch_default_kernel_init(),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="linear_fuse",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_ratio, deterministic=not train)(x)
        return nn.Conv(
            self.num_classes,
            (1, 1),
            kernel_init=torch_default_kernel_init(),
            bias_init=torch_default_bias_init(self.embedding_dim),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="linear_pred",
        )(x)
