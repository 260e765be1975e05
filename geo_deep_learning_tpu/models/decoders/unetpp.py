"""UNet++ decoder: dense nested skip pathways.

The reference delegates UNet++ entirely to ``segmentation_models_pytorch``
(reference tasks_with_models/segmentation_unetplus.py:126-131); we implement
it from the paper (Zhou et al., "UNet++: Redesigning Skip Connections to
Exploit Multiscale Features in Image Segmentation", PAPERS.md):

    X[i][j] = ConvBlock( concat( X[i][0..j-1], Up(X[i+1][j-1]) ) )

where ``i`` is the resolution level (0 = finest encoder feature) and ``j``
the position along the skip pathway. The decoder consumes the encoder
pyramid finest-first and emits a full-resolution feature map via a final
skip-free upsampling block (matching smp's stride-1 output contract).
Deep supervision (the paper's L1..L4 outputs) is available via
``deep_supervision=True``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from geo_deep_learning_tpu.models.layers import ConvModule
from geo_deep_learning_tpu.ops.resize import resize


class DecoderBlock(nn.Module):
    """Upsample x2 (nearest) → concat skips → 2x (3x3 conv + BN + ReLU)."""

    features: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skips: Sequence[jnp.ndarray] = (),
        train: bool = False,
    ) -> jnp.ndarray:
        x = resize(x, scale_factor=2.0, method="nearest")
        if skips:
            x = jnp.concatenate([x, *skips], axis=-1)
        x = ConvModule(
            self.features, dtype=self.dtype, param_dtype=self.param_dtype, name="conv1"
        )(x, train=train)
        return ConvModule(
            self.features, dtype=self.dtype, param_dtype=self.param_dtype, name="conv2"
        )(x, train=train)


class UnetPlusPlusDecoder(nn.Module):
    """Dense nested decoder over an encoder pyramid.

    Args:
        decoder_channels: out-channels per pathway column, deepest column
            first (smp convention ``(256, 128, 64, 32, 16)``); entry ``j``
            is used by nodes computed at step ``j`` of the pathway, and the
            last entry by the final full-resolution block.
        deep_supervision: also return the intermediate X[0][j] maps.
    """

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    deep_supervision: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, features: Sequence[jnp.ndarray], train: bool = False
    ) -> jnp.ndarray | tuple[jnp.ndarray, list[jnp.ndarray]]:
        depth = len(features) - 1  # pathway length
        if len(self.decoder_channels) < depth + 1:
            msg = (
                f"need {depth + 1} decoder channels for {len(features)} "
                f"encoder features, got {len(self.decoder_channels)}"
            )
            raise ValueError(msg)
        # grid[i][j] = X[i][j]; X[i][0] are the encoder features
        grid: dict[tuple[int, int], jnp.ndarray] = {
            (i, 0): f for i, f in enumerate(features)
        }
        for j in range(1, depth + 1):
            for i in range(depth - j + 1):
                skips = [grid[(i, k)] for k in range(j)]
                grid[(i, j)] = DecoderBlock(
                    self.decoder_channels[j - 1],
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"x_{i}_{j}",
                )(grid[(i + 1, j - 1)], skips, train=train)
        # final skip-free block: finest node → input resolution (stride 1)
        out = DecoderBlock(
            self.decoder_channels[depth],
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="final",
        )(grid[(0, depth)], (), train=train)
        if self.deep_supervision:
            return out, [grid[(0, j)] for j in range(1, depth + 1)]
        return out
