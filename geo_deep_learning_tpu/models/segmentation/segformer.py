"""SegFormer assembly: MiT encoder → all-MLP decoder → upsample to input.

Reference equivalent: ``models/segmentation/segformer.py:15-57``
(``SegFormerSegmentationModel``): encoder is either a standard MiT (b0-b5)
or the channel-agnostic DynamicMixTransformer (``use_dynamic_encoder``,
reference tasks_with_models/segmentation_segformer.py:127-149); decoder
embedding dim is 256 for b0/b1 and 768 for b2+ (reference
models/decoders/segformer_mlp.py:40-44).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from geo_deep_learning_tpu.models.base import SegmentationOutput
from geo_deep_learning_tpu.models.decoders.segformer_mlp import SegFormerMLPDecoder
from geo_deep_learning_tpu.models.encoders.mix_transformer import (
    DynamicMixTransformer,
    MixVisionTransformer,
)
from geo_deep_learning_tpu.ops.resize import resize


class SegFormer(nn.Module):
    encoder_name: str = "mit_b0"
    num_classes: int = 1
    use_dynamic_encoder: bool = False
    dropout_ratio: float = 0.1
    remat: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> SegmentationOutput:
        in_hw = x.shape[1:3]
        encoder_cls = (
            DynamicMixTransformer if self.use_dynamic_encoder else MixVisionTransformer
        )
        enc_kwargs = {} if self.use_dynamic_encoder else {"remat": self.remat}
        feats = encoder_cls(
            variant=self.encoder_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="encoder",
            **enc_kwargs,
        )(x, train=train)
        embedding_dim = 256 if self.encoder_name in ("mit_b0", "mit_b1") else 768
        logits = SegFormerMLPDecoder(
            num_classes=self.num_classes,
            embedding_dim=embedding_dim,
            dropout_ratio=self.dropout_ratio,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="decoder",
        )(feats, train=train)
        logits = resize(
            logits.astype(jnp.float32), size=in_hw, method="bilinear"
        )
        return SegmentationOutput(out=logits, aux=None)
