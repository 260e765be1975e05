"""DOFA segmentation assembly.

Reference equivalent: ``models/segmentation/dofa.py:24-107``
(``DOFASegmentationModel``): DOFAv2 encoder → MultiLevelNeck (BN+ReLU
ConvModules, scales [4, 2, 1, 0.5]) → UperNetDecoder (PPM 1,2,3,6,
channels 256, align_corners=False) → 1x1 SegmentationHead → bilinear
upsample to input size; parallel FCNHead (num_convs=1, channels 256) aux
on the last neck feature. Returns ``SegmentationOutput(out, aux)``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from geo_deep_learning_tpu.models.base import SegmentationOutput
from geo_deep_learning_tpu.models.decoders.upernet import UperNetDecoder
from geo_deep_learning_tpu.models.encoders.dofa import DOFAv2
from geo_deep_learning_tpu.models.heads import FCNHead, SegmentationHead
from geo_deep_learning_tpu.models.necks import MultiLevelNeck
from geo_deep_learning_tpu.ops.resize import resize


class DOFASegmentation(nn.Module):
    encoder_name: str = "dofa_base"
    num_classes: int = 1
    decoder_channels: int = 256
    remat: bool = False
    remat_mode: str = "mlp"  # see DOFAv2.remat_mode
    pos_embed_table: Any = None  # see DOFAv2.pos_embed_table
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        wavelengths: jnp.ndarray | None = None,
        train: bool = False,
        baked_embed: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    ) -> SegmentationOutput:
        in_hw = x.shape[1:3]
        encoder = DOFAv2(
            variant=self.encoder_name,
            remat=self.remat,
            remat_mode=self.remat_mode,
            pos_embed_table=self.pos_embed_table,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="encoder",
        )
        taps = encoder(x, wavelengths, train=train, baked_embed=baked_embed)
        d = encoder.embed_dim
        feats = MultiLevelNeck(
            out_channels=[d] * 4,
            scales=[4, 2, 1, 0.5],
            use_norm_act=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="neck",
        )(taps, train=train)
        dec = UperNetDecoder(
            pool_scales=(1, 2, 3, 6),
            channels=self.decoder_channels,
            align_corners=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="decoder",
        )(feats, train=train)
        out = SegmentationHead(
            num_classes=self.num_classes,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="head",
        )(dec)
        out = resize(out.astype(jnp.float32), size=in_hw, method="bilinear")
        aux = FCNHead(
            channels=256,
            num_convs=1,
            num_classes=self.num_classes,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="aux_head",
        )(feats[-1], train=train)
        aux = resize(aux.astype(jnp.float32), size=in_hw, method="bilinear")
        return SegmentationOutput(out=out, aux=aux)
