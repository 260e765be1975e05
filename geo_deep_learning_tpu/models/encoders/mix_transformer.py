"""MixTransformer (MiT) encoder — the SegFormer backbone.

Reference equivalent: ``models/encoders/mix_transformer.py`` (934 LoC of
NCHW/torch): 4 stages of OverlapPatchEmbed (7/4 then 3/2 convs, ref
:224-276) + transformer blocks with spatial-reduction attention (``sr_ratio``
conv downsamples K/V, ref :134-148) and Mix-FFN (depthwise 3x3 between the
two FCs, ref :17-63), per-stage LayerNorm, variants b0-b5 (ref :599-708),
plus the channel-count-agnostic ``DynamicChannelEmbed`` (ref :762-859).

TPU-native redesign: everything stays ``[B, H, W, C]`` end-to-end.
The reference round-trips [B,C,H,W] ↔ [B,HW,C] around every conv; in
channel-last none of those transposes exist — LayerNorm/Dense act on the
trailing axis of the feature map, the depthwise Mix-FFN conv and the SR
conv apply directly, and attention folds H,W into one einsum axis. All
matmuls and convs hit the MXU in the compute dtype (bf16).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from geo_deep_learning_tpu.models.layers import (
    DropPath,
    kaiming_normal_conv_out,
    torch_default_bias_init,
    torch_default_kernel_init,
    trunc_normal_init,
)

Dtype = Any


class MixFFN(nn.Module):
    """Dense → depthwise 3x3 conv → GELU → Dense (reference Mlp+DWConv)."""

    hidden_dim: int
    out_dim: int
    drop: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(
            self.hidden_dim,
            kernel_init=trunc_normal_init(),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fc1",
        )(x)
        x = nn.Conv(
            self.hidden_dim,
            (3, 3),
            feature_group_count=self.hidden_dim,
            kernel_init=kaiming_normal_conv_out(groups=self.hidden_dim),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="dwconv",
        )(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Dense(
            self.out_dim,
            kernel_init=trunc_normal_init(),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fc2",
        )(x)
        return nn.Dropout(self.drop, deterministic=not train)(x)


class SRAttention(nn.Module):
    """Multi-head attention with spatial-reduction of K/V.

    For ``sr_ratio > 1`` the K/V source is downsampled with a
    ``sr_ratio``-strided conv + LayerNorm (reference Attention :134-148),
    shrinking the attention score matrix by ``sr_ratio²`` — the trick that
    keeps 512² inputs tractable at stage 1.
    """

    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        head_dim = c // self.num_heads
        scale = head_dim**-0.5

        q = nn.Dense(
            c, use_bias=self.qkv_bias, kernel_init=trunc_normal_init(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="q",
        )(x).reshape(b, h * w, self.num_heads, head_dim)

        kv_src = x
        if self.sr_ratio > 1:
            kv_src = nn.Conv(
                c,
                (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio),
                padding="VALID",  # torch sr conv has padding 0
                kernel_init=kaiming_normal_conv_out(),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="sr",
            )(x)
            kv_src = nn.LayerNorm(
                epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype,
                name="sr_norm",
            )(kv_src)
        l_kv = kv_src.shape[1] * kv_src.shape[2]
        kv = nn.Dense(
            2 * c, use_bias=self.qkv_bias, kernel_init=trunc_normal_init(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="kv",
        )(kv_src).reshape(b, l_kv, 2, self.num_heads, head_dim)
        k, v = kv[:, :, 0], kv[:, :, 1]

        if self.attn_drop > 0 and train:
            # dropout on probabilities requires the materialized matrix
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            attn = nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w, c)
        else:
            # fused VMEM attention on TPU (einsum fallback elsewhere):
            # never writes the [Lq, Lkv] probability matrix to HBM
            from geo_deep_learning_tpu.ops.pallas.sr_attention import sr_attention

            o = sr_attention(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                scale,
            )
            out = o.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        out = nn.Dense(
            c, kernel_init=trunc_normal_init(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="proj",
        )(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class MiTBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    sr_ratio: int = 1
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        y = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype, name="norm1"
        )(x)
        y = SRAttention(
            num_heads=self.num_heads,
            sr_ratio=self.sr_ratio,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attn",
        )(y, train=train)
        x = x + DropPath(self.drop_path, name="dp1")(y, train=train)
        y = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype, name="norm2"
        )(x)
        y = MixFFN(
            hidden_dim=int(c * self.mlp_ratio),
            out_dim=c,
            drop=self.drop,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="mlp",
        )(y, train=train)
        return x + DropPath(self.drop_path, name="dp2")(y, train=train)


class OverlapPatchEmbed(nn.Module):
    """Strided overlapping conv + LayerNorm (reference :224-276)."""

    embed_dim: int
    patch_size: int = 7
    stride: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size // 2
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            kernel_init=kaiming_normal_conv_out(),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )(x)
        return nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype, name="norm"
        )(x)


@dataclass(frozen=True)
class MiTConfig:
    embed_dims: tuple[int, ...] = (64, 128, 320, 512)
    num_heads: tuple[int, ...] = (1, 2, 5, 8)
    mlp_ratios: tuple[float, ...] = (4, 4, 4, 4)
    depths: tuple[int, ...] = (2, 2, 2, 2)
    sr_ratios: tuple[int, ...] = (8, 4, 2, 1)
    qkv_bias: bool = True
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1


mit_configs: dict[str, MiTConfig] = {
    "mit_b0": MiTConfig(embed_dims=(32, 64, 160, 256)),
    "mit_b1": MiTConfig(),
    "mit_b2": MiTConfig(depths=(3, 4, 6, 3)),
    "mit_b3": MiTConfig(depths=(3, 4, 18, 3)),
    "mit_b4": MiTConfig(depths=(3, 8, 27, 3)),
    "mit_b5": MiTConfig(depths=(3, 6, 40, 3)),
}


class MixVisionTransformer(nn.Module):
    """4-stage MiT backbone returning features at strides [4, 8, 16, 32].

    ``remat=True`` rematerializes each block in the backward pass
    (jax.checkpoint): activations are recomputed instead of stored,
    trading ~30% extra FLOPs for O(depth) less activation HBM — the
    standard lever for scaling batch size on TPU.
    """

    variant: str = "mit_b0"
    drop_path_rate: float | None = None  # override config
    remat: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        return mit_configs[self.variant].embed_dims

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> list[jnp.ndarray]:
        cfg = mit_configs[self.variant]
        dpr_max = (
            self.drop_path_rate
            if self.drop_path_rate is not None
            else cfg.drop_path_rate
        )
        total = sum(cfg.depths)
        dpr = np.linspace(0.0, dpr_max, total)
        block_cls = (
            nn.remat(MiTBlock, static_argnums=(2,)) if self.remat else MiTBlock
        )
        outs = []
        cur = 0
        for stage in range(4):
            x = OverlapPatchEmbed(
                embed_dim=cfg.embed_dims[stage],
                patch_size=7 if stage == 0 else 3,
                stride=4 if stage == 0 else 2,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"patch_embed{stage + 1}",
            )(x)
            for i in range(cfg.depths[stage]):
                x = block_cls(
                    num_heads=cfg.num_heads[stage],
                    mlp_ratio=cfg.mlp_ratios[stage],
                    sr_ratio=cfg.sr_ratios[stage],
                    qkv_bias=cfg.qkv_bias,
                    drop=cfg.drop_rate,
                    drop_path=float(dpr[cur + i]),
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"block{stage + 1}_{i}",
                )(x, train)
            cur += cfg.depths[stage]
            x = nn.LayerNorm(
                epsilon=1e-6,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"norm{stage + 1}",
            )(x)
            outs.append(x)
        return outs


class DynamicChannelEmbed(nn.Module):
    """Channel-count-agnostic stage-1 patch embedding (reference :762-859).

    Each input channel is embedded independently by a shared 1→D strided
    conv, scaled by weights generated from sinusoidal channel-position
    encodings, then aggregated with a softmax channel attention — so one
    trained model accepts any number of spectral bands.
    """

    embed_dim: int = 64
    hidden_dim: int = 128
    patch_size: int = 7
    stride: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, channels = x.shape
        # sinusoidal channel position encoding [C, pos_dim]
        positions = jnp.arange(channels, dtype=jnp.float32)
        dim_t = jnp.arange(0, self.hidden_dim, 2, dtype=jnp.float32)
        inv_freq = 1.0 / (10000.0 ** (dim_t / self.hidden_dim))
        ang = positions[:, None] * inv_freq[None, :]
        pos_enc = jnp.zeros((channels, self.hidden_dim))
        pos_enc = pos_enc.at[:, 0::2].set(jnp.sin(ang))
        pos_enc = pos_enc.at[:, 1::2].set(jnp.cos(ang))
        pos_enc = pos_enc.astype(self.dtype)

        # per-channel weight from a small MLP (tanh-bounded)
        tdef = lambda fan: dict(
            kernel_init=torch_default_kernel_init(),
            bias_init=torch_default_bias_init(fan),
        )
        cw = nn.Dense(
            self.hidden_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="weight_gen1", **tdef(pos_enc.shape[-1]),
        )(pos_enc)
        cw = nn.relu(cw)
        cw = nn.tanh(
            nn.Dense(
                self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                name="weight_gen2", **tdef(self.hidden_dim),
            )(cw)
        )  # [C, D]

        # shared spatial conv applied per channel: fold C into batch
        p = self.patch_size // 2
        xc = x.transpose(0, 3, 1, 2).reshape(b * channels, h, w, 1)
        xc = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            # raw torch Conv2d in the reference (no init sweep runs over
            # the Dynamic* classes): torch defaults
            kernel_init=torch_default_kernel_init(),
            bias_init=torch_default_bias_init(self.patch_size**2),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="spatial_conv",
        )(xc)
        ho, wo = xc.shape[1], xc.shape[2]
        xc = xc.reshape(b, channels, ho, wo, self.embed_dim)
        xw = xc * cw[None, :, None, None, :]  # weighted per channel

        # channel attention over [embed | pos] features (1x1 convs ≡ Dense)
        pos_b = jnp.broadcast_to(
            pos_enc[None, :, None, None, :], (b, channels, ho, wo, self.hidden_dim)
        )
        attn_in = jnp.concatenate([xw, pos_b], axis=-1)
        a = nn.Dense(
            self.embed_dim // 2, dtype=self.dtype, param_dtype=self.param_dtype,
            name="channel_attn1", **tdef(attn_in.shape[-1]),
        )(attn_in)
        a = nn.relu(a)
        a = nn.Dense(
            1, dtype=self.dtype, param_dtype=self.param_dtype,
            name="channel_attn2", **tdef(self.embed_dim // 2),
        )(a)  # [B, C, ho, wo, 1]
        a = nn.softmax(a, axis=1)
        agg = jnp.sum(xw * a, axis=1)  # [B, ho, wo, D]
        agg = nn.Dense(
            self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="proj", **tdef(self.embed_dim),
        )(agg)
        return nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype, name="norm"
        )(agg)


class DynamicMixTransformer(nn.Module):
    """MiT with the dynamic channel embedding at stage 1 (reference :862-934).

    Stages 2-4 are standard MiT (and can reuse pretrained weights)."""

    variant: str = "mit_b0"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> tuple[int, ...]:
        return mit_configs[self.variant].embed_dims

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> list[jnp.ndarray]:
        cfg = mit_configs[self.variant]
        total = sum(cfg.depths)
        dpr = np.linspace(0.0, cfg.drop_path_rate, total)
        outs = []
        cur = 0
        for stage in range(4):
            if stage == 0:
                x = DynamicChannelEmbed(
                    embed_dim=cfg.embed_dims[0],
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="dynamic_patch_embed1",
                )(x)
            else:
                x = OverlapPatchEmbed(
                    embed_dim=cfg.embed_dims[stage],
                    patch_size=3,
                    stride=2,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"patch_embed{stage + 1}",
                )(x)
            for i in range(cfg.depths[stage]):
                x = MiTBlock(
                    num_heads=cfg.num_heads[stage],
                    mlp_ratio=cfg.mlp_ratios[stage],
                    sr_ratio=cfg.sr_ratios[stage],
                    qkv_bias=cfg.qkv_bias,
                    drop=cfg.drop_rate,
                    drop_path=float(dpr[cur + i]),
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"block{stage + 1}_{i}",
                )(x, train=train)
            cur += cfg.depths[stage]
            x = nn.LayerNorm(
                epsilon=1e-6,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"norm{stage + 1}",
            )(x)
            outs.append(x)
        return outs
