"""UNet++ decoder: dense nested skip pathways (smp-parity channel scheme).

The reference delegates UNet++ entirely to ``segmentation_models_pytorch``
(reference tasks_with_models/segmentation_unetplus.py:126-131); this is a
from-scratch NHWC/Flax implementation of the same network (Zhou et al.,
"UNet++: Redesigning Skip Connections to Exploit Multiscale Features in
Image Segmentation", PAPERS.md) with smp's exact block wiring and channel
allocation:

- encoder features are consumed deepest-first; node ``x_{d}_{j}`` sits at
  the resolution of (reversed) feature ``j+1`` and is computed as
  ``Block(up2x(x_{d}_{j-1}), concat(x_{d+1..j}_{j}, feats[j+1]))``
  (first column: ``Block(up2x(feats[d]), feats[d+1])``),
- only the backbone column ``x_0_j`` uses ``decoder_channels[j]``; every
  dense intermediate node (d>0) keeps its level's ENCODER width
  (smp's ``skip_channels[j]``). This matters for TPU throughput as much as
  parity: the r1 per-column scheme put 256-channel 3x3 convs at 1/2
  resolution, ~3.1 TFLOP per bs8 forward vs ~0.9 TFLOP for this scheme.

Node names match smp's ``blocks["x_{d}_{j}"]`` keys so torch checkpoints
convert mechanically. A final skip-free block ``x_0_{depth}`` upsamples to
input resolution (smp's stride-1 output contract). Deep supervision
returns the finest-level nodes (the paper's L1..Ln outputs).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from geo_deep_learning_tpu.models.layers import (
    ConvModule,
    maybe_bn_barrier,
    torch_default_bias_init,
    torch_default_kernel_init,
)
from geo_deep_learning_tpu.ops.resize import resize
from geo_deep_learning_tpu.ops.s2d import (
    depth_to_space,
    nearest_up2_packed,
    pack_bias,
    pack_conv3x3_kernel,
    pack_up2_conv3x3_kernel,
    pack_w_conv3x3_kernel,
    packed_concat,
    slot_mean_var,
    space_to_depth,
    tile_stats,
    wdepth_to_space,
    wspace_to_depth,
)


class PackedConv3x3(nn.Module):
    """3x3 conv executed in 2x2 space-to-depth layout (ops/s2d.py).

    Declares EXACTLY ``nn.Conv``'s parameters (``kernel`` [3,3,in,out],
    optional ``bias`` [out], same initializers), so checkpoints, torch
    converters, and golden-parity tests are oblivious to the packed
    execution; only the MXU-visible GEMM shapes change (K,N x4).
    """

    features: int
    in_features: int
    use_bias: bool = False
    # up2_input: the input is the UNPACKED pre-upsample tensor and this
    # module computes conv3x3(nearest_up2(x)) in packed layout directly
    # via ops/s2d.py:pack_up2_conv3x3_kernel — the tiled-x4 input and the
    # 75%-zero packed kernel never exist (4x fewer FLOPs / input reads).
    up2_input: bool = False
    # w_mode: W-only (1x2) packing instead of 2x2 space-to-depth — the
    # [3,3,2C,2O] block kernel of ops/s2d.py:pack_w_conv3x3_kernel
    # (mutually exclusive with up2_input)
    w_mode: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            torch_default_kernel_init(),
            (3, 3, self.in_features, self.features),
            self.param_dtype,
        )
        if self.w_mode:
            y = jax.lax.conv_general_dilated(
                xp.astype(self.dtype),
                pack_w_conv3x3_kernel(kernel.astype(self.dtype)),
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if self.use_bias:
                bias = self.param(
                    "bias", torch_default_bias_init(9 * self.in_features),
                    (self.features,), self.param_dtype,
                )
                y = y + jnp.tile(bias, 2).astype(self.dtype)
            return y
        if self.up2_input:
            y = jax.lax.conv_general_dilated(
                xp.astype(self.dtype),
                pack_up2_conv3x3_kernel(kernel.astype(self.dtype)),
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if self.use_bias:
                bias = self.param(
                    "bias", torch_default_bias_init(9 * self.in_features), (self.features,),
                    self.param_dtype,
                )
                y = y + pack_bias(bias).astype(self.dtype)
            return y
        pk = pack_conv3x3_kernel(kernel.astype(self.dtype))
        y = jax.lax.conv_general_dilated(
            xp.astype(self.dtype),
            pk,
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", torch_default_bias_init(9 * self.in_features), (self.features,),
                self.param_dtype,
            )
            y = y + pack_bias(bias).astype(self.dtype)
        return y


class PackedBatchNorm(nn.Module):
    """BatchNorm over packed tensors with full-resolution statistics.

    Parameter/batch_stats layout is identical to ``nn.BatchNorm`` on the
    unpacked tensor (per ORIGINAL channel): the ``slots`` slots partition
    the original spatial positions, so slot-averaged batch statistics
    equal the full-resolution statistics exactly. ``slots=4`` is the 2x2
    space-to-depth tail; ``slots=2`` the W-packed finest column.
    """

    channels: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    slots: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.channels,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.channels,), jnp.float32
        )
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros_init(),
            jax.random.PRNGKey(0), (self.channels,), jnp.float32,
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones_init(),
            jax.random.PRNGKey(0), (self.channels,), jnp.float32,
        )
        if train:
            mean, var = slot_mean_var(xp, self.channels, self.slots)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1.0 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        n = self.slots
        y = (xp.astype(jnp.float32) - tile_stats(mean, n)) * tile_stats(inv, n)
        return (y + tile_stats(bias, n)).astype(self.dtype)


class PackedConvModule(nn.Module):
    """Packed-layout twin of ``ConvModule`` (same param tree)."""

    features: int
    in_features: int
    up2_input: bool = False  # see PackedConv3x3.up2_input
    w_mode: bool = False  # see PackedConv3x3.w_mode
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        xp = PackedConv3x3(
            self.features,
            self.in_features,
            up2_input=self.up2_input,
            w_mode=self.w_mode,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(xp)
        xp = PackedBatchNorm(
            self.features, slots=2 if self.w_mode else 4,
            dtype=self.dtype, name="bn",
        )(xp, train=train)
        return nn.relu(xp)


@jax.custom_vjp
def _up2_conv(x: jnp.ndarray, k_eff: jnp.ndarray) -> jnp.ndarray:
    """lhs-dilated conv computing ``conv3x3(nearest_up2(x))`` with the
    4x4 kernel K (.) ones(2,2); custom VJP pins both gradients to plain
    stride-1 convs over the space-to-depth grid of ``dy`` (validated
    exact vs ``jax.vjp`` of the forward).

    Forward algebra (XLA correlation convention, pad 2, lhs-dilation 2):
    ``y[p] = sum_m x[m] * k_eff[2m - p + 2]``.

    - dx = conv(dy, k_eff[::-1, ::-1], stride 2, pad 1) with the kernel's
      feature dims read swapped (HWOI) — the only reversal is the tiny
      4x4 kernel (HLO census: zero full-tensor reverses);
    - dk: the natural weight-grad form conv(x, dy, lhs_dilation 2) makes
      dy the conv RHS of an lhs-dilated conv, which the TPU backend
      lowers through a FULL-TENSOR spatial reversal of dy — 4 x 1.6
      ms/step at bs32 on the finest decoder column (a reversed
      minor-dim tile walk is ~80x the cost of copying the same bytes).
      Swapping roles — dy as CHWN lhs, x as the (rhs_dilation=2) sliding
      window — computes ``out[o, u', c] = sum_m dy[u' - 1 + 2m] x[m]``,
      i.e. dk at reversed tap index ``u = 3 - u'``; a [O,4,4,C]-sized
      flip + transpose restores HWIO. Same contraction, no dilated lhs,
      no big reversal: 10x faster in isolation at the hot shape
      (B32 H128 C96 O64: 4.3 vs 43 ms host-timed; phase-split slices
      measured 6.7 ms and the s2d(dy) re-expression regressed the full
      step by +13 ms of pad/reshape/copy, so both were rejected).
    """
    return jax.lax.conv_general_dilated(
        x, k_eff, (1, 1), ((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _up2_conv_fwd(x, k_eff):
    return _up2_conv(x, k_eff), (x, k_eff)


def _up2_conv_bwd(res, dy):
    x, k_eff = res
    dx = jax.lax.conv_general_dilated(
        dy, k_eff[::-1, ::-1], (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWOI", "NHWC"),
    )
    dk = jax.lax.conv_general_dilated(
        dy, x, (1, 1), ((1, 1), (1, 1)),
        rhs_dilation=(2, 2),
        dimension_numbers=("CHWN", "IHWO", "NHWC"),
    )  # [O, 4, 4, C] at reversed tap index
    dk = dk[:, ::-1, ::-1].transpose(1, 2, 3, 0)
    return dx, dk.astype(k_eff.dtype)


_up2_conv.defvjp(_up2_conv_fwd, _up2_conv_bwd)


@jax.custom_vjp
def _up2w_conv(x: jnp.ndarray, k_eff: jnp.ndarray) -> jnp.ndarray:
    """W-packed sibling of :func:`_up2_conv`: consumes the SOURCE-resolution
    input and emits ``conv3x3(nearest_up2(x))`` directly in the W-packed
    [B, 2H, W, 2O] layout (no post-hoc reshape — a W-pack of a T(8,128)
    tensor materializes a ~0.85 ms copy at the live shapes). ``k_eff`` is
    ops/s2d.py:pack_w_up2_conv3x3_kernel's [4, 3, C, 2O]: H is the
    lhs-dilated up2 composition, W the slot-merged packed taps. The VJP
    mirrors :func:`_up2_conv`'s reversal-free forms (validated 0.0 /
    3.8e-6 vs ``jax.vjp`` of the forward)."""
    return jax.lax.conv_general_dilated(
        x, k_eff, (1, 1), ((2, 2), (1, 1)),
        lhs_dilation=(2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _up2w_conv_fwd(x, k_eff):
    return _up2w_conv(x, k_eff), (x, k_eff)


def _up2w_conv_bwd(res, dy):
    x, k_eff = res
    dx = jax.lax.conv_general_dilated(
        dy, k_eff[::-1, ::-1], (2, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWOI", "NHWC"),
    )
    dk = jax.lax.conv_general_dilated(
        dy, x, (1, 1), ((1, 1), (1, 1)),
        rhs_dilation=(2, 1),
        dimension_numbers=("CHWN", "IHWO", "NHWC"),
    )  # [2O, 4, 3, C] at reversed tap index
    dk = dk[:, ::-1, ::-1].transpose(1, 2, 3, 0)
    return dx, dk.astype(k_eff.dtype)


_up2w_conv.defvjp(_up2w_conv_fwd, _up2w_conv_bwd)


def _up2w_conv_apply(x_src: jnp.ndarray, ku: jnp.ndarray) -> jnp.ndarray:
    """``w_pack(conv3x3(nearest_up2(x_src)))`` fused via :func:`_up2w_conv`."""
    from geo_deep_learning_tpu.ops.s2d import pack_w_up2_conv3x3_kernel

    return _up2w_conv(x_src, pack_w_up2_conv3x3_kernel(ku))


def _up2_conv_apply(x_src: jnp.ndarray, ku: jnp.ndarray) -> jnp.ndarray:
    """``conv3x3(nearest_up2(x_src))`` via :func:`_up2_conv`.

    nearest-up2 = zero-dilation followed by a ones(2,2) box filter, and
    convolution composes: the effective 4x4 kernel is ``ku (.) ones(2,2)``
    and the lhs-dilated conv emits interleaved target-resolution output
    directly (no materialized upsample, no depth_to_space shuffle).
    """
    pad = jnp.pad
    k_eff = (
        pad(ku, ((0, 1), (0, 1), (0, 0), (0, 0)))
        + pad(ku, ((0, 1), (1, 0), (0, 0), (0, 0)))
        + pad(ku, ((1, 0), (0, 1), (0, 0), (0, 0)))
        + pad(ku, ((1, 0), (1, 0), (0, 0), (0, 0)))
    )
    return _up2_conv(x_src, k_eff)


class _Conv3x3Kernel(nn.Module):
    """Parameter shell: declares exactly ``nn.Conv``'s 3x3 kernel (same
    name, shape, initializer) without executing anything, so a parent can
    slice/merge it across modules at trace time."""

    features: int
    in_features: int
    param_dtype: Any = jnp.float32

    def setup(self) -> None:
        self.kernel = self.param(
            "kernel",
            torch_default_kernel_init(),
            (3, 3, self.in_features, self.features),
            self.param_dtype,
        )


class _Conv1Shell(nn.Module):
    """Parameter shell for a decoder node's first conv+BN (child names
    ``conv``/``bn`` — identical tree to ``UpSkipConvModule``); the parent
    owns execution order so per-source contributions from MERGED convs can
    be accumulated before the BN runs. With ``w_packed`` the BN is the
    slots-2 :class:`PackedBatchNorm` (same param/batch_stats tree as
    ``nn.BatchNorm``) consuming the W-packed accumulated activations."""

    features: int
    in_features: int
    w_packed: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self) -> None:
        self.conv = _Conv3x3Kernel(
            self.features, self.in_features, param_dtype=self.param_dtype
        )
        if self.w_packed:
            self.bn = PackedBatchNorm(
                self.features, slots=2, dtype=self.dtype
            )
        else:
            self.bn = nn.BatchNorm(
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )

    def norm(self, y: jnp.ndarray, train: bool) -> jnp.ndarray:
        y = maybe_bn_barrier(y)
        if self.w_packed:
            return self.bn(y, train=train)
        return self.bn(y, use_running_average=not train)


class _DenseNodeShell(nn.Module):
    """One dense decoder node's parameters (``conv1`` shell + ``conv2``
    ConvModule) under the node's ``x_{d}_{j}`` scope — same tree as
    ``DecoderBlock``. ``w_packed`` switches execution (not parameters) to
    the W-packed layout for the finest column."""

    features: int
    in_features: int  # conv1 total input channels (up + all skips)
    w_packed: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self) -> None:
        self.conv1 = _Conv1Shell(
            self.features,
            self.in_features,
            w_packed=self.w_packed,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        if self.w_packed:
            self.conv2 = PackedConvModule(
                self.features,
                self.features,
                w_mode=True,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )
        else:
            self.conv2 = ConvModule(
                self.features, dtype=self.dtype, param_dtype=self.param_dtype
            )


class UpSkipConv3x3(nn.Module):
    """``conv3x3(concat(nearest_up2(x), skips))`` without materializing
    the upsample: the kernel's up-slice runs at SOURCE resolution through
    :func:`~geo_deep_learning_tpu.ops.s2d.pack_up2_conv3x3_kernel` (a
    [3,3,C,4O] merged kernel whose GEMM fills all 128 MXU lanes at 4x
    fewer input reads), the skip-slice as a plain conv at the output
    resolution, and the two results sum. Exact math up to float
    reassociation: conv(concat(a, b), K) == conv(a, K[:, :, :Ca]) +
    conv(b, K[:, :, Ca:]).

    Declares EXACTLY ``nn.Conv``'s parameters (``kernel``
    [3, 3, C_up+C_skip, O], same initializer), so checkpoints, torch
    converters, and golden-parity tests are oblivious to the execution.
    The device profile motivating this: the UNet++ finest dense column
    runs 64-out-channel convs at ~24% of MXU peak (lane-limited), and
    the nearest-up2 + 320-channel concat materializations cost a further
    ~8 ms/step (bs16, 512**2).
    """

    features: int
    up_features: int
    skip_features: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x_src: jnp.ndarray, skip_cat: jnp.ndarray
    ) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            torch_default_kernel_init(),
            (3, 3, self.up_features + self.skip_features, self.features),
            self.param_dtype,
        )
        k = kernel.astype(self.dtype)
        # conv3x3(nearest_up2(x)) as a single lhs-dilated conv (see
        # _up2_conv_apply; a packed [3,3,C,4O] variant measured +9 ms/step
        # of layout copies from the d2s).
        up = _up2_conv_apply(x_src.astype(self.dtype), k[:, :, : self.up_features])
        sk = jax.lax.conv_general_dilated(
            skip_cat.astype(self.dtype),
            k[:, :, self.up_features :],
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return up + sk


class UpSkipConvModule(nn.Module):
    """``ConvModule`` twin for the fused up2+skip first conv of a decoder
    node (same param tree: ``conv`` + ``bn``)."""

    features: int
    up_features: int
    skip_features: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x_src: jnp.ndarray,
        skip_cat: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        y = UpSkipConv3x3(
            self.features,
            self.up_features,
            self.skip_features,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x_src, skip_cat)
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(y)
        return nn.relu(y)


class DecoderBlock(nn.Module):
    """Upsample x2 (nearest) → concat skips → 2x (3x3 conv + BN + ReLU).

    With ``packed=True`` the caller hands a PRE-PACKED input (upsample +
    skip concat already done in space-to-depth layout via ops/s2d.py
    helpers) with logical channel count ``packed_in_features``; both
    convs run packed and the output stays packed. Exact same math, param
    tree, and statistics as the unpacked path.
    """

    features: int
    packed: bool = False
    # packed + up2_fused: the caller hands the RAW pre-upsample tensor
    # (no skips) and conv1 computes conv3x3(nearest_up2(x)) in packed
    # layout directly (PackedConv3x3.up2_input) — the x4-tiled input
    # never exists.
    up2_fused: bool = False
    # unpacked path: run conv1 as UpSkipConvModule (factored up2+skip
    # split, exact math, same param tree) instead of
    # resize→concat→conv. Identical results; much better MXU lane
    # economics at the finest dense column.
    up2_factored: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skips: Sequence[jnp.ndarray] = (),
        train: bool = False,
        packed_in_features: int | None = None,
    ) -> jnp.ndarray:
        if self.packed:
            if skips:
                msg = "packed DecoderBlock takes a pre-concatenated input"
                raise ValueError(msg)
            xp = x
            if self.up2_fused:
                in_feats = x.shape[-1]
            elif packed_in_features is not None:
                in_feats = packed_in_features
            else:
                in_feats = x.shape[-1] // 4
            xp = PackedConvModule(
                self.features,
                in_feats,
                up2_input=self.up2_fused,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv1",
            )(xp, train=train)
            return PackedConvModule(
                self.features,
                self.features,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv2",
            )(xp, train=train)
        if skips and self.up2_factored:
            # factored first conv: the up-slice runs at SOURCE resolution
            # (full-lane [3,3,C,4O] GEMM, no materialized upsample), the
            # skip-slice as a plain conv over the concatenated skips.
            # NOTE an earlier concat-free split over ALL parts (each part
            # its own conv at OUTPUT resolution) measured SLOWER (65.8 vs
            # 60.5 ms decoder fwd+bwd) — this split is different: it
            # moves the up part to 1/4 the spatial positions and x4 the
            # output channels, which is where the win comes from.
            skip_cat = (
                jnp.concatenate(skips, axis=-1)
                if len(skips) > 1
                else skips[0]
            )
            x = UpSkipConvModule(
                self.features,
                up_features=x.shape[-1],
                skip_features=skip_cat.shape[-1],
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv1",
            )(x, skip_cat, train=train)
            return ConvModule(
                self.features, dtype=self.dtype,
                param_dtype=self.param_dtype, name="conv2"
            )(x, train=train)
        x = resize(x, scale_factor=2.0, method="nearest")
        if skips:
            # concat then conv: XLA fuses the concat into the conv read
            x = jnp.concatenate([x, *skips], axis=-1)
        x = ConvModule(
            self.features, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv1"
        )(x, train=train)
        return ConvModule(
            self.features, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv2"
        )(x, train=train)


class UnetPlusPlusDecoder(nn.Module):
    """Dense nested decoder over an encoder pyramid (smp wiring).

    Args:
        decoder_channels: backbone-column out-channels, deepest node first
            (smp convention ``(256, 128, 64, 32, 16)``); the last entry is
            the full-resolution output width.
        deep_supervision: also return the finest-level node maps.
    """

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    deep_supervision: bool = False
    packed_tail: bool = False  # run the full-res block space-to-depth packed
    # additionally pack the finest dense column (j == depth-1). The dense
    # packed kernel is 4x the FLOPs of the original (structural zeros),
    # which WINS for the <=32-channel full-res stages (<25% MXU
    # utilization) but LOSES at the 64-channel half-res column (measured
    # 62 -> 85 ms decoder fwd+bwd on v5e) — hence off by default.
    packed_column: bool = False
    # factored up2+skip first conv at every unpacked dense node (see
    # UpSkipConv3x3); exact math, same param tree — off only for A/B
    up2_factored: bool = True
    # merged-source skip convs: in the factored form, every node's skip
    # contribution is conv(source, kernel-slice) summed per source
    # (conv-of-concat == sum of per-part convs). Each shared source tensor
    # (an encoder skip or an earlier dense node) is consumed by SEVERAL
    # nodes at its level, each with a lane-limited O∈{16..64} kernel; this
    # flag runs ONE conv per source whose kernel is the trace-time concat
    # of every consumer's slice (O up to 224 at the ResNet-34 finest
    # column — full 128 MXU lanes for both forward and weight-grad),
    # consumers take channel slices of the output. Identical FLOPs, exact
    # math up to float reassociation, unchanged param tree.
    # PRECEDENCE: when packed_tail AND packed_column are both set, the
    # finest column executes space-to-depth packed and merged_skips is
    # IGNORED for the whole grid (the packed column cannot consume merged
    # slices). A/B runs comparing these flags should set packed_column
    # XOR merged_skips; a trace-time warning flags the shadowed combination.
    merged_skips: bool = True
    # W-pack (1x2) the finest dense column inside the merged-skips grid:
    # [B,H,W,64] activations execute as [B,H,W/2,128] so every conv fills
    # the 128 MXU lanes at 2x structural-zero FLOPs — measured 1.33x
    # fwd+bwd at the live bs32 shapes in isolation
    # (scripts/bench_wpack_column.py), and it cuts the BN-stats reduce
    # family 93.9 -> 74.9 ms/step in the full model (the 2x lane-padding
    # diagnosis of scripts/bench_bn_shapes.py confirmed). OFF by default:
    # end-to-end the packed graph loses 247.5 vs 217.2 ms/step because
    # XLA layout assignment inserts ~49 ms of physical copies at the
    # pack boundaries (measured r4, BASELINE.md "W-pack study").
    # Exact math, unchanged param tree; only active when up2_factored,
    # merged_skips, and not packed_column (same shadowing rules).
    wpacked_column: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, features: Sequence[jnp.ndarray], train: bool = False
    ) -> jnp.ndarray | tuple[jnp.ndarray, list[jnp.ndarray]]:
        feats = list(features)[::-1]  # deepest first (smp reverses)
        depth = len(feats) - 1  # pathway length
        if len(self.decoder_channels) != depth + 1:
            msg = (
                f"need {depth + 1} decoder channels for {len(features)} "
                f"encoder features, got {len(self.decoder_channels)}"
            )
            raise ValueError(msg)
        out_ch = list(self.decoder_channels)
        skip_ch = [f.shape[-1] for f in feats[1:]]  # encoder width per level

        def block(d: int, j: int, x, skips):
            return DecoderBlock(
                out_ch[j] if d == 0 else skip_ch[j],
                up2_factored=self.up2_factored,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"x_{d}_{j}",
            )(x, skips, train=train)

        def packed_block(d: int, j: int, xp, in_feats: int):
            return DecoderBlock(
                out_ch[j] if d == 0 else skip_ch[j],
                packed=True,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"x_{d}_{j}",
            )(xp, (), train=train, packed_in_features=in_feats)

        # with packed_tail, the finest column (j == depth-1, the nodes at
        # 1/2 input resolution) and the final full-res block execute in
        # space-to-depth layout (ops/s2d.py): identical math, 4x-wider
        # GEMMs at 1/4 the spatial positions for the MXU
        packed_j = depth - 1 if (self.packed_tail and self.packed_column) else -1
        if packed_j >= 0 and self.merged_skips:
            import logging

            logging.getLogger(__name__).warning(
                "UnetPlusPlusDecoder: packed_column takes precedence — "
                "merged_skips is ignored while the finest column runs "
                "space-to-depth packed"
            )

        dense: dict[tuple[int, int], jnp.ndarray] = {}
        node_ch: dict[tuple[int, int], int] = {}
        if self.up2_factored and self.merged_skips and packed_j < 0:
            # ---- merged-source execution of the dense grid ----
            # the finest column (j == wj) optionally runs W-packed (1x2):
            # activations live as [B, H, W/2, 2C] so the C=64 column fills
            # all 128 MXU lanes (measured 1.33x fwd+bwd at the live bs32
            # shapes, scripts/bench_wpack_column.py); exact same math and
            # param tree — kernels are block-packed at trace time
            wj = depth - 1 if self.wpacked_column else -1
            up_ch: dict[tuple[int, int], int] = {}
            shells: dict[tuple[int, int], _DenseNodeShell] = {}
            for layer in range(depth):
                for d in range(depth - layer):
                    j = d + layer
                    node_ch[(d, j)] = out_ch[j] if d == 0 else skip_ch[j]
                    up_ch[(d, j)] = (
                        feats[d].shape[-1] if layer == 0 else node_ch[(d, j - 1)]
                    )
                    c_in = up_ch[(d, j)] + feats[j + 1].shape[-1]
                    c_in += sum(node_ch[(i, j)] for i in range(d + 1, j + 1))
                    shells[(d, j)] = _DenseNodeShell(
                        node_ch[(d, j)],
                        c_in,
                        w_packed=(j == wj),
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"x_{d}_{j}",
                    )

            def src_offset(d: int, j: int, i: int) -> int:
                # conv1 input-dim offset of source block ``i`` in node
                # (d, j)'s kernel; concat order is up, dense(d+1..j, j),
                # feats[j+1] (i == j+1 addresses the encoder skip)
                off = up_ch[(d, j)]
                for ii in range(d + 1, min(i, j + 1)):
                    off += node_ch[(ii, j)]
                return off

            contrib: dict[tuple[int, int], list[jnp.ndarray]] = {}

            def run_source(src: jnp.ndarray, i: int, j: int) -> None:
                # one conv of ``src`` against the trace-time O-concat of
                # every consumer's kernel slice; consumers (d, j) for
                # d < min(i, j+1) each take a channel slice of the output
                # at the W-packed column ``src`` arrives ALREADY packed
                # (the caller packs encoder feats once; dense nodes stay
                # packed) and the conv runs the block kernel
                consumers = list(range(min(i, j + 1)))
                w = src.shape[-1] // (2 if j == wj else 1)
                slices, sizes = [], []
                for d in consumers:
                    k = shells[(d, j)].conv1.conv.kernel.astype(self.dtype)
                    off = src_offset(d, j, i)
                    slices.append(k[:, :, off : off + w])
                    sizes.append(node_ch[(d, j)])
                if j == wj:
                    # pack PER CONSUMER so each consumer's channels are a
                    # CONTIGUOUS slice of the conv output (a global pack
                    # would interleave slots across consumers and the
                    # strided re-slice materializes a copy per consumer —
                    # measured 0.85 ms each on the T(8,128) layout)
                    slices = [pack_w_conv3x3_kernel(s) for s in slices]
                    sizes = [2 * sz for sz in sizes]
                merged = (
                    jnp.concatenate(slices, axis=-1)
                    if len(slices) > 1
                    else slices[0]
                )
                y = jax.lax.conv_general_dilated(
                    src.astype(self.dtype),
                    merged,
                    (1, 1),
                    "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                o = 0
                for d, sz in zip(consumers, sizes):
                    contrib.setdefault((d, j), []).append(y[..., o : o + sz])
                    o += sz

            for j in range(depth):
                f = feats[j + 1]
                run_source(wspace_to_depth(f) if j == wj else f, j + 1, j)
            for layer in range(depth):
                for d in range(depth - layer):
                    j = d + layer
                    shell = shells[(d, j)]
                    x_up = feats[d] if layer == 0 else dense[(d, j - 1)]
                    k = shell.conv1.conv.kernel.astype(self.dtype)
                    if j == wj:
                        # fused up2+pack: emits the W-packed layout
                        # directly with the reversal-free custom VJP
                        y = _up2w_conv_apply(
                            x_up.astype(self.dtype), k[:, :, : up_ch[(d, j)]]
                        )
                    else:
                        y = _up2_conv_apply(
                            x_up.astype(self.dtype), k[:, :, : up_ch[(d, j)]]
                        )
                    for t in contrib.pop((d, j)):
                        y = y + t
                    y = nn.relu(shell.conv1.norm(y, train))
                    dense[(d, j)] = shell.conv2(y, train=train)
                    if d > 0:
                        run_source(dense[(d, j)], d, j)

            def _unpack_fine(v: jnp.ndarray) -> jnp.ndarray:
                return wdepth_to_space(v) if wj == depth - 1 else v

            if self.deep_supervision:
                ds = [
                    _unpack_fine(dense[(d, depth - 1)])
                    for d in range(depth - 1, -1, -1)
                ]
            out = DecoderBlock(
                out_ch[depth],
                packed=self.packed_tail,
                up2_fused=self.packed_tail,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"x_0_{depth}",
            )(_unpack_fine(dense[(0, depth - 1)]), (), train=train)
            if self.deep_supervision:
                return out, ds
            return out
        feat_last_packed = (
            space_to_depth(feats[depth]) if packed_j >= 0 else None
        )
        for layer in range(depth):
            for d in range(depth - layer):
                j = d + layer
                node_ch[(d, j)] = out_ch[j] if d == 0 else skip_ch[j]
                if j == packed_j:
                    x_in = feats[d] if layer == 0 else dense[(d, j - 1)]
                    parts = [nearest_up2_packed(x_in)]
                    chans = [x_in.shape[-1]]
                    for i in range(d + 1, j + 1):
                        parts.append(dense[(i, j)])  # already packed
                        chans.append(node_ch[(i, j)])
                    parts.append(feat_last_packed)
                    chans.append(feats[j + 1].shape[-1])
                    xp = packed_concat(parts, chans)
                    dense[(d, j)] = packed_block(d, j, xp, sum(chans))
                elif layer == 0:
                    dense[(d, d)] = block(d, d, feats[d], [feats[d + 1]])
                else:
                    skips = [dense[(i, j)] for i in range(d + 1, j + 1)]
                    skips.append(feats[j + 1])
                    dense[(d, j)] = block(d, j, dense[(d, j - 1)], skips)
        # final skip-free block → input resolution (stride 1); with
        # packed_tail the result stays in space-to-depth layout
        # [B, H/2, W/2, 4*out_ch] for the caller's packed head
        if self.packed_tail:
            # conv1 fuses the nearest-up2 into its packed kernel
            # (DecoderBlock.up2_fused): hand it the raw source-resolution
            # node, unpacking the finest column's output first if needed
            x_fin = (
                depth_to_space(dense[(0, depth - 1)])
                if depth - 1 == packed_j
                else dense[(0, depth - 1)]
            )
            out = DecoderBlock(
                out_ch[depth],
                packed=True,
                up2_fused=True,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"x_0_{depth}",
            )(x_fin, (), train=train)
        else:
            out = DecoderBlock(
                out_ch[depth],
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"x_0_{depth}",
            )(dense[(0, depth - 1)], (), train=train)
        if self.deep_supervision:
            ds = []
            for d in range(depth - 1, -1, -1):
                v = dense[(d, depth - 1)]
                ds.append(depth_to_space(v) if depth - 1 == packed_j else v)
            return out, ds
        return out
