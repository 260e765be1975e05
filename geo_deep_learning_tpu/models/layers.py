"""Shared model primitives (Flax, NHWC).

Native equivalents of the reference's ``models/utils.py`` building blocks
(ConvModule :10-52, PPM :55-93) plus transformer utilities (DropPath,
truncated-normal init) the reference pulls from timm. Everything takes
``dtype`` (compute) / ``param_dtype`` so the bf16-mixed policy threads
through uniformly; BatchNorm statistics are always f32.

Sync-BN note: under GSPMD jit with a batch-sharded input, ``nn.BatchNorm``'s
batch reduction is a *global* reduction (XLA inserts the cross-replica
collectives), so the reference's ``sync_batchnorm: true`` behavior is the
default here — no wrapper needed.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from geo_deep_learning_tpu.ops.resize import resize

Dtype = Any


def trunc_normal_init(stddev: float = 0.02):
    return nn.initializers.truncated_normal(stddev=stddev, lower=-2.0, upper=2.0)


def torch_default_kernel_init():
    """torch ``nn.Conv2d``/``nn.Linear`` default weight init.

    ``kaiming_uniform_(a=sqrt(5))`` == U(±sqrt(1/fan_in)), and flax's
    ``variance_scaling(1/3, "fan_in", "uniform")`` draws
    U(±sqrt(3·(1/3)/fan_in)) — identical. The quality-parity study
    (BASELINE.md "Quality parity", runs_evidence/parity_r4/) measured the
    flax ``lecun_normal`` default costing UNet++ 3.2 val-mIoU points vs
    the torch reference on the same recipe; this init closes the gap
    exactly (0.4762 vs 0.4749 torch).
    """
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_default_bias_init(fan_in: int):
    """torch ``nn.Conv2d``/``nn.Linear`` default bias init:
    U(±1/sqrt(fan_in)) with fan_in of the WEIGHT (in_features × receptive
    field)."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(
            key, shape, dtype, minval=-bound, maxval=bound
        )

    return init


def kaiming_normal_conv_out(groups: int = 1):
    """Reference MiT conv init (mix_transformer.py:49-54):
    N(0, sqrt(2/fan_out)) with fan_out = kh·kw·out_ch / groups. Flax's
    ``variance_scaling`` cannot express the groups division, so compute
    from the HWIO kernel shape directly."""

    def init(key, shape, dtype=jnp.float32):
        fan_out = shape[0] * shape[1] * shape[3] // groups
        std = math.sqrt(2.0 / fan_out)
        return std * jax.random.normal(key, shape, dtype)

    return init


def xavier_uniform_flat(fan_in: int, fan_out: int):
    """torch ``xavier_uniform_`` with EXPLICIT fans — needed where the
    torch weight is a flattened matrix (e.g. MHA in_proj [3D, D]) but the
    flax param is factored ([D, H, hd] per q/k/v), so shape-derived fans
    would differ."""
    bound = math.sqrt(6.0 / (fan_in + fan_out))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(
            key, shape, dtype, minval=-bound, maxval=bound
        )

    return init


def maybe_bn_barrier(x: jnp.ndarray) -> jnp.ndarray:
    """A/B experiment hook (GDL_BN_BARRIER=1): optimization_barrier
    between a conv and its BatchNorm.

    The round-5 disjoint accounting (BASELINE.md) showed conv+stats
    fusions running at 65% of their lane cap while conv-only fusions hit
    90% — the fused stats epilogue drags the conv schedule. The barrier
    forces XLA to materialize the conv output before the stats reduce
    (decoupling them into separate kernels at the cost of one extra HBM
    read per tensor). Off by default; flipped via env for measurement.
    """
    import os

    if os.environ.get("GDL_BN_BARRIER") == "1":
        return jax.lax.optimization_barrier(x)
    return x


class ConvModule(nn.Module):
    """Conv (or transpose conv) + optional BatchNorm + optional activation.

    Reference equivalent: ``models/utils.py:10-52``. The reference never
    re-initializes these convs, so they carry torch's DEFAULT init
    (kaiming_uniform(a=√5) + uniform bias) — matched here; override via
    ``kernel_init``. (The neck's ``xavier_init`` helper exists in the
    reference but its ``init_weights()`` is never called — verified by
    grep, quality-parity protocol relies on this.)
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    dilation: tuple[int, int] = (1, 1)
    use_norm: bool = True
    act: Callable | None = nn.relu
    transpose: bool = False
    use_bias: bool | None = None  # default: bias iff no norm
    kernel_init: Callable | None = None  # default: torch_default_kernel_init
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        use_bias = self.use_bias if self.use_bias is not None else not self.use_norm
        conv_cls = nn.ConvTranspose if self.transpose else nn.Conv
        fan_in = x.shape[-1] * self.kernel_size[0] * self.kernel_size[1]
        x = conv_cls(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            kernel_dilation=self.dilation,
            use_bias=use_bias,
            kernel_init=self.kernel_init or torch_default_kernel_init(),
            bias_init=torch_default_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        if self.use_norm:
            x = maybe_bn_barrier(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="bn",
            )(x)
        if self.act is not None:
            x = self.act(x)
        return x




class PPM(nn.Module):
    """Pyramid Pooling Module (PSPNet-style), reference ``models/utils.py:55-93``.

    Adaptive-average-pool the input to each scale in ``pool_scales``,
    project with 1x1 ConvModule, and bilinearly upsample back.
    """

    pool_scales: Sequence[int] = (1, 2, 3, 6)
    channels: int = 256
    align_corners: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list[jnp.ndarray]:
        h, w = x.shape[1], x.shape[2]
        outs = []
        for scale in self.pool_scales:
            pooled = adaptive_avg_pool(x, (scale, scale))
            proj = ConvModule(
                self.channels,
                kernel_size=(1, 1),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"pool{scale}",
            )(pooled, train=train)
            outs.append(
                resize(
                    proj, size=(h, w), method="bilinear", align_corners=self.align_corners
                )
            )
        return outs


def adaptive_avg_pool(x: jnp.ndarray, output_size: tuple[int, int]) -> jnp.ndarray:
    """torch ``AdaptiveAvgPool2d`` semantics on NHWC.

    Bin i spans [floor(i*In/Out), ceil((i+1)*In/Out)); implemented with a
    cumulative-sum (integral image) so bins of unequal width stay exact and
    the whole op is a few VPU passes instead of a gather per bin.
    """
    b, h, w, c = x.shape
    oh, ow = output_size
    if h % oh == 0 and w % ow == 0:
        # fast path: equal bins → plain mean-pool reshape
        return x.reshape(b, oh, h // oh, ow, w // ow, c).mean(axis=(2, 4))
    # integral image along H and W (f32 accumulation)
    xi = x.astype(jnp.float32)
    cs = jnp.cumsum(jnp.cumsum(xi, axis=1), axis=2)
    cs = jnp.pad(cs, ((0, 0), (1, 0), (1, 0), (0, 0)))
    ys = (jnp.arange(oh) * h) // oh
    ye = -((-(jnp.arange(oh) + 1) * h) // oh)  # ceil
    xs = (jnp.arange(ow) * w) // ow
    xe = -((-(jnp.arange(ow) + 1) * w) // ow)
    # sums over each bin via inclusion-exclusion on the integral image
    a = cs[:, ye][:, :, xe]  # [B, oh, ow, C]
    b_ = cs[:, ys][:, :, xe]
    c_ = cs[:, ye][:, :, xs]
    d = cs[:, ys][:, :, xs]
    sums = a - b_ - c_ + d
    areas = ((ye - ys)[:, None] * (xe - xs)[None, :]).astype(jnp.float32)
    return (sums / areas[None, :, :, None]).astype(x.dtype)


class DropPath(nn.Module):
    """Stochastic depth (per-sample residual drop), timm equivalent."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if not train or self.rate == 0.0:
            return x
        import jax

        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return x / keep * mask


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    return x.mean(axis=(1, 2), keepdims=keepdims)
