"""Spatial resize ops for NHWC tensors.

Replaces the reference's ``models/utils.py:96-137`` ``resize`` wrapper
around ``F.interpolate``. Two coordinate conventions are supported because
pretrained-weight parity requires matching torch exactly:

- ``align_corners=False`` (half-pixel centers): equals
  ``jax.image.resize(method="bilinear")``, which XLA lowers to fused
  gather/dot ops on TPU.
- ``align_corners=True``: corner-aligned sampling, implemented with an
  explicit separable gather (torch semantics; used by UperNet/FCN heads
  in many configs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _corner_aligned_1d(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    """Linear interp along ``axis`` with align_corners=True coordinates."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if in_size == 1:
        reps = [1] * x.ndim
        reps[axis] = out_size
        return jnp.tile(x, reps)
    # torch align_corners=True: src = dst * (in-1)/(out-1)
    pos = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_size - 2)
    frac = pos - lo.astype(jnp.float32)
    a = jnp.take(x, lo, axis=axis)
    b = jnp.take(x, lo + 1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    frac = frac.reshape(shape).astype(x.dtype)
    return a * (1 - frac) + b * frac


def resize(
    x: jnp.ndarray,
    size: tuple[int, int] | None = None,
    scale_factor: float | tuple[float, float] | None = None,
    method: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize NHWC (or HWC) images to ``size`` or by ``scale_factor``."""
    if (size is None) == (scale_factor is None):
        msg = "exactly one of size / scale_factor required"
        raise ValueError(msg)
    batched = x.ndim == 4
    if not batched:
        x = x[None]
    h, w = x.shape[1], x.shape[2]
    if size is None:
        if not isinstance(scale_factor, (tuple, list)):
            scale_factor = (scale_factor, scale_factor)
        size = (int(h * scale_factor[0]), int(w * scale_factor[1]))
    size = (int(size[0]), int(size[1]))

    if method == "nearest":
        out = _nearest(x, size)
    elif method == "bilinear" and align_corners:
        out = _corner_aligned_1d(_corner_aligned_1d(x, size[0], 1), size[1], 2)
    elif method == "bilinear":
        # exact integer-factor fast paths: half-pixel 2x up is a fixed
        # [0.25, 0.75] phase blend and 2x down is a pair average — pure
        # elementwise + reshape, where jax.image.resize lowers to
        # dot/transpose chains (profiled at ~6 ms/step in the DOFA neck)
        if size == (2 * h, 2 * w):
            out = _half_pixel_up2(_half_pixel_up2(x, 1), 2)
        elif (h, w) == (2 * size[0], 2 * size[1]):
            out = _half_pixel_down2(x)
        else:
            # antialias=False matches torch F.interpolate's plain bilinear
            # (torch does not low-pass filter on downscale unless
            # antialias=True)
            out = jax.image.resize(
                x,
                (x.shape[0], size[0], size[1], x.shape[3]),
                method="bilinear",
                antialias=False,
            )
    else:
        msg = f"unsupported resize method: {method}"
        raise ValueError(msg)
    return out if batched else out[0]


def _half_pixel_up2(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 2x half-pixel bilinear upsample along ``axis``.

    dst 2i sits at src i - 0.25 and dst 2i+1 at src i + 0.25, so the two
    output phases are fixed [0.25, 0.75] blends of adjacent inputs with
    edge clamping — identical numerics to
    ``jax.image.resize(method="bilinear", antialias=False)``.
    """
    n = x.shape[axis]
    lo = [slice(None)] * x.ndim
    hi = [slice(None)] * x.ndim
    first = [slice(None)] * x.ndim
    last = [slice(None)] * x.ndim
    lo[axis], hi[axis] = slice(0, n - 1), slice(1, n)
    first[axis], last[axis] = slice(0, 1), slice(n - 1, n)
    up = jnp.concatenate([x[tuple(first)], x[tuple(lo)]], axis=axis)
    dn = jnp.concatenate([x[tuple(hi)], x[tuple(last)]], axis=axis)
    even = 0.25 * up + 0.75 * x
    odd = 0.75 * x + 0.25 * dn
    inter = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n
    return inter.reshape(shape).astype(x.dtype)


def _half_pixel_down2(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x half-pixel bilinear downsample (both spatial axes): dst i
    sits at src 2i + 0.5 — the average of each input pair."""
    b, h, w, c = x.shape
    v = x.reshape(b, h // 2, 2, w // 2, 2, c)
    quarter = jnp.asarray(0.25, v.dtype)
    return (
        (v[:, :, 0, :, 0] + v[:, :, 0, :, 1] + v[:, :, 1, :, 0] + v[:, :, 1, :, 1])
        * quarter
    ).astype(x.dtype)


def _nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor with torch's ``F.interpolate(mode='nearest')``
    index rule (floor of dst * in/out) — used for mask resizing where
    label values must be preserved exactly.

    Integer up/down factors avoid gathers entirely: an exact k× upsample
    is a broadcast+reshape and an exact k× downsample is a strided slice
    (both match the torch index rule), which XLA lowers to cheap
    copies/slices instead of gather engines — this is the hot path for the
    UNet++ decoder's 2x upsamples.
    """
    b, h, w, c = x.shape
    oh, ow = size
    if oh % h == 0 and ow % w == 0:
        kh, kw = oh // h, ow // w
        if kh == 1 and kw == 1:
            return x
        out = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, kh, w, kw, c))
        return out.reshape(b, oh, ow, c)
    if h % oh == 0 and w % ow == 0:
        return x[:, :: h // oh, :: w // ow]
    rows = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[:, rows][:, :, cols]
