"""Tensor utilities (JAX, channel-last).

Capability parity with the reference's ``utils/tensors.py``
(/root/reference/geo_deep_learning/utils/tensors.py:10-76), redesigned for
TPU: arrays are NHWC / HWC (channel-last, XLA:TPU's preferred layout) and
``mean``/``std`` are explicit per-channel vectors rather than pre-reshaped
``(C,1,1)`` tensors (fixes the broadcast quirk noted in SURVEY.md §7).

All functions are pure jnp ops so they fuse under ``jit`` — on TPU the
normalize/standardize chain is a single VPU pass fused into the surrounding
graph instead of separate CUDA kernel launches.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalization(
    input_tensor: jnp.ndarray,
    image_min: float = 0.0,
    image_max: float = 255.0,
    norm_min: float = 0.0,
    norm_max: float = 1.0,
) -> jnp.ndarray:
    """Min-max rescale from [image_min, image_max] to [norm_min, norm_max].

    Mirrors reference ``normalization`` (utils/tensors.py:10-23): a pure
    affine map; values outside the source range are NOT clipped.
    """
    scale = (norm_max - norm_min) / (image_max - image_min)
    return (input_tensor - image_min) * scale + norm_min


def standardization(
    input_tensor: jnp.ndarray,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    channel_axis: int = -1,
) -> jnp.ndarray:
    """Per-channel standardization: ``(x - mean) / std``.

    ``mean``/``std`` are 1-D per-channel vectors aligned with
    ``channel_axis`` (default: last, NHWC). Reference equivalent:
    utils/tensors.py:25-35 (which assumed NCHW and ``(C,1)`` stats).
    """
    mean = jnp.asarray(mean, dtype=input_tensor.dtype)
    std = jnp.asarray(std, dtype=input_tensor.dtype)
    if mean.ndim != 1 or std.ndim != 1:
        msg = f"mean/std must be 1-D per-channel vectors, got {mean.shape}/{std.shape}"
        raise ValueError(msg)
    axis = channel_axis % input_tensor.ndim
    shape = [1] * input_tensor.ndim
    shape[axis] = -1
    return (input_tensor - mean.reshape(shape)) / std.reshape(shape)


def denormalization(
    image: jnp.ndarray,
    mean: jnp.ndarray | float | None = None,
    std: jnp.ndarray | float | None = None,
    data_type_max: float = 255.0,
    channel_axis: int = -1,
) -> jnp.ndarray:
    """Invert standardization+normalization and quantize to uint8 for viz.

    Reference equivalent: utils/tensors.py:38-56.
    """
    if mean is not None and std is not None:
        mean = jnp.atleast_1d(jnp.asarray(mean, dtype=image.dtype))
        std = jnp.atleast_1d(jnp.asarray(std, dtype=image.dtype))
        axis = channel_axis % image.ndim
        shape = [1] * image.ndim
        shape[axis] = -1
        image = image * std.reshape(shape) + mean.reshape(shape)
    return jnp.clip(image * data_type_max, 0, data_type_max).astype(jnp.uint8)


def manage_bands(
    image: jnp.ndarray,
    band_indices: list[int] | None = None,
    channel_axis: int = -1,
) -> jnp.ndarray:
    """Select spectral bands by index along the channel axis.

    Reference equivalent: utils/tensors.py:59-76 (which selected along
    dim 0 of CHW); here the channel axis defaults to last (HWC/NHWC).
    """
    if band_indices is None:
        return image
    axis = channel_axis % image.ndim
    bands = image.shape[axis]
    if max(band_indices) >= bands:
        msg = (
            f"Band index {max(band_indices)} is out of range "
            f"for image with {bands} bands"
        )
        raise ValueError(msg)
    return jnp.take(image, jnp.asarray(band_indices, dtype=jnp.int32), axis=axis)
