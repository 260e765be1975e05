"""Fused on-device preprocessing: uint8 decode → normalize → standardize.

Why this exists (BASELINE.json north star: "fused Pallas
decode/normalize/augment kernels on 512² patches"): the reference
normalizes on the host and ships float32 patches over PCIe
(csv_dataset.py:149-153). Shipping the raw uint8 pixels instead cuts
host→device bandwidth 4× — the input pipeline's scarcest resource — and
this kernel performs the dtype conversion + min-max normalization +
per-channel standardization in one VMEM pass on the VPU:

    out = ((x / 255) - mean) / std

Layout: one grid step per batch element; the [H, W, C] tile lives in VMEM
(512·512·4 bytes ≈ 1 MB as uint8, 4 MB as f32 output — well under the
~16 MB budget). ``mean``/``std`` are per-sample per-channel vectors
(multi-sensor batches may mix normalization stats).

``fused_normalize_standardize`` dispatches to the Pallas kernel on TPU
and to an identical jnp composition elsewhere (CPU tests, interpret-free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INTERPRET = False  # True in tests: pallas interpreter mode on CPU


def _kernel(img_ref, mean_ref, std_ref, out_ref):
    i = pl.program_id(0)
    # Mosaic has no direct u8→f32 cast; widen through int32 first
    x = img_ref[...].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    mean = mean_ref[i, :]  # [W·C] row, broadcasts over H
    inv = std_ref[i, :]  # pre-inverted on the wrapper side
    out_ref[...] = ((x - mean) * inv).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _pallas_call(image, mean, std, out_dtype):
    b, h, w, c = image.shape
    from jax.experimental.pallas import tpu as pltpu

    # Layout: fold (W, C) into one lane axis. With C=3 the natural NHWC
    # block would put 3 in the 128-wide lane dimension (97% waste and a
    # Mosaic stress case); W·C (e.g. 512·3 = 1536 = 12×128) tiles cleanly.
    img3 = image.reshape(b, h, w * c)
    mean_row = jnp.tile(mean, (1, w)).astype(jnp.float32)  # [B, W·C]
    inv_row = jnp.tile(1.0 / std, (1, w)).astype(jnp.float32)
    out = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w * c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w * c), out_dtype),
        interpret=_INTERPRET,
    )(img3, mean_row, inv_row)
    return out.reshape(b, h, w, c)


def _jnp_reference(image, mean, std, out_dtype):
    x = image.astype(jnp.float32) / 255.0
    x = (x - mean[:, None, None, :]) / std[:, None, None, :]
    return x.astype(out_dtype)


def fused_normalize_standardize(
    image: jnp.ndarray,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """uint8 (or raw-float) [B,H,W,C] + per-sample [B,C] stats → normalized.

    Uses the Pallas kernel on TPU backends; jnp composition elsewhere.
    """
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    if mean.ndim == 1:
        mean = jnp.broadcast_to(mean[None], (image.shape[0], mean.shape[0]))
        std = jnp.broadcast_to(std[None], (image.shape[0], std.shape[0]))
    if jax.default_backend() in ("tpu",) or _is_axon():
        try:
            # multi-chip: per-device over the batch via shard_map — the
            # pallas custom call is opaque to GSPMD (ops/pallas/spmd.py)
            from jax.sharding import PartitionSpec as P

            from geo_deep_learning_tpu.ops.pallas.spmd import maybe_shard_map

            spec = P("data")
            return maybe_shard_map(
                lambda i, m, s: _pallas_call(i, m, s, out_dtype),
                (image, mean, std), (spec, spec, spec), spec,
            )
        except Exception:  # pallas unavailable → identical jnp path
            pass
    return _jnp_reference(image, mean, std, out_dtype)


def _is_axon() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False
