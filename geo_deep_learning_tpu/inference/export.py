"""Deployment export: serialized StableHLO with preprocessing baked in.

Reference equivalent: ``tools/script_model.py:10-86`` (``ScriptModel`` /
``SegmentationScriptModel``): jit-trace the eval model and prepend
normalization/standardization and append softmax/sigmoid so the deployed
artifact consumes raw uint8-range imagery. Here the trace is
``jax.export`` → StableHLO bytes, which any XLA runtime (TPU/GPU/CPU,
TF-Serving via jax2tf, IREE) can load — the portable analog of a
TorchScript file.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def bake_dofa_embedding(
    variables: dict,
    wavelengths: Sequence[float],
    in_channels: int,
    variant: str = "dofa_base",
    convert_to_16: bool = False,
):
    """Pre-compute DOFA's λ-generated patch-embed (kernel, bias) ONCE.

    XLA does NOT constant-fold the wavelength weight generator even when
    λ is a compile-time constant (measured: identical fusion counts with
    λ closed over vs passed in), so static-λ serving pays the 128-token
    generator transformer every call unless its output is baked here and
    threaded through ``baked_embed`` (ROADMAP #9).
    """
    from geo_deep_learning_tpu.models.encoders.dofa import (
        DOFAv2Embedding,
        dofa_configs,
    )

    cfg = dofa_configs[variant]
    embed = DOFAv2Embedding(
        embed_dim=cfg.embed_dim,
        kernel_size=cfg.patch_size,
        convert_to_16=convert_to_16,
    )
    params = variables["params"]["encoder"]["patch_embed"]
    wv = jnp.asarray(wavelengths, jnp.float32)
    kernel, bias = embed.apply(
        {"params": params}, in_channels, wv, method=DOFAv2Embedding.generate
    )
    return jax.device_get(kernel), jax.device_get(bias)


def make_serving_fn(
    model_apply,
    variables: dict,
    mean: Sequence[float],
    std: Sequence[float],
    num_classes: int,
    scale_max: float = 255.0,
    wavelengths: Sequence[float] | None = None,
    baked_embed: tuple | None = None,
):
    """Raw image batch [B, H, W, C] (0..255 floats) → class probabilities.

    Mirrors ScriptModel.forward (script_model.py:43-59): normalize →
    standardize → model → softmax (multiclass) / sigmoid (binary).

    ``baked_embed``: pre-baked DOFA patch-embed weights from
    :func:`bake_dofa_embedding` — the exported graph then carries the
    generated conv kernel as a literal constant instead of re-running the
    weight-generator transformer per inference call.
    """
    mean_arr = jnp.asarray(mean, jnp.float32)
    std_arr = jnp.asarray(std, jnp.float32)
    wv = jnp.asarray(wavelengths, jnp.float32) if wavelengths is not None else None
    if baked_embed is not None:
        baked_embed = tuple(jnp.asarray(b) for b in baked_embed)

    def serve(image: jnp.ndarray) -> jnp.ndarray:
        x = image.astype(jnp.float32) / scale_max
        x = (x - mean_arr) / std_arr
        if baked_embed is not None:
            out = model_apply(variables, x, train=False, baked_embed=baked_embed)
        elif wv is not None:
            out = model_apply(variables, x, wv, train=False)
        else:
            out = model_apply(variables, x, train=False)
        logits = out.out if hasattr(out, "out") else out
        if num_classes == 1:
            return jax.nn.sigmoid(logits)
        return jax.nn.softmax(logits, axis=-1)

    return serve


def export_model(
    serving_fn,
    input_shape: tuple[int, ...],
    output_path: str | Path,
    batch_polymorphic: bool = True,
) -> Path:
    """Serialize the serving function to a StableHLO artifact (.shlo).

    ``batch_polymorphic=True`` exports with a symbolic batch dimension so
    one artifact serves any batch size.
    """
    from jax import export as jax_export

    if batch_polymorphic:
        scope = jax_export.SymbolicScope()
        dims = jax_export.symbolic_shape("b", scope=scope)
        shape = (dims[0], *input_shape[1:])
    else:
        shape = input_shape
    spec = jax.ShapeDtypeStruct(shape, jnp.float32)
    exported = jax_export.export(jax.jit(serving_fn))(spec)
    blob = exported.serialize()
    out = Path(output_path)
    out.write_bytes(blob)
    return out


def load_exported(path: str | Path):
    """Deserialize an exported artifact; returns a callable."""
    from jax import export as jax_export

    exported = jax_export.deserialize(Path(path).read_bytes())
    return lambda x: exported.call(jnp.asarray(x, jnp.float32))
