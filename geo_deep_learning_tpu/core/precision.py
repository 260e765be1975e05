"""Precision policy: bf16 compute, f32 parameters and optimizer state.

TPU-native replacement for the reference's NVIDIA AMP ``precision:
"16-mixed"`` (reference configs/dofa_config_RGB.yaml:12). bfloat16 is the
TPU MXU's native input dtype and shares float32's exponent range, so no
loss scaling is needed — the policy is just "cast activations to bf16 on
the way into the model, keep params/optimizer state and the loss in f32".
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import jax.numpy as jnp


class Precision(str, enum.Enum):
    """User-facing precision names (config surface)."""

    BF16_MIXED = "bf16-mixed"  # bf16 compute, f32 params — TPU default
    F32 = "32-true"  # full f32 (debugging / parity tests)


@dataclass(frozen=True)
class PrecisionPolicy:
    """Dtypes threaded through model construction and the train step."""

    compute_dtype: jnp.dtype
    param_dtype: jnp.dtype
    output_dtype: jnp.dtype  # logits/loss dtype

    @classmethod
    def create(cls, precision: Precision | str = Precision.BF16_MIXED) -> "PrecisionPolicy":
        precision = Precision(precision)
        if precision == Precision.BF16_MIXED:
            return cls(jnp.bfloat16, jnp.float32, jnp.float32)
        return cls(jnp.float32, jnp.float32, jnp.float32)

    def cast_input(self, x):
        """Cast a floating-point input batch to the compute dtype."""
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(self.compute_dtype)
        return x
