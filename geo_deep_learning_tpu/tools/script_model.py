"""Deployment model wrappers (API-parity path).

Reference equivalent: ``tools/script_model.py:10-86`` (``ScriptModel`` /
``SegmentationScriptModel``: traced eval model with normalization and
softmax/sigmoid folded in). The TPU-native artifact is serialized
StableHLO (see :mod:`geo_deep_learning_tpu.inference.export`); these
classes keep the reference's object-style surface on top of it.
"""

from __future__ import annotations

from typing import Sequence

from geo_deep_learning_tpu.inference.export import (
    export_model,
    load_exported,
    make_serving_fn,
)


class ScriptModel:
    """Callable serving model: raw 0-255 imagery → class probabilities."""

    def __init__(
        self,
        model_apply,
        variables: dict,
        input_shape: tuple[int, ...],
        mean: Sequence[float],
        std: Sequence[float],
        num_classes: int,
        wavelengths: Sequence[float] | None = None,
    ) -> None:
        self.input_shape = tuple(input_shape)
        self.serving_fn = make_serving_fn(
            model_apply,
            variables,
            mean=mean,
            std=std,
            num_classes=num_classes,
            wavelengths=wavelengths,
        )

    def __call__(self, image):
        return self.serving_fn(image)

    def save(self, path: str, batch_polymorphic: bool = True) -> str:
        """Serialize to a StableHLO artifact (TorchScript-file analog)."""
        return str(
            export_model(
                self.serving_fn,
                self.input_shape,
                path,
                batch_polymorphic=batch_polymorphic,
            )
        )

    @staticmethod
    def load(path: str):
        return load_exported(path)


class SegmentationScriptModel(ScriptModel):
    """Alias kept for reference naming (output unpacking of the
    SegmentationOutput NamedTuple is handled inside ``make_serving_fn``)."""
