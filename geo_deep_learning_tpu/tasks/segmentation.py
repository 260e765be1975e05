"""Segmentation task specs binding models to training wiring."""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp

from geo_deep_learning_tpu.training.task import SegmentationTask


class SegmentationTaskSpec:
    """Common plumbing: holds the SegmentationTask + optimizer/scheduler
    dicts + warm-start / freeze settings consumed by ``Trainer.fit``."""

    def __init__(
        self,
        model,
        *,
        num_classes: int,
        loss: Callable,
        optimizer: dict | None = None,
        scheduler: dict | None = None,
        scheduler_config: dict | None = None,
        max_samples: int = 3,
        class_labels: Sequence[str] | None = None,
        class_colors: Sequence[str] | None = None,
        weights_from_checkpoint_path: str | None = None,
        load_parts: list[str] | None = None,
        freeze_layers: list[str] | None = None,
        torch_weights: dict | None = None,
        aux_loss_weight: float = 0.4,
        uses_wavelengths: bool | None = None,
        wavelengths: list[float] | None = None,
        **extra: object,  # tolerate unknown keys (reference **kwargs)
    ) -> None:
        if extra:
            import logging

            logging.getLogger(__name__).debug("ignoring task args: %s", list(extra))
        self.task = SegmentationTask(
            model=model,
            loss=loss,
            num_classes=num_classes,
            class_labels=list(class_labels) if class_labels else None,
            class_colors=list(class_colors) if class_colors else None,
            aux_loss_weight=aux_loss_weight,
            uses_wavelengths=uses_wavelengths,
            default_wavelengths=list(wavelengths) if wavelengths else None,
        )
        self.optimizer = optimizer
        self.scheduler = scheduler
        self.scheduler_config = scheduler_config or {"interval": "epoch"}
        self.max_samples = max_samples
        self.weights_from_checkpoint_path = weights_from_checkpoint_path
        self.load_parts = load_parts
        self.freeze_layers = freeze_layers
        self.torch_weights = torch_weights

    def fit_kwargs(self) -> dict[str, Any]:
        return {
            "optimizer": self.optimizer,
            "scheduler": self.scheduler,
            "weights_from_checkpoint_path": self.weights_from_checkpoint_path,
            "load_parts": self.load_parts,
            "freeze_layers": self.freeze_layers,
            "torch_weights": self.torch_weights,
        }


def _dtype(precision: str | None):
    return jnp.bfloat16 if precision in (None, "bf16-mixed", "16-mixed") else jnp.float32


class SegmentationUnetPlus(SegmentationTaskSpec):
    """Reference ``SegmentationUnetPlus`` (segmentation_unetplus.py:34)."""

    def __init__(
        self,
        encoder: str = "resnet34",
        image_size: tuple[int, int] = (512, 512),
        in_channels: int = 3,
        num_classes: int = 1,
        max_samples: int = 3,
        loss: Callable | None = None,
        weights: str | None = None,
        precision: str | None = None,
        decoder_channels: tuple[int, ...] = (256, 128, 64, 32, 16),
        **kwargs: Any,
    ) -> None:
        from geo_deep_learning_tpu.models.segmentation.unetpp import UnetPlusPlus
        from geo_deep_learning_tpu.ops.losses import DiceLoss

        del image_size, in_channels  # NHWC models infer both from input
        self.weights = weights  # "imagenet" → pretrained conversion (convert.py)
        model = UnetPlusPlus(
            encoder_name=encoder,
            num_classes=num_classes,
            decoder_channels=tuple(decoder_channels),
            dtype=_dtype(precision),
        )
        super().__init__(
            model,
            num_classes=num_classes,
            loss=loss or DiceLoss(mode="binary" if num_classes == 1 else "multiclass"),
            max_samples=max_samples,
            uses_wavelengths=False,
            **kwargs,
        )


class SegmentationSegformer(SegmentationTaskSpec):
    """Reference ``SegmentationSegformer`` (segmentation_segformer.py:32)."""

    def __init__(
        self,
        encoder: str = "mit_b0",
        image_size: tuple[int, int] = (512, 512),
        in_channels: int = 3,
        num_classes: int = 1,
        max_samples: int = 3,
        loss: Callable | None = None,
        use_dynamic_encoder: bool = False,
        weights: str | None = None,
        precision: str | None = None,
        **kwargs: Any,
    ) -> None:
        from geo_deep_learning_tpu.models.segmentation.segformer import SegFormer
        from geo_deep_learning_tpu.ops.losses import DiceLoss

        del image_size, in_channels
        self.weights = weights
        model = SegFormer(
            encoder_name=encoder,
            num_classes=num_classes,
            use_dynamic_encoder=use_dynamic_encoder,
            dtype=_dtype(precision),
        )
        super().__init__(
            model,
            num_classes=num_classes,
            loss=loss or DiceLoss(mode="binary" if num_classes == 1 else "multiclass"),
            max_samples=max_samples,
            uses_wavelengths=False,
            **kwargs,
        )


class SegmentationDOFA(SegmentationTaskSpec):
    """Reference ``SegmentationDOFA`` (segmentation_dofa.py:33): dual loss
    main + 0.4·aux, wavelength-conditioned forward."""

    def __init__(
        self,
        encoder: str = "dofa_base",
        pretrained: bool = True,
        image_size: tuple[int, int] = (512, 512),
        num_classes: int = 1,
        max_samples: int = 3,
        loss: Callable | None = None,
        precision: str | None = None,
        **kwargs: Any,
    ) -> None:
        from geo_deep_learning_tpu.models.segmentation.dofa import DOFASegmentation
        from geo_deep_learning_tpu.ops.losses import DiceLoss

        del image_size
        self.pretrained = pretrained  # HF weight conversion handled separately
        model = DOFASegmentation(
            encoder_name=encoder,
            num_classes=num_classes,
            dtype=_dtype(precision),
        )
        super().__init__(
            model,
            num_classes=num_classes,
            loss=loss or DiceLoss(mode="binary" if num_classes == 1 else "multiclass"),
            max_samples=max_samples,
            aux_loss_weight=0.4,
            uses_wavelengths=True,
            **kwargs,
        )
