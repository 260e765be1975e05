"""Segmentation task: binds a model assembly, a loss, and batch semantics.

Functional counterpart of the reference's three LightningModules
(tasks_with_models/segmentation_{unetplus,segformer,dofa}.py). Where the
reference duplicates ~390 lines per task, here one task class covers all
three because the differences are data, not code:

- whether the forward consumes ``wavelengths`` (DOFA),
- the aux-loss weight (DOFA: main + 0.4·aux, ref segmentation_dofa.py:226-228),
- binary (C==1, sigmoid>0.5) vs multiclass (argmax) inference
  (ref segmentation_unetplus.py:223-320).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from geo_deep_learning_tpu.models.segmentation.dofa import DOFASegmentation


@dataclass
class SegmentationTask:
    model: nn.Module
    loss: Callable
    num_classes: int = 1
    aux_loss_weight: float = 0.4  # applied only when the model emits aux
    threshold: float = 0.5
    class_labels: Sequence[str] | None = None
    class_colors: Sequence[str] | None = None
    monitor: str = "val_loss"
    uses_wavelengths: bool | None = None  # None = infer from model type
    default_wavelengths: Sequence[float] | None = None  # batch fallback

    def __post_init__(self):
        if self.uses_wavelengths is None:
            self.uses_wavelengths = isinstance(self.model, DOFASegmentation)

    # number of evaluation classes: binary tasks evaluate {bg, fg}
    # (reference quirk: num_classes==1 → 2-class IoU, segmentation_dofa.py:70)
    @property
    def eval_classes(self) -> int:
        return self.num_classes + 1 if self.num_classes == 1 else self.num_classes

    def model_args(self, batch: dict) -> tuple:
        if self.uses_wavelengths:
            wv = batch.get("wavelengths")
            if wv is None and self.default_wavelengths is not None:
                wv = jnp.asarray(self.default_wavelengths, jnp.float32)
            return (batch["image"], wv)
        return (batch["image"],)

    def init_variables(self, rng: jax.Array, batch: dict) -> dict:
        # Initialize on the host CPU backend: eager init through a remote
        # TPU dispatches every layer initializer separately, and a jitted
        # init program is large and slow for the remote compiler — the CPU
        # compiles it locally in seconds. The trainer re-places the state
        # onto the mesh afterwards.
        import numpy as np

        args = tuple(
            np.asarray(a) if hasattr(a, "shape") else a
            for a in self.model_args(batch)
        )
        init = jax.jit(lambda r, *a: self.model.init(r, *a, train=False))
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            return init(rng, *args)
        with jax.default_device(cpu):
            return init(rng, *args)

    def forward(
        self,
        variables: dict,
        batch: dict,
        train: bool = False,
        rngs: dict | None = None,
        mutable: list | bool = False,
    ):
        return self.model.apply(
            variables, *self.model_args(batch), train=train, rngs=rngs, mutable=mutable
        )

    def compute_loss(
        self,
        output,
        mask: jnp.ndarray,
        sample_weights: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """Main (+0.4·aux) loss; ``sample_weights`` ([B], 0/1) masks
        wraparound-padded tail samples out of eval losses exactly (the
        reference evaluates a genuinely smaller last batch; our static
        shapes pad-and-mask instead). Custom loss callables that do not
        accept ``sample_weights`` fall back to the unweighted form.
        """
        if sample_weights is not None and self._loss_takes_weights():
            loss = self.loss(output.out, mask, sample_weights=sample_weights)
            if output.aux is not None:
                loss = loss + self.aux_loss_weight * self.loss(
                    output.aux, mask, sample_weights=sample_weights
                )
            return loss
        loss = self.loss(output.out, mask)
        if output.aux is not None:
            loss = loss + self.aux_loss_weight * self.loss(output.aux, mask)
        return loss

    def _loss_takes_weights(self) -> bool:
        cached = getattr(self, "_loss_weights_ok", None)
        if cached is None:
            import inspect

            try:
                sig = inspect.signature(self.loss)
                cached = "sample_weights" in sig.parameters or any(
                    p.kind is inspect.Parameter.VAR_KEYWORD
                    for p in sig.parameters.values()
                )
            except (TypeError, ValueError):
                cached = False
            object.__setattr__(self, "_loss_weights_ok", cached)
        return cached
