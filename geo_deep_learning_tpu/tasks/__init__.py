"""Config-surface task classes.

Reference equivalent: the three LightningModules in
``tasks_with_models/`` (SegmentationUnetPlus :34, SegmentationSegformer
:32, SegmentationDOFA :33). These classes keep the reference's
constructor signatures so YAML ``init_args`` translate 1:1; they carry
the model assembly plus training wiring (optimizer/scheduler dicts,
warm-start, freezing) into :class:`Trainer.fit`.
"""

from geo_deep_learning_tpu.tasks.segmentation import (
    SegmentationDOFA,
    SegmentationSegformer,
    SegmentationTaskSpec,
    SegmentationUnetPlus,
)

__all__ = [
    "SegmentationDOFA",
    "SegmentationSegformer",
    "SegmentationTaskSpec",
    "SegmentationUnetPlus",
]
