"""Visualization-on-new-best callback (API-parity shim).

Reference equivalent: ``tools/callbacks/segmentation_visualization.py:12-76``
(cache last val batch; render figures only when a new best checkpoint is
saved). That behavior is built into :class:`Trainer` (training/loop.py
``_log_visualizations`` fires on checkpoint improvement); this class keeps
the reference's config surface — the CLI maps its ``max_samples`` onto
``TrainerConfig.visualize_max_samples``.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class VisualizationCallback:
    max_samples: int = 3
    mean: list[float] | None = None
    std: list[float] | None = None
