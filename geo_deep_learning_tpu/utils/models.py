"""Checkpoint weight loading (API-parity path).

Reference equivalent: ``utils/models.py:10-66``
(``load_weights_from_checkpoint`` with full or ``load_parts``-filtered
loading). Implementation lives in :mod:`geo_deep_learning_tpu.training.checkpoint`.
"""

from geo_deep_learning_tpu.training.checkpoint import load_weights_from_checkpoint

__all__ = ["load_weights_from_checkpoint"]
