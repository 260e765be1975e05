"""LR schedulers (API-parity path).

Reference equivalent: ``tools/schedulers/lr_scheduler.py:13-198``. The
implementations live in :mod:`geo_deep_learning_tpu.training.optim`; this
module mirrors the reference's import path so library users find them
where the reference kept them.
"""

from geo_deep_learning_tpu.training.optim import (
    linear_warmup_cosine_annealing as LinearWarmupCosineAnnealingLR,
    linear_warmup_decay,
    one_cycle,
)

__all__ = ["LinearWarmupCosineAnnealingLR", "linear_warmup_decay", "one_cycle"]
