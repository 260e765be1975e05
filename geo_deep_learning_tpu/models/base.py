"""Model composition base.

Native equivalent of the reference's ``models/segmentation/base.py:8-73``:
a segmentation model is encoder → (neck) → decoder → head (+ aux head),
returning a ``SegmentationOutput(out, aux)`` pair. In Flax the composition
is explicit in each assembly's ``__call__``; this module holds the shared
output contract and the freeze-by-name capability (which in JAX is an
*optimizer* concern — see ``training/optim.py`` ``freeze_by_substring`` —
rather than a ``requires_grad`` mutation).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class SegmentationOutput(NamedTuple):
    """Output contract shared by all assemblies (reference
    ``models/heads/segmentation_head.py:9-13``)."""

    out: jnp.ndarray  # [B, H, W, num_classes] logits at input resolution
    aux: jnp.ndarray | None = None  # auxiliary-head logits or None


def match_freeze_substrings(param_path: str, substrings: list[str]) -> bool:
    """True when a flattened parameter path matches any freeze pattern.

    Reference equivalent: ``BaseSegmentationModel._freeze_layers``
    (models/segmentation/base.py:24-31) freezes parameters whose *name*
    contains any substring. Used by the optimizer mask.
    """
    return any(s in param_path for s in substrings)
