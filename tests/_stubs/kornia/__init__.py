"""kornia import stub (names only) so the reference's DOFA assembly module
imports; its DataAugmentation class is never instantiated by the golden
parity tests (augmentation parity is covered by tests/test_ops_augment.py
against explicit math, not kornia)."""

from . import augmentation  # noqa: F401
