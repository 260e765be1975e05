"""Compute ops: losses, metrics, resize, augmentation, Pallas kernels."""
