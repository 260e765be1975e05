"""Pallas TPU kernels for ops XLA doesn't already fuse optimally."""
