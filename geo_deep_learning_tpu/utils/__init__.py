"""Leaf utilities: tensors, rasters, checkpoint loading."""
