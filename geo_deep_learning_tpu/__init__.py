"""geo_deep_learning_tpu: TPU-native geospatial deep learning framework.

A brand-new JAX/Flax/XLA/Pallas framework with the capabilities of
NRCan/geo-deep-learning (semantic segmentation of multi-sensor Earth
observation imagery), designed TPU-first:

- NHWC tensor layout throughout (XLA:TPU preferred conv layout).
- bf16 compute / f32 parameter precision policy (no AMP loss scaling).
- Data parallelism via ``jax.sharding.Mesh`` + jitted steps (GSPMD),
  not DDP/NCCL; gradient sync is implicit psum fused by XLA.
- Host-side raster/tar input pipeline feeding double-buffered device puts.
- Sliding-window full-scene inference with overlap blending on device.

Package map (see SURVEY.md for the reference blueprint):

- ``core``      mesh/topology, train state, precision policy, jitted steps
- ``models``    Flax model zoo: UNet++, SegFormer (MiT), DOFA (+necks/decoders/heads)
- ``ops``       losses, metrics, resize, augmentation, Pallas kernels
- ``parallel``  sharding specs and collective helpers
- ``data``      GeoTIFF/CSV/tar-shard datasets, datamodules, mixing
- ``training``  fit/validate/test loops, optimizers, checkpointing
- ``inference`` tiled scene inference, export
- ``tools``     experiment tracking, visualization, callbacks, schedulers
- ``utils``     tensor/raster/checkpoint utilities
- ``cli``       YAML-config driven fit/validate/test/predict entry point
"""

__version__ = "0.1.0"
