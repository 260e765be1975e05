"""Host-side data layer: GeoTIFF I/O, CSV + tar-shard datasets, datamodules.

The reference delegates raster I/O to rasterio/GDAL and streaming to
webdataset; neither is a TPU-host given, so this package owns both:
a self-contained GeoTIFF codec (`geotiff.py`, with a native C++ libtiff
fast path), CSV-indexed patch datasets, sharded-tar streaming with
multi-sensor mixing, and prefetching datamodules that feed the mesh.
"""
