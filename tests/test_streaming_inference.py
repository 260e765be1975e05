"""Streamed GeoTIFF I/O + banded scene inference.

Checks (1) windowed reads match whole-file decode across compressions
and tiling layouts, (2) the incremental strip writer round-trips through
the reader, (3) the banded streamer's output equals the monolithic
sliding-window path (same tile contributions, same blend), and (4) the
end-to-end streamed predictor writes a valid georeferenced class map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geo_deep_learning_tpu.data.geotiff import (
    Affine,
    GeoInfo,
    read_geotiff,
    write_geotiff,
)
from geo_deep_learning_tpu.data.geotiff_stream import (
    GeoTiffStripWriter,
    GeoTiffWindowReader,
)
from geo_deep_learning_tpu.inference.sliding_window import (
    SlidingWindowConfig,
    sliding_window_logits,
)
from geo_deep_learning_tpu.inference.streaming import (
    predict_scene_streamed,
    streamed_scene_logits_writer,
)


@pytest.mark.parametrize("compress", [None, "deflate", "lzw"])
def test_window_reader_matches_full_decode(tmp_path, compress):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(93, 40, 3)).astype(np.uint8)
    path = tmp_path / "scene.tif"
    write_geotiff(path, img, compress=compress, rows_per_strip=16)
    full, _ = read_geotiff(path)
    with GeoTiffWindowReader(path) as r:
        assert (r.height, r.width, r.channels) == (93, 40, 3)
        for row0, n in [(0, 93), (0, 1), (10, 30), (80, 13), (15, 17)]:
            np.testing.assert_array_equal(r.read_rows(row0, n), full[row0 : row0 + n])


def test_strip_writer_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(70, 33, 2)).astype(np.uint8)
    geo = GeoInfo(transform=Affine(0.5, 0, 100.0, 0, -0.5, 200.0), epsg=32617)
    path = tmp_path / "out.tif"
    with GeoTiffStripWriter(path, 33, 2, np.uint8, geo=geo, rows_per_strip=16) as w:
        # stream in uneven chunks to exercise the strip buffer
        for y0, n in [(0, 5), (5, 20), (25, 16), (41, 29)]:
            w.write_rows(img[y0 : y0 + n])
    back, geo2 = read_geotiff(path)
    np.testing.assert_array_equal(back, img)
    assert geo2.epsg == 32617
    assert abs(geo2.transform.a - 0.5) < 1e-9
    assert abs(geo2.transform.c - 100.0) < 1e-9


def test_strip_writer_classic_tiff(tmp_path):
    img = (np.arange(24 * 10) % 251).astype(np.uint8).reshape(24, 10, 1)
    path = tmp_path / "classic.tif"
    with GeoTiffStripWriter(
        path, 10, 1, np.uint8, rows_per_strip=7, bigtiff=False
    ) as w:
        w.write_rows(img)
    back, _ = read_geotiff(path)
    np.testing.assert_array_equal(back, img)


class _ArrayReader:
    """In-memory stand-in for GeoTiffWindowReader."""

    def __init__(self, arr):
        self.arr = arr
        self.height, self.width = arr.shape[:2]
        self.channels = arr.shape[2]

    def read_rows(self, row0, nrows):
        return self.arr[row0 : row0 + nrows]


def _toy_forward(tiles):
    # channel-mixing "model": separable, deterministic, shape-preserving
    k = jnp.asarray([[0.7, -0.2], [0.1, 0.4], [-0.3, 0.9]], jnp.float32)
    return jnp.einsum("bhwc,ck->bhwk", tiles, k)


@pytest.mark.parametrize(
    "shape",
    [
        (96, 80),
        (64, 48),
        (40, 40),
        # scenes shorter/narrower than one tile: the clamped tile covers
        # padded rows, which must reflect exactly like _plan_tiles
        # (advisor r2: edge-pad diverged from the monolithic path here)
        (20, 40),
        (40, 20),
        (20, 24),
    ],
)
def test_streamed_blend_matches_monolithic(shape):
    h, w = shape
    rng = np.random.default_rng(2)
    scene = rng.normal(size=(h, w, 3)).astype(np.float32)
    cfg = SlidingWindowConfig(tile_size=32, overlap=8, batch_size=4)
    ref = np.asarray(sliding_window_logits(_toy_forward, scene, 2, cfg))

    got = np.zeros((h, w, 2), np.float32)

    def write_rows(row0, rows):
        got[row0 : row0 + rows.shape[0]] = rows

    streamed_scene_logits_writer(
        _toy_forward, _ArrayReader(scene), write_rows, 2, cfg, band_tile_rows=2
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_streamed_sharded_matches_monolithic():
    """Banded streaming + mesh data parallelism: same blend as monolithic
    (BASELINE.json config #5 combined with ROADMAP #6)."""
    from geo_deep_learning_tpu.core.mesh import MeshConfig, create_mesh

    mesh = create_mesh(MeshConfig(data=8, model=1))
    h, w = 96, 80
    rng = np.random.default_rng(4)
    scene = rng.normal(size=(h, w, 3)).astype(np.float32)
    cfg = SlidingWindowConfig(tile_size=32, overlap=8, batch_size=2)
    ref = np.asarray(sliding_window_logits(_toy_forward, scene, 2, cfg))

    got = np.zeros((h, w, 2), np.float32)

    def write_rows(row0, rows):
        got[row0 : row0 + rows.shape[0]] = rows

    streamed_scene_logits_writer(
        _toy_forward,
        _ArrayReader(scene),
        write_rows,
        2,
        cfg,
        band_tile_rows=2,
        mesh=mesh,
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_predict_scene_streamed_end_to_end(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(70, 50, 3)).astype(np.uint8)
    geo = GeoInfo(transform=Affine(1.0, 0, 10.0, 0, -1.0, 20.0), epsg=32617)
    src = tmp_path / "src.tif"
    write_geotiff(src, img, geo=geo)
    out = predict_scene_streamed(
        _toy_forward,
        str(src),
        str(tmp_path / "pred.tif"),
        num_classes=2,
        config=SlidingWindowConfig(tile_size=32, overlap=8, batch_size=4),
        band_tile_rows=2,
    )
    pred, geo2 = read_geotiff(out)
    assert pred.shape == (70, 50, 1)
    assert set(np.unique(pred)) <= {0, 1}
    assert geo2.epsg == 32617

    # must equal the monolithic predictor's map
    from geo_deep_learning_tpu.inference.sliding_window import predict_scene

    out2 = predict_scene(
        _toy_forward,
        str(src),
        str(tmp_path / "pred_mono.tif"),
        num_classes=2,
        config=SlidingWindowConfig(tile_size=32, overlap=8, batch_size=4),
    )
    mono, _ = read_geotiff(out2)
    np.testing.assert_array_equal(pred, mono)


def test_streamed_sharded_tiles_disjoint_exactly_once():
    """VERDICT r2 #8: blended-output equality cannot catch duplicated
    tiles (a tile processed twice inflates acc AND wsum by the same
    factor, normalizing away), so spy on the coords/valid arrays each
    band hands the sharded accumulator and assert every valid tile
    appears exactly ONCE (the P('data') contiguous shards of that array
    are what each device consumes), and that the striping balances valid
    tiles across the mesh."""
    from geo_deep_learning_tpu.core.mesh import MeshConfig, create_mesh
    from geo_deep_learning_tpu.inference import streaming as st

    mesh = create_mesh(MeshConfig(data=8, model=1))
    h, w = 64, 96
    rng = np.random.default_rng(9)
    scene = rng.normal(size=(h, w, 3)).astype(np.float32)
    cfg = SlidingWindowConfig(tile_size=32, overlap=8, batch_size=2)

    recorded = []
    orig = st._band_acc_sharded

    def spy(forward, params, block, coords, valid, *a, **kw):
        recorded.append((np.asarray(coords), np.asarray(valid)))
        return orig(forward, params, block, coords, valid, *a, **kw)

    got = np.zeros((h, w, 2), np.float32)

    def write_rows(row0, rows):
        got[row0 : row0 + rows.shape[0]] = rows

    st._band_acc_sharded = spy
    try:
        streamed_scene_logits_writer(
            _toy_forward, _ArrayReader(scene), write_rows, 2, cfg,
            band_tile_rows=2, mesh=mesh,
        )
    finally:
        st._band_acc_sharded = orig

    assert recorded
    ref = np.asarray(sliding_window_logits(_toy_forward, scene, 2, cfg))
    np.testing.assert_allclose(got, ref, atol=1e-4)

    n_dev = 8
    for coords, valid in recorded:
        # every valid tile appears exactly once across the whole band
        vc = coords[valid > 0]
        uniq = {tuple(c) for c in vc}
        assert len(uniq) == len(vc), "duplicated tile on some device"
        # contiguous per-device shards (P('data') semantics) stay balanced
        per_dev = np.array_split(valid, n_dev)
        counts = [int(v.sum()) for v in per_dev]
        assert max(counts) - min(counts) <= 1, counts


def test_streamed_crop_blend_matches_monolithic():
    """The banded streamer's seam-exactness must hold for blend="crop"
    (hard 1.0/1e-3 window edges are less forgiving than the Hann taper)."""
    rng = np.random.default_rng(7)
    scene = rng.normal(size=(96, 80, 3)).astype(np.float32)
    cfg = SlidingWindowConfig(tile_size=32, overlap=8, batch_size=4, blend="crop")
    ref = np.asarray(sliding_window_logits(_toy_forward, scene, 2, cfg))

    got = np.zeros((96, 80, 2), np.float32)

    def write_rows(row0, rows):
        got[row0 : row0 + rows.shape[0]] = rows

    streamed_scene_logits_writer(
        _toy_forward, _ArrayReader(scene), write_rows, 2, cfg, band_tile_rows=2
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)
