"""Raster utility tests (parity with reference test_utils_raster.py)."""

import numpy as np
import pytest

from geo_deep_learning_tpu.data.geotiff import Affine, GeoInfo, write_geotiff, read_geotiff
from geo_deep_learning_tpu.utils.rasters import (
    align_to_reference,
    compute_dataset_stats_from_list,
)


@pytest.fixture
def pair(tmp_path):
    """Source at 1m resolution; reference at 2m covering the same extent."""
    rng = np.random.default_rng(0)
    src = rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)
    src_geo = GeoInfo(Affine(1.0, 0, 1000.0, 0, -1.0, 2000.0), epsg=32617)
    ref = np.zeros((16, 16, 1), dtype=np.uint8)
    ref_geo = GeoInfo(Affine(2.0, 0, 1000.0, 0, -2.0, 2000.0), epsg=32617)
    sp, rp = tmp_path / "src.tif", tmp_path / "ref.tif"
    write_geotiff(sp, src, src_geo)
    write_geotiff(rp, ref, ref_geo)
    return sp, rp, tmp_path


def test_align_matches_reference_grid(pair):
    sp, rp, tmp = pair
    out = align_to_reference(sp, rp, tmp / "out.tif", resampling="bilinear")
    img, geo = read_geotiff(out)
    assert img.shape == (16, 16, 3)
    np.testing.assert_allclose(geo.transform.to_tuple(), (2.0, 0, 1000.0, 0, -2.0, 2000.0))
    assert geo.epsg == 32617


def test_align_nearest_preserves_values(pair):
    sp, rp, tmp = pair
    out = align_to_reference(sp, rp, tmp / "n.tif", resampling="nearest")
    img, _ = read_geotiff(out)
    src, _ = read_geotiff(sp)
    # nearest of a 2x downsample picks one of the source pixels
    assert set(np.unique(img)).issubset(set(np.unique(src)))


def test_align_invalid_resampling(pair):
    sp, rp, tmp = pair
    with pytest.raises(ValueError, match="Invalid resampling"):
        align_to_reference(sp, rp, tmp / "x.tif", resampling="lanczos")


def test_align_rejects_cross_crs(tmp_path):
    a = tmp_path / "a.tif"
    b = tmp_path / "b.tif"
    write_geotiff(a, np.zeros((4, 4), np.uint8), GeoInfo(epsg=32617))
    write_geotiff(b, np.zeros((4, 4), np.uint8), GeoInfo(epsg=4326))
    with pytest.raises(NotImplementedError, match="reproject"):
        align_to_reference(a, b, tmp_path / "c.tif")


def test_dataset_stats(tmp_path):
    paths = []
    rng = np.random.default_rng(2)
    all_vals = []
    for i in range(3):
        arr = rng.uniform(0, 100, size=(8, 8, 2)).astype(np.float32)
        p = tmp_path / f"{i}.tif"
        write_geotiff(p, arr)
        paths.append(p)
        all_vals.append(arr)
    stats = compute_dataset_stats_from_list(paths)
    stacked = np.concatenate([a.reshape(-1, 2) for a in all_vals])
    np.testing.assert_allclose(stats["mean"], stacked.mean(axis=0), rtol=1e-5)
    np.testing.assert_allclose(stats["std"], stacked.std(axis=0), rtol=1e-5)


def test_dataset_stats_excludes_nodata(tmp_path):
    arr = np.full((8, 8, 1), -9999.0, dtype=np.float32)
    arr[:4] = 10.0
    p = tmp_path / "nd.tif"
    write_geotiff(p, arr, GeoInfo(nodata=-9999.0))
    stats = compute_dataset_stats_from_list([p])
    np.testing.assert_allclose(stats["mean"], [10.0])
    np.testing.assert_allclose(stats["std"], [0.0], atol=1e-9)


def test_dataset_stats_empty_list():
    with pytest.raises(ValueError, match="empty"):
        compute_dataset_stats_from_list([])
