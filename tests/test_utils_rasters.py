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


def test_align_rejects_unsupported_crs(tmp_path):
    a = tmp_path / "a.tif"
    b = tmp_path / "b.tif"
    write_geotiff(a, np.zeros((4, 4), np.uint8), GeoInfo(epsg=2960))  # NAD83 CSRS
    write_geotiff(b, np.zeros((4, 4), np.uint8), GeoInfo(epsg=4326))
    with pytest.raises(NotImplementedError, match="reproject"):
        align_to_reference(a, b, tmp_path / "c.tif")


def test_align_cross_crs_4326_to_utm(tmp_path):
    """Reproject EPSG:4326 → EPSG:32617 (reference utils/rasters.py:45-79
    behavior via rasterio.warp, reimplemented in utils/crs.py).

    The source raster stores an analytic function of (lon, lat); after
    alignment each reference pixel must hold that function evaluated at
    the pixel center's inverse-projected coordinates — a golden test that
    needs no external PROJ."""
    from geo_deep_learning_tpu.utils import crs as crs_lib

    # source: 0.001-deg pixels around (-79.4, 43.65) (Toronto, zone 17N)
    lon0, lat0, res = -79.45, 43.70, 0.001
    h, w = 120, 120
    src_geo = GeoInfo(Affine(res, 0, lon0, 0, -res, lat0), epsg=4326)
    lon = lon0 + (np.arange(w) + 0.5) * res
    lat = lat0 - (np.arange(h) + 0.5) * res
    lon_g, lat_g = np.meshgrid(lon, lat)
    src = (1000.0 * (lon_g - lon0) + 2000.0 * (lat0 - lat_g)).astype(np.float32)
    sp = tmp_path / "src.tif"
    write_geotiff(sp, src[..., None], src_geo)

    # reference: 30 m pixels in UTM 17N covering the middle of the source
    e0, n0 = crs_lib.from_geographic(32617, lon0 + 0.02, lat0 - 0.02)
    ref_geo = GeoInfo(Affine(30.0, 0, float(e0), 0, -30.0, float(n0)), epsg=32617)
    rp = tmp_path / "ref.tif"
    write_geotiff(rp, np.zeros((64, 64), np.uint8), ref_geo)

    out_path = align_to_reference(sp, rp, tmp_path / "out.tif", resampling="bilinear")
    out, out_geo = read_geotiff(out_path)
    assert out_geo.epsg == 32617

    cols, rows = np.meshgrid(np.arange(64) + 0.5, np.arange(64) + 0.5)
    xs = 30.0 * cols + float(e0)
    ys = -30.0 * rows + float(n0)
    lon_c, lat_c = crs_lib.to_geographic(32617, xs, ys)
    expected = 1000.0 * (lon_c - lon0) + 2000.0 * (lat0 - lat_c)
    # bilinear interp of a linear field is exact up to float32 rounding
    np.testing.assert_allclose(out[..., 0], expected, atol=2e-3)


def test_crs_landmark_and_roundtrip():
    """Published golden: CN Tower 43.642567N 79.387139W = UTM 17N
    (630084 E, 4833438 N) within survey tolerance; plus roundtrips."""
    from geo_deep_learning_tpu.utils import crs as crs_lib

    e, n = crs_lib.from_geographic(32617, -79.387139, 43.642567)
    assert abs(float(e) - 630084.0) < 2.0
    assert abs(float(n) - 4833438.0) < 2.0

    x, y = crs_lib.from_geographic(3857, -73.0, 45.0)
    # analytic web-mercator values: x = R*lon_rad, y = R*ln(tan(45°+lat/2))
    assert abs(float(x) + 8126322.82) < 1.0
    assert abs(float(y) - 5621521.49) < 1.0

    rng = np.random.default_rng(0)
    lon = rng.uniform(-80.9, -78.1, 500)
    lat = rng.uniform(-70, 70, 500)
    for epsg in (32617, 32717, 3857):
        xs, ys = crs_lib.from_geographic(epsg, lon, lat)
        lo2, la2 = crs_lib.to_geographic(epsg, xs, ys)
        assert np.abs(lo2 - lon).max() < 1e-9
        assert np.abs(la2 - lat).max() < 1e-9


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
