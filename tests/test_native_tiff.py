"""Native libtiff decoder: parity with the numpy codec + speed sanity."""

import time

import numpy as np
import pytest

from geo_deep_learning_tpu.data import _native
from geo_deep_learning_tpu.data.geotiff import (
    Affine,
    GeoInfo,
    read_geo_only,
    read_geotiff,
    write_geotiff,
)

pytestmark = pytest.mark.skipif(
    _native.get_lib() is None, reason="native libtiff decoder unavailable"
)


@pytest.mark.parametrize(
    "dtype,bands",
    [(np.uint8, 3), (np.uint8, 1), (np.uint16, 4), (np.float32, 6), (np.int16, 2)],
)
def test_native_matches_python(tmp_path, dtype, bands):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.floating):
        arr = rng.normal(size=(33, 29, bands)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(
            max(info.min, -1000), min(info.max, 1000), size=(33, 29, bands)
        ).astype(dtype)
    p = tmp_path / "x.tif"
    write_geotiff(p, arr)
    native = _native.read_pixels_native(p)
    assert native is not None
    np.testing.assert_array_equal(native, arr)


def test_native_reads_pil_lzw(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    p = tmp_path / "lzw.tif"
    PIL.fromarray(arr).save(p, compression="tiff_lzw")
    native = _native.read_pixels_native(p)
    np.testing.assert_array_equal(native, arr)


def test_read_geotiff_uses_native_and_keeps_geo(tmp_path):
    arr = np.random.default_rng(2).integers(0, 255, (16, 16, 3)).astype(np.uint8)
    geo = GeoInfo(Affine(0.5, 0, 100.0, 0, -0.5, 200.0), epsg=32617, nodata=7)
    p = tmp_path / "g.tif"
    write_geotiff(p, arr, geo)
    img, g = read_geotiff(p)
    np.testing.assert_array_equal(img, arr)
    assert g.epsg == 32617 and g.nodata == 7
    g2 = read_geo_only(p)
    assert g2.epsg == 32617
    np.testing.assert_allclose(g2.transform.to_tuple(), geo.transform.to_tuple())


def test_native_faster_than_python_on_lzw(tmp_path):
    """The point of the native path: LZW decode off the Python interpreter."""
    PIL = pytest.importorskip("PIL.Image")
    import geo_deep_learning_tpu.data.geotiff as gt

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, (512, 512, 3)).astype(np.uint8)
    p = tmp_path / "big.tif"
    PIL.fromarray(arr).save(p, compression="tiff_lzw")

    t0 = time.perf_counter()
    for _ in range(3):
        native = _native.read_pixels_native(p)
    t_native = time.perf_counter() - t0

    data = p.read_bytes()
    t0 = time.perf_counter()
    for _ in range(3):
        tf = gt._TiffFile(data)
        tags = tf.read_ifd(tf.first_ifd)
        # decode one strip the python way to time the LZW path
        off, cnt = tags[gt.TAG_STRIP_OFFSETS][0], tags[gt.TAG_STRIP_COUNTS][0]
        gt._decompress(data[off : off + cnt], gt.COMP_LZW)
    t_python_one_strip = time.perf_counter() - t0

    np.testing.assert_array_equal(native, arr)
    # native full-image decode should beat python decoding even ONE strip
    assert t_native < t_python_one_strip * 20  # generous: just sanity order


def test_native_tar_matches_tarfile(tmp_path):
    """Native tar reader yields identical members to Python tarfile."""
    import io as _io
    import json as _json
    import tarfile as _tarfile

    from geo_deep_learning_tpu.data import _native as nat

    if nat.get_tar_lib() is None:
        pytest.skip("native tar reader unavailable")
    p = tmp_path / "shard.tar"
    rng = np.random.default_rng(0)
    with _tarfile.open(p, "w") as tar:
        for i in range(5):
            arr = rng.integers(0, 255, (4, 8, 8)).astype(np.uint8)
            buf = _io.BytesIO()
            np.save(buf, arr)
            raw = buf.getvalue()
            ti = _tarfile.TarInfo(f"sample{i}.image_patch.npy")
            ti.size = len(raw)
            tar.addfile(ti, _io.BytesIO(raw))
            meta = _json.dumps({"i": i}).encode()
            ti2 = _tarfile.TarInfo(f"sample{i}.metadata.json")
            ti2.size = len(meta)
            tar.addfile(ti2, _io.BytesIO(meta))

    native = list(nat.iter_tar_members_native(p))
    with _tarfile.open(p) as tar:
        expected = [
            (m.name, tar.extractfile(m).read()) for m in tar if m.isfile()
        ]
    assert [n for n, _ in native] == [n for n, _ in expected]
    for (_, a), (_, b) in zip(native, expected):
        assert a == b


def test_shard_pipeline_uses_native_transparently(tmp_path):
    """iter_tar_samples gives identical samples with and without native."""
    import io as _io
    import json as _json
    import os as _os
    import tarfile as _tarfile

    from geo_deep_learning_tpu.data.shard_dataset import iter_tar_samples

    p = tmp_path / "s.tar"
    rng = np.random.default_rng(1)
    with _tarfile.open(p, "w") as tar:
        for i in range(3):
            arr = rng.integers(0, 255, (3, 8, 8)).astype(np.uint8)
            buf = _io.BytesIO()
            np.save(buf, arr)
            raw = buf.getvalue()
            for field, payload in [("image_patch.npy", raw),
                                   ("metadata.json", _json.dumps({"k": i}).encode())]:
                ti = _tarfile.TarInfo(f"key{i}.{field}")
                ti.size = len(payload)
                tar.addfile(ti, _io.BytesIO(payload))
    with_native = list(iter_tar_samples(p))
    _os.environ["GDL_TPU_NO_NATIVE"] = "1"
    try:
        from geo_deep_learning_tpu.data import _native as nat
        saved = nat._tar_lib, nat._tar_tried
        nat._tar_lib, nat._tar_tried = None, False
        without = list(iter_tar_samples(p))
        nat._tar_lib, nat._tar_tried = saved
    finally:
        del _os.environ["GDL_TPU_NO_NATIVE"]
    assert len(with_native) == len(without) == 3
    for a, b in zip(with_native, without):
        assert a["__key__"] == b["__key__"]
        np.testing.assert_array_equal(a["image_patch.npy"], b["image_patch.npy"])
        assert a["metadata.json"] == b["metadata.json"]


def test_native_tar_long_names(tmp_path):
    """pax ('x' path record) and GNU ('L') long names parse natively.

    Regression: metadata entries used to be skipped and the truncated
    100-char ustar name returned, silently mis-grouping samples
    (reference analog: tarfile/webdataset handle these transparently).
    """
    import io as _io
    import tarfile as _tarfile

    from geo_deep_learning_tpu.data import _native as nat

    if nat.get_tar_lib() is None:
        pytest.skip("native tar reader unavailable")

    long_key = "a" * 120  # > 100-char ustar name field, no '/' for prefix
    members = [
        (f"{long_key}.image_patch.npy", b"payload-one"),
        (f"{long_key}.metadata.json", b'{"k": 1}'),
        ("short.npy", b"xyz"),
    ]
    for fmt, label in [
        (_tarfile.PAX_FORMAT, "pax"),
        (_tarfile.GNU_FORMAT, "gnu"),
    ]:
        p = tmp_path / f"long_{label}.tar"
        with _tarfile.open(p, "w", format=fmt) as tar:
            for name, payload in members:
                ti = _tarfile.TarInfo(name)
                ti.size = len(payload)
                tar.addfile(ti, _io.BytesIO(payload))
        native = list(nat.iter_tar_members_native(p))
        assert native == members, f"{label} long names mis-parsed"
