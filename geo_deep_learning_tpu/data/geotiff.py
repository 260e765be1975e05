"""Self-contained GeoTIFF reader/writer (no GDAL/rasterio dependency).

The reference reads/writes patches and scenes through rasterio
(datasets/csv_dataset.py:118-136, utils/rasters.py:14-79). TPU host images
don't ship GDAL, so this module implements the subset of TIFF + GeoTIFF
the framework needs, in numpy:

Reading: classic TIFF and BigTIFF, both endiannesses; striped and tiled
layouts; PlanarConfig chunky/separate; uint8/16/32, int8/16/32, float32/64;
compressions none/LZW/Deflate/PackBits (+ horizontal-differencing
predictor); geo tags (ModelPixelScale+Tiepoint or ModelTransformation),
EPSG code from the GeoKey directory, GDAL nodata.

Writing: striped, chunky, uncompressed or Deflate, with geo tags.

A native C++ decode path (``native/``, libtiff) is used automatically for
the hot training-read path when built; this pure-numpy implementation is
the always-available fallback and the reference for its tests.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

# --- TIFF constants -------------------------------------------------------

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
               11: 4, 12: 8, 16: 8, 17: 8, 18: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f",
             12: "d", 16: "Q", 17: "q"}

TAG_WIDTH = 256
TAG_HEIGHT = 257
TAG_BITS = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SPP = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_COUNTS = 279
TAG_PLANAR = 284
TAG_PREDICTOR = 317
TAG_TILE_WIDTH = 322
TAG_TILE_LENGTH = 323
TAG_TILE_OFFSETS = 324
TAG_TILE_COUNTS = 325
TAG_EXTRA_SAMPLES = 338
TAG_SAMPLE_FORMAT = 339
TAG_MODEL_PIXEL_SCALE = 33550
TAG_MODEL_TIEPOINT = 33922
TAG_MODEL_TRANSFORM = 34264
TAG_GEO_KEYS = 34735
TAG_GEO_DOUBLES = 34736
TAG_GEO_ASCII = 34737
TAG_GDAL_NODATA = 42113

COMP_NONE = 1
COMP_LZW = 5
COMP_DEFLATE_ADOBE = 8
COMP_PACKBITS = 32773
COMP_DEFLATE = 32946

GEOKEY_GT_MODEL_TYPE = 1024
GEOKEY_GEOGRAPHIC_CS = 2048
GEOKEY_PROJECTED_CS = 3072


@dataclass
class Affine:
    """Row-major 2-D affine: x = a·col + b·row + c ; y = d·col + e·row + f.

    Matches rasterio's ``Affine(a, b, c, d, e, f)`` ordering.
    """

    a: float = 1.0
    b: float = 0.0
    c: float = 0.0
    d: float = 0.0
    e: float = -1.0
    f: float = 0.0

    def __mul__(self, colrow: tuple[float, float]) -> tuple[float, float]:
        col, row = colrow
        return (
            self.a * col + self.b * row + self.c,
            self.d * col + self.e * row + self.f,
        )

    def invert(self) -> "Affine":
        det = self.a * self.e - self.b * self.d
        ia, ib = self.e / det, -self.b / det
        id_, ie = -self.d / det, self.a / det
        ic = -(ia * self.c + ib * self.f)
        if_ = -(id_ * self.c + ie * self.f)
        return Affine(ia, ib, ic, id_, ie, if_)

    def to_tuple(self) -> tuple[float, ...]:
        return (self.a, self.b, self.c, self.d, self.e, self.f)


@dataclass
class GeoInfo:
    transform: Affine = field(default_factory=Affine)
    epsg: int | None = None
    nodata: float | None = None

    @property
    def pixel_size(self) -> tuple[float, float]:
        return (abs(self.transform.a), abs(self.transform.e))


# --- low-level IFD parsing -------------------------------------------------


class _TiffFile:
    def __init__(self, data: bytes):
        self.data = data
        if data[:2] == b"II":
            self.bo = "<"
        elif data[:2] == b"MM":
            self.bo = ">"
        else:
            msg = "not a TIFF file"
            raise ValueError(msg)
        magic = struct.unpack(self.bo + "H", data[2:4])[0]
        self.big = magic == 43
        if magic not in (42, 43):
            msg = f"bad TIFF magic {magic}"
            raise ValueError(msg)
        if self.big:
            off_size, _ = struct.unpack(self.bo + "HH", data[4:8])
            if off_size != 8:
                msg = "unsupported BigTIFF offset size"
                raise ValueError(msg)
            self.first_ifd = struct.unpack(self.bo + "Q", data[8:16])[0]
        else:
            self.first_ifd = struct.unpack(self.bo + "I", data[4:8])[0]

    def read_ifd(self, offset: int) -> dict[int, list]:
        bo, data = self.bo, self.data
        if self.big:
            count = struct.unpack(bo + "Q", data[offset : offset + 8])[0]
            entry_size, base = 20, offset + 8
        else:
            count = struct.unpack(bo + "H", data[offset : offset + 2])[0]
            entry_size, base = 12, offset + 2
        tags: dict[int, list] = {}
        for i in range(count):
            e = base + i * entry_size
            tag, typ = struct.unpack(bo + "HH", data[e : e + 4])
            if self.big:
                n = struct.unpack(bo + "Q", data[e + 4 : e + 12])[0]
                value_field = data[e + 12 : e + 20]
            else:
                n = struct.unpack(bo + "I", data[e + 4 : e + 8])[0]
                value_field = data[e + 8 : e + 12]
            size = _TYPE_SIZES.get(typ, 1) * n
            if size <= len(value_field):
                raw = value_field[:size]
            else:
                off = struct.unpack(bo + ("Q" if self.big else "I"), value_field)[0]
                raw = data[off : off + size]
            tags[tag] = self._decode_values(typ, n, raw)
        return tags

    def _decode_values(self, typ: int, n: int, raw: bytes) -> list:
        bo = self.bo
        if typ == 2:  # ascii
            return [raw.rstrip(b"\0").decode("ascii", "replace")]
        if typ in (5, 10):  # rational
            fmt = "I" if typ == 5 else "i"
            vals = struct.unpack(bo + fmt * (2 * n), raw)
            return [vals[2 * i] / max(vals[2 * i + 1], 1) for i in range(n)]
        fmt = _TYPE_FMT.get(typ)
        if fmt is None:
            return [raw]
        return list(struct.unpack(bo + fmt * n, raw))


def _dtype_from_tags(bits: int, sample_format: int) -> np.dtype:
    if sample_format == 3:
        return {32: np.float32, 64: np.float64}[bits]
    if sample_format == 2:
        return {8: np.int8, 16: np.int16, 32: np.int32}[bits]
    return {8: np.uint8, 16: np.uint16, 32: np.uint32}[bits]


# --- LZW / PackBits decode --------------------------------------------------


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (MSB-first, early-change)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    bitpos = 0
    nbits = 9
    prev: bytes | None = None
    total_bits = len(data) * 8

    def read_code() -> int:
        nonlocal bitpos
        if bitpos + nbits > total_bits:
            return 257  # EOI
        byte_idx = bitpos // 8
        chunk = int.from_bytes(data[byte_idx : byte_idx + 4].ljust(4, b"\0"), "big")
        code = (chunk >> (32 - (bitpos % 8) - nbits)) & ((1 << nbits) - 1)
        bitpos += nbits
        return code

    while True:
        code = read_code()
        if code == 256:  # clear
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            nbits = 9
            prev = None
            continue
        if code == 257:  # EOI
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        # early change: bump width one code early
        if len(table) >= (1 << nbits) - 1 and nbits < 12:
            nbits += 1
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i : i + 1] * (257 - n)
            i += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encode (MSB-first, early-change) — the exact dual
    of ``_lzw_decode``; used for LZW-compressed writes (reference writes
    aligned rasters LZW-compressed, utils/rasters.py:63-66)."""
    clear, eoi = 256, 257
    out = bytearray()
    acc = 0  # bit accumulator
    acc_bits = 0

    def emit(code: int, nbits: int) -> None:
        nonlocal acc, acc_bits
        acc = (acc << nbits) | code
        acc_bits += nbits
        while acc_bits >= 8:
            acc_bits -= 8
            out.append((acc >> acc_bits) & 0xFF)
        acc &= (1 << acc_bits) - 1  # keep the accumulator bounded

    # strings are (prefix-code, next-byte) chains — O(1) dict ops, no
    # byte-string concatenation
    table: dict[tuple[int, int], int] = {}
    next_code = 258
    nbits = 9
    emit(clear, nbits)
    it = iter(data)
    w = next(it, None)
    if w is not None:
        for byte in it:
            key = (w, byte)
            code = table.get(key)
            if code is not None:
                w = code
                continue
            emit(w, nbits)
            if next_code >= 4093:
                # table nearly full: reset (decoder resets on clear too)
                emit(clear, nbits)
                table.clear()
                next_code = 258
                nbits = 9
            else:
                table[key] = next_code
                next_code += 1
                # early change, shifted one entry: the decoder's table
                # lags the encoder's by one and widens at (1<<nbits)-1
                if next_code >= (1 << nbits) and nbits < 12:
                    nbits += 1
            w = byte
        emit(w, nbits)
    emit(eoi, nbits)
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    return bytes(out)


def _decompress(raw: bytes, compression: int) -> bytes:
    if compression == COMP_NONE:
        return raw
    if compression in (COMP_DEFLATE, COMP_DEFLATE_ADOBE):
        return zlib.decompress(raw)
    if compression == COMP_LZW:
        return _lzw_decode(raw)
    if compression == COMP_PACKBITS:
        return _packbits_decode(raw)
    msg = f"unsupported TIFF compression {compression}"
    raise ValueError(msg)


def _undo_predictor(block: np.ndarray) -> np.ndarray:
    """Predictor 2: horizontal differencing along the row axis."""
    return np.cumsum(block, axis=1, dtype=block.dtype)


# --- public read ------------------------------------------------------------


def read_geo_only(path: str | Path) -> GeoInfo:
    """Parse only the geo tags with targeted seeks (no pixel decode).

    Used alongside the native pixel decoder so the hot path never pulls
    the compressed pixel payload through Python.
    """
    geo_tags = {
        TAG_MODEL_PIXEL_SCALE,
        TAG_MODEL_TIEPOINT,
        TAG_MODEL_TRANSFORM,
        TAG_GEO_KEYS,
        TAG_GDAL_NODATA,
    }
    with Path(path).open("rb") as f:
        head = f.read(16)
        bo = "<" if head[:2] == b"II" else ">"
        big = struct.unpack(bo + "H", head[2:4])[0] == 43
        if big:
            ifd_off = struct.unpack(bo + "Q", head[8:16])[0]
        else:
            ifd_off = struct.unpack(bo + "I", head[4:8])[0]
        f.seek(ifd_off)
        if big:
            count = struct.unpack(bo + "Q", f.read(8))[0]
            entry_size = 20
        else:
            count = struct.unpack(bo + "H", f.read(2))[0]
            entry_size = 12
        raw_entries = f.read(count * entry_size)
        decoder = _TiffFile.__new__(_TiffFile)
        decoder.bo = bo
        tags: dict[int, list] = {}
        for i in range(count):
            e = raw_entries[i * entry_size : (i + 1) * entry_size]
            tag, typ = struct.unpack(bo + "HH", e[:4])
            if tag not in geo_tags:
                continue
            if big:
                n = struct.unpack(bo + "Q", e[4:12])[0]
                value_field = e[12:20]
            else:
                n = struct.unpack(bo + "I", e[4:8])[0]
                value_field = e[8:12]
            size = _TYPE_SIZES.get(typ, 1) * n
            if size <= len(value_field):
                raw = value_field[:size]
            else:
                off = struct.unpack(bo + ("Q" if big else "I"), value_field)[0]
                f.seek(off)
                raw = f.read(size)
            tags[tag] = decoder._decode_values(typ, n, raw)
    return _parse_geo(tags)


def read_geotiff(path: str | Path) -> tuple[np.ndarray, GeoInfo]:
    """Read a GeoTIFF into an HWC numpy array + geo metadata.

    Single-band rasters come back with a trailing channel axis of 1.
    Pixel decode uses the native libtiff library when built
    (``native/tiff_reader.cc``); the numpy path below is the fallback.
    """
    from geo_deep_learning_tpu.data._native import read_pixels_native

    native = read_pixels_native(path)
    if native is not None:
        return native, read_geo_only(path)

    data = Path(path).read_bytes()
    tf = _TiffFile(data)
    tags = tf.read_ifd(tf.first_ifd)

    width = int(tags[TAG_WIDTH][0])
    height = int(tags[TAG_HEIGHT][0])
    spp = int(tags.get(TAG_SPP, [1])[0])
    bits_list = tags.get(TAG_BITS, [8])
    bits = int(bits_list[0])
    if any(int(b) != bits for b in bits_list):
        msg = "mixed per-band bit depths unsupported"
        raise ValueError(msg)
    sample_format = int(tags.get(TAG_SAMPLE_FORMAT, [1])[0])
    compression = int(tags.get(TAG_COMPRESSION, [COMP_NONE])[0])
    predictor = int(tags.get(TAG_PREDICTOR, [1])[0])
    planar = int(tags.get(TAG_PLANAR, [1])[0])
    dtype = _dtype_from_tags(bits, sample_format)
    dt = np.dtype(dtype).newbyteorder(tf.bo)

    tiled = TAG_TILE_OFFSETS in tags
    if tiled:
        tw = int(tags[TAG_TILE_WIDTH][0])
        th = int(tags[TAG_TILE_LENGTH][0])
        offsets = tags[TAG_TILE_OFFSETS]
        counts = tags[TAG_TILE_COUNTS]
        tiles_across = -(-width // tw)
        tiles_down = -(-height // th)
        planes = spp if planar == 2 else 1
        chans = 1 if planar == 2 else spp
        img = np.zeros((height, width, spp), dtype=dtype)
        idx = 0
        for plane in range(planes):
            for ty in range(tiles_down):
                for tx in range(tiles_across):
                    raw = _decompress(
                        data[offsets[idx] : offsets[idx] + counts[idx]], compression
                    )
                    block = np.frombuffer(raw, dtype=dt, count=th * tw * chans)
                    block = block.reshape(th, tw, chans)
                    if predictor == 2:
                        block = _undo_predictor(block)
                    y0, x0 = ty * th, tx * tw
                    ys, xs = min(th, height - y0), min(tw, width - x0)
                    if planar == 2:
                        img[y0 : y0 + ys, x0 : x0 + xs, plane] = block[:ys, :xs, 0]
                    else:
                        img[y0 : y0 + ys, x0 : x0 + xs, :] = block[:ys, :xs]
                    idx += 1
    else:
        offsets = tags[TAG_STRIP_OFFSETS]
        counts = tags[TAG_STRIP_COUNTS]
        rps = int(tags.get(TAG_ROWS_PER_STRIP, [height])[0])
        strips_per_plane = -(-height // rps)
        planes = spp if planar == 2 else 1
        chans = 1 if planar == 2 else spp
        img = np.zeros((height, width, spp), dtype=dtype)
        idx = 0
        for plane in range(planes):
            for s in range(strips_per_plane):
                raw = _decompress(
                    data[offsets[idx] : offsets[idx] + counts[idx]], compression
                )
                y0 = s * rps
                rows = min(rps, height - y0)
                block = np.frombuffer(raw, dtype=dt, count=rows * width * chans)
                block = block.reshape(rows, width, chans)
                if predictor == 2:
                    block = _undo_predictor(block)
                if planar == 2:
                    img[y0 : y0 + rows, :, plane] = block[..., 0]
                else:
                    img[y0 : y0 + rows] = block
                idx += 1

    geo = _parse_geo(tags)
    return img, geo


def _parse_geo(tags: dict) -> GeoInfo:
    geo = GeoInfo()
    if TAG_MODEL_TRANSFORM in tags:
        m = tags[TAG_MODEL_TRANSFORM]
        geo.transform = Affine(m[0], m[1], m[3], m[4], m[5], m[7])
    elif TAG_MODEL_PIXEL_SCALE in tags and TAG_MODEL_TIEPOINT in tags:
        sx, sy = tags[TAG_MODEL_PIXEL_SCALE][:2]
        tp = tags[TAG_MODEL_TIEPOINT]
        # tiepoint: raster (i, j, k) -> model (x, y, z)
        i, j, _, x, y, _ = tp[:6]
        geo.transform = Affine(sx, 0.0, x - i * sx, 0.0, -sy, y + j * sy)
    if TAG_GEO_KEYS in tags:
        keys = tags[TAG_GEO_KEYS]
        # geokey directory: header of 4 shorts then (key, loc, count, value)*
        for k in range(4, len(keys), 4):
            key_id, tag_loc, _count, value = keys[k : k + 4]
            if key_id in (GEOKEY_PROJECTED_CS, GEOKEY_GEOGRAPHIC_CS) and tag_loc == 0:
                geo.epsg = int(value)
    if TAG_GDAL_NODATA in tags:
        try:
            geo.nodata = float(str(tags[TAG_GDAL_NODATA][0]).strip())
        except ValueError:
            pass
    return geo


# --- public write -----------------------------------------------------------


def write_geotiff(
    path: str | Path,
    array: np.ndarray,
    geo: GeoInfo | None = None,
    compress: str | None = "deflate",
    rows_per_strip: int = 64,
    bigtiff: bool | None = None,
) -> None:
    """Write an HWC (or HW) array as a striped GeoTIFF (little-endian).

    ``compress``: ``None``/"none", "deflate", or "lzw" (the reference
    writes aligned rasters LZW-compressed, utils/rasters.py:63-66).
    ``bigtiff``: force the BigTIFF container; default auto-promotes when
    the payload cannot be addressed with 32-bit offsets (the reference
    passes BIGTIFF=YES unconditionally; classic TIFF is kept here for
    small files since every reader accepts it).
    """
    if array.ndim == 2:
        array = array[..., None]
    height, width, spp = array.shape
    dtype = array.dtype
    if dtype == np.float64:
        sample_format = 3
    elif dtype.kind == "f":
        sample_format = 3
    elif dtype.kind == "i":
        sample_format = 2
    elif dtype.kind == "u":
        sample_format = 1
    else:
        msg = f"unsupported dtype {dtype}"
        raise ValueError(msg)
    bits = dtype.itemsize * 8
    comp = {
        None: COMP_NONE,
        "none": COMP_NONE,
        "deflate": COMP_DEFLATE_ADOBE,
        "lzw": COMP_LZW,
    }[compress]

    strips = []
    for y0 in range(0, height, rows_per_strip):
        block = np.ascontiguousarray(
            array[y0 : y0 + rows_per_strip], dtype=dtype.newbyteorder("<")
        ).tobytes()
        if comp == COMP_DEFLATE_ADOBE:
            block = zlib.compress(block, 6)
        elif comp == COMP_LZW:
            block = _lzw_encode(block)
        strips.append(block)

    if bigtiff is None:
        bigtiff = sum(len(s) for s in strips) + 65536 > 2**32 - 1

    entries: list[tuple[int, int, list]] = [
        (TAG_WIDTH, 4, [width]),
        (TAG_HEIGHT, 4, [height]),
        (TAG_BITS, 3, [bits] * spp),
        (TAG_COMPRESSION, 3, [comp]),
        # RGB photometric for 3-band uint8 (PIL/GDAL interop); else min-is-black
        (TAG_PHOTOMETRIC, 3, [2 if (spp == 3 and bits == 8) else 1]),
        (TAG_SPP, 3, [spp]),
        (TAG_ROWS_PER_STRIP, 3, [rows_per_strip]),
        (TAG_PLANAR, 3, [1]),
        (TAG_SAMPLE_FORMAT, 3, [sample_format] * spp),
    ]
    if spp > 3:
        entries.append((TAG_EXTRA_SAMPLES, 3, [0] * (spp - 3)))
    if geo is not None:
        t = geo.transform
        entries.append((TAG_MODEL_PIXEL_SCALE, 12, [abs(t.a), abs(t.e), 0.0]))
        entries.append(
            (TAG_MODEL_TIEPOINT, 12, [0.0, 0.0, 0.0, t.c, t.f, 0.0])
        )
        if geo.epsg is not None:
            model_type = 2 if geo.epsg == 4326 else 1
            cs_key = (
                GEOKEY_GEOGRAPHIC_CS if geo.epsg == 4326 else GEOKEY_PROJECTED_CS
            )
            entries.append(
                (
                    TAG_GEO_KEYS,
                    3,
                    [1, 1, 0, 2,
                     GEOKEY_GT_MODEL_TYPE, 0, 1, model_type,
                     cs_key, 0, 1, int(geo.epsg)],
                )
            )
        if geo.nodata is not None:
            nd = f"{geo.nodata:g}\0"
            entries.append((TAG_GDAL_NODATA, 2, [nd]))

    # layout: header | IFD | tag overflow data | strip data.
    # Classic: 8B header, 12B entries, u32 counts/offsets, 4B inline.
    # BigTIFF: 16B header, 20B entries, u64 counts/offsets, 8B inline.
    n_strips = len(strips)
    off_type = 16 if bigtiff else 4  # LONG8 vs LONG for strip offsets/counts
    entries.append((TAG_STRIP_OFFSETS, off_type, [0] * n_strips))  # patched below
    entries.append((TAG_STRIP_COUNTS, off_type, [len(s) for s in strips]))
    entries.sort(key=lambda e: e[0])

    inline = 8 if bigtiff else 4
    header_size = 16 if bigtiff else 8
    entry_size = 20 if bigtiff else 12
    ifd_size = (
        (8 + len(entries) * entry_size + 8)
        if bigtiff
        else (2 + len(entries) * entry_size + 4)
    )

    def encoded_size(typ: int, vals: list) -> int:
        if typ == 2:
            return sum(len(v) for v in vals)
        return _TYPE_SIZES[typ] * len(vals)

    ifd_offset = header_size
    overflow_offset = ifd_offset + ifd_size
    overflow_size = sum(
        encoded_size(typ, vals)
        for _, typ, vals in entries
        if encoded_size(typ, vals) > inline
    )
    data_offset = overflow_offset + overflow_size
    # strip offsets now known
    strip_offsets = []
    pos = data_offset
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    for i, (tag, typ, vals) in enumerate(entries):
        if tag == TAG_STRIP_OFFSETS:
            entries[i] = (tag, typ, strip_offsets)

    def encode_values(typ: int, vals: list) -> bytes:
        if typ == 2:
            return b"".join(v.encode("ascii") for v in vals)
        fmt = _TYPE_FMT[typ]
        return struct.pack("<" + fmt * len(vals), *vals)

    count_fmt = "<Q" if bigtiff else "<I"
    out = bytearray()
    if bigtiff:
        out += b"II" + struct.pack("<HHH", 43, 8, 0) + struct.pack("<Q", ifd_offset)
        out += struct.pack("<Q", len(entries))
    else:
        out += b"II*\0" + struct.pack("<I", ifd_offset)
        out += struct.pack("<H", len(entries))
    overflow = bytearray()
    for tag, typ, vals in entries:
        enc = encode_values(typ, vals)
        count = len(vals) if typ != 2 else len(enc)
        out += struct.pack("<HH", tag, typ) + struct.pack(count_fmt, count)
        if len(enc) <= inline:
            out += enc.ljust(inline, b"\0")
        else:
            out += struct.pack(count_fmt, overflow_offset + len(overflow))
            overflow += enc
    out += struct.pack(count_fmt, 0)  # next IFD
    out += overflow
    assert len(out) == data_offset, (len(out), data_offset)
    for s in strips:
        out += s
    Path(path).write_bytes(bytes(out))
