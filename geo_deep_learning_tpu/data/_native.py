"""ctypes bridge to the native libtiff decoder (``native/tiff_reader.cc``).

The shared library is built on first use (one ``g++`` invocation, cached
under ``native/build/``); absence of a toolchain or libtiff degrades
silently to the pure-numpy codec. ``GDL_TPU_NO_NATIVE=1`` disables the
native path entirely (useful for parity debugging).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libgdltiff.so"
_TAR_LIB_PATH = _NATIVE_DIR / "build" / "libgdltar.so"
_DTYPES = {
    1: np.uint8,
    2: np.uint16,
    3: np.uint32,
    4: np.int8,
    5: np.int16,
    6: np.int32,
    7: np.float32,
    8: np.float64,
}

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"],
            cwd=_NATIVE_DIR,
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.debug("native tiff build failed: %s", e)
        return False


def get_lib() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried or os.environ.get("GDL_TPU_NO_NATIVE") == "1":
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError as e:
            logger.debug("native tiff load failed: %s", e)
            return None
        lib.gdl_tiff_read_info.argtypes = [ctypes.c_char_p] + [
            ctypes.POINTER(ctypes.c_int32)
        ] * 4
        lib.gdl_tiff_read_info.restype = ctypes.c_int
        lib.gdl_tiff_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
        lib.gdl_tiff_read.restype = ctypes.c_int
        _lib = lib
        logger.info("native libtiff decoder loaded from %s", _LIB_PATH)
    return _lib


_tar_lib: ctypes.CDLL | None = None
_tar_tried = False


def get_tar_lib() -> ctypes.CDLL | None:
    global _tar_lib, _tar_tried
    if _tar_lib is not None:
        return _tar_lib
    if _tar_tried or os.environ.get("GDL_TPU_NO_NATIVE") == "1":
        return _tar_lib
    with _lock:
        if _tar_lib is not None or _tar_tried:
            return _tar_lib
        _tar_tried = True
        if not _TAR_LIB_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_TAR_LIB_PATH))
        except OSError as e:
            logger.debug("native tar load failed: %s", e)
            return None
        lib.gdl_tar_open.argtypes = [ctypes.c_char_p]
        lib.gdl_tar_open.restype = ctypes.c_void_p
        lib.gdl_tar_next.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.gdl_tar_next.restype = ctypes.c_int
        lib.gdl_tar_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.gdl_tar_read.restype = ctypes.c_int
        lib.gdl_tar_close.argtypes = [ctypes.c_void_p]
        lib.gdl_tar_close.restype = None
        _tar_lib = lib
        logger.info("native tar reader loaded from %s", _TAR_LIB_PATH)
    return _tar_lib


def iter_tar_members_native(path: str | Path):
    """Yield (name, bytes) pairs from a tar shard via the native reader.

    Returns None (not an iterator) when the native library is unavailable
    so callers can fall back to Python's tarfile.
    """
    lib = get_tar_lib()
    if lib is None:
        return None

    def gen():
        handle = lib.gdl_tar_open(str(path).encode())
        if not handle:
            msg = f"cannot open tar shard {path}"
            raise OSError(msg)
        try:
            name_buf = ctypes.create_string_buffer(4096)
            size = ctypes.c_int64()
            while True:
                rc = lib.gdl_tar_next(handle, name_buf, ctypes.byref(size))
                if rc == 0:
                    return
                if rc < 0:
                    msg = f"tar parse error in {path}"
                    raise OSError(msg)
                buf = ctypes.create_string_buffer(size.value)
                if lib.gdl_tar_read(handle, buf) != 0:
                    msg = f"tar read error in {path}"
                    raise OSError(msg)
                yield name_buf.value.decode("utf-8", "replace"), buf.raw
        finally:
            lib.gdl_tar_close(handle)

    return gen()


def read_pixels_native(path: str | Path) -> np.ndarray | None:
    """Decode HWC pixel data natively; None means 'fall back to Python'."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    c = ctypes.c_int32()
    dt = ctypes.c_int32()
    p = str(path).encode()
    if lib.gdl_tiff_read_info(p, w, h, c, dt) != 0:
        return None
    dtype = _DTYPES.get(dt.value)
    if dtype is None:
        return None
    out = np.empty((h.value, w.value, c.value), dtype=dtype)
    if lib.gdl_tiff_read(p, out.ctypes.data_as(ctypes.c_void_p)) != 0:
        return None
    return out
