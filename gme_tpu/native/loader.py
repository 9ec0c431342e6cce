"""ctypes bindings to the native C++ host runtime (libgme_native.so).

The native library provides the host-side components that sit off-device by
necessity (SURVEY.md §2.3): raw-video (y4m) decode into packed frame
buffers and a multi-threaded zlib PNG writer for the results streams.
Built with `python -m gme_tpu.native.build`; every caller falls back to
pure Python when the library is absent.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libgme_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.gme_y4m_probe.restype = ctypes.c_int
        lib.gme_y4m_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.gme_y4m_decode.restype = ctypes.c_int
        lib.gme_y4m_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.gme_codec_available.restype = ctypes.c_int
        lib.gme_codec_available.argtypes = []
        lib.gme_codec_open.restype = ctypes.c_void_p
        lib.gme_codec_open.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.gme_codec_read_gray.restype = ctypes.c_int
        lib.gme_codec_read_gray.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.gme_codec_close.restype = None
        lib.gme_codec_close.argtypes = [ctypes.c_void_p]
        lib.gme_write_png.restype = ctypes.c_int
        lib.gme_write_png.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.gme_png_writer_start.restype = ctypes.c_int
        lib.gme_png_writer_start.argtypes = [ctypes.c_int]
        lib.gme_png_writer_submit.restype = ctypes.c_int
        lib.gme_png_writer_submit.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.gme_png_writer_drain.restype = ctypes.c_int
        lib.gme_png_writer_drain.argtypes = []
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def decode_y4m(path: str) -> List[np.ndarray]:
    lib = _load()
    assert lib is not None
    w = ctypes.c_int()
    h = ctypes.c_int()
    n = ctypes.c_int()
    rc = lib.gme_y4m_probe(path.encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(n))
    if rc != 0:
        raise ValueError(f"native y4m probe failed ({rc}) for {path}")
    buf = np.empty((n.value, h.value, w.value), dtype=np.uint8)
    rc = lib.gme_y4m_decode(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size,
    )
    if rc != 0:
        raise ValueError(f"native y4m decode failed ({rc}) for {path}")
    return [buf[i] for i in range(n.value)]


def codec_available() -> bool:
    """True when the library was built with FFmpeg/libav support."""
    lib = _load()
    return lib is not None and bool(lib.gme_codec_available())


def decode_codec(path: str) -> List[np.ndarray]:
    """Decode a codec video (mp4/webm/...) to grayscale frames via the
    native FFmpeg shim — same BT.601 fixed-point grayscale as the cv2
    path (bit-identical frames)."""
    lib = _load()
    assert lib is not None and lib.gme_codec_available()
    w = ctypes.c_int()
    h = ctypes.c_int()
    handle = lib.gme_codec_open(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if not handle:
        raise ValueError(f"native codec open failed for {path}")
    frames: List[np.ndarray] = []
    try:
        while True:
            buf = np.empty((h.value, w.value), dtype=np.uint8)
            rc = lib.gme_codec_read_gray(
                handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            )
            if rc == 0:
                break
            if rc < 0:
                raise ValueError(f"native codec decode failed ({rc}) for {path}")
            frames.append(buf)
    finally:
        lib.gme_codec_close(handle)
    return frames


def iter_codec(path: str):
    """Streaming variant of `decode_codec`: yields grayscale frames one at
    a time from the native demux/decode handle (the handle API is already
    incremental — gme_codec_open/read_gray/close)."""
    lib = _load()
    assert lib is not None and lib.gme_codec_available()
    w = ctypes.c_int()
    h = ctypes.c_int()
    handle = lib.gme_codec_open(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if not handle:
        raise ValueError(f"native codec open failed for {path}")
    try:
        while True:
            buf = np.empty((h.value, w.value), dtype=np.uint8)
            rc = lib.gme_codec_read_gray(
                handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            )
            if rc == 0:
                return
            if rc < 0:
                raise ValueError(f"native codec decode failed ({rc}) for {path}")
            yield buf
    finally:
        lib.gme_codec_close(handle)


def write_png(path: str, img: np.ndarray) -> None:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img)
    if img.ndim == 2:
        channels = 1
    elif img.ndim == 3 and img.shape[2] == 3:
        channels = 3
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    rc = lib.gme_write_png(
        path.encode(),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[1],
        img.shape[0],
        channels,
        1,
    )
    if rc != 0:
        raise IOError(f"native png write failed ({rc}) for {path}")


class AsyncPNGWriter:
    """Multi-threaded background PNG writer (native worker pool)."""

    def __init__(self, workers: int = 2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built")
        self._lib = lib
        rc = lib.gme_png_writer_start(workers)
        if rc != 0:
            raise RuntimeError("failed to start native png writer pool")

    def submit(self, path: str, img: np.ndarray) -> None:
        img = np.ascontiguousarray(img)
        channels = 1 if img.ndim == 2 else img.shape[2]
        rc = self._lib.gme_png_writer_submit(
            path.encode(),
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            img.shape[1],
            img.shape[0],
            channels,
            1,
        )
        if rc != 0:
            raise IOError(f"native png submit failed for {path}")

    def drain(self) -> None:
        self._lib.gme_png_writer_drain()
