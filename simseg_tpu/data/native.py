"""ctypes bindings for the native decode library (data/_native/decode.cc).

The reference's data path is torch DataLoader worker processes + PIL's C
decoders (SURVEY.md §2.9); here the hot decode+crop+resample runs in a C++
library so loader threads never hold the GIL during image work. JPEGs decode
with DCT-domain scaling (1/2, 1/4, 1/8) when the target resolution allows,
which skips most of the IDCT + color conversion cost of large photos.

The library builds lazily on first use (g++ -O3, cached next to the source);
set SIMSEG_NATIVE=0 to force the pure-PIL path. All entry points degrade
gracefully: ``available()`` is False when the toolchain or codec headers are
missing, and callers fall back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "_native", "decode.cc")
_LIB = os.path.join(_DIR, "_native", "libsimseg_decode.so")

FILTER_BILINEAR = 0
FILTER_BICUBIC = 1
FILTER_NEAREST = 2

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return True
    # compile to a private temp name and rename into place: rename is
    # atomic, so a concurrent process (multi-host shared checkout) never
    # dlopens a half-written library
    tmp = f"{_LIB}.build.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", tmp,
        "-ljpeg", "-lpng", "-lwebp", "-pthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if proc.returncode != 0:
        import logging

        logging.getLogger(__name__).warning(
            "native decode build failed (falling back to PIL):\n%s", proc.stderr
        )
        return False
    try:
        os.replace(tmp, _LIB)
    except OSError:
        return os.path.exists(_LIB)
    return True


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("SIMSEG_NATIVE", "1") == "0":
            return None
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.ssd_image_size.argtypes = [
            u8p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.ssd_image_size.restype = ctypes.c_int
        lib.ssd_decode.argtypes = [
            u8p, ctypes.c_size_t,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,  # crop
            ctypes.c_int, ctypes.c_int,  # out w, h
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # flip, filter, fast
            u8p,
        ]
        lib.ssd_decode.restype = ctypes.c_int
        lib.ssd_pool_new.argtypes = [ctypes.c_int]
        lib.ssd_pool_new.restype = ctypes.c_void_p
        lib.ssd_pool_free.argtypes = [ctypes.c_void_p]
        lib.ssd_pool_decode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            u8p, ctypes.POINTER(ctypes.c_int),
        ]
        lib.ssd_pool_decode_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as_u8p(data: bytes):
    return ctypes.cast(ctypes.c_char_p(data), ctypes.POINTER(ctypes.c_uint8))


def image_size(data: bytes) -> Tuple[int, int]:
    """(width, height) from the encoded header. Raises ValueError on
    unknown/corrupt input."""
    lib = _load()
    assert lib is not None
    w, h = ctypes.c_int(), ctypes.c_int()
    rc = lib.ssd_image_size(_as_u8p(data), len(data),
                            ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ValueError(f"cannot read image header (rc={rc})")
    return w.value, h.value


def decode(
    data: bytes,
    crop: Optional[Tuple[int, int, int, int]] = None,
    out_size: Optional[Tuple[int, int]] = None,  # (w, h)
    flip: bool = False,
    filter: int = FILTER_BILINEAR,
    fast_scale: bool = True,
) -> np.ndarray:
    """Decode (+crop +resample +hflip) to an (H, W, 3) uint8 array.

    The GIL is released for the duration of the C call, so loader threads
    decode truly in parallel (unlike PIL's Python-level transform glue)."""
    lib = _load()
    assert lib is not None
    cx, cy, cw, ch = crop if crop is not None else (-1, -1, -1, -1)
    if out_size is None:
        if crop is not None:
            # the C side clamps the box to the image extent and (with no
            # out_size) emits the CLAMPED dims — size the buffer the same
            # way or an out-of-bounds crop would garble rows
            w, h = image_size(data)
            cx2, cy2 = min(max(cx, 0), w), min(max(cy, 0), h)
            ow, oh = min(cw, w - cx2), min(ch, h - cy2)
            if ow <= 0 or oh <= 0:
                raise ValueError(f"crop {crop} outside image {w}x{h}")
        else:
            ow, oh = image_size(data)
    else:
        ow, oh = out_size
    out = np.empty((oh, ow, 3), np.uint8)
    rc = lib.ssd_decode(
        _as_u8p(data), len(data), cx, cy, cw, ch,
        ow if out_size is not None else 0, oh if out_size is not None else 0,
        int(flip), int(filter), int(fast_scale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError(f"native decode failed (rc={rc})")
    return out


class BatchDecoder:
    """Persistent C++ thread pool decoding whole batches in one call into a
    contiguous (N, H, W, 3) uint8 buffer."""

    def __init__(self, threads: int = 0):
        lib = _load()
        assert lib is not None
        self._lib = lib
        self._pool = lib.ssd_pool_new(threads or (os.cpu_count() or 4))

    def __del__(self):
        pool = getattr(self, "_pool", None)
        if pool:
            self._lib.ssd_pool_free(pool)
            self._pool = None

    def decode_batch(
        self,
        datas: Sequence[bytes],
        out_w: int,
        out_h: int,
        crops: Optional[Sequence[Tuple[int, int, int, int]]] = None,
        flips: Optional[Sequence[bool]] = None,
        filter: int = FILTER_BILINEAR,
        fast_scale: bool = True,
    ) -> np.ndarray:
        n = len(datas)
        bufs = (ctypes.c_void_p * n)(
            *[ctypes.cast(ctypes.c_char_p(d), ctypes.c_void_p) for d in datas]
        )
        lens = (ctypes.c_size_t * n)(*[len(d) for d in datas])
        flat_crops = (ctypes.c_int * (4 * n))()
        for i in range(n):
            c = crops[i] if crops is not None else (-1, -1, -1, -1)
            flat_crops[4 * i:4 * i + 4] = c
        flat_flips = (ctypes.c_int * n)(
            *[int(flips[i]) if flips is not None else 0 for i in range(n)]
        )
        out = np.empty((n, out_h, out_w, 3), np.uint8)
        status = (ctypes.c_int * n)()
        rc = self._lib.ssd_pool_decode_batch(
            self._pool, n, bufs, lens, flat_crops, out_w, out_h, flat_flips,
            int(filter), int(fast_scale),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), status,
        )
        if rc != 0:
            bad = [i for i in range(n) if status[i] != 0]
            raise ValueError(f"native batch decode failed for indices {bad}")
        return out
