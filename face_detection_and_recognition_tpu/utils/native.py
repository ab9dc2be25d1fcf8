"""ctypes bridge to the native C++ decode/preprocess library.

Loads ``native/libfdrt_native.so`` (build: ``make -C native``) which decodes
JPEGs with libjpeg (DCT-scaled) and letterboxes into fixed buffers on a
thread pool — the native replacement for python/cv2 decode on the host side
of the pipeline. Falls back to cv2 when the library is not built.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "native", "libfdrt_native.so")


def load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.fdrt_decode_letterbox.restype = ctypes.c_int
    lib.fdrt_decode_letterbox.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint8, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.fdrt_decode_letterbox_batch.restype = ctypes.c_int
    lib.fdrt_decode_letterbox_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint8,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    if hasattr(lib, "fdrt_jpeg_dims"):  # v2 API
        lib.fdrt_jpeg_dims.restype = ctypes.c_int
        lib.fdrt_jpeg_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.fdrt_decode_bgr.restype = ctypes.c_int
        lib.fdrt_decode_bgr.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return load_native() is not None


def decode_letterbox_jpeg(
    jpeg_bytes: bytes, out_wh: Tuple[int, int], fill: int = 125
) -> Optional[np.ndarray]:
    """JPEG bytes -> letterboxed BGR u8 [h, w, 3]; None on decode failure.
    Uses the native library when built, else cv2."""
    w, h = out_wh
    lib = load_native()
    if lib is not None:
        out = np.empty((h, w, 3), np.uint8)
        rc = lib.fdrt_decode_letterbox(
            jpeg_bytes, len(jpeg_bytes), w, h, fill,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc == 0:
            return out
        # fall through to cv2: libjpeg rejects CMYK/arithmetic-coded files
        # cv2 can decode — coverage must not depend on the native build
    import cv2

    img = cv2.imdecode(np.frombuffer(jpeg_bytes, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        return None
    from ..ops.geometry import letterbox_params

    ih, iw = img.shape[:2]
    _, sh, sw, top, left = letterbox_params((ih, iw), (h, w))
    resized = cv2.resize(img, (sw, sh))
    canvas = np.full((h, w, 3), fill, np.uint8)
    canvas[top : top + sh, left : left + sw] = resized
    return canvas


def decode_letterbox_batch(
    jpeg_list: List[bytes], out_wh: Tuple[int, int], fill: int = 125,
    num_threads: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batch decode -> ([N, h, w, 3] u8, ok mask [N]). Failed slots are
    fill-colored."""
    w, h = out_wh
    n = len(jpeg_list)
    lib = load_native()
    if lib is None or n == 0:
        out = np.full((n, h, w, 3), fill, np.uint8)
        ok = np.zeros(n, bool)
        for i, b in enumerate(jpeg_list):
            img = decode_letterbox_jpeg(b, out_wh, fill)
            if img is not None:
                out[i] = img
                ok[i] = True
        return out, ok
    out = np.empty((n, h, w, 3), np.uint8)
    status = np.empty(n, np.int32)
    bufs = (ctypes.c_char_p * n)(*jpeg_list)
    lens = (ctypes.c_size_t * n)(*[len(b) for b in jpeg_list])
    lib.fdrt_decode_letterbox_batch(
        bufs, lens, n, w, h, fill,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    ok = status == 0
    for i in np.nonzero(~ok)[0]:  # cv2 rescue for libjpeg-rejected files
        img = decode_letterbox_jpeg(bytes(jpeg_list[i]), out_wh, fill)
        if img is not None:
            out[i] = img
            ok[i] = True
    return out, ok


def decode_jpeg_bgr(jpeg_bytes: bytes) -> Optional[np.ndarray]:
    """Full-resolution JPEG decode -> BGR u8 [H, W, 3] (the cv2.imread slot
    in the dataset loaders). Native libjpeg when built (ctypes releases the
    GIL, so PrefetchLoader workers decode in true parallel); cv2 fallback."""
    lib = load_native()
    if lib is not None and hasattr(lib, "fdrt_decode_bgr"):
        w = ctypes.c_int()
        h = ctypes.c_int()
        if lib.fdrt_jpeg_dims(jpeg_bytes, len(jpeg_bytes),
                              ctypes.byref(w), ctypes.byref(h)) == 0:
            out = np.empty((h.value, w.value, 3), np.uint8)
            rc = lib.fdrt_decode_bgr(
                jpeg_bytes, len(jpeg_bytes),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                w.value, h.value,
            )
            if rc == 0:
                return out
    import cv2

    return cv2.imdecode(np.frombuffer(jpeg_bytes, np.uint8), cv2.IMREAD_COLOR)


def read_image_bgr(path: str) -> Optional[np.ndarray]:
    """Read any image file as BGR u8; JPEGs ride the native decoder."""
    if os.path.splitext(path)[1].lower() in (".jpg", ".jpeg"):
        try:
            with open(path, "rb") as f:
                return decode_jpeg_bgr(f.read())
        except OSError:
            return None
    import cv2

    return cv2.imread(path)
