"""Native C++ decode/letterbox library (ctypes bridge) — parity vs the
cv2 letterbox reference and failure handling. Tests run against the built
library when present, else the cv2 fallback path."""
import cv2
import numpy as np

from face_detection_and_recognition_tpu.utils.native import (
    decode_letterbox_batch, decode_letterbox_jpeg, native_available)


def _jpeg_bytes(rng, hw=(240, 320)):
    img = rng.randint(0, 255, (*hw, 3)).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    return img, enc.tobytes()


def test_single_decode_letterbox(rng):
    img, b = _jpeg_bytes(rng)
    out = decode_letterbox_jpeg(b, (128, 128))
    assert out is not None and out.shape == (128, 128, 3)
    # letterbox geometry: 240x320 -> scale 0.4 -> 96x128, pad top/bottom 16
    assert (out[:16] == 125).all() and (out[-16:] == 125).all()
    assert not (out[64] == 125).all()


def test_decode_matches_cv2_within_jpeg_tolerance(rng):
    img, b = _jpeg_bytes(rng, (200, 300))
    out = decode_letterbox_jpeg(b, (256, 256))
    dec = cv2.imdecode(np.frombuffer(b, np.uint8), cv2.IMREAD_COLOR)
    from tests.test_geometry import ref_pad_resize

    ref = ref_pad_resize(dec, (256, 256))
    # decoder + bilinear differences stay small on average
    assert np.abs(out.astype(int) - ref.astype(int)).mean() < 3.0


def test_batch_decode_and_failures(rng):
    _, b = _jpeg_bytes(rng)
    out, ok = decode_letterbox_batch([b, b"garbage", b], (64, 64),
                                     num_threads=2)
    assert out.shape == (3, 64, 64, 3)
    assert ok.tolist() == [True, False, True]


def test_corrupt_input_returns_none():
    assert decode_letterbox_jpeg(b"not a jpeg", (64, 64)) is None


def test_native_lib_reports_availability():
    # informational: both paths are exercised above either way
    assert native_available() in (True, False)
