"""Serving-latency benchmark: batch-1 p50/p90 through FaceService.

Mirrors the reference's serving condition (one 576x1024 frame per request
through the Triton ensemble, ``face_detection_trt_server/inference.py``)
against the in-process TPU service. Run after bench_all (shares the compile
cache): python benchmarks/bench_serving.py [--iters 50]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAME_HW = (576, 1024)


def percentiles(samples_ms):
    s = np.sort(np.asarray(samples_ms))
    return (float(np.percentile(s, 50)), float(np.percentile(s, 90)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from face_detection_and_recognition_tpu.serving.service import (
        FaceService, ServiceConfig)

    svc = FaceService(ServiceConfig(detector="yolov5s"))
    frame = np.random.RandomState(0).randint(
        0, 255, (*FRAME_HW, 3)).astype(np.uint8)

    for label, call in (
        ("detect_faces", lambda: svc.detect_faces(frame)),
        ("detect_embed_classify", lambda: svc.detect_embed_classify(frame)),
    ):
        call()  # compile / warmup
        call()
        lat = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            call()
            lat.append((time.perf_counter() - t0) * 1e3)
        p50, p90 = percentiles(lat)
        # the axon tunnel adds tens of ms of load-dependent jitter; min is
        # the reproducible floor (device compute + one uncontended upload)
        print(f"{label}: min {min(lat):.0f} / p50 {p50:.0f} / "
              f"p90 {p90:.0f} ms ({args.iters} iters)", flush=True)


if __name__ == "__main__":
    main()
