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


def bench_concurrent(svc, frame, n_clients: int, reqs_per_client: int,
                     batching: bool):
    """p50/p99 per-request latency + aggregate throughput under concurrent
    client load (the Triton dynamic_batching load condition the replaced
    row was designed for)."""
    import threading

    if batching and svc._batcher is None:
        svc.enable_dynamic_batching(max_batch=8, max_delay_ms=4.0)
    lat: list = []
    lock = threading.Lock()
    start = threading.Barrier(n_clients + 1)

    def client():
        mine = []
        start.wait()
        for _ in range(reqs_per_client):
            t0 = time.perf_counter()
            svc.detect_faces(frame)
            mine.append((time.perf_counter() - t0) * 1e3)
        with lock:
            lat.extend(mine)

    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    for t in threads:
        t.start()
    start.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    s = np.sort(np.asarray(lat))
    return {
        "clients": n_clients,
        "batching": batching,
        "p50_ms": float(np.percentile(s, 50)),
        "p99_ms": float(np.percentile(s, 99)),
        "rps": len(lat) / wall,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--concurrent", action="store_true",
                    help="also run the multi-client load sweep")
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

    if args.concurrent:
        for nc in (1, 8, 32):
            for batching in (False, True):
                if batching:
                    fresh = FaceService(ServiceConfig(detector="yolov5s"))
                    # compile EVERY padding bucket up front (1/2/4/8):
                    # a first-hit bucket mid-benchmark is a 20-40s XLA
                    # compile booked against one unlucky request's p99
                    fresh.warmup(shapes=(FRAME_HW,), batches=(1, 2, 4, 8))
                    fresh.enable_dynamic_batching(max_batch=8,
                                                  max_delay_ms=4.0)
                else:
                    fresh = svc
                # shape warmup: drive a few requests through first
                for _ in range(3):
                    fresh.detect_faces(frame)
                r = bench_concurrent(fresh, frame, nc,
                                     max(args.iters // nc, 4), batching)
                print(f"concurrent clients={r['clients']:>2} "
                      f"batching={str(r['batching']):>5}: "
                      f"p50 {r['p50_ms']:.0f} / p99 {r['p99_ms']:.0f} ms, "
                      f"{r['rps']:.1f} req/s", flush=True)


if __name__ == "__main__":
    main()
