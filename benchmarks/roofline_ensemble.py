"""Per-stage roofline for the LOADED fused ensemble (round-3 VERDICT #7).

The detect-only pipeline has a published roofline (roofline_report.py);
this does the same for ``detect_embed_classify_batch`` — detect -> crop ->
embed -> age/gender in ONE XLA program — with TRAINED weights and REAL
faces (the golden 3-face image tiled to the video resolution, so ~3 valid
slots/frame drive the slot-skip scan the way production frames would).
Groups device time + HBM bytes by project source file so the 26 ms of
previously unattributed step time lands on named stages.

Run (exclusive TPU):
    python benchmarks/roofline_ensemble.py [--batch 32] [--no-rect]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0

D = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests", "data")


def golden_frames(batch: int, hw=(576, 1024)) -> np.ndarray:
    """The golden 3-face image letterboxed to the benchmark video
    resolution, replicated: every frame detects 3 REAL faces."""
    import cv2

    img = cv2.imread(os.path.join(D, "test2_faces_3.jpg"))
    h, w = hw
    canvas = np.zeros((h, w, 3), np.uint8)
    s = min(w / img.shape[1], h / img.shape[0])
    nw, nh = int(img.shape[1] * s), int(img.shape[0] * s)
    canvas[:nh, :nw] = cv2.resize(img, (nw, nh))
    return np.repeat(canvas[None], batch, axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--arch", default="yolov5s")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--no-rect", action="store_true")
    ap.add_argument("--no-ag", action="store_true",
                    help="skip the age/gender stage (lever comparison)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)
    from face_detection_and_recognition_tpu.utils import trace_analysis as TA

    engine = FaceEngine(EngineConfig(
        detector=args.arch, dtype=jnp.bfloat16, rect=not args.no_rect,
        det_thres=0.5, embedder="mobile_facenet", with_age_gender=True))
    engine.load_weights(os.path.join(D, f"golden_{args.arch}_ckpt"))
    engine.load_embed_weights(os.path.join(D, "golden_embed_ckpt"))
    engine.load_age_gender_weights(os.path.join(D, "golden_ag_ckpt"))

    frames = golden_frames(args.batch)
    run = lambda: engine.detect_embed_classify_batch(  # noqa: E731
        frames, want_ag=not args.no_ag)
    r = run()  # compile
    n_faces = int(np.asarray(jnp.sum(r.det.valid)))
    print(f"valid faces/step: {n_faces} "
          f"({n_faces / args.batch:.1f}/frame)")

    trace_dir = tempfile.mkdtemp(prefix="roofline_ens_")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            r = run()
        float(jnp.sum(r.embeddings[0, 0]))
    wall = (time.perf_counter() - t0) / args.steps
    print(f"e2e: {wall * 1e3:.1f} ms/step, {args.batch / wall:.0f} fps "
          f"(batch {args.batch}, rect={not args.no_rect}, "
          f"ag={not args.no_ag})")

    path = TA.find_trace_file(trace_dir)
    ops = TA.load_device_ops(path)
    rows = TA.summarize_by(ops, TA.source_file_key, steps=args.steps)
    total_ms = sum(ms for _, ms, _ in rows)
    print(f"\ndevice total {total_ms:.1f} ms/step")
    print(f"{'stage':44s} {'ms/step':>8s} {'GB/step':>8s} {'GB/s':>7s} "
          f"{'%HBM':>5s}")
    for key, ms, gb in rows:
        gbs = gb / (ms / 1e3) if ms > 0 else 0.0
        print(f"{key:44s} {ms:8.2f} {gb:8.2f} {gbs:7.0f} "
              f"{100 * gbs / V5E_HBM_GBS:5.0f}")
    print("\nceiling: stages at >=70% HBM bandwidth are at the memory "
          "roofline; low-GB/s stages are compute- or dispatch-bound.")


if __name__ == "__main__":
    main()
