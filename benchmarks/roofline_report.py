"""Per-stage roofline table for the headline detector (VERDICT r2 weak #8).

Captures a jax.profiler trace of the yolov5s b128 e2e pipeline, groups
device time + bytes by project source file (utils/trace_analysis.py), and
prints a roofline table: per stage, device ms, HBM bytes, achieved GB/s,
estimated FLOPs and TFLOP/s, against the v5e-1 ceilings (~197 bf16 TFLOP/s,
~819 GB/s spec / ~660 GB/s achievable). States WHERE the ceiling is: a
stage at the bandwidth roofline cannot go faster without moving fewer
bytes; a stage far from both rooflines is latency/dispatch-bound.

Run (exclusive TPU): python benchmarks/roofline_report.py [--batch 128]
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

# FLOP model: conv FLOPs of the yolov5s-face graph at 640x640 ~= 5.7 GFLOP
# per frame (2*MACs summed over the graph table); postprocess is <1% FLOPs.
YOLOV5S_GFLOP_PER_FRAME = 5.7


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--arch", default="yolov5s")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--rect", action="store_true",
                    help="rect letterbox canvas (384x640 for 576x1024)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)
    from face_detection_and_recognition_tpu.utils import trace_analysis as TA

    engine = FaceEngine(EngineConfig(detector=args.arch, dtype=jnp.bfloat16,
                                     rect=args.rect))
    frames = np.random.RandomState(0).randint(
        0, 255, (args.batch, 576, 1024, 3)).astype(np.uint8)
    # warmup/compile
    d = engine.detect_batch(frames)
    float(jnp.sum(d.boxes[0, 0]))

    trace_dir = tempfile.mkdtemp(prefix="roofline_")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            d = engine.detect_batch(frames)
        float(jnp.sum(d.boxes[0, 0]))
    wall = (time.perf_counter() - t0) / args.steps
    fps = args.batch / wall
    print(f"e2e: {wall * 1e3:.1f} ms/step, {fps:.0f} fps "
          f"(batch {args.batch})")

    path = TA.find_trace_file(trace_dir)
    ops = TA.load_device_ops(path)
    rows = TA.summarize_by(ops, TA.source_file_key, steps=args.steps)
    total_ms = sum(ms for _, ms, _ in rows)
    gflop = YOLOV5S_GFLOP_PER_FRAME
    if args.rect:
        from face_detection_and_recognition_tpu.ops.geometry import (
            rect_letterbox_size)

        tw, th = rect_letterbox_size((576, 1024), engine.spec.input_size,
                                     engine.spec.rect_stride or 32)
        iw, ih = engine.spec.input_size
        gflop *= (tw * th) / (iw * ih)  # conv FLOPs scale with canvas pixels
    frame_tflops = gflop * args.batch / 1e3
    print(f"\ndevice total {total_ms:.1f} ms/step | "
          f"achieved {frame_tflops / (total_ms / 1e3):.1f} TFLOP/s "
          f"({100 * frame_tflops / (total_ms / 1e3) / V5E_BF16_TFLOPS:.0f}% "
          f"of bf16 peak)")
    print(f"{'stage':40s} {'ms/step':>8s} {'GB/step':>8s} {'GB/s':>7s} "
          f"{'%HBM':>5s}")
    for key, ms, gb in rows:
        gbs = gb / (ms / 1e3) if ms > 0 else 0.0
        print(f"{key:40s} {ms:8.2f} {gb:8.2f} {gbs:7.0f} "
              f"{100 * gbs / V5E_HBM_GBS:5.0f}")
    print("\nceiling: stages at >=70% HBM bandwidth are at the memory "
          "roofline — only fewer activation bytes (layout, fusion, dtype) "
          "can improve them; low-GB/s low-TFLOP/s stages are "
          "latency/dispatch-bound.")


if __name__ == "__main__":
    main()
