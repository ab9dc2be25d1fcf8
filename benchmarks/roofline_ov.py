"""Per-stage roofline for the encoded OpenVINO topologies (round-5 #4).

Round-4 left ov-0204 as the thinnest perf row (2540 fps b64 = 102x vs
273-1283x everywhere else) with no per-stage attribution. This traces the
IR-interpreter pipeline at b64/b128, groups device time by source file AND
by op, and measures the bf16 lever (make_ov_detect compute_dtype) against
the f32 baseline — either the named bottleneck gets a number or the
ceiling statement does.

Run (exclusive TPU): python benchmarks/roofline_ov.py [--arch ov-0204]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_GBS = 819.0


def bench(arch, batch, dtype_name, steps=3, trace=False):
    import jax
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    engine = FaceEngine(EngineConfig(detector=arch, det_thres=0.5,
                                     max_det=32, dtype=dtype))
    frames = jax.device_put(np.random.RandomState(0).randint(
        0, 255, (batch, 576, 1024, 3)).astype(np.uint8))
    out = engine.detect_batch(frames)
    float(jnp.sum(out.boxes[0, 0]))  # sync on one scalar (tunnel)

    trace_dir = tempfile.mkdtemp(prefix="roofline_ov_") if trace else None
    t0 = time.perf_counter()
    if trace:
        with jax.profiler.trace(trace_dir):
            for _ in range(steps):
                out = engine.detect_batch(frames)
            float(jnp.sum(out.boxes[0, 0]))
    else:
        for _ in range(steps):
            out = engine.detect_batch(frames)
        float(jnp.sum(out.boxes[0, 0]))
    wall = (time.perf_counter() - t0) / steps
    return batch / wall, wall, trace_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="ov-0204")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    from face_detection_and_recognition_tpu.utils import trace_analysis as TA

    for dt in ("f32", "bf16"):
        fps, wall, _ = bench(args.arch, args.batch, dt, args.steps)
        print(f"{args.arch} b{args.batch} {dt}: {wall*1e3:.1f} ms/step, "
              f"{fps:.0f} fps", flush=True)

    # trace the bf16 path (the production dtype)
    fps, wall, trace_dir = bench(args.arch, args.batch, "bf16",
                                 args.steps, trace=True)
    path = TA.find_trace_file(trace_dir)
    ops = TA.load_device_ops(path)
    rows = TA.summarize_by(ops, TA.source_file_key, steps=args.steps)
    total_ms = sum(ms for _, ms, _ in rows)
    print(f"\ndevice total {total_ms:.1f} ms/step (bf16)")
    print(f"{'stage':44s} {'ms/step':>8s} {'GB/step':>8s} {'GB/s':>7s} "
          f"{'%HBM':>5s}")
    for key, ms, gb in rows:
        gbs = gb / (ms / 1e3) if ms > 0 else 0.0
        print(f"{key:44s} {ms:8.2f} {gb:8.2f} {gbs:7.0f} "
              f"{100 * gbs / V5E_HBM_GBS:5.0f}")
    print("\n-- top ops --")
    for o in TA.top_ops(ops, n=12, steps=args.steps):
        gbs = o.bytes_accessed / 1e9 / (o.duration_us / 1e6) \
            if o.duration_us else 0
        print(f"{o.duration_us/1e3:8.2f} ms {gbs:6.0f} GB/s  "
              f"x{o.occurrences:<4d} {o.name[:70]}")


if __name__ == "__main__":
    main()
