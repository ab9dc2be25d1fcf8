"""Benchmark every detector family at the reference's headline condition
(576x1024 video frames) on the real TPU, plus embedder throughput.

Writes BENCHMARKS.md with the per-detector table mirroring the reference
README's FPS table (BASELINE.md).

Run: python benchmarks/bench_all.py [--quick]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAME_HW = (576, 1024)

# (registry name, reference row, baseline fps, batch)
DETECTORS = [
    ("yolov5s", "YOLOv5s-face", 13.0, 128),
    ("yolov5n", "YOLOv5n-face", 13.0, 128),
    ("blazeface-front", "BlazeFace front pytorch", 21.0, 256),
    ("blazeface-back", "BlazeFace back onnx", 30.0, 256),
    ("ssd-resnet10", "OpenCV SSD caffemodel", 18.0, 256),
    ("ssd-mobilenetv2", "OpenVINO MobileNetV2-SSD", 25.0, 128),
    ("ssd-squeezenet", "OpenVINO SqueezeNet-SSD", 28.0, 256),
    ("mtcnn", "MTCNN", 2.0, 64),
]


def fetch(tree):
    """Sync on ONE scalar of the last result: axon's device->host link is
    ~12MB/s, so fetching a full tensor would dominate the measurement;
    in-order execution means one element proves the step finished."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(tree)
    float(jnp.sum(jnp.ravel(leaves[0])[0]))


def bench_detector(name: str, batch: int, iters: int = 10):
    import jax
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.core.engine import (EngineConfig,
                                                                FaceEngine)

    engine = FaceEngine(EngineConfig(detector=name, det_thres=0.5,
                                     max_det=32, dtype=jnp.bfloat16))
    rng = np.random.RandomState(0)
    frames = jax.device_put(
        rng.randint(0, 255, (batch, *FRAME_HW, 3)).astype(np.uint8)
    )
    out = engine.detect_batch(frames)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = engine.detect_batch(frames)
    fetch(out)
    return batch * iters / (time.perf_counter() - t0)


def bench_embedder(name: str, batch: int = 256, iters: int = 10):
    import jax
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.models.embedders import get_embedder

    spec = get_embedder(name)
    _, variables, embed = spec.build(dtype=jnp.bfloat16)
    w, h = spec.input_size
    crops = jax.device_put(
        np.random.RandomState(0).uniform(-1, 1, (batch, h, w, 3)).astype(np.float32)
    )
    out = embed(variables, crops)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = embed(variables, crops)
    fetch(out)
    return batch * iters / (time.perf_counter() - t0)


def bench_ensemble(batch: int = 32, iters: int = 10):
    """Full fused detect->crop->embed->age/gender program (the Triton
    ensemble's TPU collapse): frames/s at 576x1024 with 32 face slots per
    frame cropped, embedded (512-d) and classified in the same program."""
    import jax
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.core.engine import (EngineConfig,
                                                                FaceEngine)

    engine = FaceEngine(EngineConfig(
        detector="yolov5s", det_thres=0.5, max_det=32, dtype=jnp.bfloat16,
        embedder="mobile_facenet", with_age_gender=True,
    ))
    rng = np.random.RandomState(0)
    frames = jax.device_put(
        rng.randint(0, 255, (batch, *FRAME_HW, 3)).astype(np.uint8))
    out = engine.detect_embed_classify_batch(frames)
    fetch(out.embeddings)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = engine.detect_embed_classify_batch(frames)
    fetch(out.embeddings)
    return batch * iters / (time.perf_counter() - t0), batch


def main():
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="skip the slow-compile detectors (mtcnn)")
    args = ap.parse_args()
    import jax

    platform = jax.devices()[0].platform
    rows = []
    for name, ref_row, base, batch in DETECTORS:
        if args.quick and name == "mtcnn":
            continue
        try:
            t0 = time.time()
            fps = bench_detector(name, batch)
            rows.append((ref_row, name, base, batch, fps))
            print(f"{name}: {fps:.0f} fps ({fps/base:.0f}x baseline, "
                  f"{time.time()-t0:.0f}s incl compile)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    ens_fps = ens_batch = None
    try:
        ens_fps, ens_batch = bench_ensemble()
        print(f"fused ensemble: {ens_fps:.0f} fps (b{ens_batch})", flush=True)
    except Exception as e:
        print(f"ensemble: FAILED {e}", flush=True)

    emb_rows = []
    for name in ("mobile_facenet", "facenet", "reid-mnv2"):
        try:
            fps = bench_embedder(name)
            emb_rows.append((name, fps))
            print(f"embedder {name}: {fps:.0f} crops/s", flush=True)
        except Exception as e:
            print(f"embedder {name}: FAILED {e}", flush=True)

    with open("BENCHMARKS.md", "w") as f:
        f.write("# Benchmarks — TPU v5e-1 vs the reference's i9-CPU table\n\n")
        f.write(f"Condition: {FRAME_HW[0]}x{FRAME_HW[1]} frames (the reference "
                "README's video benchmark), bf16 backbones, end-to-end "
                "(preprocess + backbone + decode + NMS + postprocess), "
                f"platform `{platform}`.\n\n")
        f.write("| Detector | Reference FPS (i9 CPU) | This framework (batch) | Speedup |\n")
        f.write("|---|---|---|---|\n")
        for ref_row, name, base, batch, fps in rows:
            f.write(f"| {ref_row} (`{name}`) | {base:.0f} | "
                    f"{fps:.0f} (b{batch}) | {fps/base:.0f}x |\n")
        f.write("\n| Embedder | crops/s (112-160px, batch 256) |\n|---|---|\n")
        for name, fps in emb_rows:
            f.write(f"| {name} | {fps:.0f} |\n")
        if ens_fps is not None:
            f.write(
                "\n## Fused ensemble (Triton-graph equivalent)\n\n"
                "detect + 32 face crops + 512-d embed + age/gender per frame "
                "in ONE XLA program (no host round-trips between stages; the "
                "reference needed three Triton containers and two gRPC "
                f"hops): **{ens_fps:.0f} frames/s** = "
                f"{ens_fps*32:.0f} face-slots/s at batch {ens_batch}, "
                "576x1024 input.\n"
                "\nThe reference's closest condition is the OpenCV "
                "age+gender pipeline at 12 FPS on i9 CPU (detect + per-face "
                f"crops + 2 classifiers): **{ens_fps/12:.0f}x**, while also "
                "computing 512-d embeddings the reference pipeline does not "
                "produce.\n"
            )
    print("wrote BENCHMARKS.md")


if __name__ == "__main__":
    main()
