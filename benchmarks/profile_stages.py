"""Stage-level throughput breakdown of the detect pipeline on real TPU.

Times cumulative prefixes of the yolov5s pipeline (preprocess / +backbone /
+decode / +NMS) at the bench batch size so regressions localize to a stage.
Methodology notes (hard-won on the axon rig):
  * sync on ONE scalar of the last result — block_until_ready is a no-op
    through the tunnel and device->host fetch is ~12MB/s;
  * reduce intermediate stages to scalars — materializing a standalone
    [B, 640, 640, 3] output forces a lane-padded (C 3->128) layout copy
    that allocates 26GB and OOMs.

Round-2 baseline after the candidates-first rewrite (v5e-1, b128 @
576x1024, bf16): preprocess ~6ms (normalize fused before letterbox pad),
+backbone ~21ms (at ~660GB/s, the HBM roofline), +select/decode ~5ms
(top-k on raw logits, [B, K] decode), +NMS ~2ms -> ~3600 fps engine e2e.
The old full-grid decode+postprocess stages cost ~13.6ms more; see
yolov5_face_detect_maps. For an op-level breakdown use
utils/trace_analysis.py on a jax.profiler trace.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128
FRAME_HW = (576, 1024)
ITERS = 20


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.models.yolov5_face import (
        ARCHS, YoloV5FaceConfig, YoloV5FaceNet, yolov5_face_detect_maps)
    from face_detection_and_recognition_tpu.ops import preprocess as P

    cfg = YoloV5FaceConfig(arch="yolov5s", input_size=(640, 640))
    net = YoloV5FaceNet(arch=cfg.arch, nc=cfg.nc, dtype=jnp.bfloat16)
    variables = jax.jit(net.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3), jnp.float32))
    spec = ARCHS[cfg.arch]
    frames = jax.device_put(np.random.RandomState(0).randint(
        0, 255, (BATCH, *FRAME_HW, 3)).astype(np.uint8))

    def pre(x):
        return P.apply_preprocess_batch(x, P.YOLOV5_FACE, jnp.bfloat16)

    def backbone(x):
        return net.apply(variables, pre(x))

    def full(x):
        return yolov5_face_detect_maps(
            backbone(x), spec["anchors"], spec["strides"], cfg)

    stages = [
        ("preprocess", jax.jit(lambda x: jnp.sum(pre(x)))),
        ("+backbone", jax.jit(lambda x: [jnp.sum(m) for m in backbone(x)])),
        ("+select+NMS", jax.jit(full)),
    ]

    def sync(o):
        leaves = jax.tree_util.tree_leaves(o)
        float(jnp.sum(jnp.ravel(leaves[0])[0]))

    prev = 0.0
    for label, fn in stages:
        o = fn(frames)
        sync(o)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            o = fn(frames)
        sync(o)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{label:14s} {dt * 1e3:7.2f} ms  (+{(dt - prev) * 1e3:6.2f})  "
              f"{BATCH / dt:6.0f} fps", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
