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

# (registry name, reference row, baseline fps, batch, rect)
DETECTORS = [
    ("yolov5s", "YOLOv5s-face rect 384x640", 13.0, 128, True),
    ("yolov5s", "YOLOv5s-face square 640", 13.0, 128, False),
    ("yolov5n", "YOLOv5n-face rect 384x640", 13.0, 128, True),
    ("yolov5n", "YOLOv5n-face square 640", 13.0, 128, False),
    ("blazeface-front", "BlazeFace front pytorch", 21.0, 256, False),
    ("blazeface-back", "BlazeFace back onnx", 30.0, 256, False),
    ("ssd-resnet10", "OpenCV SSD caffemodel", 18.0, 256, False),
    ("ssd-mobilenetv2", "OpenVINO class-of MobileNetV2-SSD", 25.0, 128, False),
    ("ssd-squeezenet", "OpenVINO class-of SqueezeNet-SSD", 28.0, 256, False),
    # the EXACT encoded OMZ topologies (models/ov_topologies.py) through
    # the IR interpreter — the reference's real face-detection-0204 /
    # face-detection-retail-0004 rows, not class-of stand-ins
    ("ov-0204", "OpenVINO face-detection-0204 (exact topology)", 25.0, 64,
     False),
    ("ov-squeezenet-light", "OpenVINO face-detection-retail-0004 (exact "
     "topology)", 28.0, 128, False),
    ("mtcnn", "MTCNN", 2.0, 64, False),
]


def fetch(tree):
    """Sync on ONE scalar of the last result: axon's device->host link is
    ~12MB/s, so fetching a full tensor would dominate the measurement;
    in-order execution means one element proves the step finished."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(tree)
    float(jnp.sum(jnp.ravel(leaves[0])[0]))


def bench_detector(name: str, batch: int, iters: int = 10, rect: bool = False):
    import jax
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.core.engine import (EngineConfig,
                                                                FaceEngine)

    engine = FaceEngine(EngineConfig(detector=name, det_thres=0.5,
                                     max_det=32, dtype=jnp.bfloat16,
                                     rect=rect))
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


def bench_ensemble(batch: int = 32, iters: int = 10, rect: bool = False):
    """Full fused detect->crop->embed->age/gender program (the Triton
    ensemble's TPU collapse): frames/s at 576x1024 with 32 face slots per
    frame cropped, embedded (512-d) and classified in the same program."""
    import jax
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.core.engine import (EngineConfig,
                                                                FaceEngine)

    engine = FaceEngine(EngineConfig(
        detector="yolov5s", det_thres=0.5, max_det=32, dtype=jnp.bfloat16,
        embedder="mobile_facenet", with_age_gender=True, rect=rect,
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


def _jax_config():
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _run_one(spec: str) -> None:
    """Child-process entry: run ONE benchmark row, print one JSON line."""
    import json

    _jax_config()
    kind, *rest = spec.split(":")
    if kind == "det":
        name, batch, rect = rest[0], int(rest[1]), rest[2] == "1"
        fps = bench_detector(name, batch, rect=rect)
    elif kind == "ens":
        fps, _ = bench_ensemble(rect=rest[0] == "1")
    else:
        fps = bench_embedder(rest[0])
    print(json.dumps({"fps": fps}), flush=True)


def _in_subprocess(spec: str, timeout: float = 1200.0) -> float:
    """Run one row in a FRESH process. In-process sweeps skew later rows
    even with gc + clear_caches between them (square yolov5s measured 3414
    fps mid-sweep vs 4223 fresh; the rect ensemble 150 vs 422) — resident
    HBM/compile state from earlier rows is not fully reclaimable. The
    persistent compile cache keeps per-process startup cheap."""
    import json
    import subprocess

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--one", spec],
        capture_output=True, text=True, timeout=timeout)
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()[-3:]
        raise RuntimeError(f"row {spec} failed: {' | '.join(tail)}")
    return float(json.loads(proc.stdout.strip().splitlines()[-1])["fps"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="skip the slow-compile detectors (mtcnn)")
    ap.add_argument("--one", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.one:
        _run_one(args.one)
        return
    _jax_config()
    import jax

    platform = jax.devices()[0].platform

    rows = []
    for name, ref_row, base, batch, rect in DETECTORS:
        if args.quick and name == "mtcnn":
            continue
        try:
            t0 = time.time()
            fps = _in_subprocess(f"det:{name}:{batch}:{int(rect)}")
            rows.append((ref_row, name, base, batch, fps))
            print(f"{name}: {fps:.0f} fps ({fps/base:.0f}x baseline, "
                  f"{time.time()-t0:.0f}s incl compile)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    ens_fps = ens_batch = ens_rect_fps = None
    try:
        ens_fps, ens_batch = _in_subprocess("ens:0"), 32
        print(f"fused ensemble: {ens_fps:.0f} fps (b{ens_batch})", flush=True)
        ens_rect_fps = _in_subprocess("ens:1")
        print(f"fused ensemble rect: {ens_rect_fps:.0f} fps", flush=True)
    except Exception as e:
        print(f"ensemble: FAILED {e}", flush=True)

    emb_rows = []
    for name in ("mobile_facenet", "facenet", "facenet-512", "reid-mnv2"):
        try:
            fps = _in_subprocess(f"emb:{name}")
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
        f.write('\n("class-of": same architecture family and input size '
                "as the reference's IR models; the exact encoded "
                "topologies are the ov-0204 / ov-squeezenet-light rows — "
                "see PARITY.md.)\n")
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
                "576x1024 input"
                + (f" ({ens_rect_fps:.0f} frames/s with rect=True)"
                   if ens_rect_fps else "") + ".\n"
                "\nThe reference's closest condition is the OpenCV "
                "age+gender pipeline at 12 FPS on i9 CPU (detect + per-face "
                f"crops + 2 classifiers): **{ens_fps/12:.0f}x**, while also "
                "computing 512-d embeddings the reference pipeline does not "
                "produce.\n"
            )
        f.write(NOTES_FOOTER)
    print("wrote BENCHMARKS.md")


# Methodology + serving notes appended verbatim on every regeneration so a
# re-run never loses the hand-maintained context.
NOTES_FOOTER = """
## Ensemble slot skipping (round 3b)

The fused ensemble pads every frame to max_det face slots (the Triton
I/O contract) — but `FaceEngine._masked_chunked_net` sorts slots by
validity and runs the embed/age-gender nets inside a lax.scan whose
lax.cond skips all-invalid chunks, so those stages cost what the FACES
cost, not what the padding costs: rect ensemble 422 -> 905 fps on
faceless frames, 435 fps when ALL 1024 slots are valid (>= the dense
form either way). Valid slots always run the real nets (exact); invalid
slots return zeros. The ensemble row above reflects whatever face
density the random-weight benchmark produces (typically zero).

## Preprocess fusion (round 3b)

The resize stage got the bytes treatment too (interleaved in-pipeline A/B,
4x10 iters each, yolov5s b128):

- **Pad-through-matrix letterbox**: when the pad bands are a small canvas
  fraction, the zero rows ride the H resample matrix and the gray fill is
  one fused `where` — the separate canvas pass disappears. Rect step
  19.83 -> 19.34 ms (**-0.5 ms**). For the square 640 canvas (44% pad
  rows) the inflated intermediate costs MORE than the canvas pass, so
  `apply_preprocess` picks the strategy by pad fraction (<=1.25x) and
  keeps the staged form there — measured 31.0 vs 33.7 ms the wrong way
  around. W-resample-first variants lost in-pipeline in both modes
  (+0.9 ms) despite winning standalone: fusion context decides, so every
  variant was measured inside the full jitted detect program.
- **uint8 casts never run as their own pass**: `_resample_axis` slices the
  source FIRST and casts per GEMM operand.
- **Negative result — fused Pallas letterbox kernel**: a single-VMEM-pass
  kernel (uint8 in, banded H GEMM, kron-expanded W GEMM folding
  de-interleave + BGR swap + normalize, canvas written in-kernel) is
  numerically exact and moves 4x fewer HBM bytes, but XLA lays out every
  conv input BATCH-MINOR (`{0,3,2,1}` — lanes = batch) and a Pallas result
  is row-major B-major, so entering the backbone costs a ~2 ms relayout
  that cancels the win (measured 7.33 vs 7.52 ms with a consumer conv;
  pipeline-neutral end to end). A batch-minor kernel would need the frame
  batch transposed at the source plus halo DMAs; parked — the XLA
  restructure above captures half the win for none of the risk.

## Rect letterbox inference (round 3)

`EngineConfig(rect=True)` letterboxes each source resolution onto the
smallest stride-multiple canvas instead of the square 640x640: 576x1024
frames run the backbone at 384x640 — the resized interior is IDENTICAL
(same scale, same resample; `ops/geometry.rect_letterbox_size`), only the
constant gray padding shrinks. Since the backbone is HBM-bound (the
roofline below), 40% fewer pixel bytes is 40% less backbone time:
**yolov5s e2e 4157 -> 6584 fps (1.58x)** at batch 128. Detections are
unchanged — `tests/test_golden_accuracy.py::
test_rect_inference_matches_square_on_golden` pins rect == square on the
golden image with the trained checkpoint (boxes differ only by conv border
context). Decode derives the level layout from the map shapes, so one code
path serves both; supported by every fully-convolutional detector
(`DetectorSpec.rect_stride`: the yolov5 families), opt-in because the
reference's own convention is the square canvas.

## Training throughput (round 3)

The golden accuracy loops train with the device-resident loop
(`train/device_loop.py`): the augmented dataset uploads to HBM once and
100-step `lax.scan` chunks sample/flip/jitter batches on device. On this
rig's tunneled chip (~5-35 MB/s host->device) this is the difference between
training being possible and not: streaming yolov5n b16@640 batches ran at
~0.25 steps/s (the 20 MB batch upload IS the step time); device-resident
b32@640 runs ~4 steps/s wall (~10 ms device compute + chunk dispatch), a
~16x speedup that turns the golden detection run from >4 h (never converged
before the driver's wall) into ~12 min to gate-pass. On a PCIe host the
same loop is pure device compute (~100 steps/s at this size).

## Per-stage roofline — yolov5s b128 @576x1024 (round 3)

`python benchmarks/roofline_report.py` (jax.profiler trace grouped by source
file, v5e-1 ceilings: ~197 bf16 TFLOP/s, 819 GB/s spec HBM):

| stage | ms/step | GB/step | GB/s | %HBM |
|---|---|---|---|---|
| models/layers.py (backbone convs) | 15.26 | 10.12 | 663 | 81 |
| models/yolov5_face.py (heads+decode) | 5.04 | 1.42 | 283 | 35 |
| ops/pallas_kernels.py (gather/crop/NMS) | 3.07 | 0.55 | 178 | 22 |
| ops/geometry.py (resize) | 2.85 | 1.64 | 576 | 70 |
| ops/nms.py | 0.63 | 0.02 | 34 | 4 |
| ops/preprocess.py | 0.54 | 0.35 | 657 | 80 |
| **device total** | **28.4** | | | |

Achieved 25.7 TFLOP/s = 13% of bf16 peak. **Ceiling statement**: the
backbone — 54% of the step — runs at 663 GB/s, the practical v5e HBM
roofline (spec 819 GB/s; ~660 is what dense convs sustain), so its time is
set by activation BYTES, not FLOPs: small-channel convs at 640px have
arithmetic intensity ~25 FLOP/byte vs the ~240 needed to turn compute-bound.
The round-3 arithmetic-intensity lever — keeping the detect heads' raw maps
bf16 end-to-end through the candidate gather (decode upcasts per 256-row
candidate block instead of per 25k-row grid) — halved the head/decode bytes;
decode+NMS now totals 9.3 ms vs the backbone's 15.3. The second round-3
lever attacks the bytes themselves: rect letterbox inference (above) stops
paying the HBM roofline for constant padding — 4157 -> 6500 fps without
touching the interior pixels. Remaining levers beyond that trade exactness
(int8 activations: measured slower at these channel widths even statically
calibrated — `utils/quantize.py`'s docstring has the data). At the square condition MFU 13% IS the
roofline for this model family at this resolution; the same pipeline
reaches 81% of HBM peak, which is the binding resource.

Rect canvas (384x640, `--rect`): device total **16.8 ms/step** after the
round-3b preprocess fusion (was 17.3; 28.4 square) — backbone 8.53 ms at
721 GB/s (**88% of spec HBM**), heads+decode 2.04 ms, Pallas postprocess
1.90 ms, resize+normalize 3.6 ms across geometry/preprocess (the fusion
moved work between those two attributions while cutting their sum's
device time — the -0.5 ms shows in the total). The backbone sits at the
bandwidth roofline: rect removed only the padding bytes, confirming
bytes — not FLOPs — set the clock.

## Serving latency (batch 1, 576x1024, yolov5s)

`FaceService.detect_faces`: min 52 / p50 56 / p90 60 ms; full
`detect_embed_classify`: min 55 / p50 58 / p90 71 ms
(`benchmarks/bench_serving.py`, 50 iters; round 3b — the ensemble
chunk-skip and preprocess fusion cut full-pipeline p50 from 77 ms).
Round-2b had halved p50 (was 145/121 ms): per-call
`jnp.float32(threshold)` scalars were BLOCKING host->device transfers
through the tunnel — they're cached device arrays now, and the params
pytree is closure-captured. The remaining floor is the ~50 ms frame
upload through the shared axon tunnel (device compute is a few ms at
batch 1); on a PCIe host expect ~10 ms p50. Concurrent callers amortize
further via dynamic batching (`enable_dynamic_batching`).

## Notes (round 2)

- Timing syncs on one scalar of the last result: `block_until_ready` is a
  no-op through the axon tunnel and the device->host link is ~12MB/s, so
  fetching full tensors books tunnel time against the device.
- The yolov5 paths select candidates BEFORE decode (top-k on raw
  objectness, [B, K] decode, max_det-sliced final gather — see
  `yolov5_face_detect_maps`) and every letterbox spec normalizes before
  padding; together these moved yolov5s from 2993 to ~3600+ fps. The
  backbone itself runs at ~660GB/s — the v5e HBM roofline — per
  `utils/trace_analysis.py` on a `jax.profiler` trace.
- MTCNN is a single compiled program per resolution with batch as a leading
  dim through the whole pyramid + 3 stages; its R/O-Net crops (and every
  crop+resize in the framework) run as dense GEMMs on the MXU
  (`ops/crop.py method="gemm"`; TPU gathers measured 3-7x slower at these
  shapes), with the cascade's crops on the fused Pallas kernel
  (`crop_gemm_pallas`: image VMEM-resident across all K crops).
- Detector preprocess runs in the backbone dtype (bf16): uint8 pixels are
  exact in bf16, and the f32 resize/normalize was ~25% of the yolov5s step.
- Round-2b kernel work: candidate rows are gathered by
  `candidate_rows_gather_pallas` (streaming one-hot GEMM over the raw head
  levels; XLA row gathers are latency-bound ~2.6 ms at [128,1024,16] and
  needed the [B,~25k,16] concat — decode section 7.9 -> 4.5 ms device
  time); the Pallas crop kernel is WINDOWED (only [128,256] image pieces
  overlapping each box are multiplied — exact decomposition, ~10x fewer
  MACs for typical face boxes); the MTCNN pyramid resamples in the P-Net
  compute dtype; SPP's (5,9,13) pools run as three chained 5x5 pools (the
  SPPF identity, bit-exact); `resize_bilinear` applies banded row-block
  GEMMs weight-identical to jax.image.resize instead of its dense dots;
  and the crop kernel SKIPS invalid proposal slots with pl.when instead of
  zero-multiplying them (mtcnn 1062 -> 1775 fps: stage blocks are mostly
  padding, and the kernel is per-crop issue-bound). channel_shuffle runs as
  an exact one-hot [C, C] matmul on the MXU instead of a VPU lane-relayout
  copy: yolov5n device step 42.3 -> 33.6 ms (2579 -> 3248 fps). BlazeFace's
  weighted-blend NMS runs as ONE VMEM kernel (`weighted_blend_nms_pallas`:
  greedy-keep fixpoint + first-kept-owner assignment + MXU one-hot blends —
  the sequential jnp fori ran at 40 GB/s): blazeface-back 8639 -> 9685,
  front 12815 -> 15025 fps at b256.
- Dispatch overhead matters at these step times: engine pipelines CAPTURE
  the params pytree in the compiled closure (flattening ~300 leaves per
  call costs ~2 ms through the tunnel; `load_weights` invalidates the
  cache) and threshold scalars are cached device arrays, not per-call
  `jnp.float32(...)` transfers.
- End-to-end *video file* throughput on THIS rig is bound by the axon
  tunnel's ~35MB/s host->device upload (18 fps at 576x1024 with decode,
  upload, compute and annotate fully overlapped —
  `core/inference.inference_vid`); on a real PCIe TPU host the same loop
  runs at the compute bound above.
- Batch extraction pipeline (`pipelines/extract_faces.py`) packs frames
  across media into fixed blocks for the fused ensemble and shards over a
  mesh with `--mesh`. Measured: 256 JPEG media (576x1024) with detect +
  embed features at block 64 = **13.8 media/s** end-to-end on this rig —
  again the ~35MB/s tunnel upload is the wall (the device side of the same
  job sustains 2700+ fps); the reference's serial i9 loop manages ~10
  media/s on the same condition while computing no embeddings.
"""


if __name__ == "__main__":
    main()
