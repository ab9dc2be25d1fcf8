"""Executed int8 accuracy: quantize the trained golden checkpoint and regate.

``python -m face_detection_and_recognition_tpu.cli.quantize_golden`` takes
the f32 golden detector checkpoint (produced by cli/train_golden.py), folds
BN + quantizes weights per-channel to int8, calibrates static per-tensor
activation scales on golden composites (utils/quantize.py), writes the int8
checkpoint, and re-runs the SAME golden gate the f32 checkpoint passed
(3 faces at IoU >= 0.5 vs the reference's pinned boxes,
tests/image_tests/test_yolov5_face.py:58-66, zero on the 0-face image) plus
the held-out composite AP — through a ``quantized="static"`` engine.

This turns the int8 path's accuracy story from random-weight decoded-map
correlation (tests/test_quantize.py) into an EXECUTED pixel-level result.
Exit code 0 only when the int8 gate passes.
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile


def calibration_batches(work_dir: str, input_size: int, n_images: int,
                        batch: int, seed: int):
    """Golden composites preprocessed exactly as the engine feeds yolov5
    (square canvas == letterbox identity: BGR->RGB, /255, f32)."""
    import glob

    import cv2
    import jax.numpy as jnp
    import numpy as np

    from ..train.golden import make_composite_dataset

    _, images_root = make_composite_dataset(
        os.path.join(work_dir, "calib_ds"), n_images=n_images,
        out_wh=(input_size, input_size), seed=seed)
    paths = sorted(glob.glob(
        os.path.join(images_root, "**", "*.jpg"), recursive=True))[:n_images]
    if not paths:
        raise FileNotFoundError(f"no calibration jpgs under {images_root}")
    imgs = np.stack([
        cv2.imread(p)[..., ::-1].astype(np.float32) / 255.0 for p in paths])
    return [jnp.asarray(imgs[i:i + batch])
            for i in range(0, len(imgs), batch)]


def quantize_checkpoint(ckpt_in: str, ckpt_out: str, arch: str,
                        input_size: int, work_dir: str, n_calib: int = 32,
                        batch: int = 8, seed: int = 515, log=print) -> None:
    """f32 golden checkpoint -> static-calibrated int8 checkpoint."""
    import jax

    from ..models.yolov5_face import YoloV5FaceConfig, make_yolov5_face
    from ..utils.checkpoint import load_variables, save_variables
    from ..utils.quantize import (calibrate_activation_scales,
                                  pour_activation_scales, quantize_variables)

    variables = load_variables(ckpt_in)
    cfg = YoloV5FaceConfig(arch=arch, input_size=(input_size, input_size))
    net, _, _ = make_yolov5_face(cfg)

    vq = quantize_variables(jax.tree_util.tree_map(
        lambda x: jax.device_get(x), variables))
    batches = calibration_batches(work_dir, input_size, n_calib, batch, seed)
    log(f"[int8] calibrating activation scales on {n_calib} composites")
    scales = calibrate_activation_scales(net, variables, batches)
    vqs = pour_activation_scales(vq, scales)
    save_variables(ckpt_out, vqs)
    log(f"[int8] wrote {ckpt_out} ({len(scales)} calibrated ConvBN scales)")


def evaluate_int8(ckpt: str, arch: str, input_size: int, work_dir: str,
                  log=print):
    """Golden gate + holdout AP through a quantized='static' engine."""
    from ..core.engine import EngineConfig, FaceEngine
    from ..train.golden import evaluate_golden, evaluate_holdout_ap
    from ..utils.checkpoint import load_variables

    eng = FaceEngine(EngineConfig(
        detector=arch, det_thres=0.5,
        detector_overrides={"input_size": (input_size, input_size),
                            "quantized": "static"}))
    eng.variables = load_variables(ckpt)
    r = evaluate_golden(eng)
    log(f"[int8] golden gate: ok={r['ok']} n_pos={r['n_pos']} "
        f"n_neg={r['n_neg']} ious={['%.3f' % i for i in r['ious']]}")
    ap = None
    if r["ok"]:
        ap = evaluate_holdout_ap(eng, work_dir, input_size=input_size)
        log(f"[int8] holdout AP50={ap['AP50']:.3f} AP={ap['AP']:.3f} "
            f"AR={ap['AR']:.3f}")
    return r, ap


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="tests/data/golden_yolov5n_ckpt",
                    help="trained f32 golden checkpoint")
    ap.add_argument("--out", default="tests/data/golden_yolov5n_int8_ckpt")
    ap.add_argument("--arch", default="yolov5n")
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--calib-images", type=int, default=32)
    ap.add_argument("--work-dir", default=None)
    args = ap.parse_args(argv)

    work = args.work_dir or tempfile.mkdtemp(prefix="int8_golden_")
    quantize_checkpoint(args.ckpt, args.out, args.arch, args.size, work,
                        n_calib=args.calib_images)
    r, _ = evaluate_int8(args.out, args.arch, args.size, work)
    return 0 if r["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
