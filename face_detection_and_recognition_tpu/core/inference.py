"""Inference drivers: image / video / webcam loops over a FaceEngine.

TPU-native replacement for ``modules/utils/inference.py:61-119``: the image
path is one fused device program; the video path MICRO-BATCHES frames
(the reference runs strictly frame-at-a-time — SURVEY.md §3.2 calls frame
batching the #1 TPU win) while preserving per-frame outputs, and supports
headless operation (write annotated output instead of imshow).
"""
from __future__ import annotations

import os
from typing import List, Optional

import cv2
import numpy as np

from ..utils.draw import draw_bbox_on_image
from .detections import PostProcessedDetection
from .engine import FaceEngine


def annotate(img: np.ndarray, post: PostProcessedDetection) -> np.ndarray:
    return draw_bbox_on_image(img, post)


def inference_img(
    engine: FaceEngine,
    img,
    wname: str = "Output",
    waitKey_val: int = 0,
    output: Optional[str] = None,
    display: bool = True,
    age_gender: bool = False,
) -> PostProcessedDetection:
    """Run detection (+optional age/gender) on one image, draw, show/save."""
    if isinstance(img, str):
        if not os.path.exists(img):
            raise FileNotFoundError(f"{img} does not exist")
        image = cv2.imread(img)
    elif isinstance(img, np.ndarray):
        image = img
    else:
        raise ValueError("image cannot be read")

    post = (engine.detect_age_gender(image) if age_gender
            else engine.detect_image(image))
    annotate(image, post)
    if output:
        cv2.imwrite(output, image)
    if display:
        cv2.imshow(wname, image)
        cv2.waitKey(waitKey_val)
    return post


def inference_vid(
    engine: FaceEngine,
    vid,
    wname: str = "Output",
    output: Optional[str] = None,
    display: bool = True,
    age_gender: bool = False,
    micro_batch: int = 4,
) -> List[PostProcessedDetection]:
    """Video loop with frame micro-batching.

    Frames are collected into blocks of ``micro_batch`` and detected in one
    device program per block; outputs remain per-frame. Single-image
    semantics (thresholds, postprocessing) are unchanged.
    """
    cap = cv2.VideoCapture(vid)
    writer = None
    results: List[PostProcessedDetection] = []
    frames: List[np.ndarray] = []

    def flush():
        nonlocal writer
        if not frames:
            return
        if age_gender or len(frames) == 1:
            posts = [
                engine.detect_age_gender(f) if age_gender else engine.detect_image(f)
                for f in frames
            ]
        else:
            # pad the tail block to micro_batch so every block reuses the
            # same compiled program (no per-tail-size recompilation)
            n = len(frames)
            block = frames + [frames[-1]] * (micro_batch - n)
            posts = engine.detect_batch(np.stack(block)).to_numpy()[:n]
        for f, p in zip(frames, posts):
            annotate(f, p)
            results.append(p)
            if output:
                if writer is None:
                    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
                    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
                    writer = cv2.VideoWriter(
                        output, fourcc, fps, (f.shape[1], f.shape[0])
                    )
                writer.write(f)
            if display:
                cv2.imshow(wname, f)
                cv2.waitKey(5)
        frames.clear()

    ret, frame = cap.read()
    while ret:
        frames.append(frame)
        if len(frames) >= micro_batch:
            flush()
            if display and (cv2.waitKey(5) & 0xFF) == ord("q"):
                break
        ret, frame = cap.read()
    flush()
    cap.release()
    if writer is not None:
        writer.release()
    if display:
        cv2.destroyAllWindows()
    return results


def inference_webcam(
    engine: FaceEngine, cam_index: int, wname: str = "Output",
    age_gender: bool = False,
) -> None:
    """Webcam = video loop with micro_batch 1 for lowest latency."""
    inference_vid(engine, cam_index, wname=wname, age_gender=age_gender,
                  micro_batch=1)
