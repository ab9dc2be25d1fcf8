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
        if image is None:  # exists but unsupported codec / truncated
            raise ValueError(f"cannot decode image: {img}")
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


def _default_micro_batch() -> int:
    """Throughput batch on accelerators, latency batch on CPU. 32 keeps
    block latency ~15-30ms at the measured TPU throughput (bench.py) while
    realizing most of the batch-128 throughput knee."""
    import jax

    from ..ops.platform import on_tpu
    return 32 if on_tpu() else 4


def inference_vid(
    engine: FaceEngine,
    vid,
    wname: str = "Output",
    output: Optional[str] = None,
    display: bool = True,
    age_gender: bool = False,
    micro_batch: Optional[int] = None,
) -> List[PostProcessedDetection]:
    """Video loop with double-buffered frame micro-batching.

    A decode thread fills a bounded queue of frame blocks while the device
    runs; block k+1 is dispatched (async) before block k's results are
    fetched, so cv2 decode, TPU compute, and host annotate/write overlap.
    Outputs remain per-frame; single-image semantics (thresholds,
    postprocessing) are unchanged. Replaces the reference's strictly serial
    read->infer->draw loop (``modules/utils/inference.py:96-111``).
    """
    import queue
    import threading

    if micro_batch is None:
        micro_batch = 1 if display and not isinstance(vid, str) else (
            _default_micro_batch())
    cap = cv2.VideoCapture(vid)
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    writer = None
    results: List[PostProcessedDetection] = []
    stop = threading.Event()

    # batched age/gender rides the fused ensemble when available; native
    # cascades (mtcnn) fall back to the per-frame staged path
    fused_ag = age_gender and engine._classify_ag is not None \
        and engine.spec.input_size != (-1, -1)

    def dispatch(item):
        """One async device dispatch for an uploaded block -> handle."""
        n, block, imgs = item
        if fused_ag:
            # the annotate path consumes dets + age/gender labels only:
            # leave the embed stage out of the compiled program
            return n, block, engine.detect_embed_classify_batch(
                imgs, want_embed=False)
        return n, block, engine.detect_batch(imgs)

    def collect(handle) -> List[PostProcessedDetection]:
        n, block, res = handle
        if fused_ag:
            from ..models.age_gender import labels_from_probs

            import jax

            posts = res.det.to_numpy()[:n]
            # one transfer for the whole block: per-image np.asarray slices
            # cost 2 device round-trips per frame (tens of ms each through
            # a tunneled chip)
            valid, ages, genders = jax.device_get(
                (res.det.valid, res.age_probs, res.gender_probs))
            valid = np.asarray(valid)
            for i, p in enumerate(posts):
                p.bbox_labels = list(labels_from_probs(
                    np.asarray(ages[i])[valid[i]],
                    np.asarray(genders[i])[valid[i]]))
            return posts
        return res.to_numpy()[:n]

    def write_frame(f):
        """Lazily create the writer from the first frame's size (shared by
        the fused and staged paths so codec/size fixes apply to both)."""
        nonlocal writer
        if writer is None:
            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
            writer = cv2.VideoWriter(
                output, fourcc, src_fps, (f.shape[1], f.shape[0]))
        writer.write(f)

    def emit(handle):
        for f, p in zip(handle[1], collect(handle)):
            annotate(f, p)
            results.append(p)
            if output:
                write_frame(f)
            if display:
                cv2.imshow(wname, f)
                if (cv2.waitKey(5) & 0xFF) == ord("q"):
                    stop.set()

    blocks: "queue.Queue" = queue.Queue(maxsize=2)  # decode double-buffer
    _END = object()

    # the staged per-frame path (native cascades + age_gender) only reads
    # the host frame list — uploading its blocks would waste the full
    # host->device transfer per block
    staged = age_gender and not fused_ag

    def upload(block: List[np.ndarray]):
        """Pad + stage the block on device FROM THE READER THREAD so the
        host->device transfer (1.5s/56MB through the axon tunnel) overlaps
        with device compute and host annotate/write of earlier blocks."""
        import jax

        if staged:
            return len(block), block, None
        padded = block + [block[-1]] * (micro_batch - len(block))
        return len(block), block, jax.device_put(np.stack(padded))

    reader_error: List[BaseException] = []

    def reader():
        try:
            block: List[np.ndarray] = []
            ret, frame = cap.read()
            while ret and not stop.is_set():
                block.append(frame)
                if len(block) >= micro_batch:
                    blocks.put(upload(block))
                    block = []
                ret, frame = cap.read()
            if block:
                blocks.put(upload(block))
        except BaseException as e:  # decode/upload failure must not hang
            reader_error.append(e)  # the consumer on a blocking get()
        finally:
            blocks.put(_END)

    t = threading.Thread(target=reader, daemon=True)
    t.start()

    if staged:  # per-frame path (native cascades with age/gender)
        while True:
            item = blocks.get()
            if item is _END or stop.is_set():
                break
            for f in item[1]:
                p = engine.detect_age_gender(f)
                annotate(f, p)
                results.append(p)
                if output:
                    write_frame(f)
                if display:
                    cv2.imshow(wname, f)
                    if (cv2.waitKey(5) & 0xFF) == ord("q"):
                        stop.set()
    else:
        pending = None
        while True:
            item = blocks.get()
            if item is _END:
                break
            handle = dispatch(item)           # async: device starts now
            if pending is not None:
                emit(pending)                 # overlap host work w/ device
            pending = handle
            if stop.is_set():
                break
        if pending is not None:
            # emit the in-flight block even on a 'q' quit: every frame that
            # was dispatched reaches `results` and the written video (frame
            # count is conserved — only undispatched reader frames drop)
            emit(pending)

    if reader_error:
        raise reader_error[0]
    stop.set()
    while not blocks.empty():  # unblock a reader stuck on a full queue
        try:
            blocks.get_nowait()
        except Exception:
            break
    t.join(timeout=2.0)
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
