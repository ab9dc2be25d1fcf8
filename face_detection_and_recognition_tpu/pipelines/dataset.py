"""Dataset walking + media decoding for the batch pipelines.

Reproduces the reference's dataset contract
(``face_extraction/extract_faces_from_dataset.py``): a one-level class tree
``dataset/class_x/{images,videos}``, videos sampled at 1 fps with caps
MAX_N_FRAME_FROM_VID=15 and MAX_N_FACES_PER_FRAME=3 (``:38-40,421-437``),
resume-by-existence semantics (``:410-419``).

TPU-first: decode happens on host threads feeding a double-buffered queue of
device-ready frame batches, so the accelerator never waits on cv2 I/O (the
reference's loop is fully serial).
"""
from __future__ import annotations

import dataclasses
import glob
import os
import queue
import threading
from typing import Iterator, List, Tuple

import cv2
import numpy as np

MAX_N_FRAME_FROM_VID = 15
MAX_N_FACES_PER_FRAME = 3

_IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")
_VID_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


@dataclasses.dataclass
class MediaItem:
    class_name: str
    path: str
    kind: str  # "image" | "video"


def walk_class_tree(data_dir: str) -> List[MediaItem]:
    """Enumerate media under one-level class dirs, alphabetical order."""
    items: List[MediaItem] = []
    for cls_path in sorted(glob.glob(os.path.join(data_dir, "*"))):
        if not os.path.isdir(cls_path):
            continue
        cls = os.path.basename(cls_path)
        for p in sorted(glob.glob(os.path.join(cls_path, "*"))):
            ext = os.path.splitext(p)[1].lower()
            if ext in _IMG_EXTS:
                items.append(MediaItem(cls, p, "image"))
            elif ext in _VID_EXTS:
                items.append(MediaItem(cls, p, "video"))
    return items


def iter_media_frames(
    item: MediaItem,
    max_frames: int = MAX_N_FRAME_FROM_VID,
) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (frame_index, BGR frame). Images yield once; videos sample one
    frame per second of footage (frame_num % round(fps) == 0) capped at
    ``max_frames`` (reference ``:421-437``)."""
    if item.kind == "image":
        # JPEGs decode through the native C++ loader (libjpeg, GIL-free);
        # other formats via cv2
        from ..utils.native import read_image_bgr

        img = read_image_bgr(item.path)
        if img is not None:
            yield 0, img
        return
    cap = cv2.VideoCapture(item.path)
    fps = cap.get(cv2.CAP_PROP_FPS)
    step = max(1, round(fps)) if fps and np.isfinite(fps) else 25
    taken = frame_num = 0
    ret, frame = cap.read()
    while ret and taken < max_frames:
        if frame_num % step == 0:
            yield frame_num, frame
            taken += 1
        ret, frame = cap.read()
        frame_num += 1
    cap.release()


class PrefetchLoader:
    """Host-side decode pipeline: N worker threads decode media into a
    bounded queue while the device consumes — the double-buffered replacement
    for the reference's serial read->infer loop."""

    _END = object()

    def __init__(self, items: List[MediaItem], num_workers: int = 4,
                 queue_size: int = 16, max_frames: int = MAX_N_FRAME_FROM_VID):
        self.items = items
        self.num_workers = max(1, num_workers)
        self.max_frames = max_frames
        self._q: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self._item_q: "queue.Queue" = queue.Queue()
        for it in items:
            self._item_q.put(it)
        self._threads: List[threading.Thread] = []
        self._stop = threading.Event()

    def _worker(self):
        while not self._stop.is_set():
            try:
                item = self._item_q.get_nowait()
            except queue.Empty:
                break
            frames = list(iter_media_frames(item, self.max_frames))
            # timed put so a consumer that stopped iterating (exception,
            # early break) cannot park this thread forever on a full queue
            while not self._stop.is_set():
                try:
                    self._q.put((item, frames), timeout=0.2)
                    break
                except queue.Full:
                    continue
        self._q.put(self._END)  # close() drains, so this cannot deadlock

    def close(self):
        """Stop workers and reclaim their threads; safe to call twice.
        Runs automatically when iteration ends OR is abandoned."""
        self._stop.set()
        while any(t.is_alive() for t in self._threads):
            try:
                self._q.get(timeout=0.1)
            except queue.Empty:
                pass
        for t in self._threads:
            t.join()
        self._threads = []

    def __iter__(self):
        for _ in range(self.num_workers):
            t = threading.Thread(target=self._worker, daemon=True)
            t.start()
            self._threads.append(t)
        done = 0
        try:
            while done < self.num_workers:
                got = self._q.get()
                if got is self._END:
                    done += 1
                    continue
                yield got
        finally:
            self.close()


def output_exists(out_dir: str, class_name: str, media_path: str,
                  feature: bool) -> bool:
    """Resume-by-existence check (reference ``:410-419``)."""
    stem = os.path.splitext(os.path.basename(media_path))[0]
    if feature:
        return os.path.exists(os.path.join(out_dir, class_name, stem + ".npy"))
    d = os.path.join(out_dir, class_name, stem)
    return os.path.isdir(d) and bool(os.listdir(d))
