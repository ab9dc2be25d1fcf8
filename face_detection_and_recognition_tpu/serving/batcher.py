"""Dynamic request batching — the Triton scheduler's one real idea, kept.

The reference's Triton servers declare ``dynamic_batching`` in their
``config.pbtxt`` (``face_detection_trt_server/models/*/config.pbtxt``):
concurrent single-image gRPC requests are coalesced into one batched model
execution. Our serving layer is in-process, but the economics are identical
on TPU — a batch-8 fused-ensemble dispatch costs barely more than batch-1 —
so concurrent HTTP callers should share device dispatches.

``DynamicBatcher`` is runtime-agnostic: a worker thread drains the request
queue, groups requests by (shape, thresholds) — only identical shapes can
share a fixed-shape XLA program — pads each group to the compiled batch
size, and runs ONE call per group. Callers block on a per-request event and
get exactly what the unbatched path would have returned.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, List, Optional, Tuple

import numpy as np


class _Request:
    __slots__ = ("img", "key", "done", "result", "error")

    def __init__(self, img: np.ndarray, key: Tuple):
        self.img = img
        self.key = key
        self.done = threading.Event()
        self.result: Any = None
        self.error: Optional[BaseException] = None


class DynamicBatcher:
    """Coalesce concurrent single-image calls into batched dispatches.

    Args:
        run_batch: fn(imgs [B, H, W, 3], key) -> list of B per-image results
            (key is the grouping tuple the requests were submitted with,
            e.g. thresholds).
        max_batch: coalescing limit (requests beyond it dispatch in the
            next window).
        max_delay_ms: how long the worker waits for co-travellers after the
            first request of a group arrives.
        preferred_batch_sizes: the compiled batch buckets (Triton's
            ``preferred_batch_size``): each group pads up to the SMALLEST
            bucket that fits it, not straight to max_batch. Padding bytes
            ride the host->device link, so a lone request padded to 8 pays
            8x the upload of a batch-1 program — ruinous through a slow
            tunnel, measurable even on PCIe. Defaults to powers of two up
            to max_batch (one XLA program per bucket, compile-once each).
    """

    def __init__(self, run_batch: Callable, max_batch: int = 8,
                 max_delay_ms: float = 4.0,
                 preferred_batch_sizes: Optional[List[int]] = None):
        self.run_batch = run_batch
        self.max_batch = max_batch
        self.max_delay = max_delay_ms / 1e3
        if preferred_batch_sizes is None:
            preferred_batch_sizes = []
            b = 1
            while b < max_batch:
                preferred_batch_sizes.append(b)
                b *= 2
            preferred_batch_sizes.append(max_batch)
        self.preferred_batch_sizes = sorted(
            {min(int(b), max_batch) for b in preferred_batch_sizes})
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self.dispatches = 0          # observability: device calls made
        self.requests = 0
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # ---- caller side ----

    def submit(self, img: np.ndarray, key: Tuple = ()) -> Any:
        """Blocking: returns this image's result from a shared dispatch."""
        if self._stop.is_set():
            raise RuntimeError("batcher is shut down")
        req = _Request(np.asarray(img), (tuple(img.shape),) + tuple(key))
        self._q.put(req)
        req.done.wait()
        if req.error is not None:
            raise req.error
        return req.result

    def shutdown(self) -> None:
        self._stop.set()
        self._q.put(None)  # wake the worker
        self._worker.join(timeout=2.0)
        self._fail_queued()  # anything enqueued after the worker exited

    def _fail_queued(self) -> None:
        while True:
            try:
                got = self._q.get_nowait()
            except queue.Empty:
                return
            if got is not None:
                got.error = RuntimeError("batcher is shut down")
                got.done.set()

    # ---- worker side ----

    def _loop(self) -> None:
        pending: List[_Request] = []
        try:
            while not self._stop.is_set():
                if not pending:
                    got = self._q.get()
                    if got is None:
                        continue
                    pending.append(got)
                # wait for same-group co-travellers until max_delay after
                # the window OPENED (an absolute deadline — a per-get
                # timeout would let trickling arrivals hold the first
                # caller up to max_delay * (max_batch - 1))
                import time as _time

                deadline = _time.monotonic() + self.max_delay
                group_key = pending[0].key
                group = [r for r in pending if r.key == group_key]
                rest = [r for r in pending if r.key != group_key]
                while len(group) < self.max_batch:
                    remaining = deadline - _time.monotonic()
                    if remaining <= 0:
                        break
                    try:
                        got = self._q.get(timeout=remaining)
                    except queue.Empty:
                        break
                    if got is None:
                        break
                    (group if got.key == group_key else rest).append(got)
                self._dispatch(group)
                pending = rest
        finally:
            # never strand a caller: fail whatever is still waiting
            for r in pending:
                r.error = RuntimeError("batcher is shut down")
                r.done.set()
            self._fail_queued()

    def _dispatch(self, group: List[_Request]) -> None:
        self.requests += len(group)
        self.dispatches += 1
        try:
            imgs = np.stack([r.img for r in group])
            bucket = next((b for b in self.preferred_batch_sizes
                           if b >= len(group)), self.max_batch)
            pad = bucket - len(group)
            if pad:
                imgs = np.concatenate(
                    [imgs, np.repeat(imgs[-1:], pad, axis=0)])
            results = self.run_batch(imgs, group[0].key)
            for r, res in zip(group, results):
                r.result = res
                r.done.set()
        except BaseException as e:  # propagate to every waiting caller
            for r in group:
                r.error = e
                r.done.set()
