"""Op-level TPU profile analysis from jax.profiler traces.

The reference's only profiling was ad-hoc ``time.time()`` FPS prints
(``pytorch/detect_face_pytorch.py:102-109``) and a CUDA-synchronized timer
(``pytorch/utils/torch_utils.py:70-74``). On TPU the ground truth is the
device timeline: ``jax.profiler.trace`` writes a Chrome-trace JSON
(``*.trace.json.gz``) whose "XLA Ops" rows carry per-op device duration,
bytes accessed, and Python source attribution. This module turns that file
into actionable numbers WITHOUT TensorFlow/TensorBoard:

  * ``load_device_ops`` — the raw per-op event list (name, duration,
    bytes_accessed, source stack, tf_op path).
  * ``summarize_by`` — total device ms grouped by any attribution key
    (e.g. source file, a custom region classifier).
  * ``top_ops`` — the heaviest individual ops with source lines.

This is the tool that localized the round-2 headline work: it showed the
yolov5s backbone already at ~660GB/s (HBM roofline) while 13.6 ms/step sat
in full-grid sort + f32 row gathers — leading to the candidates-first
rewrite (``models/yolov5_face.yolov5_face_detect_maps``).

Usage:
    with jax.profiler.trace("/tmp/tr"):  # run a few steps
        ...
    python -m face_detection_and_recognition_tpu.utils.trace_analysis /tmp/tr
"""
from __future__ import annotations

import dataclasses
import glob
import gzip
import json
import os
from collections import Counter
from typing import Callable, Dict, List, Optional, Tuple


@dataclasses.dataclass
class DeviceOp:
    """One XLA op execution on the device timeline."""

    name: str
    duration_us: float
    occurrences: int = 1
    bytes_accessed: int = 0
    flops: int = 0
    tf_op: str = ""
    source: str = ""
    source_stack: str = ""

    @property
    def ms(self) -> float:
        return self.duration_us / 1e3


def find_trace_file(path: str) -> str:
    """Resolve a trace directory (as passed to ``jax.profiler.trace``) or a
    direct ``*.trace.json.gz`` path to the newest trace file."""
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(
        os.path.join(path, "plugins", "profile", "*", "*.trace.json.gz")))
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {path}")
    return hits[-1]


def load_device_ops(path: str) -> List[DeviceOp]:
    """Parse all device-side ("XLA Ops" lanes) events from a trace.

    Multiple executions of the same op (several profiled steps) stay
    separate events; aggregate with ``summarize_by``/``top_ops``.
    """
    fname = find_trace_file(path)
    with gzip.open(fname, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    lanes = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lanes[(e["pid"], e["tid"])] = e["args"].get("name", "")
    ops: List[DeviceOp] = []
    for e in events:
        if e.get("ph") != "X":
            continue
        if lanes.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        a = e.get("args", {})
        ops.append(DeviceOp(
            name=e.get("name", ""),
            duration_us=float(e.get("dur", 0)),
            bytes_accessed=int(a.get("bytes_accessed", 0) or 0),
            flops=int(a.get("model_flops", 0) or 0),
            tf_op=a.get("tf_op", ""),
            source=a.get("source", ""),
            source_stack=a.get("source_stack", ""),
        ))
    return ops


def summarize_by(
    ops: List[DeviceOp],
    key: Callable[[DeviceOp], str],
    steps: int = 1,
) -> List[Tuple[str, float, float]]:
    """Group ops and return [(group, ms_per_step, gbytes_per_step)] sorted
    by time desc. ``steps`` divides totals by the number of profiled
    iterations."""
    time_us: Counter = Counter()
    nbytes: Counter = Counter()
    for op in ops:
        k = key(op)
        time_us[k] += op.duration_us
        nbytes[k] += op.bytes_accessed
    return [
        (k, time_us[k] / 1e3 / steps, nbytes[k] / 1e9 / steps)
        for k, _ in time_us.most_common()
    ]


def source_file_key(op: DeviceOp) -> str:
    """Attribution by the deepest project source file in the op's stack
    (falls back to the leaf source, then the tf_op root)."""
    for line in op.source_stack.splitlines():
        if "site-packages" not in line and line.strip():
            return line.split(":")[0].strip()
    if op.source:
        return op.source.split(":")[0]
    return op.tf_op.split("/")[0] if op.tf_op else "<unattributed>"


def top_ops(
    ops: List[DeviceOp], n: int = 20, steps: int = 1
) -> List[DeviceOp]:
    """The n heaviest ops, aggregated by op name, per profiled step."""
    by_name: Dict[str, DeviceOp] = {}
    for op in ops:
        cur = by_name.get(op.name)
        if cur is None:
            by_name[op.name] = dataclasses.replace(op)
        else:
            cur.duration_us += op.duration_us
            cur.bytes_accessed += op.bytes_accessed
            cur.occurrences += 1
    out = sorted(by_name.values(), key=lambda o: -o.duration_us)[:n]
    for o in out:
        o.duration_us /= steps
        o.bytes_accessed //= steps
    return out


def print_report(path: str, steps: int = 1, n: int = 15) -> None:
    ops = load_device_ops(path)
    total = sum(o.duration_us for o in ops) / 1e3 / steps
    print(f"device time: {total:.2f} ms/step ({len(ops)} op executions, "
          f"{steps} step(s))")
    print("\n-- by source file --")
    for k, ms, gb in summarize_by(ops, source_file_key, steps)[:n]:
        bw = f"{gb / (ms / 1e3):6.0f} GB/s" if ms > 0 and gb > 0 else "      --  "
        print(f"{ms:8.2f} ms  {gb:6.2f} GB  {bw}  {k}")
    print("\n-- top ops --")
    for o in top_ops(ops, n, steps):
        src = o.source.split("/")[-1] if o.source else ""
        print(f"{o.ms:8.3f} ms  {o.name[:32]:32} {o.tf_op[:48]:48} {src}")


def main(argv: Optional[List[str]] = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("trace", help="trace dir (from jax.profiler.trace) or "
                                  "a *.trace.json.gz file")
    ap.add_argument("--steps", type=int, default=1,
                    help="profiled iterations to divide totals by")
    ap.add_argument("-n", type=int, default=15, help="rows per section")
    args = ap.parse_args(argv)
    print_report(args.trace, steps=args.steps, n=args.n)


if __name__ == "__main__":
    main()
