"""utils/trace_analysis: parse + aggregate a synthetic Chrome-trace file,
and (on CPU) a real jax.profiler trace directory layout."""
import gzip
import json
import os

import pytest

from face_detection_and_recognition_tpu.utils import trace_analysis as TA


def _write_trace(path, events):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)


@pytest.fixture()
def synthetic_trace(tmp_path):
    d = tmp_path / "tr" / "plugins" / "profile" / "2026_01_01_00_00_00"
    events = [
        {"ph": "M", "pid": 3, "tid": 7, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 3, "tid": 8, "name": "thread_name",
         "args": {"name": "python"}},  # host lane: must be ignored
        # two steps of the same conv op, attributed to a project file
        {"ph": "X", "pid": 3, "tid": 7, "name": "fusion.1", "dur": 1000,
         "args": {"bytes_accessed": "1000000", "model_flops": "5",
                  "tf_op": "jit(run)/Net/Conv_0/conv_general_dilated:",
                  "source": "site-packages/flax/linen/linear.py:700",
                  "source_stack": "site-packages/flax/linen/linear.py:700:1\n"
                                  "/repo/pkg/models/layers.py:92:1\n"}},
        {"ph": "X", "pid": 3, "tid": 7, "name": "fusion.1", "dur": 1400,
         "args": {"bytes_accessed": "1000000",
                  "tf_op": "jit(run)/Net/Conv_0/conv_general_dilated:",
                  "source": "site-packages/flax/linen/linear.py:700",
                  "source_stack": "site-packages/flax/linen/linear.py:700:1\n"
                                  "/repo/pkg/models/layers.py:92:1\n"}},
        # a sort op attributed directly to a project file
        {"ph": "X", "pid": 3, "tid": 7, "name": "sort.3", "dur": 600,
         "args": {"bytes_accessed": "200000",
                  "tf_op": "jit(run)/top_k:",
                  "source": "/repo/pkg/models/yolov5_face.py:467",
                  "source_stack": "/repo/pkg/models/yolov5_face.py:467:1\n"}},
        # host-lane event that must NOT be counted
        {"ph": "X", "pid": 3, "tid": 8, "name": "hostwork", "dur": 9999},
    ]
    _write_trace(str(d / "vm.trace.json.gz"), events)
    return str(tmp_path / "tr")


def test_load_and_aggregate(synthetic_trace):
    ops = TA.load_device_ops(synthetic_trace)
    assert len(ops) == 3  # host lane excluded
    assert {o.name for o in ops} == {"fusion.1", "sort.3"}

    # per-step aggregation over 2 steps
    top = TA.top_ops(ops, n=5, steps=2)
    assert top[0].name == "fusion.1"
    assert top[0].ms == pytest.approx(1.2)          # (1000+1400)/2 us
    assert top[0].bytes_accessed == 1000000
    assert top[0].occurrences == 2

    groups = TA.summarize_by(ops, TA.source_file_key, steps=2)
    names = [g[0] for g in groups]
    assert "/repo/pkg/models/layers.py" in names     # not the flax frame
    assert "/repo/pkg/models/yolov5_face.py" in names
    by = dict((g[0], g[1]) for g in groups)
    assert by["/repo/pkg/models/layers.py"] == pytest.approx(1.2)
    assert by["/repo/pkg/models/yolov5_face.py"] == pytest.approx(0.3)


def test_print_report_runs(synthetic_trace, capsys):
    TA.print_report(synthetic_trace, steps=2, n=5)
    out = capsys.readouterr().out
    assert "ms/step" in out and "fusion.1" in out


def test_missing_trace_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        TA.find_trace_file(str(tmp_path))


def test_real_jax_profiler_trace(tmp_path):
    """End-to-end: profile a tiny jitted computation on CPU and parse the
    produced trace directory (device lanes may be absent on pure-CPU
    backends; the parser must still return cleanly)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: jnp.sum(x * 2.0))
    x = jnp.ones((64, 64))
    float(f(x))
    with jax.profiler.trace(str(tmp_path)):
        for _ in range(2):
            _ = f(x)
        float(_)
    fname = TA.find_trace_file(str(tmp_path))
    assert fname.endswith(".trace.json.gz")
    ops = TA.load_device_ops(str(tmp_path))
    assert isinstance(ops, list)  # content depends on backend lanes
