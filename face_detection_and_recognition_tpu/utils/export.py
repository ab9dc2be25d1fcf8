"""Model export: serialized StableHLO artifacts via jax.export.

The reference ships per-runtime exporters (ONNX for blazeface / yolov5-face /
mobile_facenet, ``modules/*/onnx_export.py``; TF savedmodels and OpenVINO IRs
for the rest). The TPU-native equivalent is one exporter: any jitted function
(detector pipeline, embedder, ensemble) serializes to a portable StableHLO
artifact that any PJRT runtime (TPU/CPU/GPU) can reload and execute without
python model code.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import numpy as np


def export_jitted(
    fn: Callable, example_args: Sequence[Any], path: str
) -> None:
    """Serialize ``jax.jit(fn)(*example_args)`` to ``path`` (StableHLO)."""
    from jax import export as jexport

    args = [jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype)
            for a in example_args]
    exported = jexport.export(jax.jit(fn))(*args)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    """Reload a serialized artifact; returns a callable .call(*args)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported


def export_detector(engine, path: str, batch: int = 1) -> None:
    """Export an engine's raw detect program (preprocessed input ->
    normalized dets + valid) for serving runtimes."""
    w, h = engine.spec.input_size
    if (w, h) == (-1, -1):
        raise ValueError("native-resolution cascades export per-resolution; "
                         "use export_jitted with a concrete shape")
    example = np.zeros((batch, h, w, 3), np.float32)
    export_jitted(lambda imgs: engine._detect(engine.variables, imgs),
                  [example], path)


def export_embedder(engine, path: str, batch: int = 1) -> None:
    if engine._embed is None:
        raise ValueError("engine has no embedder")
    ew, eh = engine.embed_spec.input_size
    example = np.zeros((batch, eh, ew, 3), np.float32)
    export_jitted(lambda crops: engine._embed(engine.embed_vars, crops),
                  [example], path)


def export_ensemble(engine, path: str, batch: int = 1,
                    image_hw=(576, 1024), det_thres: float = None,
                    bbox_area_thres: float = None) -> None:
    """Export the FULL fused detect->crop->embed->age/gender program (the
    Triton-ensemble equivalent) as one StableHLO artifact: raw BGR uint8
    frames in, Detections + crops (+ embeddings/probs) out. This is the
    deployable serving graph — no python model code needed at the other
    end."""
    import jax.numpy as jnp

    h, w = image_hw
    if engine.embed_spec is not None:
        ew, eh = engine.embed_spec.input_size
        crop_size = (eh, ew)
    else:
        crop_size = (112, 112)
    run = engine._ensemble_for((h, w, 3), crop_size)
    dt = engine.cfg.det_thres if det_thres is None else det_thres
    at = (engine.cfg.bbox_area_thres if bbox_area_thres is None
          else bbox_area_thres)

    def fn(imgs):
        # non-sharded ensemble programs capture the engine's variables
        post, crops, emb, age, gender = run(
            imgs, jnp.float32(dt), jnp.float32(at))
        outs = (post.boxes, post.scores, post.valid, crops)
        if emb is not None:
            outs += (emb,)
        if age is not None:
            outs += (age, gender)
        return outs

    example = np.zeros((batch, h, w, 3), np.uint8)
    export_jitted(fn, [example], path)
