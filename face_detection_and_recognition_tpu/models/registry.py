"""Detector/embedder registry: one uniform build-and-detect interface.

Replaces the reference's per-runtime ``Model``-subclass zoo (SURVEY.md §2.2):
every backend becomes a registry entry whose ``build`` returns a jitted
``detect(variables, imgs) -> (dets, valid)`` with a declarative preprocessing
recipe attached. The engine composes these with postprocessing, cropping and
embedding without knowing which architecture is underneath.

Normalized detection contract (same as the reference's
``modules/models/base.py``): rows [xmin, ymin, xmax, ymax, (lmk xy pairs...),
conf] in [0, 1] wrt the model input size.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..ops import preprocess as P


@dataclasses.dataclass(frozen=True)
class DetectorSpec:
    """A detector registry entry.

    build(rng, dtype, **overrides) -> (net, variables, detect) where
    detect(variables, imgs [B,h,w,3] preprocessed) returns
    (dets [B,K,4+L+1] NORMALIZED to input size, valid [B,K]).
    """

    name: str
    input_size: Tuple[int, int]  # (width, height)
    preprocess: P.PreprocessSpec
    n_landmark_cols: int
    build: Callable
    # fully-convolutional detectors whose detect() accepts any input whose
    # sides are a multiple of this stride (rect letterbox support); 0 =
    # fixed input only. input_size stays the max box rect shapes fit in.
    rect_stride: int = 0


_REGISTRY = {}


def register(spec: DetectorSpec):
    _REGISTRY[spec.name] = spec
    return spec


def get(name: str) -> DetectorSpec:
    if name not in _REGISTRY:
        raise KeyError(f"unknown detector '{name}'; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def available():
    return sorted(_REGISTRY)


# ---------------- yolov5-face family ----------------


def _build_yolov5(arch: str, input_size):
    def build(rng=None, dtype=jnp.float32, **kw):
        from .yolov5_face import YoloV5FaceConfig, make_yolov5_face

        kw.setdefault("input_size", input_size)
        # quantized is a build-time graph switch, not a config field:
        # detector_overrides={"quantized": "static"} serves int8 checkpoints
        # produced by cli/quantize_golden.py / utils/quantize.py
        quantized = kw.pop("quantized", False)
        cfg = YoloV5FaceConfig(arch=arch, **kw)
        net, variables, detect = make_yolov5_face(
            cfg, rng=rng, dtype=dtype, quantized=quantized)

        @jax.jit
        def detect_norm(variables, imgs):
            # normalize by the ACTUAL input dims (static under trace): the
            # same detect serves square and rect letterbox resolutions
            ih, iw = imgs.shape[1], imgs.shape[2]
            scale = jnp.asarray([iw, ih] * 7 + [1.0], jnp.float32)
            dets, valid = detect(variables, imgs)
            # [x1,y1,x2,y2,obj,lmk x10, cls] pixels ->
            # [x1,y1,x2,y2, lmk x10, obj] normalized (wrapper contract,
            # modules/yolov5_face/model.py:28-35, landmarks preserved)
            cols = jnp.concatenate(
                [dets[..., :4], dets[..., 5:15], dets[..., 4:5]], axis=-1
            )
            return cols / scale, valid

        return net, variables, detect_norm

    return build


for _arch in ("yolov5s", "yolov5m", "yolov5l", "yolov5n", "yolov5n-0.5",
              "yolov5s6", "yolov5m6", "yolov5l6", "yolov5n6"):
    register(
        DetectorSpec(
            name=_arch,
            input_size=(640, 640),
            preprocess=P.YOLOV5_FACE,
            n_landmark_cols=10,
            build=_build_yolov5(_arch, (640, 640)),
            rect_stride=64 if _arch.endswith("6") else 32,
        )
    )


# ---------------- official (multiclass) yolov5 ----------------


def _build_yolov5_official(arch: str, input_size):
    def build(rng=None, dtype=jnp.float32, **kw):
        from .yolov5_face import YoloV5FaceConfig, make_yolov5_official

        kw.setdefault("input_size", input_size)
        kw.setdefault("nc", 80)            # COCO classes
        kw.setdefault("conf_thres", 0.4)   # reference official=True call
        kw.setdefault("iou_thres", 0.5)
        cfg = YoloV5FaceConfig(arch=arch, **kw)
        net, variables, detect = make_yolov5_official(cfg, rng=rng, dtype=dtype)

        @jax.jit
        def detect_norm(variables, imgs):
            ih, iw = imgs.shape[1], imgs.shape[2]
            scale = jnp.asarray([iw, ih, iw, ih, 1.0], jnp.float32)
            dets, valid = detect(variables, imgs)
            # [xyxy, conf, cls] pixels -> [xyxy, conf] normalized (the
            # reference wrapper keeps 5 cols, modules/yolov5_face/model.py)
            return dets[..., :5] / scale, valid

        return net, variables, detect_norm

    return build


for _arch in ("yolov5s", "yolov5n"):
    register(
        DetectorSpec(
            name=f"{_arch}-official",
            input_size=(640, 640),
            preprocess=P.YOLOV5_FACE,
            n_landmark_cols=0,
            build=_build_yolov5_official(_arch, (640, 640)),
            rect_stride=32,
        )
    )


# ---------------- blazeface ----------------


def _build_blazeface(back: bool):
    def build(rng=None, dtype=jnp.float32, **kw):
        from .blazeface import BlazeFaceConfig, make_blazeface

        if kw.pop("input_size", None) is not None:
            raise ValueError(
                "blazeface input size is fixed by the architecture "
                "(front 128x128 / back 256x256)"
            )
        cfg = BlazeFaceConfig(back_model=back, **kw)
        net, variables, detect = make_blazeface(cfg, rng=rng, dtype=dtype)

        @jax.jit
        def detect_norm(variables, imgs):
            dets, valid = detect(variables, imgs)  # already normalized 17-col
            return dets, valid

        return net, variables, detect_norm

    return build


register(DetectorSpec("blazeface-front", (128, 128), P.BLAZEFACE_FRONT, 12,
                      _build_blazeface(False)))
register(DetectorSpec("blazeface-back", (256, 256), P.BLAZEFACE_BACK, 12,
                      _build_blazeface(True)))


# ---------------- SSD family (OpenCV-DNN / OpenVINO equivalents) ----------------


def _build_ssd(backbone: str, input_size):
    def build(rng=None, dtype=jnp.float32, **kw):
        from .ssd import SSDConfig, make_ssd_face

        kw.setdefault("input_size", input_size)
        cfg = SSDConfig(backbone=backbone, **kw)
        return make_ssd_face(cfg, rng=rng, dtype=dtype)

    return build


register(DetectorSpec("ssd-resnet10", (300, 300), P.OPENCV_SSD, 0,
                      _build_ssd("resnet10", (300, 300))))


def _build_res10_graph():
    def build(rng=None, dtype=jnp.float32, **kw):
        from .res10 import build_res10

        if kw.pop("input_size", None) not in (None, (300, 300)):
            raise ValueError("res10 runs the fixed 300x300 deploy graph")
        return build_res10(rng=rng, dtype=dtype)

    return build


# the EXACT public res10_300x300 deploy graph (models/res10.py) — the
# import target for OpenCV's res10_300x300_ssd_iter_140000.caffemodel
# (reference modules/opencv2_dnn/model.py:21); `ssd-resnet10` above is the
# trainable TPU-native twin of the same class
register(DetectorSpec("res10-ssd", (300, 300), P.OPENCV_SSD, 0,
                      _build_res10_graph()))
register(DetectorSpec("ssd-mobilenetv2", (448, 448),
                      dataclasses.replace(P.OPENCV_SSD, size=(448, 448)), 0,
                      _build_ssd("mobilenetv2", (448, 448))))
register(DetectorSpec("ssd-squeezenet", (300, 300), P.OPENCV_SSD, 0,
                      _build_ssd("squeezenet", (300, 300))))


def _build_ov_ir():
    def build(rng=None, dtype=jnp.float32, **kw):
        import os

        import jax

        from ..utils.ir_graph import parse_ir_graph
        from .ov_graph import OVGraphNet, make_ov_detect

        xml = kw.pop("xml", None)
        kw.pop("input_size", None)  # sizing comes from the IR itself
        if xml is None:
            raise ValueError(
                "detector='openvino-ir' executes a REAL IR: pass "
                "detector_overrides={'xml': 'model.xml'} (bin defaults to "
                "the sibling .bin)")
        bin_path = kw.pop("bin", os.path.splitext(xml)[0] + ".bin")
        net = OVGraphNet(parse_ir_graph(xml, bin_path))
        detect = jax.jit(make_ov_detect(net))
        return net, net.init_variables(), detect

    return build


# generic executor for REAL OpenVINO IRs (face-detection-0204,
# SqueezeNet-light, … — modules/openvino/model.py loads any model.xml the
# same way); input size is read from the IR's Parameter layer, preprocess
# matches OVModel.__call__ (pad_resize, raw BGR values)
register(DetectorSpec(
    "openvino-ir", (448, 448),
    P.PreprocessSpec(size=(448, 448), resize="letterbox"), 0,
    _build_ov_ir()))


def _build_ov_topology(topology: str):
    def build(rng=None, dtype=jnp.float32, **kw):
        import jax

        from .ov_graph import OVGraphNet, make_ov_detect
        from .ov_topologies import build_ov_topology

        kw.pop("input_size", None)  # sizing comes from the topology
        seed = int(jax.random.randint(rng, (), 0, 2**31 - 1)) if rng is not None else 0
        # He-init weights are baked into the topology's Const layers.
        # The ENGINE dtype now reaches the interpreter (round-5 ov-0204
        # lever): bf16 engines run the conv ladder on the MXU in bf16,
        # with loc/conf upcast before prior decode (make_ov_detect)
        net = OVGraphNet(build_ov_topology(topology, seed=seed))
        detect = jax.jit(make_ov_detect(net, compute_dtype=dtype))
        return net, net.init_variables(), detect

    return build


# the reference's REAL OpenVINO topologies, encoded in-repo and executed
# through the same IR interpreter as 'openvino-ir' files
# (models/ov_topologies.py: face-detection-0204 / face-detection-retail-0004
# per OMZ model cards; reference detect_face_openvino.py:11-14 + README
# SqueezeNet-SSD row)
register(DetectorSpec(
    "ov-0204", (448, 448),
    P.PreprocessSpec(size=(448, 448), resize="letterbox"), 0,
    _build_ov_topology("ov-0204")))
register(DetectorSpec(
    "ov-squeezenet-light", (300, 300),
    P.PreprocessSpec(size=(300, 300), resize="letterbox"), 0,
    _build_ov_topology("ov-squeezenet-light")))


# ---------------- MTCNN ----------------


def _build_mtcnn():
    def build(rng=None, dtype=jnp.float32, **kw):
        from .mtcnn import MTCNN, MTCNNConfig

        if kw.pop("input_size", None) is not None:
            raise ValueError("mtcnn runs at native image resolution")
        cascade = MTCNN(MTCNNConfig(**kw), rng=rng, dtype=dtype)

        def detect_norm(variables, imgs):
            # imgs: [B, H, W, 3] raw BGR uint8/float at native resolution;
            # batch is a leading dim through the whole pyramid + 3 stages
            # (one compiled program per resolution, no per-image loop)
            h, w = int(imgs.shape[1]), int(imgs.shape[2])
            return cascade.detect_batch_fn(h, w)(variables, imgs)

        return cascade, cascade.variables(), detect_norm

    return build


register(
    DetectorSpec(
        name="mtcnn",
        input_size=(-1, -1),  # native resolution
        preprocess=P.PreprocessSpec(size=None, resize="none"),
        n_landmark_cols=10,
        build=_build_mtcnn(),
    )
)
