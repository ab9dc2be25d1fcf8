"""YOLOv5-face detector family, TPU-native.

Architecture contract comes from the reference's yaml-driven model zoo
(``modules/yolov5_face/pytorch/models/*.yaml`` parsed by ``yolo.py:260-327``)
and the 16-outputs-per-anchor Detect head (``yolo.py:29-113``: xyxy+obj+10
landmark coords + nc class scores). Three base graphs cover all 9 yamls:

  * "p5": StemBlock + C3/SPP CSP net, detect at strides 8/16/32
          (yolov5s/m/l via depth/width multiples)
  * "p6": same with an extra P6/64 level (yolov5s6/m6/l6/n6)
  * "shuffle": StemBlock + ShuffleNetV2 backbone (yolov5n, yolov5n-0.5)

TPU-first design vs the reference:
  * NHWC + bf16-ready blocks; channel widths follow the reference's
    make_divisible(c * width_multiple, 8) rule so converted torch weights
    drop in exactly.
  * The Detect head emits raw [B, ny, nx, na, no] maps; grid/anchor decode
    (``onnx_utils.py:30-73``) is one fused vectorized op over all levels.
  * The custom +1px-IoU NMS (``onnx_utils.py:107-163``) runs as a masked
    top-k + fori_loop kernel inside the same jitted program.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import xywh2xyxy
from ..ops.nms import greedy_nms
from .layers import (C3, SPP, ConvBN, Dtype, Focus, ShuffleV2Block, StemBlock,
                     make_divisible_torch)

FACE_ANCHORS = (
    ((4.0, 5.0), (8.0, 10.0), (13.0, 16.0)),
    ((23.0, 29.0), (43.0, 55.0), (73.0, 105.0)),
    ((146.0, 217.0), (231.0, 300.0), (335.0, 433.0)),
)
FACE_ANCHORS_P6 = (
    ((6.0, 7.0), (9.0, 11.0), (13.0, 16.0)),
    ((18.0, 23.0), (26.0, 33.0), (37.0, 47.0)),
    ((54.0, 67.0), (77.0, 104.0), (112.0, 154.0)),
    ((174.0, 238.0), (258.0, 355.0), (445.0, 568.0)),
)

# graph structure: list of (from, number, module, args) like the yamls
_P5_GRAPH: List[Tuple[Any, int, str, list]] = [
    # backbone
    (-1, 1, "StemBlock", [64, 3, 2]),          # 0  P2/4
    (-1, 3, "C3", [128]),                       # 1
    (-1, 1, "Conv", [256, 3, 2]),               # 2  P3/8
    (-1, 9, "C3", [256]),                       # 3
    (-1, 1, "Conv", [512, 3, 2]),               # 4  P4/16
    (-1, 9, "C3", [512]),                       # 5
    (-1, 1, "Conv", [1024, 3, 2]),              # 6  P5/32
    (-1, 1, "SPP", [1024, [3, 5, 7]]),          # 7
    (-1, 3, "C3", [1024, False]),               # 8
    # head
    (-1, 1, "Conv", [512, 1, 1]),               # 9
    (-1, 1, "Upsample", []),                    # 10
    ([-1, 5], 1, "Concat", []),                 # 11
    (-1, 3, "C3", [512, False]),                # 12
    (-1, 1, "Conv", [256, 1, 1]),               # 13
    (-1, 1, "Upsample", []),                    # 14
    ([-1, 3], 1, "Concat", []),                 # 15
    (-1, 3, "C3", [256, False]),                # 16  P3/8 out
    (-1, 1, "Conv", [256, 3, 2]),               # 17
    ([-1, 13], 1, "Concat", []),                # 18
    (-1, 3, "C3", [512, False]),                # 19  P4/16 out
    (-1, 1, "Conv", [512, 3, 2]),               # 20
    ([-1, 9], 1, "Concat", []),                 # 21
    (-1, 3, "C3", [1024, False]),               # 22  P5/32 out
    ([16, 19, 22], 1, "Detect", []),            # 23
]

_P6_GRAPH: List[Tuple[Any, int, str, list]] = [
    (-1, 1, "StemBlock", [64, 3, 2]),           # 0
    (-1, 3, "C3", [128]),                        # 1
    (-1, 1, "Conv", [256, 3, 2]),                # 2  P3/8
    (-1, 9, "C3", [256]),                        # 3
    (-1, 1, "Conv", [512, 3, 2]),                # 4  P4/16
    (-1, 9, "C3", [512]),                        # 5
    (-1, 1, "Conv", [768, 3, 2]),                # 6  P5/32
    (-1, 3, "C3", [768]),                        # 7
    (-1, 1, "Conv", [1024, 3, 2]),               # 8  P6/64
    (-1, 1, "SPP", [1024, [3, 5, 7]]),           # 9
    (-1, 3, "C3", [1024, False]),                # 10
    (-1, 1, "Conv", [768, 1, 1]),                # 11
    (-1, 1, "Upsample", []),                     # 12
    ([-1, 7], 1, "Concat", []),                  # 13
    (-1, 3, "C3", [768, False]),                 # 14
    (-1, 1, "Conv", [512, 1, 1]),                # 15
    (-1, 1, "Upsample", []),                     # 16
    ([-1, 5], 1, "Concat", []),                  # 17
    (-1, 3, "C3", [512, False]),                 # 18
    (-1, 1, "Conv", [256, 1, 1]),                # 19
    (-1, 1, "Upsample", []),                     # 20
    ([-1, 3], 1, "Concat", []),                  # 21
    (-1, 3, "C3", [256, False]),                 # 22  P3
    (-1, 1, "Conv", [256, 3, 2]),                # 23
    ([-1, 19], 1, "Concat", []),                 # 24
    (-1, 3, "C3", [512, False]),                 # 25  P4
    (-1, 1, "Conv", [512, 3, 2]),                # 26
    ([-1, 15], 1, "Concat", []),                 # 27
    (-1, 3, "C3", [768, False]),                 # 28  P5
    (-1, 1, "Conv", [768, 3, 2]),                # 29
    ([-1, 11], 1, "Concat", []),                 # 30
    (-1, 3, "C3", [1024, False]),                # 31  P6
    ([22, 25, 28, 31], 1, "Detect", []),         # 32
]

_SHUFFLE_GRAPH: List[Tuple[Any, int, str, list]] = [
    (-1, 1, "StemBlock", [32, 3, 2]),            # 0  P2/4
    (-1, 1, "ShuffleV2Block", [128, 2]),         # 1  P3/8
    (-1, 3, "ShuffleV2Block", [128, 1]),         # 2
    (-1, 1, "ShuffleV2Block", [256, 2]),         # 3  P4/16
    (-1, 7, "ShuffleV2Block", [256, 1]),         # 4
    (-1, 1, "ShuffleV2Block", [512, 2]),         # 5  P5/32
    (-1, 3, "ShuffleV2Block", [512, 1]),         # 6
    (-1, 1, "Conv", [128, 1, 1]),                # 7
    (-1, 1, "Upsample", []),                     # 8
    ([-1, 4], 1, "Concat", []),                  # 9
    (-1, 1, "C3", [128, False]),                 # 10
    (-1, 1, "Conv", [128, 1, 1]),                # 11
    (-1, 1, "Upsample", []),                     # 12
    ([-1, 2], 1, "Concat", []),                  # 13
    (-1, 1, "C3", [128, False]),                 # 14  P3/8 out
    (-1, 1, "Conv", [128, 3, 2]),                # 15
    ([-1, 11], 1, "Concat", []),                 # 16
    (-1, 1, "C3", [128, False]),                 # 17  P4/16 out
    (-1, 1, "Conv", [128, 3, 2]),                # 18
    ([-1, 7], 1, "Concat", []),                  # 19
    (-1, 1, "C3", [128, False]),                 # 20  P5/32 out
    ([14, 17, 20], 1, "Detect", []),             # 21
]

_SHUFFLE_P6_GRAPH: List[Tuple[Any, int, str, list]] = [
    (-1, 1, "StemBlock", [32, 3, 2]),            # 0  P2/4
    (-1, 1, "ShuffleV2Block", [128, 2]),         # 1  P3/8
    (-1, 3, "ShuffleV2Block", [128, 1]),         # 2
    (-1, 1, "ShuffleV2Block", [256, 2]),         # 3  P4/16
    (-1, 7, "ShuffleV2Block", [256, 1]),         # 4
    (-1, 1, "ShuffleV2Block", [384, 2]),         # 5  P5/32
    (-1, 3, "ShuffleV2Block", [384, 1]),         # 6
    (-1, 1, "ShuffleV2Block", [512, 2]),         # 7  P6/64
    (-1, 3, "ShuffleV2Block", [512, 1]),         # 8
    (-1, 1, "Conv", [128, 1, 1]),                # 9
    (-1, 1, "Upsample", []),                     # 10
    ([-1, 6], 1, "Concat", []),                  # 11
    (-1, 1, "C3", [128, False]),                 # 12
    (-1, 1, "Conv", [128, 1, 1]),                # 13
    (-1, 1, "Upsample", []),                     # 14
    ([-1, 4], 1, "Concat", []),                  # 15
    (-1, 1, "C3", [128, False]),                 # 16
    (-1, 1, "Conv", [128, 1, 1]),                # 17
    (-1, 1, "Upsample", []),                     # 18
    ([-1, 2], 1, "Concat", []),                  # 19
    (-1, 1, "C3", [128, False]),                 # 20  P3/8 out
    (-1, 1, "Conv", [128, 3, 2]),                # 21
    ([-1, 17], 1, "Concat", []),                 # 22
    (-1, 1, "C3", [128, False]),                 # 23  P4/16 out
    (-1, 1, "Conv", [128, 3, 2]),                # 24
    ([-1, 13], 1, "Concat", []),                 # 25
    (-1, 1, "C3", [128, False]),                 # 26  P5/32 out
    (-1, 1, "Conv", [128, 3, 2]),                # 27
    ([-1, 9], 1, "Concat", []),                  # 28
    (-1, 1, "C3", [128, False]),                 # 29  P6/64 out
    ([20, 23, 26, 29], 1, "Detect", []),         # 30
]

ARCHS: Dict[str, Dict[str, Any]] = {
    "yolov5s": dict(graph=_P5_GRAPH, gd=0.33, gw=0.35, anchors=FACE_ANCHORS,
                    strides=(8, 16, 32)),
    "yolov5m": dict(graph=_P5_GRAPH, gd=0.67, gw=0.75, anchors=FACE_ANCHORS,
                    strides=(8, 16, 32)),
    "yolov5l": dict(graph=_P5_GRAPH, gd=1.0, gw=1.0, anchors=FACE_ANCHORS,
                    strides=(8, 16, 32)),
    "yolov5s6": dict(graph=_P6_GRAPH, gd=0.33, gw=0.50, anchors=FACE_ANCHORS_P6,
                     strides=(8, 16, 32, 64)),
    "yolov5m6": dict(graph=_P6_GRAPH, gd=0.67, gw=0.75, anchors=FACE_ANCHORS_P6,
                     strides=(8, 16, 32, 64)),
    "yolov5l6": dict(graph=_P6_GRAPH, gd=1.0, gw=1.0, anchors=FACE_ANCHORS_P6,
                     strides=(8, 16, 32, 64)),
    "yolov5n6": dict(graph=_SHUFFLE_P6_GRAPH, gd=1.0, gw=1.0,
                     anchors=FACE_ANCHORS_P6, strides=(8, 16, 32, 64)),
    "yolov5n": dict(graph=_SHUFFLE_GRAPH, gd=1.0, gw=1.0, anchors=FACE_ANCHORS,
                    strides=(8, 16, 32)),
    "yolov5n-0.5": dict(graph=_SHUFFLE_GRAPH, gd=1.0, gw=0.5, anchors=FACE_ANCHORS,
                        strides=(8, 16, 32)),
}


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """nn.Upsample(scale=2, mode=nearest) on NHWC."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class YoloV5FaceNet(nn.Module):
    """Graph-executing flax module. Produces raw per-level detect maps
    [B, ny, nx, na, no] (no = nc + 5 + 10), like the reference's export mode
    (``yolo.py:54-63``) but NHWC."""

    arch: str = "yolov5s"
    nc: int = 1
    dtype: Dtype = jnp.float32
    quantized: bool = False
    with_landmarks: bool = True  # False = official yolov5 head (no = nc+5)

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = ARCHS[self.arch]
        gd, gw = spec["gd"], spec["gw"]
        anchors = spec["anchors"]
        na = len(anchors[0])
        no = self.nc + 5 + (10 if self.with_landmarks else 0)

        def depth(n: int) -> int:
            return max(round(n * gd), 1) if n > 1 else n

        def width(c: int) -> int:
            return make_divisible_torch(c * gw, 8)

        outputs: List[jnp.ndarray] = []
        cur = x
        for i, (frm, n, mod, args) in enumerate(spec["graph"]):
            if mod == "Concat":
                inp = jnp.concatenate(
                    [cur if j == -1 else outputs[j] for j in frm], axis=-1
                )
                cur = inp
            elif mod == "Detect":
                maps = []
                for li, j in enumerate(frm):
                    m = nn.Conv(
                        no * na, (1, 1), use_bias=True, dtype=self.dtype,
                        name=f"detect_m{li}",
                    )(outputs[j])
                    b, ny, nx, _ = m.shape
                    # channel layout [na, no] matches torch's
                    # view(bs, na, no, ny, nx).permute(0,1,3,4,2)
                    m = m.reshape(b, ny, nx, na, no).transpose(0, 3, 1, 2, 4)
                    # bf16 heads stay bf16 so the candidate gather streams
                    # half the bytes (values identical after the decode's
                    # f32 upcast); f32 nets emit f32 as before
                    if self.dtype != jnp.bfloat16:
                        m = m.astype(jnp.float32)
                    maps.append(m)
                return maps
            else:
                inp = cur if frm == -1 else outputs[frm]
                if mod == "Conv":
                    c, k, s = args
                    cur = ConvBN(width(c), k, s, dtype=self.dtype,
                                 quantized=self.quantized,
                                 name=f"layer{i}")(inp, train)
                elif mod == "C3":
                    c = width(args[0])
                    shortcut = args[1] if len(args) > 1 else True
                    cur = C3(c, depth(n), shortcut, dtype=self.dtype,
                             quantized=self.quantized,
                             name=f"layer{i}")(inp, train)
                elif mod == "SPP":
                    cur = SPP(width(args[0]), tuple(args[1]), dtype=self.dtype,
                              quantized=self.quantized,
                              name=f"layer{i}")(inp, train)
                elif mod == "StemBlock":
                    c, k, s = args
                    cur = StemBlock(width(c), k, s, dtype=self.dtype,
                                    quantized=self.quantized,
                                    name=f"layer{i}")(inp, train)
                elif mod == "ShuffleV2Block":
                    c, s = width(args[0]), args[1]
                    for r in range(depth(n)):
                        inp = ShuffleV2Block(c, s, dtype=self.dtype,
                                             quantized=self.quantized,
                                             name=f"layer{i}_{r}")(inp, train)
                    cur = inp
                elif mod == "Focus":
                    c, k = args[0], args[1] if len(args) > 1 else 1
                    cur = Focus(width(c), k, dtype=self.dtype,
                                quantized=self.quantized,
                                name=f"layer{i}")(inp, train)
                elif mod == "Upsample":
                    cur = upsample2x_nearest(inp)
                else:
                    raise ValueError(f"unknown module {mod}")
            outputs.append(cur)
        raise RuntimeError("graph has no Detect layer")


def decode_heads(
    maps: Sequence[jnp.ndarray],
    anchors: Sequence[Sequence[Tuple[float, float]]],
    strides: Sequence[int],
    nc: int = 1,
    landmarks: bool = True,
) -> jnp.ndarray:
    """Fused grid/anchor decode over all levels (``onnx_utils.py:30-73``).

    maps: per-level [B, na, ny, nx, no]. Returns [B, total, no] rows
    [cx, cy, w, h, obj, l1x, l1y, ..., l5x, l5y, cls...] in INPUT PIXELS.
    landmarks=False decodes the OFFICIAL yolov5 head layout
    (no = nc + 5, everything sigmoided — the Detect-layer inference mode
    the reference's official=True ONNX path exports already decoded).
    """
    outs = []
    for m, anc, stride in zip(maps, anchors, strides):
        # decode in f32 whatever the head emitted (bf16 heads keep their raw
        # maps bf16 so the candidate gather streams half the bytes; BOTH
        # decode paths upcast the raw rows before sigmoid so they stay
        # bit-identical — the reference decodes in f32 too)
        m = jnp.asarray(m).astype(jnp.float32)
        b, na, ny, nx, no = m.shape
        gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
        grid = jnp.stack([gx, gy], axis=-1)[None, None]           # [1,1,ny,nx,2]
        anc = jnp.asarray(anc, jnp.float32).reshape(1, na, 1, 1, 2)

        if landmarks:
            # three contiguous slices instead of a scattered column update:
            # sigmoid [0:5) and [15:15+nc), landmarks [5:15) stay linear
            y = jnp.concatenate([
                jax.nn.sigmoid(m[..., :5]), m[..., 5:15],
                jax.nn.sigmoid(m[..., 15:]),
            ], axis=-1)
        else:
            y = jax.nn.sigmoid(m)
        xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * stride
        wh = (y[..., 2:4] * 2.0) ** 2 * anc
        if landmarks:
            lmk = y[..., 5:15].reshape(b, na, ny, nx, 5, 2) * anc[..., None, :]                 + (grid[..., None, :] * stride)
            out = jnp.concatenate(
                [xy, wh, y[..., 4:5], lmk.reshape(b, na, ny, nx, 10),
                 y[..., 15:]], axis=-1)
        else:
            out = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
        outs.append(out.reshape(b, -1, no))
    return jnp.concatenate(outs, axis=1)


@dataclasses.dataclass(frozen=True)
class YoloV5FaceConfig:
    arch: str = "yolov5s"
    nc: int = 1
    input_size: Tuple[int, int] = (640, 640)
    conf_thres: float = 0.4
    iou_thres: float = 0.3
    max_candidates: int = 1024
    max_det: int = 300
    # None = auto: the fused VMEM Pallas NMS kernel on TPU (1.6x the jnp
    # fixpoint at batch 128/K 1024), jnp elsewhere
    pallas_nms: bool = None


def _use_pallas_nms(cfg: YoloV5FaceConfig) -> bool:
    if cfg.pallas_nms is None:
        from ..ops.platform import on_tpu

        return on_tpu()
    return cfg.pallas_nms


def _nms_candidate_rows(p, cand_valid, cfg: YoloV5FaceConfig, use_pallas):
    """Shared NMS stage over ONE image's decoded candidate rows (sorted by
    score desc): xywh->xyxy, the custom +1px-IoU >=thres suppression, and a
    max_det-sliced, score-ordered output block."""
    boxes = xywh2xyxy(p[:, :4])
    cls_conf = jnp.max(p[:, 15:], axis=-1, keepdims=True)
    rows = jnp.concatenate([boxes, p[:, 4:5], p[:, 5:15], cls_conf], axis=-1)
    if use_pallas:
        from ..ops.nms import sort_by_score
        from ..ops.pallas_kernels import nms_fixpoint_pallas

        keep = nms_fixpoint_pallas(
            boxes, cand_valid, cfg.iou_thres, plus1=True, strict=False)
        # push suppressed rows to the end, keep score order among kept
        _, _, out_valid, out = sort_by_score(
            rows[:, 4], keep, rows, top=cfg.max_det)
        return out, out_valid
    return greedy_nms(
        rows, cand_valid, cfg.iou_thres, cfg.max_det,
        score_col=4, plus1=True, strict=False,
    )


@partial(jax.jit, static_argnames=("cfg",))
def yolov5_face_postprocess(
    pred: jnp.ndarray, cfg: YoloV5FaceConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Custom yolov5-face NMS (``onnx_utils.py:107-163``) as a fixed-size
    masked kernel: conf filter (obj >= conf_thres) -> top-k candidate select
    -> greedy +1px-IoU NMS with >=thres suppression.

    pred: [B, N, 16] decoded rows [cx, cy, w, h, obj, lmk x10, cls].
    Returns dets [B, max_det, 16] rows [x1, y1, x2, y2, obj, lmk x10, cls_conf]
    sorted by obj conf, and valid [B, max_det].
    """
    use_pallas = _use_pallas_nms(cfg)

    def per_image(p):
        obj = p[:, 4]
        valid = obj >= cfg.conf_thres
        # top-k candidate selection keeps the NMS matrix small & static;
        # top_k also leaves candidates SORTED by score desc
        k = min(cfg.max_candidates, p.shape[0])
        scores = jnp.where(valid, obj, -1.0)
        top_scores, idx = jax.lax.top_k(scores, k)
        cand = p[idx]
        cand_valid = top_scores >= cfg.conf_thres
        return _nms_candidate_rows(cand, cand_valid, cfg, use_pallas)

    return jax.vmap(per_image)(pred)


def _candidate_grid_params(
    idx: jnp.ndarray,
    anchors: Sequence[Sequence[Tuple[float, float]]],
    strides: Sequence[int],
    input_size: Tuple[int, int],
):
    """Recover (grid_xy, stride, anchor_wh) for flat anchor indices ``idx``
    by integer arithmetic over the level layout — no [N, 5] lookup-table
    gather (TPU row gathers are the single most expensive op in the
    postprocess; see yolov5_face_detect_maps).

    Flat order matches ``decode_heads``: levels concatenated, each level
    row-major over [na, ny, nx].
    """
    w, h = input_size
    gx = jnp.zeros_like(idx)
    gy = jnp.zeros_like(idx)
    stride_o = jnp.zeros(idx.shape, jnp.float32)
    aw = jnp.zeros(idx.shape, jnp.float32)
    ah = jnp.zeros(idx.shape, jnp.float32)
    offset = 0
    for anc, s in zip(anchors, strides):
        ny, nx = h // s, w // s
        na = len(anc)
        block = na * ny * nx
        r = idx - offset
        in_lvl = (r >= 0) & (r < block)
        a = r // (ny * nx)
        cell = r % (ny * nx)
        gy = jnp.where(in_lvl, cell // nx, gy)
        gx = jnp.where(in_lvl, cell % nx, gx)
        stride_o = jnp.where(in_lvl, float(s), stride_o)
        for j, (ajw, ajh) in enumerate(anc):
            hit = in_lvl & (a == j)
            aw = jnp.where(hit, float(ajw), aw)
            ah = jnp.where(hit, float(ajh), ah)
        offset += block
    grid = jnp.stack([gx, gy], axis=-1).astype(jnp.float32)
    anc_wh = jnp.stack([aw, ah], axis=-1)
    return grid, stride_o[..., None], anc_wh


def yolov5_face_detect_maps(
    maps: Sequence[jnp.ndarray],
    anchors: Sequence[Sequence[Tuple[float, float]]],
    strides: Sequence[int],
    cfg: YoloV5FaceConfig,
    rows_bf16_exact: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Candidates-first fusion of decode + NMS: top-k on RAW objectness
    logits selects ``cfg.max_candidates`` rows, then grid/anchor decode, box
    conversion and NMS all run on [B, K] instead of [B, ~25k].

    Numerically identical to ``decode_heads`` + ``yolov5_face_postprocess``
    on the valid rows (sigmoid is monotone, so logit top-k picks the same
    candidate set and order; sigmoid(gather(x)) == gather(sigmoid(x))); only
    the CONTENT of masked-out padding rows can differ. Profiled on v5e at
    batch 128: the full-grid path spends ~13.6 ms/step in sort + f32 row
    gathers + whole-grid decode; this path cuts that to ~5 ms (raw bf16 rows
    gather at half the bytes, decode shrinks 25x, the final gather only
    materializes max_det rows).
    """
    b, no = maps[0].shape[0], maps[0].shape[-1]
    maps_flat = [m.reshape(b, -1, no) for m in maps]
    n = sum(mf.shape[1] for mf in maps_flat)
    k = min(cfg.max_candidates, n)
    # top-k keyed on sigmoid(logit) — NOT the raw logit — so bf16 score TIES
    # fall in exactly the same classes as the full-grid path (greedy NMS is
    # order-dependent among ties); rows are gathered in the RAW dtype (bf16
    # rows gather 2x faster than decoded f32)
    obj = jnp.concatenate([mf[..., 4] for mf in maps_flat], axis=1)
    # sigmoid in f32 even for bf16 heads: a bf16 sigmoid collapses distinct
    # scores into ties and reorders the top-k vs the f32 full-grid path
    _, idx = jax.lax.top_k(jax.nn.sigmoid(obj.astype(jnp.float32)), k)
    pack = 128 // no if 128 % no == 0 else 0
    if pack and all(mf.shape[1] % pack == 0 for mf in maps_flat) \
            and _use_pallas_nms(cfg) \
            and (maps_flat[0].dtype == jnp.bfloat16 or rows_bf16_exact):
        # XLA row gathers here are latency-bound (~2 ms at [128,1024,16])
        # and need the [B, ~25k, no] concat materialized; the streaming
        # one-hot GEMM reads each level once at HBM bandwidth instead.
        # The kernel selects through bf16 one-hot dots, which is EXACT only
        # when the row VALUES are bf16-representable: bf16 maps, or the f32
        # maps of a bf16-compute head (rows_bf16_exact, set by the builder).
        # Genuine f32 heads take the exact take_along path instead.
        from ..ops.pallas_kernels import candidate_rows_gather_pallas
        cand = candidate_rows_gather_pallas(tuple(maps_flat), idx)
    else:
        flat = jnp.concatenate(maps_flat, axis=1)
        cand = jnp.take_along_axis(flat, idx[..., None], axis=1)  # [B,k,no]
    # the gather streams raw (possibly bf16) rows; everything downstream
    # decodes in f32 so bf16 heads match the f32 full-grid path bit-for-bit
    cand = cand.astype(jnp.float32)
    # input dims from the MAPS, not cfg: the level layout must match the
    # tensors actually produced, which makes the same compiled decode serve
    # rectangular letterbox inputs (engine rect=True) — maps are
    # [B, na, ny, nx, no] so level 0 is (h/s0, w/s0)
    in_size = (maps[0].shape[3] * strides[0], maps[0].shape[2] * strides[0])
    grid, stride, anc = _candidate_grid_params(
        idx, anchors, strides, in_size)

    # decode exactly as decode_heads (same op order and dtypes)
    y = jnp.concatenate([
        jax.nn.sigmoid(cand[..., :5]), cand[..., 5:15],
        jax.nn.sigmoid(cand[..., 15:]),
    ], axis=-1)
    xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * stride
    wh = (y[..., 2:4] * 2.0) ** 2 * anc
    lmk = (y[..., 5:15].reshape(b, k, 5, 2) * anc[..., None, :]
           + grid[..., None, :] * stride[..., None])
    pred = jnp.concatenate(
        [xy, wh, y[..., 4:5], lmk.reshape(b, k, 10), y[..., 15:]], axis=-1)

    use_pallas = _use_pallas_nms(cfg)

    def per_image(p):
        cand_valid = p[:, 4] >= cfg.conf_thres
        return _nms_candidate_rows(p, cand_valid, cfg, use_pallas)

    return jax.vmap(per_image)(pred)


def make_yolov5_face(
    cfg: YoloV5FaceConfig, rng: jax.Array = None, dtype=jnp.float32,
    quantized: bool = False,
):
    """Build net + params + a fully jitted detect function.

    detect(variables, imgs [B,H,W,3] RGB in [0,1]) ->
    (dets [B, max_det, 16] in input pixels, valid [B, max_det]).
    quantized=True builds the int8 PTQ graph (params from
    utils/quantize.quantize_variables).
    """
    net = YoloV5FaceNet(arch=cfg.arch, nc=cfg.nc, dtype=dtype,
                        quantized=quantized)
    w, h = cfg.input_size
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = jax.jit(net.init)(rng, jnp.zeros((1, h, w, 3), jnp.float32))
    spec = ARCHS[cfg.arch]

    rows_bf16 = (dtype == jnp.bfloat16) and not quantized

    @jax.jit
    def detect(variables, imgs):
        maps = net.apply(variables, imgs)
        return yolov5_face_detect_maps(
            maps, spec["anchors"], spec["strides"], cfg,
            rows_bf16_exact=rows_bf16)

    return net, variables, detect


# ---------------- official (multiclass) yolov5 path ----------------

# the official yolov5 anchor set (yolov5s.yaml; the face anchors above are
# yolov5-face's re-tuned set)
OFFICIAL_ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)


@partial(jax.jit, static_argnames=("cfg",))
def yolov5_official_postprocess(
    pred: jnp.ndarray, cfg: YoloV5FaceConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference ``non_max_suppression`` (``onnx_utils.py:193-288``) as a
    masked fixed-size kernel: obj-conf candidate filter -> conf = obj * cls
    -> best class -> torchvision-style class-offset NMS (strict IoU).

    pred: [B, N, 5 + nc] decoded rows [cx, cy, w, h, obj, cls...].
    Returns dets [B, max_det, 6] rows [x1, y1, x2, y2, conf, cls] and valid.
    """
    from ..ops.nms import multiclass_nms

    def per_image(p):
        obj = p[:, 4]
        cand = obj > cfg.conf_thres                       # reference xc
        k = min(cfg.max_candidates, p.shape[0])
        top, idx = jax.lax.top_k(jnp.where(cand, obj, -1.0), k)
        x = p[idx]
        valid = top > cfg.conf_thres
        cls_scores = x[:, 5:] * x[:, 4:5]                 # conf = obj * cls
        conf = jnp.max(cls_scores, axis=-1)
        cls = jnp.argmax(cls_scores, axis=-1)
        valid = valid & (conf > cfg.conf_thres)
        boxes = xywh2xyxy(x[:, :4])
        dets, out_valid, _ = multiclass_nms(
            boxes, conf, cls, valid, cfg.iou_thres, cfg.max_det,
            agnostic=False,
        )
        return dets, out_valid

    return jax.vmap(per_image)(pred)


def yolov5_official_detect_maps(
    maps: Sequence[jnp.ndarray],
    anchors: Sequence[Sequence[Tuple[float, float]]],
    strides: Sequence[int],
    cfg: YoloV5FaceConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Candidates-first fusion of the official (multiclass, landmark-less)
    path — same structure as ``yolov5_face_detect_maps``: obj top-k on the
    raw maps, gather, decode [B, K] rows, class-offset NMS."""
    b, no = maps[0].shape[0], maps[0].shape[-1]
    flat = jnp.concatenate([m.reshape(b, -1, no) for m in maps], axis=1)
    k = min(cfg.max_candidates, flat.shape[1])
    _, idx = jax.lax.top_k(
        jax.nn.sigmoid(flat[..., 4].astype(jnp.float32)), k)
    cand = jnp.take_along_axis(flat, idx[..., None], axis=1)
    # raw rows may be bf16 (bf16 heads); decode in f32 like decode_heads
    cand = cand.astype(jnp.float32)
    # input dims from the maps (rect-capable; see yolov5_face_detect_maps)
    in_size = (maps[0].shape[3] * strides[0], maps[0].shape[2] * strides[0])
    grid, stride, anc = _candidate_grid_params(
        idx, anchors, strides, in_size)
    y = jax.nn.sigmoid(cand)
    xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * stride
    wh = (y[..., 2:4] * 2.0) ** 2 * anc
    pred = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
    return yolov5_official_postprocess_candidates(pred, cfg)


def yolov5_official_postprocess_candidates(pred, cfg: YoloV5FaceConfig):
    """NMS stage of the official path over already-selected candidate rows
    (``pred`` [B, K, 5 + nc] decoded)."""
    from ..ops.nms import multiclass_nms

    def per_image(p):
        obj = p[:, 4]
        valid = obj > cfg.conf_thres                      # reference xc
        cls_scores = p[:, 5:] * p[:, 4:5]                 # conf = obj * cls
        conf = jnp.max(cls_scores, axis=-1)
        cls = jnp.argmax(cls_scores, axis=-1)
        valid = valid & (conf > cfg.conf_thres)
        boxes = xywh2xyxy(p[:, :4])
        dets, out_valid, _ = multiclass_nms(
            boxes, conf, cls, valid, cfg.iou_thres, cfg.max_det,
            agnostic=False,
        )
        return dets, out_valid

    return jax.vmap(per_image)(pred)


def make_yolov5_official(
    cfg: YoloV5FaceConfig, rng: jax.Array = None, dtype=jnp.float32,
):
    """Official (landmark-less, multiclass) yolov5 — the reference's
    ``official=True`` ONNX path (``onnx_utils.py:348-352``).

    detect(variables, imgs [B,H,W,3] RGB in [0,1]) ->
    (dets [B, max_det, 6] rows [xyxy, conf, cls] in input pixels, valid).
    """
    net = YoloV5FaceNet(arch=cfg.arch, nc=cfg.nc, dtype=dtype,
                        with_landmarks=False)
    w, h = cfg.input_size
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = jax.jit(net.init)(rng, jnp.zeros((1, h, w, 3), jnp.float32))
    spec = ARCHS[cfg.arch]

    @jax.jit
    def detect(variables, imgs):
        maps = net.apply(variables, imgs)
        return yolov5_official_detect_maps(
            maps, OFFICIAL_ANCHORS, spec["strides"], cfg)

    return net, variables, detect
