"""SSD-class face detectors (OpenCV-DNN / OpenVINO equivalents), TPU-native.

The reference runs three SSD-family face detectors through vendor runtimes:
ResNet-10 SSD caffemodel via OpenCV DNN (``modules/opencv2_dnn/model.py:11-37``),
and MobileNetV2-SSD / SqueezeNet-SSD IRs via OpenVINO
(``modules/openvino/model.py:8-54``). All three share the Caffe SSD
``DetectionOutput`` contract: rows ``[img_id, label, conf, x1, y1, x2, y2]``
with normalized corners, which the wrappers reorder to
``[x1, y1, x2, y2, conf]``.

Here the family is one flax detector with pluggable backbones ("resnet10",
"mobilenetv2", "squeezenet"), SSD prior boxes generated on device, and the
DetectionOutput chain (softmax conf -> variance decode -> NMS -> top-k) fused
into the jitted program. Weight import from caffemodel/IR requires the caffe
protobuf schema and is intentionally out of scope; these detectors are
trainable/loadable through our own checkpoint format.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.nms import greedy_nms
from .layers import ConvBN, Dtype


@dataclasses.dataclass(frozen=True)
class SSDConfig:
    backbone: str = "resnet10"
    input_size: Tuple[int, int] = (300, 300)
    # priorbox spec: per detection level (stride, min_sizes)
    strides: Tuple[int, ...] = (8, 16, 32, 64)
    min_sizes: Tuple[Tuple[int, ...], ...] = ((16, 24), (32, 48), (64, 96), (128, 192, 256))
    variances: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)
    num_classes: int = 2  # background + face
    conf_thres: float = 0.02
    iou_thres: float = 0.45
    top_k: int = 400
    keep_top_k: int = 200
    pallas_nms: bool = None  # None = auto (Pallas kernel on TPU)


def generate_priors(cfg: SSDConfig) -> np.ndarray:
    """Caffe PriorBox-style anchors: [N, 4] rows [cx, cy, w, h] normalized,
    aspect ratio 1, one prior per min_size per cell."""
    w, h = cfg.input_size
    priors: List[List[float]] = []
    for stride, sizes in zip(cfg.strides, cfg.min_sizes):
        fh, fw = -(-h // stride), -(-w // stride)
        for y in range(fh):
            for x in range(fw):
                cx, cy = (x + 0.5) * stride / w, (y + 0.5) * stride / h
                for s in sizes:
                    priors.append([cx, cy, s / w, s / h])
    return np.asarray(priors, np.float32)


def decode_ssd_locs(
    locs: jnp.ndarray, priors: jnp.ndarray, variances: Sequence[float]
) -> jnp.ndarray:
    """Caffe SSD variance decode: locs [..., N, 4] -> xyxy normalized."""
    v = variances
    cx = priors[:, 0] + locs[..., 0] * v[0] * priors[:, 2]
    cy = priors[:, 1] + locs[..., 1] * v[1] * priors[:, 3]
    pw = priors[:, 2] * jnp.exp(locs[..., 2] * v[2])
    ph = priors[:, 3] * jnp.exp(locs[..., 3] * v[3])
    return jnp.stack([cx - pw / 2, cy - ph / 2, cx + pw / 2, cy + ph / 2], axis=-1)


class _ResBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.features, 3, self.stride, act=nn.relu, dtype=self.dtype)(x, train)
        y = ConvBN(self.features, 3, 1, act=None, dtype=self.dtype)(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = ConvBN(self.features, 1, self.stride, act=None, dtype=self.dtype)(x, train)
        return nn.relu(x + y)


class _ResNet10Backbone(nn.Module):
    """4-stage ResNet-10-style feature extractor emitting stride 8/16/32/64
    maps — the class of backbone inside OpenCV's res10_300x300 caffemodel."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(32, 7, 4, act=nn.relu, dtype=self.dtype)(x, train)  # /4
        feats = []
        for ch in (64, 128, 256, 512):
            x = _ResBlock(ch, 2, dtype=self.dtype)(x, train)
            feats.append(x)  # /8, /16, /32, /64
        return feats


class _InvertedResidual(nn.Module):
    features: int
    stride: int = 1
    expand: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        h = ConvBN(c_in * self.expand, 1, 1, act=nn.relu6, dtype=self.dtype)(x, train)
        h = ConvBN(c_in * self.expand, 3, self.stride, groups=c_in * self.expand,
                   act=nn.relu6, dtype=self.dtype)(h, train)
        h = ConvBN(self.features, 1, 1, act=None, dtype=self.dtype)(h, train)
        return x + h if self.stride == 1 and c_in == self.features else h


class _MobileNetV2Backbone(nn.Module):
    """MobileNetV2-style extractor (OpenVINO face-detection-0204 class)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = ConvBN(32, 3, 2, act=nn.relu6, dtype=d)(x, train)        # /2
        x = _InvertedResidual(16, 1, 1, dtype=d)(x, train)
        x = _InvertedResidual(24, 2, dtype=d)(x, train)              # /4
        x = _InvertedResidual(24, 1, dtype=d)(x, train)
        x = _InvertedResidual(32, 2, dtype=d)(x, train)              # /8
        x = _InvertedResidual(32, 1, dtype=d)(x, train)
        f8 = x
        x = _InvertedResidual(64, 2, dtype=d)(x, train)              # /16
        x = _InvertedResidual(64, 1, dtype=d)(x, train)
        x = _InvertedResidual(96, 1, dtype=d)(x, train)
        f16 = x
        x = _InvertedResidual(160, 2, dtype=d)(x, train)             # /32
        x = _InvertedResidual(160, 1, dtype=d)(x, train)
        f32 = x
        x = ConvBN(256, 3, 2, act=nn.relu6, dtype=d)(x, train)       # /64
        return [f8, f16, f32, x]


class _Fire(nn.Module):
    squeeze: int
    expand: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = ConvBN(self.squeeze, 1, 1, act=nn.relu, dtype=self.dtype)(x, train)
        e1 = ConvBN(self.expand, 1, 1, act=nn.relu, dtype=self.dtype)(s, train)
        e3 = ConvBN(self.expand, 3, 1, act=nn.relu, dtype=self.dtype)(s, train)
        return jnp.concatenate([e1, e3], axis=-1)


class _SqueezeNetBackbone(nn.Module):
    """SqueezeNet-style extractor (OpenVINO SqueezeNet-light SSD class)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = ConvBN(64, 3, 2, act=nn.relu, dtype=d)(x, train)                     # /2
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])             # /4
        x = _Fire(16, 64, dtype=d)(x, train)
        x = _Fire(16, 64, dtype=d)(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])             # /8
        x = _Fire(32, 128, dtype=d)(x, train)
        f8 = _Fire(32, 128, dtype=d)(x, train)
        x = nn.max_pool(f8, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])            # /16
        x = _Fire(48, 192, dtype=d)(x, train)
        f16 = _Fire(48, 192, dtype=d)(x, train)
        x = nn.max_pool(f16, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])           # /32
        f32 = _Fire(64, 256, dtype=d)(x, train)
        f64 = ConvBN(256, 3, 2, act=nn.relu, dtype=d)(f32, train)                # /64
        return [f8, f16, f32, f64]


_BACKBONES = {
    "resnet10": _ResNet10Backbone,
    "mobilenetv2": _MobileNetV2Backbone,
    "squeezenet": _SqueezeNetBackbone,
}


class SSDFaceNet(nn.Module):
    """Backbone + per-level loc/conf heads. Returns (locs [B,N,4],
    conf_logits [B,N,num_classes]) flattened over all priors."""

    cfg: SSDConfig = SSDConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = _BACKBONES[self.cfg.backbone](dtype=self.dtype)(x, train)
        locs, confs = [], []
        for level, (f, sizes) in enumerate(zip(feats, self.cfg.min_sizes)):
            na = len(sizes)
            b = f.shape[0]
            loc = nn.Conv(na * 4, (3, 3), padding="SAME", dtype=self.dtype,
                          name=f"loc{level}")(f)
            conf = nn.Conv(na * self.cfg.num_classes, (3, 3), padding="SAME",
                           dtype=self.dtype, name=f"conf{level}")(f)
            locs.append(loc.reshape(b, -1, 4).astype(jnp.float32))
            confs.append(
                conf.reshape(b, -1, self.cfg.num_classes).astype(jnp.float32)
            )
        return jnp.concatenate(locs, 1), jnp.concatenate(confs, 1)


@partial(jax.jit, static_argnames=("cfg",))
def ssd_postprocess(
    locs: jnp.ndarray,
    conf_logits: jnp.ndarray,
    priors: jnp.ndarray,
    cfg: SSDConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Caffe DetectionOutput equivalent: softmax -> decode -> per-image NMS ->
    keep_top_k. Returns dets [B, keep_top_k, 5] rows [x1, y1, x2, y2, conf]
    normalized to [0, 1] (the post-reorder wrapper contract,
    ``opencv2_dnn/model.py:34-37``) and a validity mask."""
    conf = jax.nn.softmax(conf_logits, axis=-1)[..., 1]  # face class
    boxes = decode_ssd_locs(locs, priors, cfg.variances)
    use_pallas = cfg.pallas_nms
    if use_pallas is None:
        from ..ops.platform import on_tpu
        use_pallas = on_tpu()

    def per_image(b, c):
        k = min(cfg.top_k, c.shape[0])
        top_c, idx = jax.lax.top_k(c, k)  # sorted by conf desc
        rows = jnp.concatenate([b[idx], top_c[:, None]], axis=-1)
        valid = top_c > cfg.conf_thres
        if use_pallas:
            from ..ops.nms import sort_by_score
            from ..ops.pallas_kernels import nms_fixpoint_pallas

            keep = nms_fixpoint_pallas(rows[:, :4], valid, cfg.iou_thres)
            _, _, out_valid, out = sort_by_score(
                rows[:, 4], keep, rows, top=cfg.keep_top_k)
            return out, out_valid
        return greedy_nms(rows, valid, cfg.iou_thres, cfg.keep_top_k, score_col=4)

    return jax.vmap(per_image)(boxes, conf)


def make_ssd_face(cfg: SSDConfig, rng: jax.Array = None, dtype=jnp.float32):
    """Build net + params + jitted detect.

    detect(variables, imgs [B,H,W,3] mean-subtracted BGR) ->
    (dets [B, keep_top_k, 5] normalized xyxy+conf, valid).
    """
    net = SSDFaceNet(cfg=cfg, dtype=dtype)
    w, h = cfg.input_size
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = jax.jit(net.init)(rng, jnp.zeros((1, h, w, 3), jnp.float32))
    priors = jnp.asarray(generate_priors(cfg))

    @jax.jit
    def detect(variables, imgs):
        locs, conf = net.apply(variables, imgs)
        return ssd_postprocess(locs, conf, priors, cfg)

    return net, variables, detect
