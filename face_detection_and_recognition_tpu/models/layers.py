"""Shared NHWC flax.linen building blocks for the detector/embedder zoo.

These realize the architectural contracts of the reference's vendored torch
modules (``modules/yolov5_face/pytorch/models/common.py:39-257``,
``modules/blazeface/blazeface.py:12-68``,
``modules/mobile_facenet/mobile_facenet.py:39-101``) as TPU-idiomatic layers:
NHWC layout (native conv layout for XLA/TPU), statically-shaped, with a
``dtype`` knob so the whole network can run bfloat16 on the MXU while keeping
float32 parameters.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def autopad(k: int, p: Optional[int] = None) -> int:
    """'same' padding for odd kernels (common.py:14-18)."""
    return k // 2 if p is None else p


def make_divisible_torch(x: float, divisor: int) -> int:
    """Channel-width rounding used by the reference's parse_model
    (``pytorch/utils/general.py`` make_divisible): ceil to a multiple."""
    return int(math.ceil(x / divisor) * divisor)


def channel_shuffle(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """ShuffleNet channel shuffle on NHWC tensors (common.py:21-31).

    Implemented as an EXACT one-hot matmul on the channel axis: a lane
    permutation is a relayout copy on the VPU (measured ~425 GB/s on the
    yolov5n stage tensors) but rides the MXU as a [C, C] one-hot GEMM at
    the HBM roofline. One nonzero per output keeps it exact in every dtype
    (1.0 * x with f32 accumulation)."""
    import numpy as np

    c = x.shape[-1]
    perm = np.arange(c).reshape(groups, c // groups).T.reshape(-1)
    p = jnp.asarray(np.eye(c, dtype=np.float32)[perm].T, x.dtype)
    return jax.lax.dot_general(
        x, p, (((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)


class ConvBN(nn.Module):
    """Conv2d(bias=False) + BatchNorm + activation — yolov5 ``Conv``
    (common.py:39-55). NHWC; pass ``act=None`` for linear output.

    quantized=True switches to int8 post-training-quantized inference:
    BN is folded into per-output-channel weight scales
    (utils/quantize.quantize_variables builds the params), activations are
    dynamically quantized per tensor, and the conv runs int8 x int8 -> int32
    on the MXU (~1.5x the bf16 conv throughput on v5e)."""

    features: int
    kernel: int = 1
    stride: int = 1
    padding: Optional[Union[int, Tuple[int, int, int, int]]] = None
    groups: int = 1
    act: Optional[Callable] = nn.silu
    dtype: Dtype = jnp.float32
    use_bn: bool = True
    use_bias: bool = False
    quantized: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(self.padding, tuple):
            pad = [(self.padding[0], self.padding[1]), (self.padding[2], self.padding[3])]
        else:
            p = autopad(self.kernel, self.padding)
            pad = [(p, p), (p, p)]
        if self.quantized:
            in_c = x.shape[-1]
            kernel_q = self.param(
                "kernel_q", nn.initializers.zeros,
                (self.kernel, self.kernel, in_c // self.groups, self.features),
                jnp.int8,
            )
            wscale = self.param("wscale", nn.initializers.ones,
                                (self.features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            xf = x.astype(jnp.float32)
            if self.quantized == "static":
                # calibrated per-tensor scale (utils/quantize.
                # calibrate_activation_scales) — no dynamic absmax pass
                s = self.param("ascale", nn.initializers.ones, (),
                               jnp.float32)
            else:
                s = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6) / 127.0
            xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, kernel_q, (self.stride, self.stride), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * (s * wscale) + bias
            return self.act(y) if self.act is not None else y
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.97,
                epsilon=1e-3,
                dtype=self.dtype,
            )(x)
        return self.act(x) if self.act is not None else x


class Bottleneck(nn.Module):
    """Standard bottleneck (common.py:77-88)."""

    features: int
    shortcut: bool = True
    groups: int = 1
    expansion: float = 0.5
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.features * self.expansion)
        y = ConvBN(c_, 1, 1, dtype=self.dtype, quantized=self.quantized)(x, train)
        y = ConvBN(self.features, 3, 1, groups=self.groups, dtype=self.dtype, quantized=self.quantized)(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.features else y


class C3(nn.Module):
    """CSP bottleneck with 3 convs (common.py:111-124)."""

    features: int
    n: int = 1
    shortcut: bool = True
    groups: int = 1
    expansion: float = 0.5
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.features * self.expansion)
        y1 = ConvBN(c_, 1, 1, dtype=self.dtype, quantized=self.quantized)(x, train)
        for _ in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.groups, 1.0, dtype=self.dtype, quantized=self.quantized)(
                y1, train
            )
        y2 = ConvBN(c_, 1, 1, dtype=self.dtype, quantized=self.quantized)(x, train)
        return ConvBN(self.features, 1, dtype=self.dtype, quantized=self.quantized)(
            jnp.concatenate([y1, y2], axis=-1), train
        )


class BottleneckCSP(nn.Module):
    """CSP bottleneck, legacy variant (common.py:91-108)."""

    features: int
    n: int = 1
    shortcut: bool = True
    groups: int = 1
    expansion: float = 0.5
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.features * self.expansion)
        y1 = ConvBN(c_, 1, 1, dtype=self.dtype, quantized=self.quantized)(x, train)
        for _ in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.groups, 1.0, dtype=self.dtype, quantized=self.quantized)(
                y1, train
            )
        y1 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype)(y1)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.leaky_relu(y, 0.1)
        return ConvBN(self.features, 1, 1, dtype=self.dtype, quantized=self.quantized)(y, train)


class SPP(nn.Module):
    """Spatial pyramid pooling (common.py:179-191)."""

    features: int
    kernels: Sequence[int] = (5, 9, 13)
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = ConvBN(c_, 1, 1, dtype=self.dtype, quantized=self.quantized)(x, train)
        ks = list(self.kernels)
        if all(ks[i + 1] == ks[i] + ks[0] - 1 for i in range(len(ks) - 1)):
            # cascade identity: stride-1 SAME max_pool(k) of max_pool(j) ==
            # max_pool(j+k-1), so (5, 9, 13) = three chained 5x5 pools (the
            # SPPF trick) — bit-exact, and XLA's reduce_window cost scales
            # with k*k so the 13x13 window drops from 169 to 25 reads/elem
            k = ks[0]
            pools, y = [], x
            for _ in ks:
                y = nn.max_pool(
                    y, (k, k), strides=(1, 1), padding=[(k // 2, k // 2)] * 2
                )
                pools.append(y)
        else:
            pools = [
                nn.max_pool(
                    x, (k, k), strides=(1, 1), padding=[(k // 2, k // 2)] * 2
                )
                for k in self.kernels
            ]
        return ConvBN(self.features, 1, 1, dtype=self.dtype, quantized=self.quantized)(
            jnp.concatenate([x] + pools, axis=-1), train
        )


class StemBlock(nn.Module):
    """PeleeNet-style stem (common.py:58-74)."""

    features: int
    kernel: int = 3
    stride: int = 2
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        s1 = ConvBN(self.features, self.kernel, self.stride, dtype=self.dtype, quantized=self.quantized)(x, train)
        s2 = ConvBN(self.features // 2, 1, 1, padding=0, dtype=self.dtype, quantized=self.quantized)(s1, train)
        s2 = ConvBN(self.features, 3, 2, padding=1, dtype=self.dtype, quantized=self.quantized)(s2, train)
        # torch MaxPool2d(2, 2, ceil_mode=True) == SAME-padded 2x2 max pool
        sp = nn.max_pool(s1, (2, 2), strides=(2, 2), padding="SAME")
        out = jnp.concatenate([s2, sp], axis=-1)
        return ConvBN(self.features, 1, 1, padding=0, dtype=self.dtype, quantized=self.quantized)(out, train)


class Focus(nn.Module):
    """Focus wh into channel space (common.py:196-205). NHWC pixel-unshuffle."""

    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.concatenate(
            [x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]],
            axis=-1,
        )
        return ConvBN(self.features, self.kernel, self.stride, dtype=self.dtype, quantized=self.quantized)(x, train)


class ShuffleV2Block(nn.Module):
    """ShuffleNetV2 unit with SiLU activations (common.py:127-177)."""

    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        branch_features = self.features // 2

        def branch2(inp):
            y = ConvBN(branch_features, 1, 1, padding=0, dtype=self.dtype, quantized=self.quantized)(inp, train)
            y = ConvBN(
                branch_features, 3, self.stride, padding=1,
                groups=branch_features, act=None, dtype=self.dtype,
                quantized=self.quantized,
            )(y, train)
            return ConvBN(branch_features, 1, 1, padding=0, dtype=self.dtype, quantized=self.quantized)(y, train)

        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            out = jnp.concatenate([x1, branch2(x2)], axis=-1)
        else:
            b1 = ConvBN(
                x.shape[-1], 3, self.stride, padding=1,
                groups=x.shape[-1], act=None, dtype=self.dtype,
                quantized=self.quantized,
            )(x, train)
            b1 = ConvBN(branch_features, 1, 1, padding=0, dtype=self.dtype, quantized=self.quantized)(b1, train)
            out = jnp.concatenate([b1, branch2(x)], axis=-1)
        return channel_shuffle(out, 2)


# ---------------- BlazeFace blocks (blazeface.py:12-68) ----------------


class BlazeBlock(nn.Module):
    """Depthwise-separable residual block with TFLite stride-2 padding.

    stride 2: depthwise conv consumes x padded (0,2,0,2) with VALID padding
    while the residual is max-pooled; channel deficit on the residual is
    zero-padded (blazeface.py:37-47). Convs carry bias (BN was folded by the
    original TFLite export), so no BatchNorm here.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        if self.stride == 2:
            h = jnp.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0)))
            res = nn.max_pool(x, (2, 2), strides=(2, 2))
            pad = [(0, 0), (0, 0)]
        else:
            h = x
            res = x
            p = (self.kernel - 1) // 2
            pad = [(p, p), (p, p)]
        y = nn.Conv(
            in_c, (self.kernel, self.kernel), strides=(self.stride,) * 2,
            padding=pad, feature_group_count=in_c, use_bias=True, dtype=self.dtype,
        )(h)
        y = nn.Conv(self.features, (1, 1), use_bias=True, dtype=self.dtype)(y)
        if self.features > in_c:
            res = jnp.pad(res, ((0, 0), (0, 0), (0, 0), (0, self.features - in_c)))
        return nn.relu(y + res)


class FinalBlazeBlock(nn.Module):
    """Stride-2 separable block without residual (blazeface.py:50-68)."""

    features: int
    kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = jnp.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0)))
        y = nn.Conv(
            x.shape[-1], (self.kernel, self.kernel), strides=(2, 2),
            padding=[(0, 0), (0, 0)], feature_group_count=x.shape[-1],
            use_bias=True, dtype=self.dtype,
        )(h)
        y = nn.Conv(self.features, (1, 1), use_bias=True, dtype=self.dtype)(y)
        return nn.relu(y)


# ---------------- MobileFaceNet blocks (mobile_facenet.py:39-101) ----------------


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C))."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.where(x >= 0, x, x * alpha.astype(x.dtype))


class MFConvBlock(nn.Module):
    """Conv + BN + PReLU (mobile_facenet.py:39-51)."""

    features: int
    kernel: Tuple[int, int] = (1, 1)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, self.kernel, strides=self.stride,
            padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
            feature_group_count=self.groups, use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, dtype=self.dtype)(x)
        return PReLU(dtype=self.dtype)(x)


class MFLinearBlock(nn.Module):
    """Conv + BN, no activation (mobile_facenet.py:54-64)."""

    features: int
    kernel: Tuple[int, int] = (1, 1)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, self.kernel, strides=self.stride,
            padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
            feature_group_count=self.groups, use_bias=False, dtype=self.dtype,
        )(x)
        return nn.BatchNorm(use_running_average=not train, epsilon=1e-5, dtype=self.dtype)(x)


class MFDepthWise(nn.Module):
    """pointwise-expand -> depthwise -> linear-project, optional residual
    (mobile_facenet.py:67-88)."""

    features: int
    groups: int
    residual: bool = False
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (2, 2)
    padding: Tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = MFConvBlock(self.groups, (1, 1), (1, 1), (0, 0), dtype=self.dtype)(x, train)
        y = MFConvBlock(
            self.groups, self.kernel, self.stride, self.padding,
            groups=self.groups, dtype=self.dtype,
        )(y, train)
        y = MFLinearBlock(self.features, (1, 1), (1, 1), (0, 0), dtype=self.dtype)(y, train)
        return x + y if self.residual else y


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2 normalization (mobile_facenet.py:30-33)."""
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def kaiming_out_init(key, shape, dtype=jnp.float32):
    """torch-style normal(0, sqrt(2/fan_out)) conv init (mobile_facenet.py:132-135).
    flax conv kernels are [kh, kw, in/groups, out]."""
    import jax

    fan_out = shape[0] * shape[1] * shape[3]
    return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / fan_out)
