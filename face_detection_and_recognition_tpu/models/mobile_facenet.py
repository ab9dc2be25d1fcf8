"""MobileFaceNet embedder + ArcFace head, TPU-native.

Architecture contract from the reference torch implementation
(``modules/mobile_facenet/mobile_facenet.py:104-154``): 112x112 RGB in,
512-d L2-normalized embedding out. The ArcFace margin-softmax head
(``mobile_facenet.py:160-201``) is provided as a pure function for the
training subsystem (the reference defines but never trains it).

Input normalization matches ``modules/mobile_facenet/utils.py:5-18``:
(x - 127.5) / 127.5 on BGR crops resized to 112x112
(see ops/preprocess.MOBILE_FACENET).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (Dtype, MFConvBlock, MFDepthWise, MFLinearBlock,
                     l2_normalize)


class MobileFaceNet(nn.Module):
    """512-d face embedder (mobile_facenet.py:104-154). NHWC."""

    embedding_size: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = MFConvBlock(64, (3, 3), (2, 2), (1, 1), dtype=d, name="conv1")(x, train)
        x = MFConvBlock(64, (3, 3), (1, 1), (1, 1), groups=64, dtype=d,
                        name="conv2_dw")(x, train)
        x = MFDepthWise(64, groups=128, stride=(2, 2), dtype=d,
                        name="conv_23")(x, train)
        x = _residual(x, 64, 4, 128, d, "conv_3", train)
        x = MFDepthWise(128, groups=256, stride=(2, 2), dtype=d,
                        name="conv_34")(x, train)
        x = _residual(x, 128, 6, 256, d, "conv_4", train)
        x = MFDepthWise(128, groups=512, stride=(2, 2), dtype=d,
                        name="conv_45")(x, train)
        x = _residual(x, 128, 2, 256, d, "conv_5", train)
        x = MFConvBlock(512, (1, 1), (1, 1), (0, 0), dtype=d,
                        name="conv_6_sep")(x, train)
        x = MFLinearBlock(512, (7, 7), (1, 1), (0, 0), groups=512, dtype=d,
                          name="conv_6_dw")(x, train)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.embedding_size, use_bias=False, dtype=d,
                     name="linear")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         dtype=d, name="bn")(x)
        return l2_normalize(x.astype(jnp.float32), axis=-1)


class _ResidualScope(nn.Module):
    features: int
    num_block: int
    groups: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.num_block):
            x = MFDepthWise(
                self.features, groups=self.groups, residual=True,
                stride=(1, 1), dtype=self.dtype,
            )(x, train)
        return x


def _residual(x, features, num_block, groups, dtype, name, train):
    return _ResidualScope(features, num_block, groups, dtype, name=name)(x, train)


def arcface_logits(
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    kernel: jnp.ndarray,
    s: float = 64.0,
    m: float = 0.5,
) -> jnp.ndarray:
    """ArcFace additive-angular-margin logits (mobile_facenet.py:160-201).

    embeddings: [B, D] L2-normalized. kernel: [D, C] (normalized per column
    inside). Returns scaled logits [B, C] with cos(theta + m) substituted at
    the label positions (cosface fallback outside [0, pi]).
    """
    kn = l2_normalize(kernel, axis=0)
    cos = jnp.clip(embeddings @ kn, -1.0, 1.0)
    sin = jnp.sqrt(jnp.clip(1.0 - cos**2, 0.0, 1.0))
    cos_m, sin_m = math.cos(m), math.sin(m)
    cos_theta_m = cos * cos_m - sin * sin_m
    threshold = math.cos(math.pi - m)
    keep = cos - sin_m * m
    cos_theta_m = jnp.where(cos - threshold <= 0, keep, cos_theta_m)
    onehot = jax.nn.one_hot(labels, kernel.shape[1], dtype=cos.dtype)
    return s * (onehot * cos_theta_m + (1.0 - onehot) * cos)


def make_mobile_facenet(
    embedding_size: int = 512, rng: jax.Array = None, dtype=jnp.float32
):
    """Build net + params + a jitted embed function.

    embed(variables, crops [B,112,112,3] normalized) -> [B, D] L2-normed.
    """
    net = MobileFaceNet(embedding_size=embedding_size, dtype=dtype)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = jax.jit(net.init)(rng, jnp.zeros((1, 112, 112, 3), jnp.float32))

    @jax.jit
    def embed(variables, crops):
        return net.apply(variables, crops)

    return net, variables, embed
