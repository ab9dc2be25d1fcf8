"""FaceNet embedder: Inception-ResNet-V1 -> 128-d, TPU-native.

Fills the reference's FaceNet slots: the keras savedmodel used by
similar-face filtering (``similar_face_filtering/filter_faces_using_reference.py:131``,
160x160 prewhitened input -> 128-d ``Bottleneck_BatchNorm`` output) and the
Triton facenet server (``facenet_trt_server/models/facenet/config.pbtxt``).
Architecture follows the standard Inception-ResNet-V1 facenet layout
(stem -> 5x block35 -> reduction-A -> 10x block17 -> reduction-B ->
6x block8 -> pool -> bottleneck 128 + BN -> L2 norm).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Dtype, l2_normalize


class CB(nn.Module):
    """conv + BN(scale-free, eps 1e-3) + relu — facenet's conv block."""

    features: int
    kernel: tuple = (3, 3)
    stride: int = 1
    padding: str = "SAME"
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=(self.stride,) * 2,
                    padding=self.padding, use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         use_scale=False, dtype=self.dtype)(x)
        return nn.relu(x) if self.act else x


class Block35(nn.Module):  # Inception-ResNet-A
    scale: float = 0.17
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = CB(32, (1, 1), dtype=d)(x, train)
        b1 = CB(32, (1, 1), dtype=d)(x, train)
        b1 = CB(32, (3, 3), dtype=d)(b1, train)
        b2 = CB(32, (1, 1), dtype=d)(x, train)
        b2 = CB(32, (3, 3), dtype=d)(b2, train)
        b2 = CB(32, (3, 3), dtype=d)(b2, train)
        up = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=d)(
            jnp.concatenate([b0, b1, b2], -1)
        )
        return nn.relu(x + self.scale * up)


class Block17(nn.Module):  # Inception-ResNet-B
    scale: float = 0.10
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = CB(128, (1, 1), dtype=d)(x, train)
        b1 = CB(128, (1, 1), dtype=d)(x, train)
        b1 = CB(128, (1, 7), dtype=d)(b1, train)
        b1 = CB(128, (7, 1), dtype=d)(b1, train)
        up = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=d)(
            jnp.concatenate([b0, b1], -1)
        )
        return nn.relu(x + self.scale * up)


class Block8(nn.Module):  # Inception-ResNet-C
    scale: float = 0.20
    apply_relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b0 = CB(192, (1, 1), dtype=d)(x, train)
        b1 = CB(192, (1, 1), dtype=d)(x, train)
        b1 = CB(192, (1, 3), dtype=d)(b1, train)
        b1 = CB(192, (3, 1), dtype=d)(b1, train)
        up = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=d)(
            jnp.concatenate([b0, b1], -1)
        )
        y = x + self.scale * up
        return nn.relu(y) if self.apply_relu else y


class InceptionResNetV1(nn.Module):
    """160x160 prewhitened RGB -> ``embedding_size`` L2-normed embedding."""

    embedding_size: int = 128
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        # stem
        x = CB(32, (3, 3), 2, "VALID", dtype=d)(x, train)
        x = CB(32, (3, 3), 1, "VALID", dtype=d)(x, train)
        x = CB(64, (3, 3), 1, "SAME", dtype=d)(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = CB(80, (1, 1), 1, "VALID", dtype=d)(x, train)
        x = CB(192, (3, 3), 1, "VALID", dtype=d)(x, train)
        x = CB(256, (3, 3), 2, "VALID", dtype=d)(x, train)
        for _ in range(5):
            x = Block35(dtype=d)(x, train)
        # reduction-A -> 896
        r0 = CB(384, (3, 3), 2, "VALID", dtype=d)(x, train)
        r1 = CB(192, (1, 1), dtype=d)(x, train)
        r1 = CB(192, (3, 3), dtype=d)(r1, train)
        r1 = CB(256, (3, 3), 2, "VALID", dtype=d)(r1, train)
        r2 = nn.max_pool(x, (3, 3), (2, 2))
        x = jnp.concatenate([r0, r1, r2], -1)
        for _ in range(10):
            x = Block17(dtype=d)(x, train)
        # reduction-B -> 1792
        b0 = CB(256, (1, 1), dtype=d)(x, train)
        b0 = CB(384, (3, 3), 2, "VALID", dtype=d)(b0, train)
        b1 = CB(256, (1, 1), dtype=d)(x, train)
        b1 = CB(256, (3, 3), 2, "VALID", dtype=d)(b1, train)
        b2 = CB(256, (1, 1), dtype=d)(x, train)
        b2 = CB(256, (3, 3), dtype=d)(b2, train)
        b2 = CB(256, (3, 3), 2, "VALID", dtype=d)(b2, train)
        b3 = nn.max_pool(x, (3, 3), (2, 2))
        x = jnp.concatenate([b0, b1, b2, b3], -1)
        for _ in range(5):
            x = Block8(dtype=d)(x, train)
        x = Block8(scale=1.0, apply_relu=False, dtype=d)(x, train)
        # head
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.embedding_size, use_bias=False, dtype=d,
                     name="bottleneck")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         use_scale=False, dtype=d, name="bottleneck_bn")(x)
        return l2_normalize(x.astype(jnp.float32), axis=-1)


def make_facenet(embedding_size: int = 128, rng: jax.Array = None,
                 dtype=jnp.float32):
    """Build net + params + jitted embed(variables, crops [B,160,160,3]
    prewhitened RGB) -> [B, D]."""
    net = InceptionResNetV1(embedding_size=embedding_size, dtype=dtype)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = jax.jit(net.init)(rng, jnp.zeros((1, 160, 160, 3), jnp.float32))

    @jax.jit
    def embed(variables, crops):
        return net.apply(variables, crops)

    return net, variables, embed
