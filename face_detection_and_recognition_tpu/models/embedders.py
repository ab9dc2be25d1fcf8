"""Embedder registry: all of the reference's feature-extractor slots.

The reference's ``Net`` loader supports five feat-net types with feature
sizes 512/256/512/128/6 (``extract_faces_from_dataset.py:68-119``):
mobile_facenet (512-d), OpenVINO face-reid MobileNetV2 (256-d), OpenVINO
facenet (512-d), keras FaceNet (128-d), and a demographics net. Here each is
a registry entry building a jitted ``embed(variables, crops)``.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Dtype, l2_normalize


@dataclasses.dataclass(frozen=True)
class EmbedderSpec:
    name: str
    dim: int
    input_size: Tuple[int, int]  # (width, height)
    norm: str                    # "half" = (x-127.5)/127.5 | "prewhiten"
    rgb: bool
    build: Callable


class MobileNetV2Embedder(nn.Module):
    """MobileNetV2 trunk -> global pool -> D-dim embedding (the OpenVINO
    face-reidentification-retail class of model, 256-d)."""

    embedding_size: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .ssd import _MobileNetV2Backbone

        feats = _MobileNetV2Backbone(dtype=self.dtype)(x, train)
        x = jnp.mean(feats[-1], axis=(1, 2))
        x = nn.Dense(self.embedding_size, dtype=self.dtype)(x)
        return l2_normalize(x.astype(jnp.float32), axis=-1)


def preprocess_crops(spec: "EmbedderSpec", crops_bgr):
    """Shared crop normalization for every embedder call site (engine,
    pipelines, serving, CLIs): channel order + the spec's norm recipe.
    crops_bgr: [N, H, W, 3] float BGR already at spec.input_size."""
    import jax.numpy as jnp

    x = jnp.asarray(crops_bgr, jnp.float32)
    if spec.rgb:
        x = x[..., ::-1]
    if spec.norm == "half":
        x = (x - 127.5) / 127.5
    elif spec.norm == "prewhiten":
        from ..ops.geometry import standardize_image

        x = standardize_image(x)
    elif spec.norm == "caffe_mean":
        from ..ops.preprocess import AGE_GENDER

        x = x - jnp.asarray(AGE_GENDER.mean, jnp.float32)
    else:
        raise ValueError(f"unknown embedder norm '{spec.norm}'")
    return x


_EMBEDDERS = {}


def register_embedder(spec: EmbedderSpec):
    _EMBEDDERS[spec.name] = spec
    return spec


def get_embedder(name: str) -> EmbedderSpec:
    if name not in _EMBEDDERS:
        raise KeyError(f"unknown embedder '{name}'; have {sorted(_EMBEDDERS)}")
    return _EMBEDDERS[name]


def available_embedders():
    return sorted(_EMBEDDERS)


def _build_mobile_facenet(rng=None, dtype=jnp.float32):
    from .mobile_facenet import make_mobile_facenet

    return make_mobile_facenet(rng=rng, dtype=dtype)


def _build_facenet(rng=None, dtype=jnp.float32):
    from .facenet import make_facenet

    return make_facenet(rng=rng, dtype=dtype)


def _build_facenet512(rng=None, dtype=jnp.float32):
    from .facenet import make_facenet

    return make_facenet(embedding_size=512, rng=rng, dtype=dtype)


def _build_demographics(rng=None, dtype=jnp.float32):
    """Age+gender probabilities as a 10-d feature vector — the reference's
    CAFFE_AGE_GENDER feat-net slot (extract_faces_from_dataset.py:112-116,
    FACE_FEATURE_SIZE = 10 = 8 age buckets + 2 genders)."""
    import jax

    from .age_gender import make_age_gender

    _, (age_vars, gender_vars), classify = make_age_gender(rng=rng, dtype=dtype)
    variables = {"age": age_vars, "gender": gender_vars}

    @jax.jit
    def embed(variables, crops):
        a, g = classify(variables["age"], variables["gender"], crops)
        return jnp.concatenate([a, g], axis=-1)

    return None, variables, embed


def _build_reid(rng=None, dtype=jnp.float32):
    net = MobileNetV2Embedder(dtype=dtype)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = jax.jit(net.init)(rng, jnp.zeros((1, 128, 128, 3), jnp.float32))

    @jax.jit
    def embed(variables, crops):
        return net.apply(variables, crops)

    return net, variables, embed


register_embedder(EmbedderSpec("mobile_facenet", 512, (112, 112), "half",
                               rgb=False, build=_build_mobile_facenet))
register_embedder(EmbedderSpec("facenet", 128, (160, 160), "prewhiten",
                               rgb=True, build=_build_facenet))
register_embedder(EmbedderSpec("facenet-512", 512, (160, 160), "prewhiten",
                               rgb=True, build=_build_facenet512))
register_embedder(EmbedderSpec("reid-mnv2", 256, (128, 128), "half",
                               rgb=False, build=_build_reid))
register_embedder(EmbedderSpec("demographics", 10, (227, 227), "caffe_mean",
                               rgb=False, build=_build_demographics))
