"""Age / gender classification heads (Levi-Hassner CaffeNet class).

The reference runs two caffemodels through OpenCV DNN at 227x227 with mean
(78.43, 87.77, 114.90) BGR (``modules/opencv2_dnn/model.py:40-103``): an
8-bucket age net and a 2-way gender net, applied to padded face crops from
the SSD detector (``model.py:106-159``). Labels:
  age:    ['(0-2)','(4-6)','(8-12)','(15-20)','(25-32)','(38-43)','(48-53)','(60-100)']
  gender: ['Male','Female']

TPU-first: both heads share one CaffeNet-style trunk class and run BATCHED
over all face crops of a frame in one program — the reference's per-face
python loop (``model.py:148-158``) becomes a single [F, 227, 227, 3] pass.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Dtype

AGE_BUCKETS = (
    "(0-2)", "(4-6)", "(8-12)", "(15-20)", "(25-32)", "(38-43)", "(48-53)", "(60-100)"
)
GENDERS = ("Male", "Female")


def _ceil_pool(x, k: int = 3, s: int = 2):
    """Caffe ceil-mode max pool (out = ceil((H-k)/s)+1): edge-pad so the last
    partial window is kept; flax max_pool pads with -inf so the extra pixels
    never win. Required for the real caffemodel geometry (227 -> 56 -> 28 ->
    14 -> 7, fc6 input 384*7*7 = 18816)."""
    import math

    h, w = x.shape[1:3]
    ph = max(0, (math.ceil((h - k) / s) * s + k) - h)
    pw = max(0, (math.ceil((w - k) / s) * s + k) - w)
    return nn.max_pool(x, (k, k), (s, s), padding=[(0, ph), (0, pw)])


class CaffeNetHead(nn.Module):
    """3-conv + 2-fc CaffeNet (Levi & Hassner 2015 age/gender architecture):
    conv 96@7x7/4 -> pool/LRN -> conv 256@5x5 -> pool/LRN -> conv 384@3x3
    -> pool -> fc512 -> fc512 -> logits. Pooling is caffe ceil-mode so
    shipped age_net/gender_net caffemodels import unchanged
    (``modules/opencv2_dnn/model.py:49-83``)."""

    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = nn.relu(nn.Conv(96, (7, 7), strides=(4, 4), padding="VALID", dtype=d)(x))
        x = _ceil_pool(x)
        x = _lrn(x)
        x = nn.relu(nn.Conv(256, (5, 5), padding=[(2, 2), (2, 2)], dtype=d)(x))
        x = _ceil_pool(x)
        x = _lrn(x)
        x = nn.relu(nn.Conv(384, (3, 3), padding=[(1, 1), (1, 1)], dtype=d)(x))
        x = _ceil_pool(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(512, dtype=d)(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(512, dtype=d)(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=d)(x).astype(jnp.float32)


def _lrn(x: jnp.ndarray, n: int = 5, alpha: float = 1e-4, beta: float = 0.75,
         k: float = 1.0) -> jnp.ndarray:
    """Local response normalization across channels (Caffe LRN layer).

    The n-wide channel window sums run as ONE reduce_window pass — the
    stack-of-shifted-copies formulation materialized n full tensors."""
    sq = x * x
    half = n // 2
    # init MUST be the python scalar 0.0: an array init stops JAX from
    # recognizing the add-monoid, making the op non-differentiable (the
    # age/gender heads train through this in train/golden_ag.py)
    ssum = jax.lax.reduce_window(
        sq, 0.0, jax.lax.add,
        (1, 1, 1, n), (1, 1, 1, 1),
        padding=((0, 0), (0, 0), (0, 0), (half, half)),
    )
    denom = (k + alpha / n * ssum) ** beta
    return x / denom


def make_age_gender(rng: jax.Array = None, dtype=jnp.float32):
    """Build age + gender nets, params, and one jitted batched classify fn.

    classify(age_vars, gender_vars, crops [F,227,227,3] mean-subtracted BGR)
    -> (age_probs [F,8], gender_probs [F,2]).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    r1, r2 = jax.random.split(rng)
    age_net = CaffeNetHead(num_classes=len(AGE_BUCKETS), dtype=dtype)
    gender_net = CaffeNetHead(num_classes=len(GENDERS), dtype=dtype)
    x0 = jnp.zeros((1, 227, 227, 3), jnp.float32)
    age_vars = jax.jit(age_net.init)(r1, x0)
    gender_vars = jax.jit(gender_net.init)(r2, x0)

    @jax.jit
    def classify(age_vars, gender_vars, crops):
        a = jax.nn.softmax(age_net.apply(age_vars, crops), axis=-1)
        g = jax.nn.softmax(gender_net.apply(gender_vars, crops), axis=-1)
        return a, g

    return (age_net, gender_net), (age_vars, gender_vars), classify


def labels_from_probs(age_probs, gender_probs) -> Tuple[str, ...]:
    """Format 'Gender:conf,(age):conf' labels exactly like the reference
    (``opencv2_dnn/model.py:153-158``)."""
    import numpy as np

    out = []
    for a, g in zip(np.asarray(age_probs), np.asarray(gender_probs)):
        gender = GENDERS[int(g.argmax())]
        age = AGE_BUCKETS[int(a.argmax())]
        out.append(f"{gender}:{g.max():.2f},{age}:{a.max():.2f}")
    return tuple(out)
