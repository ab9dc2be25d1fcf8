"""BlazeFace trainer (train/blazeface.py): encoding is the exact inverse of
the model's decode, matching rules, and a toy optimization run."""
import pytest

import numpy as np
import jax
import jax.numpy as jnp

from face_detection_and_recognition_tpu.models.blazeface import (
    decode_boxes, generate_anchors)
from face_detection_and_recognition_tpu.train import blazeface as B

pytestmark = pytest.mark.slow  # slow lane (pyproject addopts)


def test_encode_is_inverse_of_decode():
    """Feeding the encoded targets through decode_boxes recovers the GT
    boxes at every positive anchor slot."""
    anchors = jnp.asarray(generate_anchors())
    gt = jnp.asarray([[[0.5, 0.45, 0.3, 0.35], [0.15, 0.2, 0.1, 0.12]]],
                     jnp.float32)
    valid = jnp.asarray([[True, True]])
    box_t, pos = B.encode_blazeface_targets(anchors, gt, valid, scale=128.0)
    assert bool(pos.any())
    raw = jnp.zeros((1, anchors.shape[0], 16), jnp.float32)
    raw = raw.at[..., :4].set(box_t)
    dec = decode_boxes(raw, anchors, 128.0)  # [1,N,16] [ymin,xmin,ymax,xmax]
    pos_np = np.asarray(pos[0])
    corners = np.asarray(dec[0])[pos_np][:, :4]
    dec_np = np.stack([
        (corners[:, 1] + corners[:, 3]) / 2,   # cx
        (corners[:, 0] + corners[:, 2]) / 2,   # cy
        corners[:, 3] - corners[:, 1],         # w
        corners[:, 2] - corners[:, 0],         # h
    ], axis=1)
    gt_np = np.asarray(gt[0])
    # every positive anchor decodes to ONE of the GT boxes exactly
    d = np.abs(dec_np[:, None] - gt_np[None]).max(-1)      # [P, T]
    assert (d.min(1) < 1e-5).all()


def test_every_valid_gt_claims_an_anchor():
    anchors = jnp.asarray(generate_anchors())
    # a face too small for any center-inside match still gets its nearest
    gt = jnp.asarray([[[0.503, 0.502, 0.004, 0.004]]], jnp.float32)
    valid = jnp.asarray([[True]])
    box_t, pos = B.encode_blazeface_targets(anchors, gt, valid, scale=128.0)
    assert int(pos.sum()) >= 1
    # invalid rows claim nothing
    _, pos0 = B.encode_blazeface_targets(anchors, gt,
                                         jnp.asarray([[False]]), 128.0)
    assert int(pos0.sum()) == 0


def test_smallest_gt_wins_nested_anchors():
    anchors = jnp.asarray(generate_anchors())
    big = [0.5, 0.5, 0.8, 0.8]
    small = [0.5, 0.5, 0.1, 0.1]
    gt = jnp.asarray([[big, small]], jnp.float32)
    valid = jnp.asarray([[True, True]])
    box_t, pos = B.encode_blazeface_targets(anchors, gt, valid, scale=128.0)
    # the anchor nearest the shared center must regress the SMALL face
    ac = np.asarray(anchors[:, :2])
    near = np.argmin(((ac - 0.5) ** 2).sum(1))
    t = np.asarray(box_t[0, near])
    np.testing.assert_allclose(t[2:] / 128.0, [0.1, 0.1], atol=1e-6)


def test_blaze_loss_optimizes_toy():
    cfg = B.BlazeTrainConfig(max_targets=2, lr=0.002, total_steps=0,
                             ema_decay=0.99, ema_tau=10.0)
    state = B.create_blaze_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(B.make_blaze_train_step_ema(state))
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (2, 128, 128, 3)).astype(np.uint8)
    t = np.full((2, 2, 14), -1.0, np.float32)
    v = np.zeros((2, 2), bool)
    t[:, 0, :4] = [64, 60, 40, 48]
    v[:, 0] = True
    p, bs, opt = state["params"], state["batch_stats"], state["opt_state"]
    ema, n = state["ema_params"], jnp.int32(0)
    losses = []
    for _ in range(30):
        p, bs, opt, ema, n, loss, metrics = step(
            p, bs, opt, ema, n, jnp.asarray(imgs), jnp.asarray(t),
            jnp.asarray(v))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]
    assert int(n) == 30
