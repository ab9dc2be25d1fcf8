"""SSD MultiBox trainer: dense matching, variance encoding, hard-negative
mining, and a jitted end-to-end step (train/ssd.py). Reference contract:
the res10/OpenCV SSD family (modules/opencv2_dnn/model.py) whose
caffemodel was trained with exactly this loss (Liu et al.)."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from face_detection_and_recognition_tpu.train import ssd as S  # noqa: E402

pytestmark = pytest.mark.slow  # slow lane (pyproject addopts)


def _toy_priors():
    # 4 priors: two at (0.25, 0.25), one at (0.75, 0.25), one at (0.5, 0.75)
    return jnp.asarray([
        [0.25, 0.25, 0.2, 0.2],
        [0.25, 0.25, 0.4, 0.4],
        [0.75, 0.25, 0.2, 0.2],
        [0.50, 0.75, 0.3, 0.3],
    ], jnp.float32)


def test_encode_matches_exact_prior():
    priors = _toy_priors()
    gt = jnp.asarray([[[0.25, 0.25, 0.2, 0.2]]], jnp.float32)  # == prior 0
    valid = jnp.asarray([[True]])
    loc_t, pos = S.encode_ssd_targets(priors, gt, valid)
    pos = np.asarray(pos[0])
    assert pos[0], "exact-overlap prior must be positive"
    assert not pos[2] and not pos[3], "far priors must stay negative"
    # encoded offsets of a perfect match are all zero
    np.testing.assert_allclose(np.asarray(loc_t[0, 0]), 0.0, atol=1e-5)


def test_encode_bipartite_force_low_iou_gt():
    """A GT overlapping every prior below iou_pos still claims its single
    best prior (the SSD paper's bipartite step)."""
    priors = _toy_priors()
    gt = jnp.asarray([[[0.70, 0.30, 0.05, 0.05]]], jnp.float32)  # tiny box
    valid = jnp.asarray([[True]])
    _, pos = S.encode_ssd_targets(priors, gt, valid)
    pos = np.asarray(pos[0])
    assert pos.sum() == 1 and pos[2], "best prior (2) must be force-matched"


def test_encode_invalid_rows_make_no_positives():
    priors = _toy_priors()
    gt = jnp.asarray([[[0.25, 0.25, 0.2, 0.2]]], jnp.float32)
    valid = jnp.asarray([[False]])
    _, pos = S.encode_ssd_targets(priors, gt, valid)
    assert np.asarray(pos).sum() == 0


def test_multibox_loss_hard_negative_count_and_perfect_logits():
    n = 64
    rng = np.random.RandomState(0)
    pos = np.zeros((2, n), bool)
    pos[0, :2] = True          # 2 positives -> 6 mined negatives
    pos[1, 0] = True           # 1 positive  -> 3 mined negatives
    loc_t = jnp.asarray(rng.randn(2, n, 4), jnp.float32)
    locs = loc_t               # perfect localization
    # near-perfect classification: big margin on the true class
    conf = np.full((2, n, 2), 0.0, np.float32)
    conf[..., 0] = 8.0
    conf[pos, 0], conf[pos, 1] = 0.0, 8.0
    loss, m = S.ssd_multibox_loss(locs, jnp.asarray(conf),
                                  loc_t, jnp.asarray(pos))
    assert float(m["box"]) < 1e-6
    assert float(loss) < 0.01

    # one confusing negative must be mined: give it a huge face logit
    conf_bad = conf.copy()
    conf_bad[0, 50] = [0.0, 12.0]
    loss_bad, _ = S.ssd_multibox_loss(locs, jnp.asarray(conf_bad),
                                      loc_t, jnp.asarray(pos))
    assert float(loss_bad) > float(loss) + 1.0, \
        "a high-scoring false positive must enter the mined negatives"


def test_ssd_train_step_runs_and_learns():
    cfg = S.SSDTrainConfig(input_size=(128, 128), max_targets=4, lr=0.01,
                           warmup_steps=2, total_steps=60)
    state = S.create_ssd_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(S.make_ssd_train_step_ema(state))
    rng = np.random.RandomState(0)
    x = rng.randint(0, 255, (2, 128, 128, 3)).astype(np.uint8)
    t = np.zeros((2, 4, 14), np.float32)
    t[:, 0, :4] = [64, 64, 40, 48]
    v = np.zeros((2, 4), bool)
    v[:, 0] = True
    p, bs, opt = state["params"], state["batch_stats"], state["opt_state"]
    ema, n = state["ema_params"], jnp.int32(0)
    losses = []
    for _ in range(25):
        p, bs, opt, ema, n, loss, m = step(p, bs, opt, ema, n, x, t, v)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]
    assert int(n) == 25
    # EMA tracked params without exploding
    flat = jax.tree_util.tree_leaves(ema)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
