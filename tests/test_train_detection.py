"""Detection training: loss properties and one train step on tiny shapes."""
import jax
import numpy as np
import pytest

from face_detection_and_recognition_tpu.train import detection as D

pytestmark = pytest.mark.slow  # slow lane (pyproject addopts)


def test_ciou_identity_and_disjoint():
    a = np.array([[50.0, 50.0, 20.0, 20.0]], np.float32)
    assert float(D.ciou(a, a)[0]) == pytest.approx(1.0, abs=1e-5)
    b = np.array([[200.0, 200.0, 20.0, 20.0]], np.float32)
    assert float(D.ciou(a, b)[0]) < 0.0  # disjoint: iou 0 minus center penalty


def test_wing_loss_properties():
    p = np.zeros((4,), np.float32)
    t = np.zeros((4,), np.float32)
    m = np.ones((4,), np.float32)
    assert float(D.wing_loss(p, t, m)) == pytest.approx(0.0, abs=1e-6)
    # small errors follow the log branch, large the linear branch
    small = float(D.wing_loss(p + 1.0, t, m))
    large = float(D.wing_loss(p + 100.0, t, m))
    assert 0 < small < large
    # mask zeroes contributions
    assert float(D.wing_loss(p + 100.0, t, np.zeros(4, np.float32))) == 0.0


def test_train_step_decreases_loss_and_updates():
    cfg = D.DetTrainConfig(arch="yolov5n", input_size=(128, 128),
                           max_targets=4, lr=0.05)
    state = D.create_det_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(D.make_det_train_step(state))

    rng = np.random.RandomState(0)
    images = rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32)
    # two GT faces in image 0, one in image 1
    targets = np.zeros((2, 4, 14), np.float32)
    targets[0, 0, :4] = [40, 40, 24, 30]
    targets[0, 1, :4] = [90, 80, 16, 20]
    targets[1, 0, :4] = [64, 64, 40, 50]
    targets[..., 4:] = 50.0  # dummy visible landmarks
    valid = np.zeros((2, 4), bool)
    valid[0, :2] = True
    valid[1, 0] = True

    p, bs, opt = state["params"], state["batch_stats"], state["opt_state"]
    losses = []
    for _ in range(5):
        p, bs, opt, loss, metrics = step(p, bs, opt, images, targets, valid)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    for k in ("box", "obj", "lmk", "cls"):
        assert np.isfinite(float(metrics[k]))


def test_build_targets_places_positives():
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.models.yolov5_face import ARCHS

    spec = ARCHS["yolov5n"]
    targets = np.zeros((1, 2, 14), np.float32)
    targets[0, 0, :4] = [40, 40, 24, 30]  # stride-8 cell (5, 5)
    valid = np.array([[True, False]])
    tpl = D.build_targets(jnp.asarray(targets), jnp.asarray(valid),
                          spec["anchors"], spec["strides"],
                          [(16, 16), (8, 8), (4, 4)], 4.0)
    # the P3 level must have at least one positive at cell (5,5), plus the
    # yolov5 lateral neighbors: frac(5.0)=0 < 0.5 -> (gi-1, gj) and (gi, gj-1)
    tobj = np.asarray(tpl[0]["tobj"])
    assert tobj[0, :, 5, 5].max() == 1.0
    assert tobj[0, :, 5, 4].max() == 1.0  # x neighbor (gj, gi-1)
    assert tobj[0, :, 4, 5].max() == 1.0  # y neighbor (gj-1, gi)
    cells = (tobj[0, :, 5, 5].sum() + tobj[0, :, 5, 4].sum()
             + tobj[0, :, 4, 5].sum())
    assert tobj.sum() == cells  # nowhere else


def test_build_targets_neighbor_box_offsets_in_decode_range():
    """Neighbor-cell xy targets sit in the head's (-0.5, 1.5) decode range
    relative to THEIR cell, and w/h are unchanged."""
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.models.yolov5_face import ARCHS

    spec = ARCHS["yolov5n"]
    targets = np.zeros((1, 1, 14), np.float32)
    targets[0, 0, :4] = [46.4, 41.6, 24, 30]  # grid (5.8, 5.2): neighbors
    valid = np.array([[True]])                # x -> gi+1, y -> gj-1
    tpl = D.build_targets(jnp.asarray(targets), jnp.asarray(valid),
                          spec["anchors"], spec["strides"],
                          [(16, 16), (8, 8), (4, 4)], 4.0)
    tobj = np.asarray(tpl[0]["tobj"])
    tbox = np.asarray(tpl[0]["tbox"])
    a = int(tobj[0, :, 5, 5].argmax())
    assert tobj[0, a, 5, 5] == 1.0 and tobj[0, a, 5, 6] == 1.0 \
        and tobj[0, a, 4, 5] == 1.0
    np.testing.assert_allclose(tbox[0, a, 5, 5, :2], [0.8, 0.2], atol=1e-5)
    np.testing.assert_allclose(tbox[0, a, 5, 6, :2], [-0.2, 0.2], atol=1e-5)
    np.testing.assert_allclose(tbox[0, a, 4, 5, :2], [0.8, 1.2], atol=1e-5)
    for cell in ((5, 5), (5, 6), (4, 5)):
        np.testing.assert_allclose(tbox[0, a, cell[0], cell[1], 2:],
                                   [3.0, 3.75], atol=1e-5)


def test_build_targets_unmatched_row_does_not_clobber():
    """A padded (invalid) row sharing a cell with a real target must not
    zero the real target's box — unmatched writes are dropped, not written."""
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.models.yolov5_face import ARCHS

    spec = ARCHS["yolov5n"]
    targets = np.zeros((1, 2, 14), np.float32)
    targets[0, 0, :4] = [12, 12, 24, 30]   # stride-8 cell (1, 1)
    targets[0, 1, :4] = [12, 12, 500, 500]  # same cell, fails anchor match
    valid = np.array([[True, True]])
    tpl = D.build_targets(jnp.asarray(targets), jnp.asarray(valid),
                          spec["anchors"], spec["strides"],
                          [(16, 16), (8, 8), (4, 4)], 4.0)
    tobj = np.asarray(tpl[0]["tobj"])
    tbox = np.asarray(tpl[0]["tbox"])
    a = int(tobj[0, :, 1, 1].argmax())
    assert tobj[0, a, 1, 1] == 1.0
    np.testing.assert_allclose(tbox[0, a, 1, 1, 2:], [3.0, 3.75], atol=1e-5)

    # padded rows at origin must not mark cell (0,0) positive either
    targets2 = np.zeros((1, 2, 14), np.float32)
    targets2[0, 0, :4] = [40, 40, 24, 30]
    tpl2 = D.build_targets(jnp.asarray(targets2),
                           jnp.asarray(np.array([[True, False]])),
                           spec["anchors"], spec["strides"],
                           [(16, 16), (8, 8), (4, 4)], 4.0)
    assert np.asarray(tpl2[0]["tobj"])[0, :, 0, 0].max() == 0.0


def test_multiclass_cls_loss_has_positive_signal():
    """nc>1: class-0 one-hot targets at positives (no all-zeros collapse)."""
    import jax.numpy as jnp

    cfg = D.DetTrainConfig(arch="yolov5n", nc=2, input_size=(64, 64),
                           max_targets=2)
    maps = [np.zeros((1, 3, 64 // s, 64 // s, 17), np.float32)
            for s in (8, 16, 32)]
    targets = np.zeros((1, 2, 14), np.float32)
    targets[0, 0, :4] = [32, 32, 16, 20]
    valid = np.array([[True, False]])
    from face_detection_and_recognition_tpu.models.yolov5_face import ARCHS

    spec = ARCHS["yolov5n"]
    tpl = D.build_targets(jnp.asarray(targets), jnp.asarray(valid),
                          spec["anchors"], spec["strides"],
                          [(8, 8), (4, 4), (2, 2)], 4.0)
    _, metrics = D.detection_loss([jnp.asarray(m) for m in maps], tpl, cfg)
    # zero logits at a positive cell -> BCE(0.5, onehot) > 0 with gradient
    assert float(metrics["cls"]) > 0.1


def test_sharded_det_train_step_matches_single_device(rng):
    """DP detector step over the virtual 8-device mesh: finite loss, params
    update, and loss equals the unsharded step on the same batch."""
    import jax

    from face_detection_and_recognition_tpu.parallel.mesh import make_mesh
    from face_detection_and_recognition_tpu.parallel.sharding import (
        batch_sharding,
    )
    from face_detection_and_recognition_tpu.train.detection import (
        DetTrainConfig, create_det_train_state, make_det_train_step,
        sharded_det_train_step,
    )

    cfg = DetTrainConfig(arch="yolov5n-0.5", input_size=(32, 32),
                         max_targets=2)
    state = create_det_train_state(cfg, jax.random.PRNGKey(0))
    B = 8
    images = rng.uniform(0, 1, (B, 32, 32, 3)).astype(np.float32)
    targets = np.zeros((B, 2, 14), np.float32)
    targets[:, 0, :4] = [0.5, 0.5, 0.25, 0.25]  # one centered face per image
    targets[:, 0, 4:] = 0.5
    tvalid = np.zeros((B, 2), bool)
    tvalid[:, 0] = True

    base_step = make_det_train_step(state)
    _, _, _, base_loss, _ = base_step(state["params"], state["batch_stats"],
                                      state["opt_state"], images, targets,
                                      tvalid)

    mesh = make_mesh(("data",), (8,))
    step, (params, stats, opt) = sharded_det_train_step(state, mesh)
    sh_images = jax.device_put(images, batch_sharding(mesh, 4))
    sh_targets = jax.device_put(targets, batch_sharding(mesh, 3))
    sh_tvalid = jax.device_put(tvalid, batch_sharding(mesh, 2))
    new_params, new_stats, new_opt, loss, metrics = step(
        params, stats, opt, sh_images, sh_targets, sh_tvalid)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(loss), float(base_loss),
                               rtol=1e-4, atol=1e-5)
    k0 = jax.tree_util.tree_leaves(state["params"])[0]
    k1 = jax.tree_util.tree_leaves(new_params)[0]
    assert not np.allclose(np.asarray(k0), np.asarray(k1))


def test_weighted_bce_matches_optax_at_pw1():
    import jax.numpy as jnp
    import optax

    logits = jnp.asarray([-2.0, -0.5, 0.0, 1.5, 3.0])
    labels = jnp.asarray([0.0, 1.0, 0.5, 1.0, 0.0])
    ours = D.weighted_bce_logits(logits, labels, 1.0)
    ref = optax.sigmoid_binary_cross_entropy(logits, labels)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-6)
    # pos_weight=2 doubles only the positive-label term
    pw = D.weighted_bce_logits(logits, labels, 2.0)
    pos_term = -labels * jax.nn.log_sigmoid(logits)
    np.testing.assert_allclose(np.asarray(pw - ours), np.asarray(pos_term),
                               atol=1e-6)


def test_level_balance_weights_obj_loss():
    """P3 obj loss weighted 4x: raising P3 logits moves total 4x more than
    the same raise on P5 (loss.py balance=[4.0,1.0,0.4])."""
    import jax.numpy as jnp

    cfg = D.DetTrainConfig(arch="yolov5n", nc=1, input_size=(64, 64),
                           max_targets=2)
    from face_detection_and_recognition_tpu.models.yolov5_face import ARCHS

    spec = ARCHS["yolov5n"]
    grids = [(8, 8), (4, 4), (2, 2)]
    targets = jnp.zeros((1, 2, 14))
    valid = jnp.zeros((1, 2), bool)
    tpl = D.build_targets(targets, valid, spec["anchors"], spec["strides"],
                          grids, 4.0)
    base_maps = [jnp.zeros((1, 3, gh, gw, 16)) for gh, gw in grids]

    def total_with_bump(level):
        maps = [m.at[..., 4].add(1.0) if i == level else m
                for i, m in enumerate(base_maps)]
        t, _ = D.detection_loss(maps, tpl, cfg)
        return float(t)

    t0, _ = D.detection_loss(base_maps, tpl, cfg)
    d_p3 = total_with_bump(0) - float(t0)
    d_p5 = total_with_bump(2) - float(t0)
    assert d_p3 == pytest.approx(10.0 * d_p5, rel=1e-4)  # 4.0 / 0.4


def test_lr_schedule_warmup_and_cosine():
    cfg = D.DetTrainConfig(lr=0.01, lrf=0.2, warmup_steps=10, total_steps=100)
    sched = D.lr_schedule(cfg)
    assert float(sched(0)) == pytest.approx(0.0, abs=1e-8)
    assert float(sched(5)) == pytest.approx(0.005, rel=1e-3)  # linear ramp
    assert float(sched(10)) == pytest.approx(0.01, rel=1e-3)  # peak
    assert float(sched(100)) == pytest.approx(0.002, rel=1e-3)  # lr*lrf
    # monotone decay after warmup
    vals = [float(sched(s)) for s in range(10, 101, 10)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    # disabled schedule stays a constant float
    assert D.lr_schedule(D.DetTrainConfig(lr=0.03)) == 0.03


def test_ema_step_tracks_params():
    """Fused EMA step: early in training (ramped decay ~0) the EMA shadow
    follows new params almost exactly; the counter increments."""
    cfg = D.DetTrainConfig(arch="yolov5n-0.5", input_size=(32, 32),
                           max_targets=2, lr=0.05)
    state = D.create_det_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(D.make_det_train_step_ema(state))
    rngn = np.random.RandomState(0)
    images = rngn.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    targets = np.zeros((1, 2, 14), np.float32)
    targets[0, 0, :4] = [16, 16, 10, 12]
    targets[..., 4:] = -1.0
    valid = np.array([[True, False]])
    p, bs, opt = state["params"], state["batch_stats"], state["opt_state"]
    ema, n = state["ema_params"], np.int32(0)
    p, bs, opt, ema, n, loss, _ = step(p, bs, opt, ema, n, images, targets,
                                       valid)
    assert int(n) == 1 and np.isfinite(float(loss))
    pl = jax.tree_util.tree_leaves(p)
    el = jax.tree_util.tree_leaves(ema)
    # d = 0.9999*(1-exp(-1/2000)) ~ 5e-4 -> ema ~= new params
    for a, b in zip(pl, el):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2)
    # after many virtual updates the decay saturates toward ema_decay
    d_late = 0.9999 * (1.0 - np.exp(-10000 / 2000.0))
    assert d_late > 0.99


def test_official_head_train_step_runs_and_pours_into_engine():
    """with_landmarks=False trains the official (multiclass, landmark-less)
    head: no = nc+5, class logits at [..., 5:], no wing-loss term — and the
    trained tree pours directly into the engine's yolov5*-official net
    (reference onnx_utils.py:193-288)."""
    import jax
    import jax.numpy as jnp

    cfg = D.DetTrainConfig(arch="yolov5n", nc=80, with_landmarks=False,
                           input_size=(64, 64), max_targets=2, lr=0.01)
    st = D.create_det_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(D.make_det_train_step(st))
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    tg = np.full((2, 2, 14), -1.0, np.float32)
    tg[:, 0, :4] = [32, 30, 20, 22]
    tv = np.zeros((2, 2), bool)
    tv[:, 0] = True
    params, stats, opt, loss, metrics = step(
        st["params"], st["batch_stats"], st["opt_state"],
        jnp.asarray(imgs), jnp.asarray(tg), jnp.asarray(tv))
    assert np.isfinite(float(loss))
    assert float(metrics["lmk"]) == 0.0  # no landmark term on this head
    assert float(metrics["cls"]) > 0.0   # 80-class BCE is live

    # the trainer must target the anchor set the ENGINE decodes with:
    # make_yolov5_official uses OFFICIAL_ANCHORS, not the face set
    from face_detection_and_recognition_tpu.models.yolov5_face import (
        ARCHS, OFFICIAL_ANCHORS)

    assert D.anchors_for(cfg) == OFFICIAL_ANCHORS
    assert D.anchors_for(cfg) != ARCHS["yolov5n"]["anchors"]

    # single-class official head still trains its class column (the
    # official decode multiplies conf = obj * cls, so an untrained column
    # would halve every confidence)
    import jax.numpy as jnp2

    cfg1 = D.DetTrainConfig(arch="yolov5n", nc=1, with_landmarks=False,
                            input_size=(64, 64), max_targets=2)
    maps1 = [np.zeros((1, 3, 64 // s, 64 // s, 6), np.float32)
             for s in (8, 16, 32)]
    tpl1 = D.build_targets(jnp2.asarray(tg), jnp2.asarray(tv),
                           D.anchors_for(cfg1), (8, 16, 32),
                           [(8, 8), (4, 4), (2, 2)], 4.0)
    _, m1 = D.detection_loss([jnp2.asarray(m) for m in maps1], tpl1, cfg1)
    assert float(m1["cls"]) > 0.0

    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)

    eng = FaceEngine(EngineConfig(
        detector="yolov5n-official", det_thres=0.5,
        detector_overrides={"input_size": (64, 64)}))
    # structure must match exactly for the pour to be meaningful (thaw:
    # the engine property returns a FrozenVars view whose treedef node
    # type differs from plain dicts)
    from face_detection_and_recognition_tpu.utils.frozen import thaw

    a = jax.tree_util.tree_structure(thaw(eng.variables["params"]))
    b = jax.tree_util.tree_structure(params)
    assert a == b
    eng.variables = {"params": jax.device_get(params),
                     "batch_stats": jax.device_get(stats)}
    post = eng.detect_image(rng.randint(0, 255, (64, 64, 3)).astype(np.uint8))
    assert np.asarray(post.boxes).shape[1] == 4


def test_evaluate_golden_margin_gate(tmp_path):
    """The golden gate must hold at det_thres±margin, not just the center:
    a 4th duplicate box at conf 0.48 passes the center threshold 0.5 but
    must fail ok with the default margin (it crosses at 0.45), and a weak
    3rd face at 0.52 must fail the upper bar at 0.55. Pins the
    cross-platform hardening that caught the first official-head
    checkpoint (4th box at 0.535 only under highest matmul precision)."""
    import cv2

    from face_detection_and_recognition_tpu.train.golden import (
        GOLDEN_BOXES_3, evaluate_golden)

    pos = str(tmp_path / "pos.jpg")
    neg = str(tmp_path / "neg.jpg")
    cv2.imwrite(pos, np.full((540, 720, 3), 255, np.uint8))
    cv2.imwrite(neg, np.zeros((540, 720, 3), np.uint8))

    class StubEngine:
        """detect_image returns the golden boxes whose conf clears the
        threshold — plus a near-duplicate 4th at configurable conf."""

        def __init__(self, confs):
            dup = GOLDEN_BOXES_3[0] + np.float32([4, 4, 4, 4])
            self.boxes = np.concatenate([GOLDEN_BOXES_3, dup[None]], 0)
            self.confs = np.asarray(confs, np.float32)

        def detect_image(self, img, det_thres):
            keep = (self.confs >= det_thres) if img.max() > 0 else \
                np.zeros_like(self.confs, bool)

            class _Post:
                boxes = self.boxes[keep]

            return _Post()

    # 4th box at 0.48: center 0.5 sees 3 boxes, lower bar 0.45 sees 4
    weak_dup = StubEngine([0.7, 0.6, 0.58, 0.48])
    r = evaluate_golden(weak_dup, pos_img=pos, neg_img=neg)
    assert r["n_pos"] == 3 and not r["ok"]
    assert evaluate_golden(weak_dup, pos_img=pos, neg_img=neg,
                           margin=0.0)["ok"]

    # 3rd face at 0.52: clears the center but not the 0.55 upper bar
    weak_face = StubEngine([0.7, 0.6, 0.52, 0.1])
    r = evaluate_golden(weak_face, pos_img=pos, neg_img=neg)
    assert r["n_pos"] == 3 and not r["ok"]

    # comfortable margins on all three and a cold 4th: ok
    strong = StubEngine([0.8, 0.7, 0.65, 0.2])
    assert evaluate_golden(strong, pos_img=pos, neg_img=neg)["ok"]
