"""Device-resident training loop (train/device_loop.py): on-device flip
parity with the host augmenter, chunked scan training actually optimizes,
and the buffer builder's shapes/dtypes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from face_detection_and_recognition_tpu.train import device_loop as DL
from face_detection_and_recognition_tpu.train.data import flip_lr_targets

pytestmark = pytest.mark.slow  # slow lane (pyproject addopts)



def test_device_flip_matches_host_convention():
    rng = np.random.RandomState(0)
    b, h, w = 4, 16, 24
    x = rng.randint(0, 255, (b, h, w, 3)).astype(np.uint8)
    t = np.full((b, 3, 14), -1.0, np.float32)
    t[..., 0] = rng.uniform(2, w - 2, (b, 3))
    t[..., 1] = rng.uniform(2, h - 2, (b, 3))
    t[..., 2:4] = rng.uniform(2, 6, (b, 3, 2))
    # visible landmarks on the first row of each example
    t[:, 0, 4:14] = rng.uniform(1, w - 1, (b, 10))

    # a key under which every example flips (prob=1.0)
    xf, tf = DL.device_flip_lr(jax.random.PRNGKey(1), jnp.asarray(x),
                               jnp.asarray(t), prob=1.0)
    xf, tf = np.asarray(xf), np.asarray(tf)
    assert np.array_equal(xf, x[:, :, ::-1, :])
    for i in range(b):
        expect = flip_lr_targets(t[i], float(w))
        np.testing.assert_allclose(tf[i], expect, atol=1e-4)

    # prob=0.0: identity
    x0, t0 = DL.device_flip_lr(jax.random.PRNGKey(1), jnp.asarray(x),
                               jnp.asarray(t), prob=0.0)
    assert np.array_equal(np.asarray(x0), x)
    np.testing.assert_allclose(np.asarray(t0), t, atol=1e-5)


def test_device_brightness_bounds():
    x = np.full((2, 4, 4, 3), 128, np.uint8)
    out = np.asarray(DL.device_brightness(jax.random.PRNGKey(0),
                                          jnp.asarray(x), 0.3))
    assert out.dtype == np.uint8
    assert out.min() >= int(128 * 0.7) - 1 and out.max() <= int(128 * 1.3) + 1


def test_chunk_trainer_optimizes_detection():
    """Two scanned chunks on a tiny fixed buffer: loss must drop and the
    carried step counter/EMA must advance — the scan path trains for real."""
    from face_detection_and_recognition_tpu.train.detection import (
        DetTrainConfig, create_det_train_state, make_det_train_step_ema)

    size = 64
    cfg = DetTrainConfig(arch="yolov5n", nc=1, input_size=(size, size),
                         max_targets=2, lr=0.01, total_steps=0,
                         ema_decay=0.99, ema_tau=10.0)
    state = create_det_train_state(cfg, jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    k = 6
    x = rng.randint(0, 255, (k, size, size, 3)).astype(np.uint8)
    t = np.full((k, 2, 14), -1.0, np.float32)
    v = np.zeros((k, 2), bool)
    t[:, 0, :4] = [28, 30, 22, 26]
    v[:, 0] = True

    data = (jnp.asarray(x), jnp.asarray(t), jnp.asarray(v))
    chunk = DL.make_chunk_trainer(make_det_train_step_ema(state),
                                  batch_size=3, chunk_steps=10,
                                  flip_lr=0.5, brightness=0.1,
                                  ema_stats_cfg=(0.99, 10.0))
    p, bs = state["params"], state["batch_stats"]
    opt, ema = state["opt_state"], state["ema_params"]
    ema_bs = jax.tree_util.tree_map(jnp.copy, bs)
    # snapshot BEFORE the chunk call: the chunk donates its weight buffers
    leaf0 = np.array(jax.tree_util.tree_leaves(ema)[0])
    n = jnp.int32(0)
    key = jax.random.PRNGKey(7)
    p, bs, opt, ema, ema_bs, n, key, loss1, _ = chunk(
        p, bs, opt, ema, ema_bs, n, key, *data)
    p, bs, opt, ema, ema_bs, n, key, loss2, _ = chunk(
        p, bs, opt, ema, ema_bs, n, key, *data)
    assert int(n) == 20
    assert float(loss2) < float(loss1)
    # EMA shadow moved off its init; EMA'd BN stats track the live stats
    leaf = jax.tree_util.tree_leaves(ema)[0]
    assert not np.allclose(np.asarray(leaf), leaf0)
    sl, el = jax.tree_util.tree_leaves(bs)[0], jax.tree_util.tree_leaves(ema_bs)[0]
    assert np.asarray(el).shape == np.asarray(sl).shape
    assert not np.allclose(np.asarray(el), np.asarray(sl))  # lags, not equal


def test_build_example_buffer_shapes(tmp_path):
    from face_detection_and_recognition_tpu.train.data import (
        AugmentConfig, load_wider_index)
    from face_detection_and_recognition_tpu.train.golden import (
        make_composite_dataset)

    ann, root = make_composite_dataset(str(tmp_path / "ds"), n_images=6,
                                       out_wh=(96, 96), seed=0)
    index = load_wider_index(ann, root)
    x, t, v = DL.build_example_buffer(index, 8, (96, 96), 4, seed=1,
                                      augment=AugmentConfig(mosaic=0.5))
    assert x.shape == (8, 96, 96, 3) and x.dtype == np.uint8
    assert t.shape == (8, 4, 14) and v.shape == (8, 4)


def test_chunk_trainer_mesh_matches_single_device():
    """The mesh-sharded chunk (batch constrained over the 'data' axis,
    replicated weights, XLA-inserted gradient psum) computes the same
    training trajectory as single-device — same PRNG, same batches."""
    from face_detection_and_recognition_tpu.parallel.mesh import make_mesh
    from face_detection_and_recognition_tpu.train.detection import (
        DetTrainConfig, create_det_train_state, make_det_train_step_ema)

    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs the virtual multi-device CPU mesh")

    size = 64
    rng = np.random.RandomState(1)
    k = 6
    x = rng.randint(0, 255, (k, size, size, 3)).astype(np.uint8)
    t = np.full((k, 2, 14), -1.0, np.float32)
    v = np.zeros((k, 2), bool)
    t[:, 0, :4] = [30, 28, 20, 24]
    v[:, 0] = True
    data = (jnp.asarray(x), jnp.asarray(t), jnp.asarray(v))

    def run(mesh):
        cfg = DetTrainConfig(arch="yolov5n", nc=1, input_size=(size, size),
                             max_targets=2, lr=0.01, total_steps=0,
                             ema_decay=0.99, ema_tau=10.0)
        state = create_det_train_state(cfg, jax.random.PRNGKey(0))
        chunk = DL.make_chunk_trainer(
            make_det_train_step_ema(state), batch_size=8, chunk_steps=6,
            flip_lr=0.5, brightness=0.1, ema_stats_cfg=(0.99, 10.0),
            mesh=mesh)
        p, bs = state["params"], state["batch_stats"]
        opt, ema = state["opt_state"], state["ema_params"]
        ema_bs = jax.tree_util.tree_map(jnp.copy, bs)
        if mesh is not None:
            from face_detection_and_recognition_tpu.parallel.sharding import (
                replicate_to_mesh)
            p, bs, opt, ema, ema_bs = replicate_to_mesh(
                (p, bs, opt, ema, ema_bs), mesh)
        out = chunk(p, bs, opt, ema, ema_bs, jnp.int32(0),
                    jax.random.PRNGKey(3), *data)
        return float(out[7]), jax.device_get(out[0])

    loss_1, p_1 = run(None)
    mesh = make_mesh(("data",), (len(jax.devices()),))
    loss_m, p_m = run(mesh)
    assert abs(loss_1 - loss_m) < 1e-3 * max(1.0, abs(loss_1))
    l1 = jax.tree_util.tree_leaves(p_1)[0]
    lm = jax.tree_util.tree_leaves(p_m)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(lm),
                               rtol=1e-3, atol=1e-4)


def test_run_device_training_mesh_tail_chunk(tmp_path):
    """max_steps NOT a chunk multiple on a mesh: the tail re-jit must carry
    the mesh (a dropped mesh de-shards the final DP steps — regression)."""
    from face_detection_and_recognition_tpu.parallel.mesh import make_mesh
    from face_detection_and_recognition_tpu.train.detection import (
        DetTrainConfig, create_det_train_state, make_det_train_step_ema)

    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs the virtual multi-device CPU mesh")

    size = 64
    rng = np.random.RandomState(2)
    k = 6
    x = rng.randint(0, 255, (k, size, size, 3)).astype(np.uint8)
    t = np.full((k, 2, 14), -1.0, np.float32)
    v = np.zeros((k, 2), bool)
    t[:, 0, :4] = [30, 28, 20, 24]
    v[:, 0] = True

    cfg = DetTrainConfig(arch="yolov5n", nc=1, input_size=(size, size),
                         max_targets=2, lr=0.01, total_steps=0,
                         ema_decay=0.99, ema_tau=10.0)
    state = create_det_train_state(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(("data",), (len(jax.devices()),))
    out = DL.run_device_training(
        state, make_det_train_step_ema, (x, t, v), batch_size=8,
        max_steps=7, chunk_steps=5, flip_lr=0.5, brightness=0.1,
        mesh=mesh, log=lambda *_: None)
    assert out["n_updates"] == 7
    leaf = np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(out["params"])[0]))
    assert np.isfinite(leaf).all()
