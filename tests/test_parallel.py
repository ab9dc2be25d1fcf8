"""Multi-chip sharding on the virtual 8-device CPU mesh: data-parallel
inference, sharded similarity matmul, and the DP+TP ArcFace train step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_detection_and_recognition_tpu.parallel.mesh import make_mesh
from face_detection_and_recognition_tpu.parallel.sharding import (

    batch_sharding, data_parallel, replicate_to_mesh, shard_reference_matrix)

pytestmark = pytest.mark.slow  # slow lane (pyproject addopts)


def _require_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def test_mesh_construction():
    _require_8()
    mesh = make_mesh(("data",))
    assert mesh.shape["data"] == 8
    mesh2 = make_mesh(("data", "model"), (4, 2))
    assert mesh2.shape == {"data": 4, "model": 2}


def test_data_parallel_batch_inference():
    _require_8()
    mesh = make_mesh(("data",))

    @jax.jit
    def fake_detect(variables, imgs):
        return imgs.mean(axis=(1, 2, 3)) + variables["b"]

    variables = {"b": jnp.float32(1.0)}
    wrapped = data_parallel(fake_detect, mesh)
    imgs = np.random.RandomState(0).uniform(0, 1, (16, 8, 8, 3)).astype(np.float32)
    out = wrapped(variables, imgs)
    np.testing.assert_allclose(np.asarray(out), imgs.mean((1, 2, 3)) + 1.0,
                               rtol=1e-6)


def test_sharded_similarity_matmul():
    _require_8()
    mesh = make_mesh(("data", "model"), (4, 2))
    rng = np.random.RandomState(0)
    emb = rng.uniform(-1, 1, (8, 64)).astype(np.float32)
    refs = rng.uniform(-1, 1, (16, 64)).astype(np.float32)
    refs_sharded = shard_reference_matrix(refs, mesh)
    emb_sharded = jax.device_put(
        emb, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data", None))
    )

    @jax.jit
    def sim(e, r):
        return e @ r.T

    out = np.asarray(sim(emb_sharded, refs_sharded))
    np.testing.assert_allclose(out, emb @ refs.T, rtol=1e-4, atol=1e-5)


def test_arcface_train_step_dp_tp():
    _require_8()
    from face_detection_and_recognition_tpu.train.arcface import (
        ArcFaceTrainConfig, create_train_state, sharded_train_step)

    mesh = make_mesh(("data", "model"), (4, 2))
    cfg = ArcFaceTrainConfig(num_classes=32, embedding_size=64)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step, (params, stats, opt) = sharded_train_step(state, mesh)
    rng = np.random.RandomState(0)
    images = jax.device_put(
        rng.uniform(-1, 1, (8, 112, 112, 3)).astype(np.float32),
        batch_sharding(mesh, 4),
    )
    labels = jax.device_put(rng.randint(0, 32, (8,)), batch_sharding(mesh, 1))
    p1, s1, o1, loss1 = step(params, stats, opt, images, labels)
    p2, s2, o2, loss2 = step(p1, s1, o1, images, labels)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    # params actually move
    assert not np.allclose(np.asarray(p1["arcface_kernel"]),
                           np.asarray(p2["arcface_kernel"]))
    # kernel stays class-sharded across steps
    assert p1["arcface_kernel"].sharding.spec == jax.sharding.PartitionSpec(None, "model")


def test_replicate_roundtrip():
    _require_8()
    mesh = make_mesh(("data",))
    tree = {"w": np.ones((4, 4), np.float32)}
    placed = replicate_to_mesh(tree, mesh)
    np.testing.assert_allclose(np.asarray(placed["w"]), tree["w"])
