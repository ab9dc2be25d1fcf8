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


def test_sharded_gallery_topk_merge_matches_single_device():
    """SURVEY §2.7 item 2 ("multi-chip embedding gather and top-k merge"):
    the distributed per-shard-top-k + k-way merge over a row-sharded
    gallery must equal the single-device answer exactly — scores AND
    global indices — including a gallery size that does NOT divide the
    mesh axis (padding masked) and k larger than one shard's contribution
    pool would naively supply."""
    _require_8()
    from face_detection_and_recognition_tpu.parallel.sharding import (
        topk_gallery_sharded)
    from face_detection_and_recognition_tpu.pipelines.similarity import (
        topk_similar)

    mesh = make_mesh(("model",))
    rng = np.random.RandomState(3)
    q = rng.randn(16, 64).astype(np.float32)

    for m, k in ((1003, 7), (64, 9), (24, 24)):
        g = rng.randn(m, 64).astype(np.float32)
        ref_scores = np.sort(q @ g.T, axis=1)[:, ::-1][:, :k]
        ref_idx = np.argsort(-(q @ g.T), kind="stable", axis=1)[:, :k]
        sc, gi = topk_gallery_sharded(q, g, mesh, k=k)
        np.testing.assert_allclose(np.asarray(sc), ref_scores, atol=1e-5)
        # random gaussian scores are distinct w.p. 1 -> indices must agree
        np.testing.assert_array_equal(np.asarray(gi), ref_idx)

    # the Pallas per-shard path (VMEM-streaming kernel inside shard_map)
    g = rng.randn(515, 64).astype(np.float32)
    sc, gi = topk_gallery_sharded(q, g, mesh, k=5, use_pallas=True)
    ref_idx = np.argsort(-(q @ g.T), kind="stable", axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(gi), ref_idx)

    # and the pipeline-level entry point routes through the mesh
    s1, i1 = topk_similar(q, g, k=5)
    s2, i2 = topk_similar(q, g, k=5, mesh=mesh)
    np.testing.assert_allclose(s1, s2, atol=1e-5)
    np.testing.assert_array_equal(i1, i2)

    # k > gallery raises loudly instead of returning padded garbage
    with pytest.raises(ValueError, match="exceeds gallery"):
        topk_gallery_sharded(q, g[:3], mesh, k=5)
