"""Embedder registry: all reference feature-extractor slots produce
L2-normalized embeddings of the right dimensionality through the engine."""
import numpy as np
import pytest

from face_detection_and_recognition_tpu.models.embedders import (
    available_embedders, get_embedder)


def test_registry_has_reference_slots():
    have = available_embedders()
    for name in ("mobile_facenet", "facenet", "reid-mnv2"):
        assert name in have
    assert get_embedder("mobile_facenet").dim == 512
    assert get_embedder("facenet").dim == 128
    assert get_embedder("reid-mnv2").dim == 256


@pytest.mark.parametrize("name,hw", [("facenet", 160), ("reid-mnv2", 128)])
def test_embedders_produce_normed_vectors(name, hw, rng):
    spec = get_embedder(name)
    net, variables, embed = spec.build()
    x = rng.uniform(-1, 1, (2, hw, hw, 3)).astype(np.float32)
    e = np.asarray(embed(variables, x))
    assert e.shape == (2, spec.dim)
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-4)


def test_engine_with_facenet_embedder(rng):
    from face_detection_and_recognition_tpu.core.engine import (EngineConfig,
                                                                FaceEngine)

    eng = FaceEngine(EngineConfig(detector="blazeface-front", det_thres=0.3,
                                  embedder="facenet", max_det=4))
    img = rng.randint(0, 255, (96, 96, 3)).astype(np.uint8)
    boxes = np.array([[10.0, 10.0, 80.0, 80.0]], np.float32)
    emb = eng.embed_faces(img, boxes)
    assert emb.shape == (1, 128)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)
