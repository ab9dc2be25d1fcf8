"""Executed RECOGNITION accuracy: the similar-face filter's math separates
the golden identities with an in-environment-trained embedder.

Unit tests cover the identity-crop sampler and the filter-math evaluator
with oracle embedders; the checkpoint-gated tests close train -> checkpoint
-> engine.load_embed_weights -> embed_crops -> filter gate on real pixels
(checkpoint produced by ``make accuracy-embed`` / cli/train_golden_embed.py).
Reference contract: ``similar_face_filtering/filter_faces_using_reference.py
:71-100,183-197`` (mean + max-ref-distance threshold routing) and the golden
threshold test ``tests/base/test_similar_faces_filter.py:30-64``.
"""
import os

import numpy as np
import pytest

from face_detection_and_recognition_tpu.train import golden_embed as GE

pytestmark = pytest.mark.golden  # golden lane (pyproject addopts)

CKPT = os.path.join(os.path.dirname(__file__), "data", "golden_embed_ckpt")


def test_make_identity_crops_shapes_and_determinism():
    a = GE.make_identity_crops(seed=7, n_per_id=4, size=96)
    b = GE.make_identity_crops(seed=7, n_per_id=4, size=96)
    c = GE.make_identity_crops(seed=8, n_per_id=4, size=96)
    assert len(a) == GE.N_IDENTITIES
    for crops in a:
        assert len(crops) == 4
        for crop in crops:
            assert crop.shape == (96, 96, 3) and crop.dtype == np.uint8
    same = all(np.array_equal(x, y) for ca, cb in zip(a, b)
               for x, y in zip(ca, cb))
    assert same, "same seed must reproduce the same crop sets"
    assert any(not np.array_equal(x, y) for ca, cc in zip(a, c)
               for x, y in zip(ca, cc)), "different seeds must differ"


def test_evaluate_identity_filter_oracle_embedders():
    """A perfectly separating embedder passes; a collapsed one fails."""
    # oracle: the crop generator is deterministic, so a byte-hash lookup
    # over the evaluator's own ref/probe sets recovers each crop's true
    # identity exactly — embedding = one-hot of that identity
    ident = {}
    for seed in (101, 202):  # evaluate_identity_filter default seeds
        for cid, crops in enumerate(GE.make_identity_crops(seed, 6)):
            for j, crop in enumerate(crops):
                ident[crop.tobytes()] = (cid, j)

    def oracle(crops_u8):
        out = np.zeros((len(crops_u8), 8), np.float32)
        for i, crop in enumerate(np.asarray(crops_u8, np.uint8)):
            cid, j = ident[crop.tobytes()]
            out[i, cid] = 10.0
            out[i, -1] = 0.01 * (j % 3)  # spread so thresholds are positive
        return out

    r = GE.evaluate_identity_filter(oracle, n_ref=6, n_probe=6)
    assert r["ok"] and r["same_acc"] == 1.0 and r["cross_acc"] == 1.0
    assert r["margin"] > 0

    def collapsed(crops_u8):
        return np.ones((len(crops_u8), 8), np.float32)

    r2 = GE.evaluate_identity_filter(collapsed, n_ref=6, n_probe=6)
    assert not r2["ok"]
    assert r2["cross_acc"] == 0.0  # everything inside every threshold


@pytest.mark.skipif(not os.path.isdir(CKPT),
                    reason="embed checkpoint not trained: make accuracy-embed")
def test_trained_embedder_separates_golden_identities():
    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)

    eng = FaceEngine(EngineConfig(detector="blazeface-front",
                                  embedder="mobile_facenet"))
    eng.load_embed_weights(CKPT)
    r = GE.evaluate_identity_filter(eng.embed_crops)
    assert r["ok"], r
    assert r["same_acc"] == 1.0 and r["cross_acc"] == 1.0
    assert r["margin"] > 0


@pytest.mark.skipif(not os.path.isdir(CKPT),
                    reason="embed checkpoint not trained: make accuracy-embed")
def test_trained_embedder_through_filter_pipeline():
    """The same checkpoint through the user-facing similar-face filter
    pipeline: reference crops of identity 0 route identity-0 probes to
    clean and the other identities to unclean."""
    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)
    from face_detection_and_recognition_tpu.pipelines.similarity import (
        ref_mean_and_threshold)

    eng = FaceEngine(EngineConfig(detector="blazeface-front",
                                  embedder="mobile_facenet"))
    eng.load_embed_weights(CKPT)
    # the threshold is a max statistic: refs must be dense enough to cover
    # the augmentation spread (same lesson as evaluate_identity_filter)
    refs = GE.make_identity_crops(seed=911, n_per_id=64)
    probes = GE.make_identity_crops(seed=912, n_per_id=12)
    mean, thres = ref_mean_and_threshold(eng.embed_crops(np.stack(refs[0])))
    for cid in range(GE.N_IDENTITIES):
        d = np.linalg.norm(eng.embed_crops(np.stack(probes[cid])) - mean,
                           axis=-1)
        if cid == 0:
            assert (d <= thres).all(), f"same-id rejected: {d} vs {thres}"
        else:
            assert (d > thres).all(), f"cross-id accepted: {d} vs {thres}"


FACENET_CKPT = os.path.join(os.path.dirname(__file__), "data",
                            "golden_facenet_ckpt")


@pytest.mark.skipif(not os.path.isdir(FACENET_CKPT),
                    reason="facenet golden ckpt not trained")
def test_trained_facenet_slot_separates_golden_identities():
    """The InceptionResNetV1 128-d slot — the keras SavedModel the
    reference's similar-face filter loads
    (filter_faces_using_reference.py:131) — trained in-environment to pass
    the filter's own math (mean + max-ref-distance threshold) on held-out
    probes, served through engine.embed_crops."""
    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)
    from face_detection_and_recognition_tpu.train.golden_embed import (
        evaluate_identity_filter)

    eng = FaceEngine(EngineConfig(detector="blazeface-front",
                                  embedder="facenet"))
    eng.load_embed_weights(FACENET_CKPT)
    r = evaluate_identity_filter(eng.embed_crops, size=160)
    assert r["ok"], r
    assert r["margin"] > 0.1, r


REID_CKPT = os.path.join(os.path.dirname(__file__), "data",
                         "golden_reid_ckpt")


@pytest.mark.skipif(not os.path.isdir(REID_CKPT),
                    reason="reid golden ckpt not trained")
def test_trained_reid_slot_separates_golden_identities():
    """The OpenVINO face-reid MobileNetV2 256-d slot
    (face_extraction/extract_faces_from_dataset.py:93-104) trained
    in-environment to pass the filter gate through engine.embed_crops."""
    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)
    from face_detection_and_recognition_tpu.train.golden_embed import (
        evaluate_identity_filter)

    eng = FaceEngine(EngineConfig(detector="blazeface-front",
                                  embedder="reid-mnv2"))
    eng.load_embed_weights(REID_CKPT)
    r = evaluate_identity_filter(eng.embed_crops, size=128)
    assert r["ok"], r
    assert r["margin"] > 0.1, r


FACENET512_CKPT = os.path.join(os.path.dirname(__file__), "data",
                               "golden_facenet512_ckpt")


@pytest.mark.skipif(not os.path.isdir(FACENET512_CKPT),
                    reason="facenet-512 golden ckpt not trained")
def test_trained_facenet512_slot_separates_golden_identities():
    """The OpenVINO facenet_20180408 512-d slot — the fifth and last of the
    reference's feat-net types (extract_faces_from_dataset.py:93-104,
    feature size 512 at 160px) — trained in-environment to pass the filter
    gate through engine.embed_crops."""
    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)
    from face_detection_and_recognition_tpu.train.golden_embed import (
        evaluate_identity_filter)

    eng = FaceEngine(EngineConfig(detector="blazeface-front",
                                  embedder="facenet-512"))
    eng.load_embed_weights(FACENET512_CKPT)
    r = evaluate_identity_filter(eng.embed_crops, size=160)
    assert r["ok"], r
    assert r["margin"] > 0.1, r
