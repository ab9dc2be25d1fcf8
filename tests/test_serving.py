"""Serving layer: ensemble contract + HTTP front door (the reference never
tested its Triton servers — SURVEY.md §4 'Not tested')."""
import json
import urllib.request

import cv2
import numpy as np
import pytest

from face_detection_and_recognition_tpu.serving import FaceService, ServiceConfig

pytestmark = pytest.mark.slow  # slow lane (pyproject addopts)


@pytest.fixture(scope="module")
def service():
    svc = FaceService(ServiceConfig(detector="blazeface-front",
                                    det_thres=0.3, max_det=8))
    assert svc.ready()
    return svc


def test_detect_faces_sentinel_contract(service, rng):
    img = rng.randint(0, 255, (120, 160, 3)).astype(np.uint8)
    faces, bboxes, confs = service.detect_faces(img)
    if faces.shape[0] == 0:
        np.testing.assert_array_equal(bboxes, [[0, 0, 0, 0]])
        assert confs.shape == (0, 1)
    else:
        assert faces.shape[1:] == (3, 112, 112)
        assert -1.0 - 1e-5 <= faces.min() and faces.max() <= 1.0 + 1e-5
        assert bboxes.shape == (faces.shape[0], 4)


def test_call_time_thresholds(service, rng):
    img = rng.randint(0, 255, (120, 160, 3)).astype(np.uint8)
    f1, _, _ = service.detect_faces(img, det_thres=0.999)
    f2, _, _ = service.detect_faces(img, det_thres=0.0, bbox_area_thres=0.0)
    assert f1.shape[0] <= f2.shape[0]


def test_embed_and_age_gender(service, rng):
    faces = rng.randint(0, 255, (2, 112, 112, 3)).astype(np.uint8)
    emb = service.embed(faces)
    assert emb.shape == (2, 512)
    a, g = service.age_gender(faces)
    assert a.shape == (2, 8) and g.shape == (2, 2)


def test_full_ensemble(service, test_image_3faces):
    out = service.detect_embed_classify(test_image_3faces)
    assert set(out) == {"bboxes", "confs", "embeddings", "labels"}
    assert len(out["labels"]) == len(out["embeddings"])


def test_http_server_roundtrip(rng):
    from face_detection_and_recognition_tpu.serving.http_server import serve

    httpd = serve(ServiceConfig(detector="blazeface-front", det_thres=0.3,
                                max_det=4, with_embedder=False,
                                with_age_gender=False),
                  host="127.0.0.1", port=18931, block=False)
    try:
        with urllib.request.urlopen("http://127.0.0.1:18931/health") as r:
            assert json.load(r)["ready"] is True
        img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        ok, enc = cv2.imencode(".jpg", img)
        assert ok
        req = urllib.request.Request(
            "http://127.0.0.1:18931/detect?det_thres=0.5",
            data=enc.tobytes(), method="POST",
            headers={"Content-Type": "image/jpeg"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
        assert "bboxes" in out and "num_faces" in out
        # garbage body -> clean 400
        bad = urllib.request.Request(
            "http://127.0.0.1:18931/detect", data=b"not an image",
            method="POST")
        try:
            urllib.request.urlopen(bad)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # EMPTY body -> 400, not a dropped connection (cv2.imdecode raises
        # on an empty buffer rather than returning None)
        empty = urllib.request.Request(
            "http://127.0.0.1:18931/detect", data=b"", method="POST")
        try:
            urllib.request.urlopen(empty)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # malformed threshold query -> 400 JSON error
        badq = urllib.request.Request(
            "http://127.0.0.1:18931/detect?det_thres=abc",
            data=enc.tobytes(), method="POST")
        try:
            urllib.request.urlopen(badq)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "bad request" in json.load(e)["error"]
    finally:
        httpd.shutdown()


def test_dynamic_batching_coalesces_and_matches(rng):
    """Concurrent detect_faces calls share fused dispatches and return
    exactly what the unbatched path returns."""
    import threading

    svc = FaceService(ServiceConfig(detector="blazeface-front",
                                    det_thres=0.2, max_det=8))
    imgs = [rng.randint(0, 255, (96, 128, 3)).astype(np.uint8)
            for _ in range(8)]
    sequential = [svc.detect_faces(im) for im in imgs]

    batcher = svc.enable_dynamic_batching(max_batch=8, max_delay_ms=50.0)
    results = [None] * len(imgs)

    def call(i):
        results[i] = svc.detect_faces(imgs[i])

    threads = [threading.Thread(target=call, args=(i,))
               for i in range(len(imgs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    batcher.shutdown()

    assert batcher.requests == len(imgs)
    assert batcher.dispatches < len(imgs), (
        f"no coalescing happened: {batcher.dispatches} dispatches")
    for (f1, b1, c1), (f2, b2, c2) in zip(results, sequential):
        np.testing.assert_allclose(f1, f2, atol=1e-5)
        np.testing.assert_allclose(b1, b2)
        np.testing.assert_allclose(c1, c2)


def test_dynamic_batching_mixed_shapes(rng):
    """Different resolutions never share a dispatch but all complete."""
    import threading

    svc = FaceService(ServiceConfig(detector="blazeface-front",
                                    det_thres=0.2, max_det=8,
                                    with_embedder=False,
                                    with_age_gender=False))
    svc.enable_dynamic_batching(max_batch=4, max_delay_ms=20.0)
    imgs = [rng.randint(0, 255, (64 + 32 * (i % 2), 64, 3)).astype(np.uint8)
            for i in range(6)]
    out = [None] * len(imgs)

    def call(i):
        out[i] = svc.detect_faces(imgs[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    svc._batcher.shutdown()
    assert all(o is not None for o in out)


def test_grpc_front_door(rng):
    """gRPC service (generic handlers, no codegen): health, detect with
    metadata thresholds, and clean INVALID_ARGUMENT on garbage."""
    grpc = pytest.importorskip("grpc")
    from face_detection_and_recognition_tpu.serving.grpc_server import (
        grpc_call, grpc_detect, serve_grpc,
    )

    server = serve_grpc(
        ServiceConfig(detector="blazeface-front", det_thres=0.3, max_det=4,
                      with_embedder=False, with_age_gender=False),
        host="127.0.0.1", port=18941, block=False)
    try:
        out = json.loads(grpc_call("127.0.0.1:18941", "Health"))
        assert out["ready"] is True

        img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        ok, enc = cv2.imencode(".jpg", img)
        assert ok
        res = grpc_detect("127.0.0.1:18941", enc.tobytes(), det_thres=0.5)
        assert "num_faces" in res and "bboxes" in res
        # higher threshold never yields more faces
        res0 = grpc_detect("127.0.0.1:18941", enc.tobytes(), det_thres=0.0,
                           bbox_area_thres=0.0)
        assert res["num_faces"] <= res0["num_faces"]

        with pytest.raises(grpc.RpcError) as e:
            grpc_call("127.0.0.1:18941", "Detect", b"not an image")
        assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
    finally:
        server.stop(grace=None)


def test_serving_native_resolution_detector(rng):
    """Round-2 review regression: FaceService with a native-resolution
    cascade (mtcnn) must serve via the staged path, not raise from the
    fused program."""
    svc = FaceService(ServiceConfig(detector="mtcnn", det_thres=0.3,
                                    max_det=8, with_embedder=False,
                                    with_age_gender=False))
    img = rng.randint(0, 255, (72, 64, 3)).astype(np.uint8)
    faces, bboxes, confs = svc.detect_faces(img)
    if faces.shape[0] == 0:
        np.testing.assert_array_equal(bboxes, [[0, 0, 0, 0]])
    out = svc.detect_embed_classify(img)
    assert set(out) == {"bboxes", "confs", "embeddings", "labels"}


def test_service_mesh_routing(rng):
    """ServiceConfig(mesh=...) shards batched ensemble dispatches over the
    virtual 8-device mesh, padding odd batch sizes to a data-axis multiple;
    results match the single-device service (VERDICT r2 Missing #5)."""
    from face_detection_and_recognition_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(("data",), (8,))
    base = FaceService(ServiceConfig(detector="blazeface-front",
                                     det_thres=0.3, max_det=4,
                                     with_embedder=False,
                                     with_age_gender=False))
    sharded = FaceService(ServiceConfig(detector="blazeface-front",
                                        det_thres=0.3, max_det=4,
                                        with_embedder=False,
                                        with_age_gender=False, mesh=mesh))
    img = rng.randint(0, 255, (96, 128, 3)).astype(np.uint8)
    f0, b0, c0 = base.detect_faces(img)     # B=1 -> padded to 8 on the mesh
    f1, b1, c1 = sharded.detect_faces(img)
    np.testing.assert_allclose(b1, b0, atol=1e-3)
    np.testing.assert_allclose(c1, c0, atol=1e-4)
    np.testing.assert_allclose(f1, f0, atol=1e-2)


def test_service_config_loads_checkpoints():
    """ServiceConfig.ckpt wires trained weights at construction (the
    reference's Triton servers always load real model files; a serving
    process must not silently run random init)."""
    import os

    ckpt = os.path.join(os.path.dirname(__file__), "data",
                        "golden_yolov5n_ckpt")
    if not os.path.isdir(ckpt):
        import pytest
        pytest.skip("golden checkpoint not trained yet")
    img = cv2.imread(os.path.join(os.path.dirname(__file__), "data",
                                  "test2_faces_3.jpg"))
    svc = FaceService(ServiceConfig(detector="yolov5n", det_thres=0.5,
                                    with_embedder=False,
                                    with_age_gender=False, ckpt=ckpt))
    faces, bboxes, confs = svc.detect_faces(img)
    assert faces.shape[0] == 3


def test_batcher_pads_to_preferred_buckets():
    """A group pads to the SMALLEST preferred bucket that fits it, never
    straight to max_batch: padding bytes ride the host->device upload, so a
    lone request padded 1->8 pays 8x the transfer (Triton's
    preferred_batch_size semantics)."""
    import threading

    from face_detection_and_recognition_tpu.serving.batcher import (
        DynamicBatcher)

    seen = []

    def run_batch(imgs, key):
        seen.append(len(imgs))
        return [int(imgs[i, 0, 0, 0]) for i in range(len(imgs))]

    b = DynamicBatcher(run_batch, max_batch=8, max_delay_ms=40.0)
    assert b.preferred_batch_sizes == [1, 2, 4, 8]
    img = np.zeros((4, 4, 3), np.uint8)
    # one lone request -> bucket 1
    assert b.submit(img) == 0
    # three concurrent -> bucket 4 (one dispatch, coalesced in the window)
    out = [None] * 3
    ts = [threading.Thread(target=lambda i=i: out.__setitem__(
        i, b.submit(img + i))) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    b.shutdown()
    assert sorted(out) == [0, 1, 2]
    assert seen[0] == 1
    # the 3 concurrent submits may coalesce into 1 dispatch (bucket 4) or
    # race into smaller ones; every dispatch must be a preferred bucket
    assert all(s in (1, 2, 4, 8) for s in seen), seen
    assert 4 in seen or seen.count(1) + seen.count(2) >= 2
