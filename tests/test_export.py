"""StableHLO export of the fused serving ensemble."""
import pytest

import numpy as np

pytestmark = pytest.mark.slow  # slow lane (pyproject addopts)

def test_export_fused_ensemble_roundtrip(tmp_path, rng):
    """The whole serving ensemble serializes to ONE StableHLO artifact and
    reloads to the same outputs."""
    from face_detection_and_recognition_tpu.core.engine import (EngineConfig,
                                                                FaceEngine)
    from face_detection_and_recognition_tpu.utils.export import (
        export_ensemble, load_exported,
    )

    engine = FaceEngine(EngineConfig(detector="blazeface-front",
                                     det_thres=0.3, max_det=4,
                                     embedder="mobile_facenet"))
    path = str(tmp_path / "ensemble.shlo")
    export_ensemble(engine, path, batch=1, image_hw=(64, 64))
    ex = load_exported(path)

    img = rng.randint(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    out = ex.call(img)
    res = engine.detect_embed_classify_batch(img)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(res.det.boxes),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[4]),
                               np.asarray(res.embeddings), atol=1e-4)
