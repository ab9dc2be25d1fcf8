"""Config JSON round-trip + mesh-sharded engine detection."""
import dataclasses

import jax
import numpy as np
import pytest

from face_detection_and_recognition_tpu.core.config import (load_config,
                                                            save_config)


def test_config_roundtrip(tmp_path):
    from face_detection_and_recognition_tpu.models.ssd import SSDConfig

    cfg = SSDConfig(backbone="squeezenet", conf_thres=0.5)
    p = str(tmp_path / "ssd.json")
    save_config(cfg, p)
    back = load_config(SSDConfig, p)
    assert back.backbone == "squeezenet"
    assert back.conf_thres == 0.5
    assert back.min_sizes == cfg.min_sizes  # tuples restored from lists


def test_config_rejects_unknown(tmp_path):
    from face_detection_and_recognition_tpu.models.ssd import SSDConfig

    p = str(tmp_path / "bad.json")
    with open(p, "w") as f:
        f.write('{"not_a_field": 1}')
    with pytest.raises(ValueError, match="unknown config keys"):
        load_config(SSDConfig, p)


def test_config_overrides(tmp_path):
    from face_detection_and_recognition_tpu.train.detection import \
        DetTrainConfig

    cfg = DetTrainConfig()
    p = str(tmp_path / "det.json")
    save_config(cfg, p)
    back = load_config(DetTrainConfig, p, lr=0.5)
    assert back.lr == 0.5


def test_engine_detect_batch_sharded(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from face_detection_and_recognition_tpu.core.engine import (EngineConfig,
                                                                FaceEngine)
    from face_detection_and_recognition_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(("data",))
    engine = FaceEngine(EngineConfig(detector="blazeface-front",
                                     det_thres=0.3, max_det=8))
    frames = rng.randint(0, 255, (16, 96, 128, 3)).astype(np.uint8)
    d_sharded = engine.detect_batch_sharded(frames, mesh)
    d_local = engine.detect_batch(frames)
    np.testing.assert_allclose(np.asarray(d_sharded.boxes),
                               np.asarray(d_local.boxes), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(d_sharded.valid),
                                  np.asarray(d_local.valid))
