"""MobileFaceNet: embedding contract + bit parity vs the reference torch
graph with randomly initialized weights (converted via utils/weights.py)."""
import os
import sys
import types

import numpy as np
import pytest

from face_detection_and_recognition_tpu.models import mobile_facenet as MF
from face_detection_and_recognition_tpu.utils.weights import convert_mobile_facenet

pytestmark = pytest.mark.parity  # parity lane (pyproject addopts)

REF = "/root/reference/face_detection_and_extraction"


def test_embedding_is_l2_normalized(rng):
    net, variables, embed = MF.make_mobile_facenet()
    x = rng.uniform(-1, 1, (3, 112, 112, 3)).astype(np.float32)
    e = np.asarray(embed(variables, x))
    assert e.shape == (3, 512)
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-5)


def test_torch_parity_random_weights(rng):
    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    torch = pytest.importorskip("torch")
    # the reference module imports torchvision only for a transform constant
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            tv = types.ModuleType("torchvision")
            tv.transforms = types.SimpleNamespace(
                Compose=lambda *a, **k: None, Resize=lambda *a, **k: None,
                ToTensor=lambda *a, **k: None, Normalize=lambda *a, **k: None,
            )
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.transforms"] = tv.transforms
    sys.path.insert(0, REF)
    from modules.mobile_facenet.mobile_facenet import MobileFaceNet as TorchMFN

    torch.manual_seed(0)
    tnet = TorchMFN(512).eval()
    # randomize BN stats so parity exercises the BN math, not identity stats
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    variables = convert_mobile_facenet(tnet.state_dict())
    net = MF.MobileFaceNet()

    x = rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    import jax

    got = np.asarray(jax.jit(net.apply)(jax.device_put(variables), x))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_arcface_logits_match_torch_reference(rng):
    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    from modules.mobile_facenet.mobile_facenet import Arcface

    torch.manual_seed(1)
    head = Arcface(embedding_size=64, classnum=10)
    emb = rng.uniform(-1, 1, (4, 64)).astype(np.float32)
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    labels = np.array([0, 3, 7, 9])
    with torch.no_grad():
        ref = head(torch.from_numpy(emb), torch.from_numpy(labels)).numpy()
    got = np.asarray(
        MF.arcface_logits(emb, labels, head.kernel.detach().numpy())
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
