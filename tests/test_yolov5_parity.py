"""Full-graph YOLOv5-face parity: the reference torch Model (built from its
own yamls) vs our flax graph with converted weights — raw detect maps must
match bit-level. Heavy: runs only for yolov5n (shuffle graph) and yolov5s
(CSP graph) at a small input size."""
import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.parity  # parity lane (pyproject addopts)

REF_PT = "/root/reference/face_detection_and_extraction/modules/yolov5_face/pytorch"


@pytest.fixture(scope="module")
def torch_yolo():
    if not os.path.isdir(REF_PT):
        pytest.skip("reference repo not mounted")
    torch = pytest.importorskip("torch")
    # stub deps the reference imports but doesn't need for graph building
    tv = types.ModuleType("torchvision")
    tvops = types.ModuleType("torchvision.ops")
    tvops.nms = lambda *a, **k: torch.zeros(0, dtype=torch.long)
    tv.ops = tvops
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.ops", tvops)
    thop = types.ModuleType("thop")
    thop.profile = lambda *a, **k: (0.0, 0.0)
    thop.clever_format = lambda *a, **k: ("0", "0")
    sys.modules.setdefault("thop", thop)
    sys.path.insert(0, REF_PT)
    cwd = os.getcwd()
    os.chdir(REF_PT)
    try:
        import models.common as C
        import models.experimental as E
        import models.yolo as Y
        import yaml

        def build(arch):
            with open(f"models/{arch}.yaml") as f:
                cfg = yaml.safe_load(f)
            ns = {**vars(C), **vars(E), "nn": torch.nn, "Detect": Y.Detect,
                  "nc": cfg["nc"], "anchors": cfg["anchors"]}
            Y.literal_eval = lambda s: eval(s, ns)  # their literal_eval breaks on class names
            m = Y.Model(cfg, ch=3, nc=1).eval()
            return m

        yield build
    finally:
        os.chdir(cwd)


@pytest.mark.parametrize("arch", ["yolov5n", "yolov5s", "yolov5n6"])
def test_full_graph_parity(arch, torch_yolo, rng):
    torch = pytest.importorskip("torch")
    import jax

    from face_detection_and_recognition_tpu.models.yolov5_face import \
        YoloV5FaceNet
    from face_detection_and_recognition_tpu.utils.weights import \
        convert_yolov5_face

    torch.manual_seed(0)
    tm = torch_yolo(arch)
    # randomize BN stats so the BN math is exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
    tm.model[-1].export = True  # raw per-level maps

    variables = convert_yolov5_face(tm.state_dict(), arch)
    net = YoloV5FaceNet(arch=arch, nc=1)

    # structure check: converted tree must exactly match the init tree
    init_vars = jax.jit(net.init)(jax.random.PRNGKey(0),
                         np.zeros((1, 64, 64, 3), np.float32))
    conv_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                  jax.tree_util.tree_leaves_with_path(variables)}
    init_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                  jax.tree_util.tree_leaves_with_path(init_vars)}
    assert conv_paths == init_paths

    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_maps = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_maps = jax.jit(net.apply)(jax.device_put(variables), x)
    assert len(t_maps) == len(j_maps)
    for tmap, jmap in zip(t_maps, j_maps):
        np.testing.assert_allclose(np.asarray(jmap), tmap.numpy(),
                                   atol=5e-4, rtol=1e-4)
