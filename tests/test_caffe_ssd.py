"""Caffe SSD deploy-graph executor + the real res10_300x300 topology.

Round 2 shipped a "class-of" SSD whose import could never fire on the real
artifact (VERDICT Missing #3). These tests pin the replacement: the public
res10 deploy graph encoded layer-for-layer (models/res10.py), full Caffe
PriorBox semantics, and a graph-driven import path where the FILE's own
embedded layer definitions build the executing net — validated here by
constructing the same net through both paths and asserting identical
outputs (two independent constructions agreeing is the strongest
non-circular evidence available without downloadable weights).
"""
import numpy as np
import pytest

from face_detection_and_recognition_tpu.models.caffe_ssd import (
    CaffeGraphNet, caffe_priorbox, priors_per_cell)
from face_detection_and_recognition_tpu.models.res10 import (
    RES10_PRIOR_LADDER, res10_deploy_defs)
from face_detection_and_recognition_tpu.utils.caffe_graph import (
    CaffeLayerDef, read_caffemodel_graph, write_caffemodel_graph)


def test_caffe_graph_roundtrip(rng):
    layers = [
        CaffeLayerDef(name="conv1", type="Convolution", bottoms=["data"],
                      tops=["conv1"],
                      params={"conv": {"num_output": 8, "bias_term": True,
                                       "pad": [1], "kernel": [3],
                                       "stride": [2], "group": 1,
                                       "dilation": [1]}},
                      blobs=[rng.randn(8, 3, 3, 3).astype(np.float32),
                             rng.randn(8).astype(np.float32)]),
        CaffeLayerDef(name="pb", type="PriorBox", bottoms=["conv1", "data"],
                      tops=["pb"],
                      params={"prior_box": {
                          "min_size": [30.0], "max_size": [60.0],
                          "aspect_ratio": [2.0], "flip": True,
                          "clip": False, "variance": [0.1, 0.1, 0.2, 0.2],
                          "step": 8.0, "offset": 0.5}}),
        CaffeLayerDef(name="det", type="DetectionOutput",
                      bottoms=["a", "b", "pb"], tops=["det"],
                      params={"detection_output": {
                          "num_classes": 2, "background_label_id": 0,
                          "nms_threshold": 0.45, "top_k": 400,
                          "keep_top_k": 200,
                          "confidence_threshold": 0.01}}),
    ]
    back = read_caffemodel_graph(write_caffemodel_graph(layers))
    assert [(b.name, b.type, b.bottoms, b.tops) for b in back] == \
        [(a.name, a.type, a.bottoms, a.tops) for a in layers]
    c = back[0].params["conv"]
    assert c["num_output"] == 8 and c["kernel"] == [3] and c["stride"] == [2]
    assert c["pad"] == [1] and c["bias_term"] is True
    np.testing.assert_allclose(back[0].blobs[0], layers[0].blobs[0])
    p = back[1].params["prior_box"]
    assert p["min_size"] == [30.0] and p["max_size"] == [60.0]
    assert p["aspect_ratio"] == [2.0] and p["step"] == 8.0
    np.testing.assert_allclose(p["variance"], [0.1, 0.1, 0.2, 0.2])
    d = back[2].params["detection_output"]
    assert d["keep_top_k"] == 200 and d["top_k"] == 400
    assert d["nms_threshold"] == pytest.approx(0.45)


def test_caffe_priorbox_ssd300_values():
    """First-cell priors of the conv4_3 ladder rung match prior_box_layer.cpp
    arithmetic: min square, sqrt(min*max) square, ar-2 pair."""
    p = {"min_size": [30.0], "max_size": [60.0], "aspect_ratio": [2.0],
         "flip": True, "clip": False, "variance": [0.1, 0.1, 0.2, 0.2],
         "step": 8.0, "offset": 0.5}
    corners, var = caffe_priorbox(38, 38, 300, 300, p)
    assert priors_per_cell(p) == 4
    assert corners.shape == (38 * 38 * 4, 4)
    cx = cy = 0.5 * 8 / 300
    s_min, s_max = 30 / 300, np.sqrt(30 * 60) / 300
    exp = np.array([
        [cx - s_min / 2, cy - s_min / 2, cx + s_min / 2, cy + s_min / 2],
        [cx - s_max / 2, cy - s_max / 2, cx + s_max / 2, cy + s_max / 2],
        [cx - s_min * np.sqrt(2) / 2, cy - s_min / np.sqrt(2) / 2,
         cx + s_min * np.sqrt(2) / 2, cy + s_min / np.sqrt(2) / 2],
        [cx - s_min / np.sqrt(2) / 2, cy - s_min * np.sqrt(2) / 2,
         cx + s_min / np.sqrt(2) / 2, cy + s_min * np.sqrt(2) / 2],
    ], np.float32)
    np.testing.assert_allclose(corners[:4], exp, atol=1e-6)
    np.testing.assert_allclose(var[0], [0.1, 0.1, 0.2, 0.2])


@pytest.fixture(scope="module")
def res10():
    net = CaffeGraphNet(res10_deploy_defs(), input_size=(300, 300))
    return net, net.init_variables()


def test_res10_topology(res10):
    """The deploy table reproduces the published ladder: 8732 priors over
    38/19/10/5/3/1 grids with 4/6/6/6/4/4 priors per cell."""
    net, _ = res10
    expected = 0
    grids = {"conv4_3_norm": 38, "fc7": 19, "conv6_2": 10, "conv7_2": 5,
             "conv8_2": 3, "conv9_2": 1}
    tops = {"conv4_3_norm": "conv4_3_norm", "fc7": "fc7",
            "conv6_2": "conv6_2_t", "conv7_2": "conv7_2_t",
            "conv8_2": "conv8_2_t", "conv9_2": "conv9_2_t"}
    for (src, mn, mx, ars, step, npc) in RES10_PRIOR_LADDER:
        g = grids[src]
        assert net.shapes[tops[src]][2:] == (g, g), src
        expected += g * g * npc
    assert expected == 8732
    assert net.priors.shape == (8732, 4)
    assert net.prior_variances.shape == (8732, 4)
    assert net.detection_cfg["num_classes"] == 2
    # head channel counts carry the prior multiplicity
    assert net.weights["conv4_3_norm_mbox_loc"][0].shape[0] == 16
    assert net.weights["fc7_mbox_loc"][0].shape[0] == 24
    assert net.weights["fc7_mbox_conf"][0].shape[0] == 12


def test_res10_apply_emits_mbox_pair(res10):
    import jax
    import jax.numpy as jnp

    net, weights = res10
    apply = jax.jit(lambda w, x: net.apply(w, x)["detection_out"])
    loc, conf = apply(weights, jnp.zeros((1, 300, 300, 3), jnp.float32))
    assert loc.shape == (1, 8732 * 4)
    assert conf.shape == (1, 8732 * 2)
    conf2 = np.asarray(conf).reshape(1, 8732, 2)
    np.testing.assert_allclose(conf2.sum(-1), 1.0, atol=1e-5)  # softmaxed


def test_res10_real_file_entry_path(res10, tmp_path, rng):
    """THE import scenario: a caffemodel whose bytes carry the full res10
    layer definitions + blobs (as real training snapshots do). Two
    independent construction paths — (a) pour by name into the deploy-table
    net, (b) execute the FILE's own embedded graph — must produce identical
    programs."""
    import jax
    import jax.numpy as jnp

    net, weights = res10
    # a synthetic "trained" snapshot: the deploy defs + random blobs
    defs = res10_deploy_defs()
    for L in defs:
        if L.name in weights:
            L.blobs = [rng.randn(*b.shape).astype(np.float32) * 0.05
                       for b in weights[L.name]]
            if L.type == "BatchNorm":
                L.blobs[1] = np.abs(L.blobs[1]) + 0.5   # positive variance
                L.blobs[2] = np.ones(1, np.float32)     # scale factor
    path = str(tmp_path / "res10_300x300_ssd_iter_140000.caffemodel")
    with open(path, "wb") as f:
        f.write(write_caffemodel_graph(defs))

    parsed = read_caffemodel_graph(path)
    poured = net.pour_blobs(parsed)                      # path (a)
    file_net = CaffeGraphNet(parsed, input_size=(300, 300))  # path (b)
    file_weights = file_net.init_variables()
    assert file_net.priors.shape == (8732, 4)
    np.testing.assert_allclose(file_net.priors, net.priors, atol=1e-6)

    x = jnp.asarray(rng.randn(1, 300, 300, 3).astype(np.float32))
    a_loc, a_conf = jax.jit(
        lambda w, i: net.apply(w, i)["detection_out"])(poured, x)
    b_loc, b_conf = jax.jit(
        lambda w, i: file_net.apply(w, i)["detection_out"])(file_weights, x)
    np.testing.assert_allclose(np.asarray(a_loc), np.asarray(b_loc),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_conf), np.asarray(b_conf),
                               atol=1e-5)


def test_res10_pour_diagnostics(res10, rng):
    """A mismatching file produces a per-layer diff, not a bare rejection."""
    net, weights = res10
    defs = res10_deploy_defs()
    bad = []
    for L in defs:
        if L.name in weights:
            L.blobs = [rng.randn(*b.shape).astype(np.float32)
                       for b in weights[L.name]]
            bad.append(L)
    # corrupt: rename one layer, mis-shape another
    bad[0].name = "conv1_RENAMED"
    bad[3].blobs[0] = bad[3].blobs[0][..., :1]
    with pytest.raises(ValueError) as e:
        net.pour_blobs(bad)
    msg = str(e.value)
    assert "MISSING" in msg and "vs net" in msg
    assert "per-layer diff" in msg


def test_res10_registry_and_engine_load(tmp_path, rng):
    """Engine entry path: EngineConfig(detector='res10-ssd') builds the
    deploy graph; load_weights('.caffemodel') pours the real-file bytes."""
    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)

    eng = FaceEngine(EngineConfig(detector="res10-ssd"))
    assert eng.input_size == (300, 300)
    defs = res10_deploy_defs()
    for L in defs:
        if L.name in eng.variables:
            L.blobs = [rng.randn(*np.asarray(b).shape).astype(np.float32)
                       for b in eng.variables[L.name]]
    path = str(tmp_path / "res10.caffemodel")
    with open(path, "wb") as f:
        f.write(write_caffemodel_graph(defs))
    old = {k: [np.asarray(x) for x in v] for k, v in eng.variables.items()}
    eng.load_weights(path)
    assert not np.allclose(eng.variables["conv1_h"][0], old["conv1_h"][0])
    np.testing.assert_allclose(eng.variables["conv1_h"][0],
                               dict((L.name, L.blobs) for L in defs
                                    if L.blobs)["conv1_h"][0].reshape(
                                        np.asarray(old["conv1_h"][0]).shape))


def test_caffe_graph_lrn_executes(rng):
    """A graph containing an LRN layer runs end-to-end, carries the layer's
    OWN local_size/alpha/beta/k through the protobuf wire format (the params
    were silently dropped before round 3c: _F_LRN was declared but never
    registered, so every parsed LRN fell back to defaults), and matches the
    channel-window LRN math."""
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.models.age_gender import _lrn
    from face_detection_and_recognition_tpu.utils.caffe_graph import (
        read_caffemodel_graph, write_caffemodel_graph)

    lrn_p = {"local_size": 3, "alpha": 2e-4, "beta": 0.6, "k": 2.0}
    layers = [
        CaffeLayerDef(name="conv1", type="Convolution", bottoms=["data"],
                      tops=["conv1"],
                      params={"conv": {"num_output": 8, "bias_term": True,
                                       "pad": [1], "kernel": [3],
                                       "stride": [1], "group": 1,
                                       "dilation": [1]}},
                      blobs=[rng.randn(8, 3, 3, 3).astype(np.float32) * 0.1,
                             rng.randn(8).astype(np.float32) * 0.1]),
        CaffeLayerDef(name="norm1", type="LRN", bottoms=["conv1"],
                      tops=["norm1"], params={"lrn": dict(lrn_p)}),
    ]
    # non-default params must survive the wire round-trip
    parsed = read_caffemodel_graph(write_caffemodel_graph(layers))
    got = parsed[1].params["lrn"]
    assert got["local_size"] == 3 and got["norm_region"] == 0
    np.testing.assert_allclose(
        [got["alpha"], got["beta"], got["k"]], [2e-4, 0.6, 2.0], rtol=1e-6)

    net = CaffeGraphNet(parsed, input_size=(16, 16))
    w = net.init_variables()
    x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    out = net.apply(w, x)["norm1"]
    conv_only = CaffeGraphNet(layers[:1], input_size=(16, 16))
    conv = conv_only.apply(w, x)["conv1"]
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(_lrn(conv, n=3, alpha=2e-4, beta=0.6, k=2.0)),
        rtol=1e-5, atol=1e-6)
    # an UNPARAMETERIZED LRN layer uses caffe.proto's defaults (alpha=1.0,
    # not the AlexNet-conventional 1e-4)
    plain = CaffeGraphNet(
        layers[:1] + [CaffeLayerDef(name="norm1", type="LRN",
                                    bottoms=["conv1"], tops=["norm1"])],
        input_size=(16, 16))
    out2 = plain.apply(w, x)["norm1"]
    np.testing.assert_allclose(
        np.asarray(out2),
        np.asarray(_lrn(conv, n=5, alpha=1.0, beta=0.75, k=1.0)),
        rtol=1e-5, atol=1e-6)


def test_detect_decodes_per_prior_variances(rng):
    """Two PriorBox levels carrying DIFFERENT variance vectors: the fused
    detect must decode every prior with its own variance row, not level 0's
    (pre-round-3 it applied variances[0] to all priors)."""
    import jax
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.models.caffe_ssd import (
        make_caffe_ssd_detect)

    def conv(name, bot, top, n_out, stride=1):
        return CaffeLayerDef(
            name=name, type="Convolution", bottoms=[bot], tops=[top],
            params={"conv": {"num_output": n_out, "bias_term": True,
                             "pad": [1], "kernel": [3], "stride": [stride],
                             "group": 1, "dilation": [1]}})

    def head(src, bot, variance):
        return [
            conv(f"{src}_loc", bot, f"{src}_loc", 4),
            CaffeLayerDef(name=f"{src}_loc_perm", type="Permute",
                          bottoms=[f"{src}_loc"], tops=[f"{src}_loc_perm"],
                          params={"permute": {"order": [0, 2, 3, 1]}}),
            CaffeLayerDef(name=f"{src}_loc_flat", type="Flatten",
                          bottoms=[f"{src}_loc_perm"],
                          tops=[f"{src}_loc_flat"],
                          params={"flatten": {"axis": 1}}),
            conv(f"{src}_conf", bot, f"{src}_conf", 2),
            CaffeLayerDef(name=f"{src}_conf_perm", type="Permute",
                          bottoms=[f"{src}_conf"], tops=[f"{src}_conf_perm"],
                          params={"permute": {"order": [0, 2, 3, 1]}}),
            CaffeLayerDef(name=f"{src}_conf_flat", type="Flatten",
                          bottoms=[f"{src}_conf_perm"],
                          tops=[f"{src}_conf_flat"],
                          params={"flatten": {"axis": 1}}),
            CaffeLayerDef(name=f"{src}_pb", type="PriorBox",
                          bottoms=[bot, "data"], tops=[f"{src}_pb"],
                          params={"prior_box": {
                              "min_size": [4.0], "max_size": [],
                              "aspect_ratio": [], "flip": True,
                              "clip": False, "variance": variance,
                              "step": None, "offset": 0.5}}),
        ]

    layers = [conv("feat_a", "data", "feat_a", 8, stride=2),
              conv("feat_b", "feat_a", "feat_b", 8, stride=2)]
    layers += head("a", "feat_a", [0.1, 0.1, 0.2, 0.2])
    layers += head("b", "feat_b", [0.3, 0.3, 0.15, 0.15])
    layers += [
        CaffeLayerDef(name="mbox_loc", type="Concat",
                      bottoms=["a_loc_flat", "b_loc_flat"],
                      tops=["mbox_loc"], params={"concat": {"axis": 1}}),
        CaffeLayerDef(name="mbox_conf", type="Concat",
                      bottoms=["a_conf_flat", "b_conf_flat"],
                      tops=["mbox_conf"], params={"concat": {"axis": 1}}),
        CaffeLayerDef(name="mbox_pb", type="Concat",
                      bottoms=["a_pb", "b_pb"], tops=["mbox_pb"],
                      params={"concat": {"axis": 2}}),
        CaffeLayerDef(name="mbox_conf_reshape", type="Reshape",
                      bottoms=["mbox_conf"], tops=["mbox_conf_reshape"],
                      params={"reshape": {"shape": [0, -1, 2]}}),
        CaffeLayerDef(name="mbox_conf_softmax", type="Softmax",
                      bottoms=["mbox_conf_reshape"],
                      tops=["mbox_conf_softmax"],
                      params={"softmax": {"axis": 2}}),
        CaffeLayerDef(name="mbox_conf_flatten", type="Flatten",
                      bottoms=["mbox_conf_softmax"],
                      tops=["mbox_conf_flatten"],
                      params={"flatten": {"axis": 1}}),
        CaffeLayerDef(name="det", type="DetectionOutput",
                      bottoms=["mbox_loc", "mbox_conf_flatten", "mbox_pb"],
                      tops=["det"],
                      params={"detection_output": {
                          "num_classes": 2, "background_label_id": 0,
                          "nms_threshold": 0.45, "top_k": 400,
                          "keep_top_k": 10,
                          "confidence_threshold": 0.01}}),
    ]
    net = CaffeGraphNet(layers, input_size=(16, 16))
    w = net.init_variables()
    n = len(net.priors)
    assert n == 8 * 8 + 4 * 4
    # the two levels really carry different variance tables
    assert not np.allclose(net.prior_variances[0], net.prior_variances[-1])

    detect = jax.jit(make_caffe_ssd_detect(net))
    x = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    dets, valid = detect(w, x)
    dets = np.asarray(dets)[0]

    # independent numpy decode with per-prior variances
    out = net.apply(w, x)
    loc, conf = out["det"]
    locs = np.asarray(loc, np.float64).reshape(n, 4)
    probs = np.asarray(conf, np.float64).reshape(n, 2)[:, 1]
    pri = net.priors.astype(np.float64)
    pcx = (pri[:, 0] + pri[:, 2]) / 2
    pcy = (pri[:, 1] + pri[:, 3]) / 2
    pw = pri[:, 2] - pri[:, 0]
    ph = pri[:, 3] - pri[:, 1]
    v = net.prior_variances.astype(np.float64)
    cx = pcx + locs[:, 0] * v[:, 0] * pw
    cy = pcy + locs[:, 1] * v[:, 1] * ph
    bw = pw * np.exp(locs[:, 2] * v[:, 2])
    bh = ph * np.exp(locs[:, 3] * v[:, 3])
    boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], 1)

    top = int(np.argmax(probs))
    assert bool(np.asarray(valid)[0, 0])
    np.testing.assert_allclose(dets[0, 4], probs[top], rtol=1e-5)
    np.testing.assert_allclose(dets[0, :4], boxes[top], rtol=1e-4, atol=1e-5)


def test_res10_build_respects_dtype(rng):
    """build_res10(dtype=bf16) runs the graph in bf16 (pre-round-3 the
    dtype silently fell back to f32) while the decode stays f32."""
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.models.res10 import build_res10

    net, weights, detect = build_res10(dtype=jnp.bfloat16)
    x = jnp.asarray(rng.randn(1, 300, 300, 3).astype(np.float32))
    out = net.apply(weights, x.astype(jnp.bfloat16))
    loc, conf = out["detection_out"]
    assert loc.dtype == jnp.bfloat16      # graph ran in the compute dtype
    dets, valid = detect(weights, x)
    assert dets.dtype == jnp.float32      # decode upcasts
    assert np.isfinite(np.asarray(dets)).all()


def test_permute_flatten_is_cell_major():
    """The SSD head flatten order is SPEC-pinned: Permute(0,2,3,1) +
    Flatten must emit (h, w, channel) cell-major order — the order real
    caffemodels' head weights assume — while a plain Flatten stays
    channel-major (NCHW). Round 4 found the heads flattening
    channel-major: invisible to self-consistent training, fatal to real
    vendor weights (a conf-bias shift arrived at the wrong softmax
    pairs)."""
    import jax
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.models.caffe_ssd import (
        CaffeGraphNet)
    from face_detection_and_recognition_tpu.utils.caffe_graph import (
        CaffeLayerDef)

    defs = [
        CaffeLayerDef(name="convA", type="Convolution", bottoms=["data"],
                      tops=["convA"],
                      params={"conv": {"num_output": 4, "bias_term": False,
                                       "pad": [0], "kernel": [1],
                                       "stride": [1], "group": 1,
                                       "dilation": [1]}}),
        CaffeLayerDef(name="perm", type="Permute", bottoms=["convA"],
                      tops=["perm"],
                      params={"permute": {"order": [0, 2, 3, 1]}}),
        CaffeLayerDef(name="flat_cell", type="Flatten", bottoms=["perm"],
                      tops=["flat_cell"], params={"flatten": {"axis": 1}}),
        CaffeLayerDef(name="flat_chan", type="Flatten", bottoms=["convA"],
                      tops=["flat_chan"], params={"flatten": {"axis": 1}}),
    ]
    net = CaffeGraphNet(defs, input_size=(2, 2), rng=jax.random.PRNGKey(0))
    # identity-pick kernel: out channel c = in channel c (1x1 conv, eye)
    w = np.zeros((4, 3, 1, 1), np.float32)
    for c in range(3):
        w[c, c, 0, 0] = 1.0
    weights = {"convA": [w]}
    # labeled input: value encodes (channel, y, x) as c*100 + y*10 + x
    x = np.zeros((1, 2, 2, 3), np.float32)
    for y in range(2):
        for x_ in range(2):
            for c in range(3):
                x[0, y, x_, c] = c * 100 + y * 10 + x_
    env = net.apply(weights, jnp.asarray(x),
                    taps=("flat_cell", "flat_chan"))
    cell = np.asarray(env["flat_cell"])[0]
    chan = np.asarray(env["flat_chan"])[0]
    # cell-major: (y0,x0: c0,c1,c2,c3), (y0,x1: ...), ...
    expect_cell = []
    for y in range(2):
        for x_ in range(2):
            expect_cell += [c * 100 + y * 10 + x_ for c in range(3)] + [0.0]
    np.testing.assert_allclose(cell, expect_cell)
    # channel-major: (c0: all cells), (c1: all cells), ...
    expect_chan = []
    for c in range(3):
        expect_chan += [c * 100 + y * 10 + x_
                        for y in range(2) for x_ in range(2)]
    expect_chan += [0.0] * 4
    np.testing.assert_allclose(chan, expect_chan)
