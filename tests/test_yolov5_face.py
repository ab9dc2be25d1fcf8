"""YOLOv5-face: builder shapes, decode parity vs a numpy loop reference, and
block-level parity vs small inline torch modules."""
import numpy as np
import pytest

from face_detection_and_recognition_tpu.models import yolov5_face as Y5


def test_builder_shapes_yolov5n():
    import jax
    import jax.numpy as jnp

    cfg = Y5.YoloV5FaceConfig(arch="yolov5n", input_size=(320, 320),
                              max_candidates=512, max_det=64)
    net, variables, detect = Y5.make_yolov5_face(cfg)
    x = jnp.zeros((1, 320, 320, 3), jnp.float32)
    maps = jax.jit(net.apply)(variables, x)
    assert len(maps) == 3
    assert maps[0].shape == (1, 3, 40, 40, 16)   # P3/8
    assert maps[1].shape == (1, 3, 20, 20, 16)   # P4/16
    assert maps[2].shape == (1, 3, 10, 10, 16)   # P5/32
    dets, valid = detect(variables, x)
    assert dets.shape == (1, 64, 16)
    assert valid.shape == (1, 64)


def test_builder_channel_widths_yolov5s():
    """yolov5s-face: width_multiple 0.35 -> stem 24ch, P5 feats 360ch."""
    import jax.numpy as jnp

    net = Y5.YoloV5FaceNet(arch="yolov5s")
    import jax

    variables = jax.jit(net.init)(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 64, 64, 3), jnp.float32))
    p = variables["params"]
    # make_divisible(64*0.35, 8) = 24
    assert p["layer0"]["ConvBN_0"]["Conv_0"]["kernel"].shape[-1] == 24
    # make_divisible(1024*0.35, 8) = 360
    assert p["layer8"]["ConvBN_2"]["Conv_0"]["kernel"].shape[-1] == 360


def ref_decode(maps, anchors, strides, nc=1):
    """Numpy loop reference for conv_strides_to_anchors (onnx_utils.py:30-73)."""

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    outs = []
    for x, anc, stride in zip(maps, anchors, strides):
        b, na, ny, nx, no = x.shape
        y = np.zeros_like(x)
        cols = [0, 1, 2, 3, 4] + list(range(15, 15 + nc))
        y[..., cols] = sigmoid(x[..., cols])
        y[..., 5:15] = x[..., 5:15]
        gy, gx = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
        grid = np.stack([gx, gy], -1)[None, None].astype(np.float32)
        anc = np.asarray(anc, np.float32).reshape(1, na, 1, 1, 2)
        y[..., 0:2] = (y[..., 0:2] * 2 - 0.5 + grid) * stride
        y[..., 2:4] = (y[..., 2:4] * 2) ** 2 * anc
        for k in range(5):
            sl = slice(5 + 2 * k, 7 + 2 * k)
            y[..., sl] = y[..., sl] * anc + grid * stride
        outs.append(y.reshape(b, -1, no))
    return np.concatenate(outs, 1)


def test_decode_matches_loop_reference(rng):
    shapes = [(2, 3, 8, 8, 16), (2, 3, 4, 4, 16), (2, 3, 2, 2, 16)]
    maps = [rng.uniform(-3, 3, s).astype(np.float32) for s in shapes]
    got = np.asarray(
        Y5.decode_heads(
            [np.asarray(m) for m in maps], Y5.FACE_ANCHORS, (8, 16, 32)
        )
    )
    # our decode emits [xy, wh, obj, lmks, cls]; the loop reference keeps the
    # original column order [xy, wh, obj, lmks, cls] too
    ref = ref_decode(maps, Y5.FACE_ANCHORS, (8, 16, 32))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_convbn_matches_torch(rng):
    """ConvBN (SiLU, BN eps=1e-3) vs an inline torch equivalent."""
    torch = pytest.importorskip("torch")
    import jax

    from face_detection_and_recognition_tpu.models.layers import ConvBN
    from face_detection_and_recognition_tpu.utils.weights import bn_entries, conv_entry

    tconv = torch.nn.Sequential(
        torch.nn.Conv2d(8, 16, 3, 2, 1, bias=False),
        torch.nn.BatchNorm2d(16, eps=1e-3),
        torch.nn.SiLU(),
    ).eval()
    with torch.no_grad():
        tconv[1].running_mean.uniform_(-1, 1)
        tconv[1].running_var.uniform_(0.5, 2)
        tconv[1].weight.uniform_(0.5, 1.5)
        tconv[1].bias.uniform_(-0.5, 0.5)
    sd = {f"c.{k}": v for k, v in tconv[0].state_dict().items()}
    sd.update({f"b.{k}": v for k, v in tconv[1].state_dict().items()})

    bn_p, bn_s = bn_entries(sd, "b")
    variables = {
        "params": {"Conv_0": conv_entry(sd, "c", bias=False), "BatchNorm_0": bn_p},
        "batch_stats": {"BatchNorm_0": bn_s},
    }
    x = rng.uniform(-1, 1, (2, 16, 16, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(
        jax.jit(ConvBN(16, 3, 2).apply)(variables, x)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_postprocess_suppresses_duplicates():
    cfg = Y5.YoloV5FaceConfig(max_candidates=32, max_det=8)
    pred = np.zeros((1, 64, 16), np.float32)
    # two near-identical faces + one distinct, xywh format in pixels
    pred[0, 0] = [100, 100, 50, 60, 0.9] + [0] * 10 + [0.8]
    pred[0, 1] = [102, 101, 50, 60, 0.8] + [0] * 10 + [0.8]
    pred[0, 2] = [300, 300, 80, 80, 0.7] + [0] * 10 + [0.9]
    dets, valid = Y5.yolov5_face_postprocess(pred, cfg)
    dets, valid = np.asarray(dets), np.asarray(valid)
    assert valid[0].sum() == 2
    kept = dets[0][valid[0]]
    assert kept[0, 4] == pytest.approx(0.9)   # sorted by obj conf
    # xywh -> xyxy conversion applied
    np.testing.assert_allclose(kept[0, :4], [75, 70, 125, 130])


@pytest.mark.slow
def test_detect_maps_matches_fullgrid_path(rng):
    """Candidates-first fused path (top-k on raw logits -> gather -> decode
    -> NMS) is bit-identical on valid rows to decode_heads + postprocess,
    for square and non-square inputs and in bf16."""
    import jax
    import jax.numpy as jnp

    for input_size, dtype in (((320, 320), jnp.float32),
                              ((320, 256), jnp.float32),
                              ((320, 320), jnp.bfloat16)):
        cfg = Y5.YoloV5FaceConfig(arch="yolov5n", input_size=input_size,
                                  max_candidates=256, max_det=32)
        w, h = input_size
        net = Y5.YoloV5FaceNet(arch=cfg.arch, nc=cfg.nc, dtype=dtype)
        variables = jax.jit(net.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
        x = jnp.asarray(rng.rand(2, h, w, 3), jnp.float32)
        maps = jax.jit(net.apply)(variables, x)
        spec = Y5.ARCHS[cfg.arch]

        d1, v1 = jax.jit(lambda m: Y5.yolov5_face_postprocess(
            Y5.decode_heads(m, spec["anchors"], spec["strides"], cfg.nc),
            cfg))(maps)
        d2, v2 = jax.jit(lambda m: Y5.yolov5_face_detect_maps(
            m, spec["anchors"], spec["strides"], cfg))(maps)
        d1, v1, d2, v2 = map(np.asarray, (d1, v1, d2, v2))
        assert (v1 == v2).all()
        mask = v1
        np.testing.assert_array_equal(d1[mask], d2[mask])


@pytest.mark.slow
def test_official_detect_maps_matches_fullgrid_path(rng):
    """Official (multiclass) candidates-first path == decode_heads +
    yolov5_official_postprocess on valid rows."""
    import jax
    import jax.numpy as jnp

    cfg = Y5.YoloV5FaceConfig(arch="yolov5n", nc=4, input_size=(320, 320),
                              max_candidates=256, max_det=32,
                              conf_thres=0.25, iou_thres=0.45)
    net = Y5.YoloV5FaceNet(arch=cfg.arch, nc=cfg.nc, with_landmarks=False)
    variables = jax.jit(net.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 320, 320, 3), jnp.float32))
    x = jnp.asarray(rng.rand(2, 320, 320, 3), jnp.float32)
    maps = jax.jit(net.apply)(variables, x)
    spec = Y5.ARCHS[cfg.arch]

    d1, v1 = jax.jit(lambda m: Y5.yolov5_official_postprocess(
        Y5.decode_heads(m, Y5.OFFICIAL_ANCHORS, spec["strides"], cfg.nc,
                        landmarks=False), cfg))(maps)
    d2, v2 = jax.jit(lambda m: Y5.yolov5_official_detect_maps(
        m, Y5.OFFICIAL_ANCHORS, spec["strides"], cfg))(maps)
    d1, v1, d2, v2 = map(np.asarray, (d1, v1, d2, v2))
    assert (v1 == v2).all()
    np.testing.assert_array_equal(d1[v1], d2[v1])
