"""BlazeFace postprocessing-chain parity: decode + clip/sigmoid + threshold +
weighted-blend NMS on synthetic raw head tensors, ours vs the reference's
_tensors_to_detections + _weighted_non_max_suppression with OUR generated
anchors — proving the full postproc pipeline (not just the net) matches."""
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.parity  # parity lane (pyproject addopts)

REF = "/root/reference/face_detection_and_extraction"


def test_postproc_chain_matches_reference(rng):
    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    from modules.blazeface.blazeface import BlazeFace as TorchBlazeFace

    from face_detection_and_recognition_tpu.models import blazeface as BF
    from face_detection_and_recognition_tpu.ops.nms import weighted_blend_nms

    tnet = TorchBlazeFace(back_model=False).eval()
    anchors = BF.generate_anchors()
    tnet.anchors = torch.from_numpy(anchors)

    # synthetic raw heads: ~30 anchors confident, clustered boxes so the
    # weighted blending path actually executes. w/h (cols 2,3) kept positive
    # — the reference's while-loop NMS live-locks on inverted boxes
    raw_boxes = rng.uniform(-10, 10, (1, 896, 16)).astype(np.float32)
    raw_boxes[..., 2:4] = rng.uniform(8.0, 40.0, (1, 896, 2))
    raw_scores = np.full((1, 896, 1), -4.0, np.float32)
    hot = rng.choice(896, 30, replace=False)
    raw_scores[0, hot, 0] = rng.uniform(1.2, 4.0, 30)
    # make half the hot anchors share near-identical decoded boxes
    raw_boxes[0, hot[:15]] = raw_boxes[0, hot[0]] + rng.uniform(
        -0.5, 0.5, (15, 16)
    ).astype(np.float32)
    raw_boxes[0, hot[:15], 2:4] = np.abs(raw_boxes[0, hot[:15], 2:4]) + 8.0

    # reference chain
    with torch.no_grad():
        dets_list = tnet._tensors_to_detections(
            torch.from_numpy(raw_boxes), torch.from_numpy(raw_scores),
            tnet.anchors,
        )
        faces = tnet._weighted_non_max_suppression(dets_list[0])
        ref = (torch.stack(faces).numpy() if faces else np.zeros((0, 17)))

    # our chain (same config: front thresh 0.75, suppression 0.3)
    import jax
    import jax.numpy as jnp

    boxes = BF.decode_boxes(jnp.asarray(raw_boxes), jnp.asarray(anchors), 128.0)
    scores = jax.nn.sigmoid(jnp.clip(jnp.asarray(raw_scores)[..., 0], -100, 100))
    mask = scores >= tnet.min_score_thresh
    dets = jnp.concatenate([boxes, scores[..., None]], axis=-1)
    out, valid = weighted_blend_nms(dets[0], mask[0], 0.3, max_out=64)
    got = np.asarray(out)[np.asarray(valid)]

    assert len(got) == len(ref)
    ref_sorted = ref[np.argsort(-ref[:, 16], kind="stable")]
    got_sorted = got[np.argsort(-got[:, 16], kind="stable")]
    np.testing.assert_allclose(got_sorted, ref_sorted, rtol=1e-3, atol=1e-4)
    # blending actually happened (merged cluster carries averaged score)
    assert len(got) < int(np.asarray(mask).sum())
