"""In-environment golden accuracy loop for the MTCNN cascade — the last
detector family without an executed result.

Trains P/R/O-Net (models/mtcnn.py) the classic way (Zhang et al. 2016,
the recipe behind the reference's mtcnn pip / tf_mtcnn_fast weights,
``modules/mtcnn/model.py``): square crops sampled around/away from GT
labeled positive (IoU>0.65, with box-offset regression), part (0.4-0.65,
regression only) and negative (IoU<0.3, classification only), at each
stage's input size (12/24/48). Regression targets are the EXACT inverse of
the cascade's decode: stage-1 offsets normalized by w=x2-x1, R/O-Net by the
facenet +1 widths (``_bbreg``). Landmarks get pseudo-targets at canonical
relative face positions so the O-Net landmark decode stays meaningful
(no landmark GT exists in-environment; the golden gate scores boxes).

The gate is the shared one: the full jitted pyramid+cascade on the golden
image finds the 3 pinned faces (IoU >= 0.5) and nothing on the 0-face
image, then checkpoint -> engine.load_weights -> regate.
"""
from __future__ import annotations

import os
import random
from typing import Dict, List, Tuple

import cv2
import numpy as np

from .golden import (bbox_iou_xyxy, evaluate_golden, make_composite_dataset)

# canonical landmark positions relative to a face box (x_frac, y_frac):
# left eye, right eye, nose, left mouth corner, right mouth corner
_CANON_LMK = np.array([[0.31, 0.38], [0.69, 0.38], [0.50, 0.58],
                       [0.35, 0.78], [0.65, 0.78]], np.float32)


def _square_jitter(rng: random.Random, box: np.ndarray,
                   pos: bool) -> np.ndarray:
    """A jittered SQUARE crop box around (pos) or loosely near (part) a GT
    box — mirrors the cascade's rerec'd proposals."""
    x1, y1, x2, y2 = box
    w, h = x2 - x1, y2 - y1
    l = max(w, h)
    cx, cy = x1 + w / 2, y1 + h / 2
    if pos:
        s = l * rng.uniform(0.9, 1.15)
        cx += rng.uniform(-0.1, 0.1) * l
        cy += rng.uniform(-0.1, 0.1) * l
    else:  # part-face range
        s = l * rng.uniform(0.7, 1.5)
        cx += rng.uniform(-0.3, 0.3) * l
        cy += rng.uniform(-0.3, 0.3) * l
    return np.array([cx - s / 2, cy - s / 2, cx + s / 2, cy + s / 2],
                    np.float32)


def _crop_norm(img: np.ndarray, box: np.ndarray, size: int,
               pad_crop: bool = False) -> np.ndarray:
    """Crop a (possibly out-of-frame) square box with zero padding OUTSIDE
    the frame — the cascade's crop_and_resize_padded convention — resized to
    [size,size,3], RGB, normalized (x-127.5)/128.

    pad_crop=True uses the R/O-Net deployment geometry (facenet pad():
    1-based boxes, so origin (x1-1, y1-1), size (x2-x1+1, y2-y1+1));
    P-Net patches (applied convolutionally, never via pad()) keep the plain
    [x1, x2) crop."""
    h, w = img.shape[:2]
    x1, y1, x2, y2 = [int(round(v)) for v in box]
    if pad_crop:
        side_x, side_y = max(x2 - x1 + 1, 1), max(y2 - y1 + 1, 1)
        ox, oy = x1 - 1, y1 - 1
    else:
        side_x, side_y = max(x2 - x1, 1), max(y2 - y1, 1)
        ox, oy = x1, y1
    canvas = np.zeros((side_y, side_x, 3), np.uint8)
    sx1, sy1 = max(ox, 0), max(oy, 0)
    sx2, sy2 = min(ox + side_x, w), min(oy + side_y, h)
    if sx2 > sx1 and sy2 > sy1:
        canvas[sy1 - oy:sy2 - oy, sx1 - ox:sx2 - ox] = img[sy1:sy2, sx1:sx2]
    crop = cv2.resize(canvas, (size, size))
    rgb = crop[..., ::-1].astype(np.float32)
    return (rgb - 127.5) * 0.0078125


def _reg_target(crop_box: np.ndarray, gt: np.ndarray,
                plus1: bool) -> np.ndarray:
    """Offset targets matching the cascade's decode: stage-1 normalizes by
    w = x2-x1 (plus1=False), R/O-Net by w = x2-x1+1 (``_bbreg``)."""
    w = crop_box[2] - crop_box[0] + (1.0 if plus1 else 0.0)
    h = crop_box[3] - crop_box[1] + (1.0 if plus1 else 0.0)
    return np.array([(gt[0] - crop_box[0]) / w, (gt[1] - crop_box[1]) / h,
                     (gt[2] - crop_box[2]) / w, (gt[3] - crop_box[3]) / h],
                    np.float32)


def _lmk_target(crop_box: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Pseudo landmark targets in the O-Net decode convention: the cascade
    emits lx = (w+1)*lmk + x1 - 1, so the target is (px - x1 + 1)/(w+1)."""
    w = crop_box[2] - crop_box[0] + 1.0
    h = crop_box[3] - crop_box[1] + 1.0
    gw, gh = gt[2] - gt[0], gt[3] - gt[1]
    px = gt[0] + _CANON_LMK[:, 0] * gw
    py = gt[1] + _CANON_LMK[:, 1] * gh
    return np.concatenate([(px - crop_box[0] + 1.0) / w,
                           (py - crop_box[1] + 1.0) / h]).astype(np.float32)


def build_stage_buffer(
    index: List[Tuple[str, np.ndarray]],
    size: int,
    n: int,
    seed: int = 0,
    neg_frac: float = 0.5,
) -> Dict[str, np.ndarray]:
    """[n] crops for one stage: x [n,S,S,3] f32 normalized, cls [n] (1 face /
    0 not), cls_mask [n] (parts excluded), reg [n,4], reg_mask [n],
    lmk [n,10], lmk_mask [n]."""
    rng = random.Random(seed)
    imgs: Dict[str, np.ndarray] = {}

    def load(i):
        p, _ = index[i]
        if p not in imgs:
            imgs[p] = cv2.imread(p)
        return imgs[p], index[i][1]

    xs = np.zeros((n, size, size, 3), np.float32)
    cls = np.zeros((n,), np.int32)
    cls_mask = np.ones((n,), np.float32)
    reg = np.zeros((n, 4), np.float32)
    reg_mask = np.zeros((n,), np.float32)
    lmk = np.zeros((n, 10), np.float32)
    lmk_mask = np.zeros((n,), np.float32)
    plus1 = size != 12
    i = 0
    guard = 0
    while i < n and guard < n * 60:
        guard += 1
        img, boxes_xywh = load(rng.randrange(len(index)))
        if img is None:
            continue
        h, w = img.shape[:2]
        gts = np.asarray(boxes_xywh, np.float32).reshape(-1, 4).copy()
        if len(gts):
            gts[:, 2:] += gts[:, :2]           # xywh -> xyxy
        r = rng.random()
        if r < neg_frac or not len(gts):
            # negative: half uniform random squares, half HARD negatives
            # hugging a GT (jaw/shoulder/ear patches — without these the
            # cascade confidently fires on part-face regions)
            if len(gts) and rng.random() < 0.5:
                g = gts[rng.randrange(len(gts))]
                gl = max(g[2] - g[0], g[3] - g[1])
                side = gl * rng.uniform(0.3, 1.2)
                cx = (g[0] + g[2]) / 2 + rng.uniform(-1.0, 1.0) * gl
                cy = (g[1] + g[3]) / 2 + rng.uniform(-1.0, 1.0) * gl
                cb = np.array([cx - side / 2, cy - side / 2,
                               cx + side / 2, cy + side / 2], np.float32)
            else:
                side = rng.uniform(12, max(min(h, w) / 2.0, 13))
                x0 = rng.uniform(0, max(w - side, 1))
                y0 = rng.uniform(0, max(h - side, 1))
                cb = np.array([x0, y0, x0 + side, y0 + side], np.float32)
            if len(gts) and max(bbox_iou_xyxy(cb, g) for g in gts) >= 0.3:
                continue
            xs[i] = _crop_norm(img, cb, size, pad_crop=plus1)
            cls[i] = 0
            i += 1
            continue
        g = gts[rng.randrange(len(gts))]
        want_pos = r < neg_frac + (1.0 - neg_frac) * 0.6
        cb = _square_jitter(rng, g, pos=want_pos)
        iou = bbox_iou_xyxy(cb, g)
        if iou > 0.65:
            xs[i] = _crop_norm(img, cb, size, pad_crop=plus1)
            cls[i] = 1
            reg[i] = _reg_target(cb, g, plus1)
            reg_mask[i] = 1.0
            lmk[i] = _lmk_target(cb, g)
            lmk_mask[i] = 1.0
            i += 1
        elif 0.4 <= iou <= 0.65:
            xs[i] = _crop_norm(img, cb, size, pad_crop=plus1)
            cls_mask[i] = 0.0                  # part face: regression only
            reg[i] = _reg_target(cb, g, plus1)
            reg_mask[i] = 1.0
            i += 1
    if i < n:
        raise RuntimeError(f"stage-{size} sampler starved at {i}/{n}")
    return {"x": xs, "cls": cls, "cls_mask": cls_mask, "reg": reg,
            "reg_mask": reg_mask, "lmk": lmk, "lmk_mask": lmk_mask}


def train_golden_mtcnn(
    ckpt_out: str,
    work_dir: str,
    n_images: int = 256,
    n_crops: int = 4096,
    batch_size: int = 128,
    max_steps: int = 3000,
    eval_every: int = 500,
    lr: float = 1e-3,
    seed: int = 0,
    log=print,
) -> Dict[str, object]:
    """Train all three nets on composite-sampled crops, gate the full
    cascade on the golden pair, checkpoint, reload, regate."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..core.engine import EngineConfig, FaceEngine
    from ..models.mtcnn import ONet, PNet, RNet
    from .data import load_wider_index

    ann, images_root = make_composite_dataset(
        os.path.join(work_dir, "golden_ds"), n_images=n_images,
        out_wh=(640, 640), seed=seed)
    index = load_wider_index(ann, images_root)
    log(f"[golden-mtcnn] dataset: {len(index)} images")

    nets = {"pnet": PNet(), "rnet": RNet(), "onet": ONet()}
    sizes = {"pnet": 12, "rnet": 24, "onet": 48}
    rng0 = jax.random.PRNGKey(seed)
    keys = dict(zip(nets, jax.random.split(rng0, 3)))
    variables = {}
    tx = optax.adamw(lr, weight_decay=1e-4)

    engine = FaceEngine(EngineConfig(detector="mtcnn", det_thres=0.5))

    def make_trainer(name, net):
        s = sizes[name]

        def loss_fn(params, x, c, cm, r, rm, l, lm):
            out = net.apply({"params": params}, x)
            prob, reg = out[0], out[1]
            p = jnp.clip(prob, 1e-7, 1.0)
            if name == "pnet":                 # fully-conv: [B,1,1,2]/[B,1,1,4]
                p = p.reshape(p.shape[0], -1)[:, -2:]
                reg = reg.reshape(reg.shape[0], -1)[:, -4:]
            ce = -(c * jnp.log(p[:, 1]) + (1 - c) * jnp.log(p[:, 0]))
            l_cls = jnp.sum(ce * cm) / jnp.maximum(jnp.sum(cm), 1.0)
            l_reg = jnp.sum(jnp.sum((reg - r) ** 2, -1) * rm) \
                / jnp.maximum(jnp.sum(rm), 1.0)
            l_lmk = 0.0
            if name == "onet":
                lpred = out[2]
                l_lmk = jnp.sum(jnp.sum((lpred - l) ** 2, -1) * lm) \
                    / jnp.maximum(jnp.sum(lm), 1.0)
            return l_cls + 0.5 * l_reg + 0.5 * l_lmk, (l_cls, l_reg)

        # data buffers are ARGUMENTS, not closure captures: captured arrays
        # ship as constants inside the compile request, and the onet buffer
        # alone can exceed the remote-compile size limit (HTTP 413)
        def chunk(params, opt, key, data, steps):
            def body(carry, _):
                params, opt, key = carry
                key, k_idx = jax.random.split(key)
                idx = jax.random.randint(k_idx, (batch_size,), 0,
                                         data[0].shape[0])
                args = [jnp.take(d, idx, axis=0) for d in data]
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, *args)
                updates, opt = tx.update(grads, opt, params)
                params = optax.apply_updates(params, updates)
                return (params, opt, key), loss

            (params, opt, key), losses = jax.lax.scan(
                body, (params, opt, key), None, length=steps)
            return params, opt, key, jnp.mean(losses)

        jchunk = jax.jit(chunk, static_argnames=("steps",),
                         donate_argnums=(0, 1))

        def train(params, data, steps_total, tag=""):
            data_args = tuple(jax.device_put(data[k]) for k in
                              ("x", "cls", "cls_mask", "reg", "reg_mask",
                               "lmk", "lmk_mask"))
            opt = tx.init(params)
            key = jax.random.fold_in(rng0, s + len(tag))
            done = 0
            while done < steps_total:
                steps = min(eval_every, steps_total - done)
                params, opt, key, loss = jchunk(params, opt, key,
                                                data_args, steps)
                done += steps
                log(f"[golden-mtcnn] {name}{tag} step {done} "
                    f"loss {float(loss):.4f}")
            return params

        return train

    trainers = {}
    stage_data = {}
    for name, net in nets.items():
        s = sizes[name]
        stage_data[name] = build_stage_buffer(index, s, n_crops,
                                              seed=seed + s)
        v0 = jax.jit(net.init)(keys[name], jnp.zeros((1, s, s, 3)))
        trainers[name] = make_trainer(name, net)
        variables[name] = {"params": trainers[name](
            v0["params"], stage_data[name], max_steps)}

    def mine_false_positives(variables, max_fp: int = 1024):
        """Run the TRAINED cascade over training images and collect boxes
        that survive all three stages with IoU < 0.3 vs every GT — the
        classic bootstrapped hard negatives (pos=stage-(n) FPs train
        stage n+1 in Zhang et al.; here they re-train R/O)."""
        engine.variables = variables
        fps: List[Tuple[str, np.ndarray]] = []
        for p, boxes_xywh in index:
            if len(fps) >= max_fp:
                break
            img = cv2.imread(p)
            if img is None or img.shape[:2] != (640, 640):
                continue
            post = engine.detect_image(img)
            pred = np.asarray(post.boxes, np.float32).reshape(-1, 4)
            gts = np.asarray(boxes_xywh, np.float32).reshape(-1, 4).copy()
            if len(gts):
                gts[:, 2:] += gts[:, :2]
            for b in pred:
                if not len(gts) or max(bbox_iou_xyxy(b, g)
                                       for g in gts) < 0.3:
                    fps.append((p, b))
        return fps

    def extend_with_fps(data: Dict[str, np.ndarray], fps, size: int):
        imgs: Dict[str, np.ndarray] = {}
        xs = []
        for p, b in fps:
            if p not in imgs:
                imgs[p] = cv2.imread(p)
            # square the FP box like the cascade's rerec before cropping
            w, h = b[2] - b[0], b[3] - b[1]
            l = max(w, h)
            cx, cy = b[0] + w / 2, b[1] + h / 2
            sq = np.array([cx - l / 2, cy - l / 2, cx + l / 2, cy + l / 2],
                          np.float32)
            xs.append(_crop_norm(imgs[p], sq, size, pad_crop=size != 12))
        n = len(xs)
        if n == 0:
            return data
        return {
            "x": np.concatenate([data["x"], np.stack(xs)]),
            "cls": np.concatenate([data["cls"], np.zeros((n,), np.int32)]),
            "cls_mask": np.concatenate([data["cls_mask"],
                                        np.ones((n,), np.float32)]),
            "reg": np.concatenate([data["reg"], np.zeros((n, 4), np.float32)]),
            "reg_mask": np.concatenate([data["reg_mask"],
                                        np.zeros((n,), np.float32)]),
            "lmk": np.concatenate([data["lmk"],
                                   np.zeros((n, 10), np.float32)]),
            "lmk_mask": np.concatenate([data["lmk_mask"],
                                        np.zeros((n,), np.float32)]),
        }

    # bootstrap rounds: mine the cascade's own surviving false positives
    # and re-train R/O-Net with them as negatives until the gate is clean
    for round_i in range(3):
        engine.variables = variables
        result = evaluate_golden(engine)
        log(f"[golden-mtcnn] gate r{round_i}: pos={result['n_pos']} "
            f"neg={result['n_neg']} "
            f"ious={['%.2f' % x for x in result['ious']]}")
        if result["ok"]:
            break
        fps = mine_false_positives(variables)
        log(f"[golden-mtcnn] bootstrap r{round_i}: {len(fps)} hard FPs")
        if not fps:
            break
        for name in ("rnet", "onet"):
            stage_data[name] = extend_with_fps(stage_data[name], fps,
                                               sizes[name])
            variables[name] = {"params": trainers[name](
                variables[name]["params"], stage_data[name],
                max_steps // 2, tag=f"+fp{round_i}")}
    engine.variables = variables
    result = evaluate_golden(engine)
    log(f"[golden-mtcnn] gate: pos={result['n_pos']} neg={result['n_neg']} "
        f"ious={['%.2f' % x for x in result['ious']]}")

    from ..utils.checkpoint import save_variables

    save_variables(ckpt_out, variables)
    log(f"[golden-mtcnn] checkpoint saved to {ckpt_out}")
    engine2 = FaceEngine(EngineConfig(detector="mtcnn", det_thres=0.5))
    engine2.load_weights(ckpt_out)
    rr = evaluate_golden(engine2)
    result["reload_ok"] = rr["ok"]
    result["reload_ious"] = rr["ious"]
    log(f"[golden-mtcnn] reload gate: {rr['ok']} "
        f"ious={['%.2f' % x for x in rr['ious']]}")
    return result
