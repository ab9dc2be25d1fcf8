"""Non-maximum suppression variants as fixed-size, masked, jittable kernels.

The reference ships three NMS algorithms as per-image python while-loops:
  * yolov5-face custom NMS with a +1-pixel IoU convention and >=thres
    suppression (``modules/yolov5_face/onnx/onnx_utils.py:107-163``),
  * BlazeFace weighted-blend NMS where overlapping boxes are merged as a
    score-weighted mean (``modules/blazeface/blazeface.py:404-458``),
  * torchvision-style hard NMS with strict >thres suppression for official
    yolov5 models (``onnx_utils.py:193-288``),
plus the original MTCNN union/min NMS that lives inside the frozen TF graph.

TPU formulation: detections are kept at a static K (padded + validity mask).
One K x K IoU matrix is computed on the VPU, then greedy suppression runs as a
``lax.fori_loop`` of K masked vector ops — no data-dependent shapes, so the
whole thing stays inside one XLA program and fuses with decode + postproc.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import box_area, iou_matrix

NEG_INF = -1e30


def sort_by_score(
    scores: jnp.ndarray, valid: jnp.ndarray, *arrays: jnp.ndarray, top=None
):
    """Sort descending by score with invalid entries pushed to the end.

    Returns (order, sorted_scores, sorted_valid, *sorted_arrays).

    ``top`` truncates the sorted order to the first ``top`` rows BEFORE
    gathering ``arrays`` — row gathers are the expensive part on TPU
    (latency-bound tile touches), so callers that only keep max_det rows
    should pass it instead of slicing afterwards.
    """
    masked = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked)
    if top is not None:
        order = order[:top]
    out = tuple(a[order] for a in arrays)
    return (order, masked[order], valid[order]) + out


@partial(jax.jit, static_argnames=("plus1", "strict", "mode"))
def greedy_nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thres: float,
    plus1: bool = False,
    strict: bool = True,
    mode: str = "union",
) -> jnp.ndarray:
    """Greedy hard NMS over *pre-sorted-or-not* detections.

    Sorting is done internally; the returned keep-mask is in the ORIGINAL
    input order.

    Args:
        boxes: [K, 4] xyxy.
        scores: [K].
        valid: [K] bool — padding mask.
        iou_thres: suppression threshold.
        plus1: use the +1-pixel IoU convention (yolov5-face custom NMS).
        strict: True suppresses iou > thres (torchvision); False suppresses
            iou >= thres (yolov5-face custom NMS keeps iou < thres).
        mode: "union" (jaccard) or "min" (inter / min(area), MTCNN stages).
    Returns:
        keep: [K] bool mask in input order.
    """
    k = boxes.shape[0]
    order, _, svalid, sboxes = sort_by_score(scores, valid, boxes)
    if mode == "union":
        iou = iou_matrix(sboxes, sboxes, plus1=plus1, eps=1e-16 if plus1 else 0.0)
    elif mode == "min":
        off = 1.0 if plus1 else 0.0
        lt = jnp.maximum(sboxes[:, None, :2], sboxes[None, :, :2])
        rb = jnp.minimum(sboxes[:, None, 2:4], sboxes[None, :, 2:4])
        wh = jnp.clip(rb - lt + off, 0.0, None)
        inter = wh[..., 0] * wh[..., 1]
        area = box_area(sboxes, plus1)
        iou = inter / jnp.minimum(area[:, None], area[None, :])
    else:
        raise ValueError(f"unknown NMS mode: {mode}")

    overlaps = (iou > iou_thres) if strict else (iou >= iou_thres)
    idx = jnp.arange(k)
    # row j suppresses col i when j has higher score (earlier in sort order)
    sup_higher = overlaps & (idx[:, None] < idx[None, :])

    # Greedy NMS as a fixpoint instead of K sequential steps: the recurrence
    # S(i) = exists j<i with overlap(j,i) and not S(j) is well-founded, so it
    # has a unique fixpoint (== the greedy result). Iterating the antitone
    # map S -> F(S) converges to it in <= suppression-chain-depth passes
    # (typically 2-5 on real detections), each pass a single [K,K] masked
    # reduction on the VPU — ~200x fewer sequential steps than the loop.
    def cond(c):
        s, prev, it = c
        return (it < 1) | jnp.any(s != prev)

    def body(c):
        s, _, it = c
        keep = svalid & ~s
        new_s = jnp.any(sup_higher & keep[:, None], axis=0)
        return new_s, s, it + 1

    s0 = jnp.zeros((k,), bool)
    s_final, _, _ = jax.lax.while_loop(cond, body, (s0, s0, 0))
    keep_sorted = svalid & ~s_final
    keep = jnp.zeros((k,), bool).at[order].set(keep_sorted)
    return keep


@partial(jax.jit, static_argnames=("max_out", "plus1", "strict", "mode"))
def greedy_nms(
    dets: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thres: float,
    max_out: int,
    score_col: int = -1,
    plus1: bool = False,
    strict: bool = True,
    mode: str = "union",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hard NMS returning a fixed [max_out, D] block sorted by score.

    dets: [K, D] rows whose first 4 cols are xyxy and ``score_col`` is the
    ranking score. Returns (out [max_out, D], out_valid [max_out]).
    """
    scores = dets[:, score_col]
    keep = greedy_nms_mask(
        dets[:, :4], scores, valid, iou_thres, plus1=plus1, strict=strict, mode=mode
    )
    _, _, kvalid, kdets = sort_by_score(scores, keep, dets, top=max_out)
    return kdets, kvalid


@partial(jax.jit, static_argnames=("max_out",))
def weighted_blend_nms(
    dets: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thres: float = 0.3,
    max_out: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BlazeFace weighted-blend NMS (``blazeface.py:404-458``).

    Each output is the score-weighted mean of all remaining detections whose
    IoU with the current highest-score detection exceeds ``iou_thres``; the
    merged confidence is total_score / n_overlapping (the reference's
    average-score variant). Exact reproduction of the python while-loop as a
    fixed-trip ``fori_loop``.

    Args:
        dets: [K, D] rows [coords..., score] — score in the LAST column,
              coords (D-1 of them) are all blended.
        valid: [K] bool.
    Returns:
        out: [max_out, D], out_valid: [max_out] bool.
    """
    k, d = dets.shape
    _, sscores, svalid, sdets = sort_by_score(dets[:, -1], valid, dets)
    from .platform import on_tpu
    if on_tpu():
        # one VMEM kernel: greedy-keep fixpoint + owner assignment + MXU
        # blend matmuls (the jnp fori below ran at 40 GB/s — 16.8 ms of the
        # b256 blazeface-back step); kept rows are already in emission order
        from .pallas_kernels import weighted_blend_nms_pallas

        rows, keep = weighted_blend_nms_pallas(sdets, svalid, iou_thres)
        rows = rows.astype(dets.dtype)  # kernel computes f32; keep the
        order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)  # jnp-branch
        if k >= max_out:                                         # contract
            order = order[:max_out]
            return rows[order], keep[order]
        # fewer candidate rows than slots: keep the fixed [max_out] contract
        # of the fori-loop branch (zero rows, False validity past k)
        order = jnp.pad(order, (0, max_out - k))
        slot_ok = jnp.arange(max_out) < k
        out_valid = keep[order] & slot_ok
        return jnp.where(out_valid[:, None], rows[order], 0.0), out_valid
    # blazeface boxes are [ymin, xmin, ymax, xmax] but IoU is symmetric in the
    # axis order, so the jaccard matrix is computed directly on cols 0:4.
    yx = sdets[:, :4]
    boxes_xyxy = yx[:, jnp.array([1, 0, 3, 2])]
    iou = iou_matrix(boxes_xyxy, boxes_xyxy)

    def body(slot, state):
        out, out_valid, alive = state
        has_any = jnp.any(alive)
        first = jnp.argmax(alive)  # first alive in score order
        # degenerate (inverted) boxes have self-IoU != 1, which would stall
        # the greedy loop (the reference's while-loop live-locks on them,
        # blazeface.py:428-443); always consume `first` itself
        overlapping = alive & (
            (iou[first] > iou_thres)
            | (jnp.arange(k) == first)
        )
        n = jnp.sum(overlapping)
        w = jnp.where(overlapping, sscores, 0.0)
        total = jnp.sum(w)
        blended_coords = jnp.sum(sdets[:, :-1] * w[:, None], axis=0) / total
        blended_score = total / n
        use_blend = n > 1
        row = jnp.where(
            use_blend,
            jnp.concatenate([blended_coords, blended_score[None]]),
            sdets[first],
        )
        out = out.at[slot].set(jnp.where(has_any, row, 0.0))
        out_valid = out_valid.at[slot].set(has_any)
        alive = alive & ~overlapping
        return out, out_valid, alive

    out0 = jnp.zeros((max_out, d), dets.dtype)
    ov0 = jnp.zeros((max_out,), bool)
    out, out_valid, _ = jax.lax.fori_loop(0, max_out, body, (out0, ov0, svalid))
    return out, out_valid


@partial(jax.jit, static_argnames=("max_out", "agnostic"))
def multiclass_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thres: float,
    max_out: int = 300,
    agnostic: bool = False,
    max_wh: float = 4096.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Torchvision-style batched NMS via the class-offset trick
    (``onnx_utils.py:266-271``): boxes of different classes are shifted by
    ``class_id * max_wh`` so a single class-agnostic pass never suppresses
    across classes.

    Returns (dets [max_out, 6] as [xyxy, conf, cls], out_valid [max_out],
    keep mask [K] in input order).
    """
    offset = jnp.zeros_like(scores) if agnostic else classes.astype(boxes.dtype) * max_wh
    shifted = boxes + offset[:, None]
    keep = greedy_nms_mask(shifted, scores, valid, iou_thres, strict=True)
    dets = jnp.concatenate(
        [boxes, scores[:, None], classes.astype(boxes.dtype)[:, None]], axis=-1
    )
    _, _, kvalid, kdets = sort_by_score(scores, keep, dets, top=max_out)
    return kdets, kvalid, keep
