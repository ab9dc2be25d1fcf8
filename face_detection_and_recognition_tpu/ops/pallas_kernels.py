"""Pallas TPU kernels for the hot postprocessing ops.

Two production kernels:

  * ``nms_fixpoint_pallas`` — greedy NMS over score-sorted boxes as a single
    VMEM-resident kernel: the K x K IoU matrix is computed once on the VPU
    and the suppression fixpoint iterates entirely on-chip (no HBM round
    trips between passes). Exact same semantics as ops/nms.greedy_nms_mask's
    sorted core.

  * ``topk_gallery_pallas`` — streaming cosine top-k against a large gallery:
    the gallery is processed in column blocks on the MXU with a running
    top-k (scores+indices) carried in VMEM scratch, so the full [N, M]
    similarity matrix never materializes in HBM. This is the production
    similarity-search path for galleries far larger than HBM-friendly
    sizes; pair with a "model"-axis sharded gallery for multi-chip.

Both kernels run in interpreter mode on CPU (tests) and compiled on TPU.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    from .platform import on_tpu

    return on_tpu()


# ---------------- fused greedy NMS ----------------


def _nms_kernel(boxes_ref, valid_ref, keep_ref, *, iou_thres: float,
                plus1: bool, strict: bool, mode: str):
    boxes = boxes_ref[:]                       # [K, 4] sorted by score desc
    valid = valid_ref[:]                       # [1, K] f32 (1.0 = valid)
    k = boxes.shape[0]
    off = 1.0 if plus1 else 0.0

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    lt_x = jnp.maximum(x1[:, None], x1[None, :])
    lt_y = jnp.maximum(y1[:, None], y1[None, :])
    rb_x = jnp.minimum(x2[:, None], x2[None, :])
    rb_y = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.clip(rb_x - lt_x + off, 0.0, None) * \
        jnp.clip(rb_y - lt_y + off, 0.0, None)
    area = (x2 - x1 + off) * (y2 - y1 + off)
    if mode == "min":
        denom = jnp.minimum(area[:, None], area[None, :])
    else:
        denom = area[:, None] + area[None, :] - inter
        if plus1:
            denom = denom + 1e-16
    iou = inter / denom

    overlaps = (iou > iou_thres) if strict else (iou >= iou_thres)
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    sup_higher = jnp.where(overlaps & (row < col), 1.0, 0.0)  # [K, K] f32

    # fixpoint: S <- exists j<i alive(j) & overlap(j,i); converges to greedy.
    # all state f32 [1, K] — avoids sub-128-lane bitwidth changes in Mosaic
    # and keeps the matvec on the MXU.
    def cond(c):
        s, prev, it = c
        return (it < 1) | jnp.any(s != prev)

    def body(c):
        s, _, it = c
        keepv = valid * (1.0 - s)                           # [1, K]
        sup = jnp.dot(keepv, sup_higher,
                      preferred_element_type=jnp.float32)
        new_s = jnp.where(sup > 0.0, 1.0, 0.0)
        return new_s, s, it + 1

    # derive carries from loaded data so their Mosaic layouts match the
    # dot output inside the loop (replicated-layout zeros break relayout)
    s0 = valid * 0.0
    s_final, _, _ = jax.lax.while_loop(cond, body, (s0, s0 + 1.0, 0))
    keep_ref[:] = valid * (1.0 - s_final)


def nms_fixpoint_pallas(
    boxes_sorted: jnp.ndarray,
    valid_sorted: jnp.ndarray,
    iou_thres: float,
    plus1: bool = False,
    strict: bool = True,
    mode: str = "union",
    interpret: bool = None,
) -> jnp.ndarray:
    """Greedy NMS keep-mask over score-sorted boxes, one VMEM kernel.

    boxes_sorted: [K, 4] xyxy, highest score first. valid_sorted: [K] bool.
    Returns keep [K] bool in sorted order.
    """
    if interpret is None:
        interpret = not _on_tpu()
    k = boxes_sorted.shape[0]
    kp = ((k + 127) // 128) * 128  # lane-align; padded rows are invalid
    boxes_p = jnp.zeros((kp, 4), jnp.float32).at[:k].set(
        boxes_sorted.astype(jnp.float32)
    )
    valid_p = jnp.zeros((1, kp), jnp.float32).at[0, :k].set(
        valid_sorted.astype(jnp.float32)
    )
    kernel = functools.partial(_nms_kernel, iou_thres=float(iou_thres),
                               plus1=plus1, strict=strict, mode=mode)
    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, kp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(boxes_p, valid_p)
    return keep[0, :k] > 0.5


# ---------------- streaming gallery top-k ----------------


def _topk_kernel(q_ref, g_ref, scores_ref, idx_ref, run_s, run_i, *,
                 block_m: int, k: int, valid_m: int):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        run_s[:] = jnp.full_like(run_s, -1e30)
        run_i[:] = jnp.zeros_like(run_i)

    q = q_ref[:]                                   # [N, D]
    g = g_ref[:]                                   # [block_m, D]
    sims = jax.lax.dot_general(
        q, g, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                              # [N, block_m]
    base = step * block_m
    cols = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1) + base
    # mask gallery padding rows so they can never enter the top-k
    sims = jnp.where(cols < valid_m, sims, -1e30)

    # merge block into the running top-k (kept sorted desc): k rounds of
    # masked argmax against the pool. When the pool max beats slot j, they
    # swap — the displaced run value re-enters the pool and can win a later
    # slot; when it doesn't, the pool is left untouched so the same max
    # competes at slot j+1.
    rs = run_s[:]                                  # [N, k]
    ri = run_i[:]
    s = sims
    c = cols
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, rs.shape, 1)
    big = jnp.int32(1 << 30)
    for slot in range(k):
        best = jnp.max(s, axis=1)                  # [N]
        # gather-free index selection: among score-ties pick the smallest
        # gallery index (take_along_axis/argmax gathers don't lower in Mosaic)
        ties = s >= best[:, None]
        best_idx = jnp.min(jnp.where(ties, c, big), axis=1)
        onehot = ties & (c == best_idx[:, None])
        cur_s = rs[:, slot]
        cur_i = ri[:, slot]
        better = best > cur_s
        at = slot_iota == slot
        rs = jnp.where(at & better[:, None], best[:, None], rs)
        ri = jnp.where(at & better[:, None], best_idx[:, None], ri)
        s = jnp.where(onehot & better[:, None], cur_s[:, None], s)
        c = jnp.where(onehot & better[:, None], cur_i[:, None], c)
    run_s[:] = rs
    run_i[:] = ri

    @pl.when(step == nsteps - 1)
    def _():
        scores_ref[:] = run_s[:]
        idx_ref[:] = run_i[:]


def topk_gallery_pallas(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    k: int = 8,
    block_m: int = 512,
    interpret: bool = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k inner-product search of [N, D] queries against an [M, D]
    gallery, streamed in blocks of ``block_m`` rows. Returns
    (scores [N, k] desc, indices [N, k]). The gallery is padded internally
    to a block multiple; padded rows are masked inside the kernel.
    """
    if interpret is None:
        interpret = not _on_tpu()
    n, d = queries.shape
    m = gallery.shape[0]
    pad = (-m) % block_m
    if pad:  # pad internally; padded rows are masked inside the kernel
        gallery = jnp.concatenate(
            [jnp.asarray(gallery, jnp.float32),
             jnp.zeros((pad, d), jnp.float32)]
        )
    grid = ((m + pad) // block_m,)
    kernel = functools.partial(_topk_kernel, block_m=block_m, k=k, valid_m=m)
    scores, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, d), lambda i: (0, 0)),
            pl.BlockSpec((block_m, d), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((n, k), lambda i: (0, 0)),
            pl.BlockSpec((n, k), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, k), jnp.float32),
            pltpu.VMEM((n, k), jnp.int32),
        ],
        interpret=interpret,
    )(queries.astype(jnp.float32), gallery.astype(jnp.float32))
    return scores, idx


# ---------------- fused crop + bilinear resize (separable GEMMs) ----------------


def _crop_kernel(boxes_ref, valid_ref, img_ref, out_ref, *, oh: int, ow: int,
                 img_h: int, img_w: int, channels: int, clamp: bool):
    """One crop per grid step: build hat-function interpolation matrices
    from the box scalars (SMEM prefetch) and run the separable bilinear
    resample as two MXU matmuls per channel, with the channels-major source
    image resident in VMEM across the whole grid (index map is constant)."""
    k = pl.program_id(0)
    fx1 = boxes_ref[k, 0]
    fy1 = boxes_ref[k, 1]
    fx2 = boxes_ref[k, 2]
    fy2 = boxes_ref[k, 3]
    w_f = jnp.float32(img_w)
    h_f = jnp.float32(img_h)
    if clamp:
        x1 = jnp.clip(jnp.floor(fx1), 0.0, w_f - 1.0)
        y1 = jnp.clip(jnp.floor(fy1), 0.0, h_f - 1.0)
        x2 = jnp.clip(jnp.floor(fx2), x1 + 1.0, w_f)
        y2 = jnp.clip(jnp.floor(fy2), y1 + 1.0, h_f)
        cw, ch = x2 - x1, y2 - y1
    else:
        x1 = jnp.floor(fx1)
        y1 = jnp.floor(fy1)
        cw = jnp.maximum(jnp.floor(fx2) - x1, 1.0)
        ch = jnp.maximum(jnp.floor(fy2) - y1, 1.0)

    # Mosaic iota must be integer-typed; cast to f32 after
    # tiling alignment: written width pads to 128 lanes (ow_pad) and height
    # to 8 sublanes (oh_pad); rows/cols beyond oh/ow hold garbage weights
    # and are sliced off by the wrapper
    ow_pad = ((ow + 127) // 128) * 128
    oh_pad = ((oh + 7) // 8) * 8
    o_y = (jax.lax.broadcasted_iota(jnp.int32, (oh_pad, 1), 0)
           .astype(jnp.float32) + 0.5) / oh
    o_x = (jax.lax.broadcasted_iota(jnp.int32, (ow_pad, 1), 0)
           .astype(jnp.float32) + 0.5) / ow
    ys = y1 + o_y * ch - 0.5                           # [oh, 1]
    xs = x1 + o_x * cw - 0.5                           # [ow, 1]
    if clamp:
        ys = jnp.clip(ys, y1, y1 + ch - 1.0)
        xs = jnp.clip(xs, x1, x1 + cw - 1.0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (oh_pad, img_h), 1).astype(jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.int32, (ow_pad, img_w), 1).astype(jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys - iy))      # [oh, H]
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs - ix))      # [ow, W]

    v = valid_ref[k]
    wdt = img_ref.dtype
    for c in range(channels):                          # static unroll
        out_ref[c * oh_pad:(c + 1) * oh_pad, :] = jnp.zeros(
            (oh_pad, ow_pad), jnp.float32)

    @pl.when(v > 0.0)  # skip padding slots entirely
    def _run():
        for c in range(channels):                      # static unroll
            rows = jnp.dot(wy.astype(wdt),
                           img_ref[c * img_h:(c + 1) * img_h, :],
                           preferred_element_type=jnp.float32)  # [oh_pad, W]
            crop = jnp.dot(rows.astype(wdt), wx.astype(wdt).T,
                           preferred_element_type=jnp.float32)
            out_ref[c * oh_pad:(c + 1) * oh_pad, :] = crop


def _crop_kernel_windowed(boxes_ref, valid_ref, img_ref, out_ref, strip_ref,
                          *, oh: int, ow: int, img_h: int, img_w: int,
                          channels: int, clamp: bool, win_h: int, win_w: int):
    """Windowed variant of :func:`_crop_kernel`: the dense [oh, H] x [H, W]
    interpolation GEMM is decomposed exactly into pieces over [win_h, win_w]
    image windows, and only windows overlapping the box's source span are
    multiplied (dynamic fori_loop trip counts). Bilinear hat weights have a
    2-tap support, so a crop whose box fits one window costs
    oh*win_h*win_w + oh*win_w*ow MACs instead of oh*H*W + oh*W*ow — ~10x
    fewer FLOPs for typical face boxes on a 576x1024 frame. Piece weights
    carry an absolute-row indicator so window clamping at the image edge
    never double-counts; the decomposition is exact (same hat weights, f32
    accumulation)."""
    k = pl.program_id(0)
    fx1 = boxes_ref[k, 0]
    fy1 = boxes_ref[k, 1]
    fx2 = boxes_ref[k, 2]
    fy2 = boxes_ref[k, 3]
    w_f = jnp.float32(img_w)
    h_f = jnp.float32(img_h)
    if clamp:
        x1 = jnp.clip(jnp.floor(fx1), 0.0, w_f - 1.0)
        y1 = jnp.clip(jnp.floor(fy1), 0.0, h_f - 1.0)
        x2 = jnp.clip(jnp.floor(fx2), x1 + 1.0, w_f)
        y2 = jnp.clip(jnp.floor(fy2), y1 + 1.0, h_f)
        cw, ch = x2 - x1, y2 - y1
    else:
        x1 = jnp.floor(fx1)
        y1 = jnp.floor(fy1)
        cw = jnp.maximum(jnp.floor(fx2) - x1, 1.0)
        ch = jnp.maximum(jnp.floor(fy2) - y1, 1.0)

    ow_pad = ((ow + 127) // 128) * 128
    oh_pad = ((oh + 7) // 8) * 8
    o_y = (jax.lax.broadcasted_iota(jnp.int32, (oh_pad, 1), 0)
           .astype(jnp.float32) + 0.5) / oh
    o_x = (jax.lax.broadcasted_iota(jnp.int32, (ow_pad, 1), 0)
           .astype(jnp.float32) + 0.5) / ow
    ys = y1 + o_y * ch - 0.5                           # [oh_pad, 1]
    xs = x1 + o_x * cw - 0.5                           # [ow_pad, 1]
    if clamp:
        ys = jnp.clip(ys, y1, y1 + ch - 1.0)
        xs = jnp.clip(xs, x1, x1 + cw - 1.0)

    def _span(lo_f, hi_f, size, align, win):
        """Source-index span [base, hi] of the hat support for sample
        coordinates in [lo_f, hi_f], plus the (bounded) piece count."""
        base = jnp.maximum(
            (jnp.floor(lo_f).astype(jnp.int32) // align) * align, 0)
        hi = jnp.clip(jnp.floor(hi_f).astype(jnp.int32) + 1, 0, size - 1)
        n = jnp.where(hi >= base, (hi - base) // win + 1, 0)
        n = jnp.clip(n, 0, (size + win - 1) // win + 1)
        return base, n

    # sample coords are monotonic in the output index; row/col 0 and oh-1 /
    # ow-1 bound the span (padded rows carry garbage weights but only ever
    # reference in-window columns, and their output rows are sliced off)
    ys_lo = y1 + (0.5 / oh) * ch - 0.5
    ys_hi = y1 + ((oh - 1) + 0.5) / oh * ch - 0.5
    xs_lo = x1 + (0.5 / ow) * cw - 0.5
    xs_hi = x1 + ((ow - 1) + 0.5) / ow * cw - 0.5
    if clamp:
        ys_lo = jnp.clip(ys_lo, y1, y1 + ch - 1.0)
        ys_hi = jnp.clip(ys_hi, y1, y1 + ch - 1.0)
        xs_lo = jnp.clip(xs_lo, x1, x1 + cw - 1.0)
        xs_hi = jnp.clip(xs_hi, x1, x1 + cw - 1.0)
    base_r, n_r = _span(ys_lo, ys_hi, img_h, 8, win_h)
    base_c, n_c = _span(xs_lo, xs_hi, img_w, 128, win_w)

    v = valid_ref[k]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (oh_pad, win_h), 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (ow_pad, win_w), 1)

    for c in range(channels):                          # static unroll
        out_ref[c * oh_pad:(c + 1) * oh_pad, :] = jnp.zeros(
            (oh_pad, ow_pad), jnp.float32)

    wdt = img_ref.dtype  # bf16 images run the GEMMs at full MXU rate

    def body_t(t, _):  # runs only for valid crops (see pl.when below)
        want_c = base_c + t * win_w
        cs = pl.multiple_of(jnp.minimum(want_c, img_w - win_w), 128)
        cols = (cs + col_iota).astype(jnp.float32)
        wx_t = jnp.maximum(0.0, 1.0 - jnp.abs(xs - cols))
        wx_t = (jnp.where(cs + col_iota >= want_c, wx_t, 0.0) * v).astype(wdt)

        for c in range(channels):                      # static unroll
            strip_ref[...] = jnp.zeros((oh_pad, win_w), jnp.float32)

            def body_j(j, _):
                want_r = base_r + j * win_h
                sj = pl.multiple_of(jnp.minimum(want_r, img_h - win_h), 8)
                rows = (sj + row_iota).astype(jnp.float32)
                wy_j = jnp.maximum(0.0, 1.0 - jnp.abs(ys - rows))
                wy_j = jnp.where(sj + row_iota >= want_r, wy_j, 0.0)
                win = img_ref[pl.ds(c * img_h + sj, win_h), pl.ds(cs, win_w)]
                strip_ref[...] += jnp.dot(
                    wy_j.astype(wdt), win, preferred_element_type=jnp.float32)
                return 0

            jax.lax.fori_loop(0, n_r, body_j, 0)
            sl = pl.ds(c * oh_pad, oh_pad)
            out_ref[sl, :] += jnp.dot(strip_ref[...].astype(wdt), wx_t.T,
                                      preferred_element_type=jnp.float32)
        return 0

    # invalid rows are SKIPPED, not zero-multiplied: stage proposal blocks
    # are mostly padding on real images (max_stage2=128 slots vs ~10 faces)
    # and the kernel is per-crop issue-bound, so skipping is the win
    @pl.when(v > 0.0)
    def _run():
        jax.lax.fori_loop(0, n_c, body_t, 0)


_CROP_WIN_H = 128
_CROP_WIN_W = 256


@functools.partial(jax.jit,
                   static_argnames=("out_hw", "clamp", "interpret",
                                    "compute_dtype", "channels"))
def crop_gemm_pallas(
    img_cm: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    out_hw: Tuple[int, int],
    clamp: bool = True,
    interpret: bool = None,
    compute_dtype=jnp.float32,
    channels: int = None,
) -> jnp.ndarray:
    """Fused crop+resize for ALL boxes of one image in one kernel.

    Args:
        img_cm: [C*H, W] f32 CHANNELS-MAJOR image (img.transpose(2,0,1)
            .reshape(C*H, W)).
        boxes: [K, 4] xyxy pixels.
        valid: [K] f32/bool — invalid crops come back zero.
        out_hw: (oh, ow).
        clamp: True = crop_and_resize clamp semantics; False = zero-pad
            (MTCNN) semantics.
    Returns:
        [K, C*oh, ow] f32 (channel-major crops; reshape+transpose to NHWC
        outside).

    vs the XLA GEMM formulation this keeps the per-crop [oh, W] row strip in
    VMEM (never materializing the [K, oh, W, C] intermediate in HBM) and the
    image loads into VMEM once for all K crops. When the source image is
    tile-aligned and at least one window large, the windowed kernel
    (:func:`_crop_kernel_windowed`) is used: it only multiplies image
    windows overlapping each box — ~10x fewer MACs for typical face boxes.
    """
    if interpret is None:
        interpret = not _on_tpu()
    k = boxes.shape[0]
    oh, ow = out_hw
    ow_pad = ((ow + 127) // 128) * 128
    oh_pad = ((oh + 7) // 8) * 8
    ch_total, w = img_cm.shape
    # channel count comes from the caller (crop.py knows img.shape[2]);
    # divisibility inference alone mis-splits e.g. a [H,W,1] image whose H
    # happens to divide by 3
    c = channels if channels is not None else (3 if ch_total % 3 == 0 else 1)
    assert ch_total % c == 0, (ch_total, c)
    h = ch_total // c
    windowed = (h % 8 == 0 and w % 128 == 0
                and h >= _CROP_WIN_H and w >= _CROP_WIN_W)

    if windowed:
        def body(boxes_s, valid_s, img_ref, out_ref, strip_ref):
            _crop_kernel_windowed(
                boxes_s, valid_s, img_ref, out_ref.at[0], strip_ref,
                oh=oh, ow=ow, img_h=h, img_w=w, channels=c, clamp=clamp,
                win_h=_CROP_WIN_H, win_w=_CROP_WIN_W)
        scratch = [pltpu.VMEM((oh_pad, _CROP_WIN_W), jnp.float32)]
    else:
        def body(boxes_s, valid_s, img_ref, out_ref):
            _crop_kernel(boxes_s, valid_s, img_ref,
                         out_ref.at[0], oh=oh, ow=ow, img_h=h, img_w=w,
                         channels=c, clamp=clamp)
        scratch = []

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((ch_total, w), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c * oh_pad, ow_pad),
                               lambda i, *_: (i, 0, 0)),
        scratch_shapes=scratch,
    )

    out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, c * oh_pad, ow_pad), jnp.float32),
        interpret=interpret,
    )(boxes.astype(jnp.float32), valid.astype(jnp.float32),
      img_cm.astype(compute_dtype))
    # strip tiling padding: [K, C*oh_pad, ow_pad] -> [K, C*oh, ow]
    out = out.reshape(k, c, oh_pad, ow_pad)[:, :, :oh, :ow]
    return out.reshape(k, c * oh, ow)


# ---------------- candidate-row gather as streaming one-hot GEMM ----------------


def _rows_gather_kernel(idx_ref, flat_ref, out_ref, *, off: int, n_l: int,
                        blk: int, k: int, pack: int):
    """One [blk, lanes] block of a level's packed rows: build the one-hot
    selection matrix TRANSPOSED (packed-row sublanes x K candidate lanes —
    the natural layout for both operands) and accumulate S^T . block on the
    MXU. Rows outside this level or this block select nothing; garbage
    values in the OOB tail of the last block are zeroed before the dot so
    0 x garbage can never produce NaN."""
    j = pl.program_id(1)
    lanes = flat_ref.shape[-1]
    idx_row = idx_ref[0, 0, :]                    # [K] int32
    lid = idx_row - off
    r = lid // pack - j * blk                     # block-local packed row
    # fold the level-membership test into the row id (-1 matches no iota
    # row) — 2D i1 broadcasts hit Mosaic relayout limits
    r = jnp.where((lid >= 0) & (lid < n_l), r, -1)
    row_io = jax.lax.broadcasted_iota(jnp.int32, (blk, k), 0)
    # the selector MUST match the data dtype: a bf16 one-hot against f32
    # rows makes Mosaic demote the f32 operand (~bf16 precision, measured
    # 7.5e-3); bf16 x bf16 selection is exact (1.0 * x, f32 accumulation)
    st = (row_io == r[None, :]).astype(flat_ref.dtype)        # [blk, K]
    n_packed = (n_l + pack - 1) // pack
    rmask = (jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
             + j * blk) < n_packed
    rows = jnp.where(rmask, flat_ref[0], jnp.bfloat16(0))     # [blk, lanes]
    acc = jax.lax.dot_general(
        st, rows, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)

    @pl.when(j == 0)
    def _init():
        out_ref[0] = acc

    @pl.when(j > 0)
    def _acc():
        out_ref[0] += acc


def candidate_rows_gather_pallas(
    maps_flat: Tuple[jnp.ndarray, ...],
    idx: jnp.ndarray,
    blk: int = 2048,  # measured: 2048 beats 512 by ~7% (fewer accumulate
    interpret: bool = None,  # rounds; rect fits one block per image)
) -> jnp.ndarray:
    """Gather candidate rows ``concat(maps_flat, 1)[b, idx[b]]`` as
    streaming one-hot GEMMs instead of an XLA row gather.

    TPU row gathers at these shapes are latency-bound (~2 ms for
    [128, 1024, 16] bf16 regardless of payload bytes); this kernel streams
    every level ONCE at HBM bandwidth, multiplying [blk, K] one-hot blocks
    on the MXU (the ops/crop.py "gather as GEMM" trick applied to decode
    candidate selection). It also removes the need to materialize the
    [B, ~25k, no] concat: each level is read in its natural layout, packed
    ``pack = 128 // no`` rows per 128-lane register row, and the packed
    neighborhood is lane-selected with 8 static masked slices at the end.

    Exactness: bit-identical to take_along_axis for bf16 (and for any
    dtype in interpret mode). On real TPU hardware f32 inputs go through
    the MXU's multi-pass f32 dot, which is NOT bit-exact — callers that
    need the exact contract on TPU must pass bf16 rows (the production
    detect paths do) or fall back to take_along_axis.

    Args:
        maps_flat: per-level [B, n_l, no] arrays (bf16/f32), no | 128 and
            pack | n_l required (caller falls back to take_along otherwise).
        idx: [B, K] int32 global row indices into the level concat.
    Returns:
        [B, K, no] rows, identical to
        jnp.take_along_axis(concat, idx[..., None], 1).
    """
    if interpret is None:
        interpret = not _on_tpu()
    b, k = idx.shape
    no = maps_flat[0].shape[-1]
    pack = 128 // no
    dtype = maps_flat[0].dtype
    # every level's row count is pack-aligned (caller-checked), so level
    # offsets in the concat are too: global packed row = idx // pack and
    # phase = idx % pack hold ACROSS levels. One packed concat + ONE
    # pallas_call replaces the per-level calls and their [B, K, 128]
    # partial-sum merges (2 full-size adds at 3 levels — ~0.3 ms at b128).
    packed = jnp.concatenate(
        [m.reshape(b, m.shape[1] // pack, no * pack) for m in maps_flat],
        axis=1)
    n_total = sum(m.shape[1] for m in maps_flat)
    n_packed = packed.shape[1]
    grid_b = (n_packed + blk - 1) // blk
    kernel = functools.partial(
        _rows_gather_kernel, off=0, n_l=n_total, blk=blk, k=k, pack=pack)
    nb = pl.pallas_call(
        kernel,
        grid=(b, grid_b),
        in_specs=[
            pl.BlockSpec((1, 1, k), lambda bi, j: (bi, 0, 0)),
            pl.BlockSpec((1, blk, no * pack), lambda bi, j: (bi, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, k, no * pack),
                               lambda bi, j: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, k, no * pack), dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32).reshape(b, 1, k), packed)
    # lane-select the no-wide window of each packed neighborhood
    phase = (idx % pack)[..., None]
    out = jnp.zeros((b, k, no), dtype)
    for s in range(pack):
        out = jnp.where(phase == s, nb[..., s * no:(s + 1) * no], out)
    return out



# ---------------- weighted-blend NMS (BlazeFace) ----------------


def _blend_nms_kernel(dets_ref, valid_ref, thr_ref, out_ref, keep_ref, *,
                      d: int):
    """Parallel form of ops/nms.weighted_blend_nms's sequential loop.

    The pick sequence of the reference while-loop is the greedy keep set
    (same fixpoint as :func:`_nms_kernel`), and every detection is consumed
    by the FIRST kept detection overlapping it — its "owner", a masked min
    over kept ranks. Blends then become one-hot matmuls on the MXU. Rows
    are score-sorted desc; coords in cols 0..d-2, score in col d-1."""
    dets = dets_ref[:]                         # [K, DP] (cols >= d are 0)
    valid = valid_ref[:]                       # [1, K] f32
    iou_thres = thr_ref[0, 0]                  # traced threshold
    k = dets.shape[0]

    # IoU on the yx-layout cols: the intersection product is symmetric in
    # the axis roles, so (ymin, xmin, ymax, xmax) needs no reordering
    a1, b1, a2, b2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]
    lt_a = jnp.maximum(a1[:, None], a1[None, :])
    lt_b = jnp.maximum(b1[:, None], b1[None, :])
    rb_a = jnp.minimum(a2[:, None], a2[None, :])
    rb_b = jnp.minimum(b2[:, None], b2[None, :])
    inter = jnp.clip(rb_a - lt_a, 0.0, None) * jnp.clip(rb_b - lt_b, 0.0, None)
    area = (a2 - a1) * (b2 - b1)
    iou = inter / (area[:, None] + area[None, :] - inter)

    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    ov = jnp.where(iou > iou_thres, 1.0, 0.0)          # strict, no +1
    sup_higher = jnp.where((ov > 0.0) & (row < col), 1.0, 0.0)

    def cond(c):
        s, prev, it = c
        return (it < 1) | jnp.any(s != prev)

    def body(c):
        s, _, it = c
        keepv = valid * (1.0 - s)
        sup = jnp.dot(keepv, sup_higher, preferred_element_type=jnp.float32)
        return jnp.where(sup > 0.0, 1.0, 0.0), s, it + 1

    s0 = valid * 0.0
    s_final, _, _ = jax.lax.while_loop(cond, body, (s0, s0 + 1.0, 0))
    keep = valid * (1.0 - s_final)                     # [1, K]

    # owner(j) = first kept i with (iou(i,j) > thr or i == j); kept rows
    # own themselves (nothing earlier overlaps them, by definition of keep)
    eye = jnp.where(row == col, 1.0, 0.0)
    cand = keep.reshape(k, 1) * valid * jnp.maximum(ov, eye)   # [K, K]
    rank = jnp.where(cand > 0.0, row, k)
    owner = jnp.min(rank, axis=0)                      # [K] int32

    sel = jnp.where((row == owner[None, :]) & (owner[None, :] < k), 1.0, 0.0)
    w = dets[:, d - 1] * valid[0]                      # scores
    wsel = sel * w[None, :]
    numer = jnp.dot(wsel, dets, preferred_element_type=jnp.float32)
    denom = jnp.sum(wsel, axis=1)                      # [K]
    n = jnp.sum(sel, axis=1)
    safe = jnp.where(denom > 0.0, denom, 1.0)
    blended = numer / safe[:, None]
    score = denom / jnp.where(n > 0.0, n, 1.0)
    use_blend = jnp.where(n > 1.0, 1.0, 0.0)[:, None]  # [K, 1]
    out = blended * use_blend + dets * (1.0 - use_blend)
    lane = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    sc = score[:, None] * use_blend + dets[:, d - 1:d] * (1.0 - use_blend)
    out = jnp.where(lane == d - 1, sc, out)
    out_ref[:] = out * keep.reshape(k, 1)
    keep_ref[:] = keep


def weighted_blend_nms_pallas(
    sdets: jnp.ndarray,
    svalid: jnp.ndarray,
    iou_thres: float,
    interpret: bool = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blend rows + keep mask for score-sorted dets [K, D] (score last).
    Returns (rows [K, D] — blended where kept, zero elsewhere, keep [K]).
    The caller compacts kept rows into max_out slots (they are already in
    the reference's emission order: kept rows by descending pick score)."""
    if interpret is None:
        interpret = not _on_tpu()
    k, d = sdets.shape
    kp = ((k + 7) // 8) * 8
    dp = ((d + 127) // 128) * 128
    # single-block kernel: the [K, K] IoU/ownership intermediates live in
    # VMEM (4+ f32 copies). 2048 rows ~= 4*2048^2*4B = 67 MB > VMEM; fail
    # loudly instead of an opaque Mosaic allocation error.
    if kp > 2048:
        raise ValueError(
            f"weighted_blend_nms_pallas: {k} rows exceeds the single-block "
            "VMEM budget (max 2048); use ops.nms.weighted_blend_nms's jnp "
            "path for larger candidate sets")
    dets_p = jnp.zeros((kp, dp), jnp.float32).at[:k, :d].set(
        sdets.astype(jnp.float32))
    valid_p = jnp.zeros((1, kp), jnp.float32).at[0, :k].set(
        svalid.astype(jnp.float32))
    kernel = functools.partial(_blend_nms_kernel, d=d)
    thr = jnp.asarray(iou_thres, jnp.float32).reshape(1, 1)
    out, keep = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((kp, dp), jnp.float32),
            jax.ShapeDtypeStruct((1, kp), jnp.float32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)] * 2,
        interpret=interpret,
    )(dets_p, valid_p, thr)
    return out[:k, :d], keep[0, :k] > 0.5
