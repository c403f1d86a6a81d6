"""YOLOv3 multi-scale loss with on-device target assignment.

Capability extension (the reference never built YOLOv3 — its Darknet-53
backbone is dead code, ``models/backbones/darknet53.py:127-283``);
semantics follow the paper (Redmon & Farhadi 2018) and the darknet
yolov3.cfg conventions:

* **assignment**: each gt box goes to the ONE anchor (of 9, across all 3
  scales) with the highest width/height IoU, at the gt center's cell of
  that anchor's scale;
* **objectness**: binary cross-entropy — target 1 at assigned slots, 0
  elsewhere, EXCEPT slots whose decoded box has IoU > ``ignore_iou`` with
  any gt (those are ignored: confident predictions near a gt that lost
  the anchor race are not punished);
* **coords**: squared error on ``σ(tx/ty)`` vs the in-cell offset and on
  raw ``tw/th`` vs ``log(gt / anchor)``, each weighted per box by
  ``2 − w·h/(W·H)`` (small boxes weigh more — darknet's box scale);
* **class**: per-class sigmoid BCE (multi-label; no softmax).

TPU-first shape discipline, same as :mod:`odc_tpu.losses.yolo_loss`: no
dense per-box target grids — positive terms are gathers at each gt's
(scale, cell, anchor) slot over the compact padded targets
(``[B, M]``), and the background term is one elementwise pass over the
head grids with a scatter-built positive mask, O(B·G + M) total.

The assignment runs INSIDE the loss from ``targets.box/cls/valid`` alone
(the compact pipeline targets' grid-dependent fields are v1/v2-specific),
so the same jitted step serves every image size and the fused on-device
augmentation path needs no special casing.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from odc_tpu.core.boxes import iou
from odc_tpu.losses.yolo_loss import Lambdas, LossParts
from odc_tpu.ops.assign import YoloTargets
from odc_tpu.ops.decode import YOLOV3_ANCHORS, decode_v3


def _bce_logits(logit, target):
    """Numerically-stable sigmoid BCE from raw logits:
    softplus(logit) − target·logit."""
    return jax.nn.softplus(logit) - target * logit


class _ScaleTerms(NamedTuple):
    sq_xy: jax.Array       # [B, M] σ-space center squared error (·box scale)
    sq_wh: jax.Array       # [B, M] log-space size squared error (·box scale)
    obj_pos: jax.Array     # [B, M] BCE(conf_logit, 1) at the assigned slot
    cls_bce: jax.Array     # [B, M] Σ_C BCE at the assigned slot
    sel: jax.Array         # [B, M] f32: gt assigned to THIS scale & valid
    noobj_sum: jax.Array   # [B] Σ BCE(conf_logit, 0) over bg slots
    noobj_cnt: jax.Array   # [B] number of bg slots


def _per_scale_terms(
    y: jax.Array,
    scale_idx: int,
    num_scales: int,
    targets: YoloTargets,
    image_hw: Tuple[int, int],
    anchors: jnp.ndarray,      # [9, 2] pixels
    best: jax.Array,           # [B, M] global best-anchor index (0..8)
    ignore_iou: float,
) -> _ScaleTerms:
    b, hg, wg, a, d = y.shape
    h, w = image_hw
    num_cls = d - 5
    stride_h = h / hg
    stride_w = w / wg

    # Which gts live on this scale: head order is coarsest-first, anchor
    # groups are smallest-first (decode_v3's convention).
    grp0 = 3 * (num_scales - 1 - scale_idx)
    sel = (
        targets.valid & (best >= grp0) & (best < grp0 + 3)
    ).astype(jnp.float32)  # [B, M]
    slot = jnp.clip(best - grp0, 0, a - 1)  # [B, M] anchor within the scale

    # GT geometry in this scale's grid.
    box = targets.box
    gw = jnp.maximum(box[..., 2] - box[..., 0], 1e-3)  # pixels
    gh = jnp.maximum(box[..., 3] - box[..., 1], 1e-3)
    gx = (box[..., 0] + box[..., 2]) / 2 / stride_w    # grid units
    gy = (box[..., 1] + box[..., 3]) / 2 / stride_h
    cx = jnp.clip(gx.astype(jnp.int32), 0, wg - 1)
    cy = jnp.clip(gy.astype(jnp.int32), 0, hg - 1)
    tx_t = gx - cx
    ty_t = gy - cy
    aw = anchors[best][..., 0]  # [B, M] the gt's own anchor, pixels
    ah = anchors[best][..., 1]
    tw_t = jnp.log(gw / aw)
    th_t = jnp.log(gh / ah)
    # Small boxes weigh more (darknet box scale), in [1, 2].
    box_scale = 2.0 - (gw * gh) / float(h * w)

    # Gather predictions at each gt's (cell, anchor) slot.
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
    pred = y[bidx, cy, cx, slot]  # [B, M, 5+C]
    sig_tx = jax.nn.sigmoid(pred[..., 0])
    sig_ty = jax.nn.sigmoid(pred[..., 1])

    sq_xy = box_scale * ((sig_tx - tx_t) ** 2 + (sig_ty - ty_t) ** 2)
    sq_wh = box_scale * (
        (pred[..., 2] - tw_t) ** 2 + (pred[..., 3] - th_t) ** 2
    )
    obj_pos = _bce_logits(pred[..., 4], 1.0)
    onehot = jax.nn.one_hot(targets.cls, num_cls, dtype=jnp.float32)
    cls_bce = jnp.sum(_bce_logits(pred[..., 5:], onehot), axis=-1)

    # Background objectness over the whole grid.  Decode THIS scale's boxes
    # (stop-grad: the ignore test shapes the mask, not the gradient) and
    # ignore slots overlapping any gt above the threshold.
    det = decode_v3((y,), image_hw, anchors[grp0 : grp0 + 3])
    pred_boxes = jax.lax.stop_gradient(det.boxes)  # [B, G, 4] pixels
    iou_bg = iou(pred_boxes[:, :, None, :], box[:, None, :, :])  # [B, G, M]
    iou_bg = jnp.where(targets.valid[:, None, :], iou_bg, 0.0)
    ignored = jnp.max(iou_bg, axis=-1) > ignore_iou  # [B, G]

    flat = (cy * wg + cx) * a + slot  # [B, M]
    # Two valid gts colliding on one (cell, anchor) slot would both gather
    # the same prediction and train it toward conflicting coord/cls targets
    # (and double-count obj_pos) while the pos scatter below collapses them
    # to one slot for the noobj mask.  Darknet overwrites the assignment
    # map, so exactly one gt trains the slot — keep the FIRST selected gt
    # per flat index and drop later colliders from sel.
    m = flat.shape[1]
    same = (flat[:, :, None] == flat[:, None, :]) & (sel[:, None, :] > 0)
    earlier = jnp.tril(jnp.ones((m, m), bool), k=-1)  # [m, m'] m' < m
    collided = jnp.any(same & earlier, axis=-1).astype(jnp.float32)  # [B, M]
    sel = sel * (1.0 - collided)

    g = hg * wg * a
    pos = (
        jnp.zeros((b, g), jnp.float32)
        .at[bidx, flat]
        .max(sel)
    )  # duplicate (cell, anchor) collisions collapse to one positive slot
    bg = (1.0 - pos) * (1.0 - ignored.astype(jnp.float32))  # [B, G]
    bce0 = _bce_logits(y[..., 4].reshape(b, g), 0.0)
    noobj_sum = jnp.sum(bce0 * bg, axis=-1)  # [B]
    noobj_cnt = jnp.sum(bg, axis=-1)

    return _ScaleTerms(sq_xy, sq_wh, obj_pos, cls_bce, sel,
                       noobj_sum, noobj_cnt)


def _all_terms(ys, targets, image_hw, anchors, ignore_iou):
    anchors_arr = jnp.asarray(anchors, jnp.float32)  # [9, 2] pixels
    if anchors_arr.shape != (3 * len(ys), 2):
        raise ValueError(
            f"expected {3 * len(ys)} (w, h) anchors, got {anchors_arr.shape}"
        )
    box = targets.box
    gw = jnp.maximum(box[..., 2] - box[..., 0], 1e-3)
    gh = jnp.maximum(box[..., 3] - box[..., 1], 1e-3)
    # Best anchor by width/height IoU (both boxes centered, darknet's
    # anchor race).
    iw = jnp.minimum(gw[..., None], anchors_arr[:, 0])
    ih = jnp.minimum(gh[..., None], anchors_arr[:, 1])
    inter = iw * ih
    union = gw[..., None] * gh[..., None] + (
        anchors_arr[:, 0] * anchors_arr[:, 1]
    ) - inter
    best = jnp.argmax(inter / (union + 1e-9), axis=-1)  # [B, M] in 0..8

    return [
        _per_scale_terms(
            y, s, len(ys), targets, image_hw, anchors_arr, best, ignore_iou
        )
        for s, y in enumerate(ys)
    ]


def yolov3_loss(
    ys: Sequence[jax.Array],
    targets: YoloTargets,
    image_hw: Tuple[int, int],
    anchors: Sequence[Tuple[float, float]] = YOLOV3_ANCHORS,
    lambdas: Lambdas = Lambdas(),
    ignore_iou: float = 0.5,
) -> Tuple[jax.Array, LossParts]:
    """λ-weighted YOLOv3 loss over the three raw heads.

    Args:
        ys: (y32, y16, y8) raw heads from :class:`odc_tpu.models.yolov3
            .YOLOv3` (coarsest first).
        targets: compact padded targets; only ``box``/``cls``/``valid``
            are consumed (assignment is re-derived per scale on device).
        image_hw: static network input (H, W) in pixels.
        anchors: 9 (w, h) pixel priors, smallest->largest.
        lambdas: the reference λ config keys, mapped
            xy->σ-center, wh->log-size, conf->positive objectness,
            noobj->background objectness, cls->per-class BCE.
        ignore_iou: background slots with a decoded-box IoU above this vs
            any gt are excluded from the noobj term (paper §2.1).

    Returns ``(total, LossParts)``; parts are masked means — positive
    terms over (elements of) valid boxes, noobj over background slots.
    """
    terms = _all_terms(ys, targets, image_hw, anchors, ignore_iou)

    num_boxes = jnp.maximum(
        sum(jnp.sum(t.sel) for t in terms), 1.0
    )  # == Σ valid (each gt selected on exactly one scale)

    def pos_mean(field, scale=1.0):
        return sum(
            jnp.sum(getattr(t, field) * t.sel) for t in terms
        ) / (num_boxes * scale)

    loss_xy = pos_mean("sq_xy", 2.0)
    loss_wh = pos_mean("sq_wh", 2.0)
    loss_conf = pos_mean("obj_pos")
    loss_cls = pos_mean("cls_bce")
    noobj_cnt = jnp.maximum(sum(jnp.sum(t.noobj_cnt) for t in terms), 1.0)
    loss_noobj = sum(jnp.sum(t.noobj_sum) for t in terms) / noobj_cnt

    parts = LossParts(loss_xy, loss_wh, loss_conf, loss_noobj, loss_cls)
    total = (
        lambdas.lambda_xy * loss_xy
        + lambdas.lambda_wh * loss_wh
        + lambdas.lambda_conf * loss_conf
        + lambdas.lambda_noobj * loss_noobj
        + lambdas.lambda_cls * loss_cls
    )
    return total, parts


def yolov3_loss_per_image(
    ys: Sequence[jax.Array],
    targets: YoloTargets,
    image_hw: Tuple[int, int],
    anchors: Sequence[Tuple[float, float]] = YOLOV3_ANCHORS,
    lambdas: Lambdas = Lambdas(),
    ignore_iou: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Per-image λ-weighted losses (denominators per image) — the same
    epoch-val semantics as :func:`odc_tpu.losses.yolo_loss
    .yolo_loss_per_image`: returns ``(losses [B], has_box [B])``; padded
    tail images get loss 0 and ``has_box`` False."""
    terms = _all_terms(ys, targets, image_hw, anchors, ignore_iou)

    m_i = sum(jnp.sum(t.sel, axis=1) for t in terms)  # [B] == box count
    denom = jnp.maximum(m_i, 1.0)

    def pos_mean_i(field, scale=1.0):
        return sum(
            jnp.sum(getattr(t, field) * t.sel, axis=1) for t in terms
        ) / (denom * scale)

    noobj_cnt = jnp.maximum(sum(t.noobj_cnt for t in terms), 1.0)  # [B]
    loss_i = (
        lambdas.lambda_xy * pos_mean_i("sq_xy", 2.0)
        + lambdas.lambda_wh * pos_mean_i("sq_wh", 2.0)
        + lambdas.lambda_conf * pos_mean_i("obj_pos")
        + lambdas.lambda_noobj * (
            sum(t.noobj_sum for t in terms) / noobj_cnt
        )
        + lambdas.lambda_cls * pos_mean_i("cls_bce")
    )
    has_box = m_i > 0
    return jnp.where(has_box, loss_i, 0.0), has_box
