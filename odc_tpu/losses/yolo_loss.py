"""The five-part masked-mean YOLO loss, computed on compact targets.

Reference semantics (``models/yolov1.py:556-931``, ``models/yolov2.py:747-
1140``), reproduced exactly but re-derived for compact padded targets:

The reference materializes per-box dense grids ``[M, Hg, Wg, A, ...]`` and
takes ``masked_select(...).mean()`` per term.  Every selected element lives
at a box's own (cell, responsible-anchor) coordinate, so each term reduces
to a gather + masked mean over boxes:

* responsible anchor = argmax over anchors of IoU(pred boxes at the box's
  cell, gt box), IoU detached (yolov1.py:784-818);
* ``loss_xy``   — mean over 2·M elements of (σ(txty)_tgt − σ(txty)_pred)²;
* ``loss_wh``   — same in sqrt-space: v1 ``sqrt(σ(twth))`` (yolov1.py:745),
  v2 ``sqrt(bwbh / anchor)`` vs ``sqrt(exp(twth))`` (yolov2.py:931-947);
* ``loss_conf`` — (IoU − conf)² at the responsible slot, mean over M
  (conf target is the **IoU**, yolov1.py:872-874);
* ``loss_noobj``— mean of conf² over every *not-responsible* slot of every
  per-box map (yolov1.py:893-897).  For box b in image i the map holds
  image i's full conf grid minus b's one responsible slot, so
  ``sum = Σ_b (Σ_grid conf²(i(b)) − conf²_resp(b))`` over a count of
  ``M·(Hg·Wg·A − 1)`` — an O(B·G + M) computation instead of the
  reference's O(M·G) memory;
* ``loss_cls``  — Σ_C (onehot − cls_prob)², v1 masked by the obj *cell*
  (per-cell class prob, yolov1.py:914-917), v2 by the responsible anchor
  (yolov2.py:1123-1126); mean over M.

All means divide by the *true* selected-element count (the reference's
``masked_select().mean()`` does the same), with a max(count, 1) guard so an
empty batch yields 0 instead of NaN.  Total = Σ λᵢ·partᵢ with the λ keys of
``config.py:28-52``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from odc_tpu.core.boxes import iou
from odc_tpu.ops.assign import YoloTargets
from odc_tpu.ops.decode import Detections


class Lambdas(NamedTuple):
    """Loss weights; names mirror the reference TRAIN_CONFIG keys."""

    lambda_xy: float = 5.0
    lambda_wh: float = 5.0
    lambda_conf: float = 1.0
    lambda_noobj: float = 0.5
    lambda_cls: float = 1.0


class LossParts(NamedTuple):
    xy: jax.Array
    wh: jax.Array
    conf: jax.Array
    noobj: jax.Array
    cls: jax.Array


def _gather_cells(pred, batch_idx, cy, cx):
    """pred [B, Hg, Wg, ...] gathered at per-box cells -> [B, M, ...]."""
    return pred[batch_idx, cy, cx]


def _safe_mean(x, mask, denom):
    return jnp.sum(x * mask) / jnp.maximum(denom, 1.0)


def _per_box_terms(
    det: Detections,
    targets: YoloTargets,
    mode: str,
    anchors,
):
    """Per-box squared-error terms shared by the batched and per-image
    reductions: (sq_xy, sq_wh, sq_conf, noobj_sum, sq_cls, valid,
    grid_slots), each term [B, M]."""
    b, hg, wg, a = det.conf.shape
    grid_slots = hg * wg * a

    batch_idx = jnp.arange(b, dtype=jnp.int32)[:, None]  # [B, 1] -> bcast [B, M]
    cy = targets.cell[..., 0]
    cx = targets.cell[..., 1]

    # Per-box gathers at the target cell: [B, M, A, ...].
    sig_txty_p = _gather_cells(det.sig_txty, batch_idx, cy, cx)
    twth_p = _gather_cells(det.twth, batch_idx, cy, cx)
    boxes_p = _gather_cells(det.boxes, batch_idx, cy, cx)
    conf_p = _gather_cells(det.conf, batch_idx, cy, cx)

    # Responsible anchor: argmax IoU(pred, gt) at the cell, IoU detached
    # (yolov1.py:784-818).
    iou_cell = jax.lax.stop_gradient(
        iou(boxes_p, targets.box[:, :, None, :])
    )  # [B, M, A]
    resp = jnp.argmax(iou_cell, axis=-1)  # [B, M]

    def take_resp(x):  # [B, M, A, ...] -> [B, M, ...]
        idx = resp[..., None, None] if x.ndim == 4 else resp[..., None]
        return jnp.take_along_axis(x, idx.astype(jnp.int32), axis=2).squeeze(2)

    sig_txty_r = take_resp(sig_txty_p)            # [B, M, 2]
    twth_r = take_resp(twth_p)                    # [B, M, 2]
    conf_r = take_resp(conf_p[..., None]).squeeze(-1)  # [B, M]
    iou_r = take_resp(iou_cell[..., None]).squeeze(-1)  # [B, M]

    # xy ------------------------------------------------------------------
    sq_xy = jnp.sum((targets.sig_txty - sig_txty_r) ** 2, axis=-1)

    # wh (sqrt space) ------------------------------------------------------
    if mode == "v1":
        wh_tgt = jnp.sqrt(targets.twth)        # sqrt(σ-space wh)
        wh_pred = jnp.sqrt(twth_r)             # pred already σ(twth)
    else:
        if anchors is None:
            raise ValueError("anchors required for mode='v2'")
        pwph = jnp.asarray(anchors, dtype=jnp.float32)  # [A, 2]
        pwph_r = pwph[resp]                    # [B, M, 2]
        wh_tgt = jnp.sqrt(targets.twth / pwph_r)
        wh_pred = jnp.sqrt(twth_r)             # pred already exp(twth)
    sq_wh = jnp.sum((wh_tgt - wh_pred) ** 2, axis=-1)

    # conf (target = IoU) --------------------------------------------------
    sq_conf = (iou_r - conf_r) ** 2

    # noobj: for box b in image i the reference's per-box map holds image
    # i's full conf grid minus b's one responsible slot ------------------
    conf_sq_sum = jnp.sum(det.conf**2, axis=(1, 2, 3))  # [B]
    noobj_sum = conf_sq_sum[:, None] - conf_r**2  # [B, M]

    # cls ------------------------------------------------------------------
    num_cls = det.cls_prob.shape[-1]
    onehot = jax.nn.one_hot(targets.cls, num_cls, dtype=jnp.float32)
    if mode == "v1":
        # Per-cell class prob, masked by the obj cell (yolov1.py:914-917).
        cls_p = _gather_cells(det.cls_prob, batch_idx, cy, cx)  # [B, M, C]
    else:
        cls_all = _gather_cells(det.cls_prob, batch_idx, cy, cx)  # [B, M, A, C]
        cls_p = take_resp(cls_all)  # [B, M, C]
    sq_cls = jnp.sum((onehot - cls_p) ** 2, axis=-1)

    valid = targets.valid.astype(jnp.float32)  # [B, M]
    return sq_xy, sq_wh, sq_conf, noobj_sum, sq_cls, valid, grid_slots


def yolo_loss(
    det: Detections,
    targets: YoloTargets,
    lambdas: Lambdas = Lambdas(),
    mode: str = "v2",
    anchors: Optional[Tuple[Tuple[float, float], ...]] = None,
) -> Tuple[jax.Array, LossParts]:
    """Compute the λ-weighted five-part loss.

    Args:
        det: decoded predictions for the image batch.
        targets: compact padded targets from :mod:`odc_tpu.ops.assign`.
        lambdas: loss weights.
        mode: "v1" or "v2" (wh space + cls masking differ, see module doc).
        anchors: required for mode="v2" — (w, h) priors in grid units.
    """
    sq_xy, sq_wh, sq_conf, noobj_sum, sq_cls, valid, grid_slots = (
        _per_box_terms(det, targets, mode, anchors)
    )
    num_boxes = jnp.sum(valid)

    loss_xy = _safe_mean(sq_xy, valid, 2.0 * num_boxes)
    loss_wh = _safe_mean(sq_wh, valid, 2.0 * num_boxes)
    loss_conf = _safe_mean(sq_conf, valid, num_boxes)
    loss_noobj = _safe_mean(noobj_sum, valid, num_boxes * (grid_slots - 1))
    loss_cls = _safe_mean(sq_cls, valid, num_boxes)

    parts = LossParts(loss_xy, loss_wh, loss_conf, loss_noobj, loss_cls)
    total = (
        lambdas.lambda_xy * loss_xy
        + lambdas.lambda_wh * loss_wh
        + lambdas.lambda_conf * loss_conf
        + lambdas.lambda_noobj * loss_noobj
        + lambdas.lambda_cls * loss_cls
    )
    return total, parts


def yolo_loss_per_image(
    det: Detections,
    targets: YoloTargets,
    lambdas: Lambdas = Lambdas(),
    mode: str = "v2",
    anchors: Optional[Tuple[Tuple[float, float], ...]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-image losses — the reference's VAL semantics, batched.

    The reference validates at bs=1 (``train.py:68-71``) so its epoch val
    loss is the mean over per-IMAGE losses where every masked mean divides
    by that image's own counts (``models/yolov1.py:1113-1122`` +
    ``get_loss``).  A batched loss with batch-global denominators weights
    images by box count instead; this variant reproduces the reference
    exactly: each image's five parts divide by its own box count m_i,
    so ``mean(losses[has_box])`` over the epoch equals the reference's
    bs=1 val number to float tolerance.

    Returns:
        (losses [B], has_box [B] bool).  Images with no valid boxes (e.g.
        padded tail rows) get loss 0 and has_box False — the reference
        would NaN on them (mean of an empty ``masked_select``); VOC images
        always carry a box so the case never arises in-contract.
    """
    sq_xy, sq_wh, sq_conf, noobj_sum, sq_cls, valid, grid_slots = (
        _per_box_terms(det, targets, mode, anchors)
    )
    m_i = jnp.sum(valid, axis=1)  # [B]
    denom = jnp.maximum(m_i, 1.0)

    def mean_i(x, scale=1.0):
        return jnp.sum(x * valid, axis=1) / (denom * scale)

    loss_i = (
        lambdas.lambda_xy * mean_i(sq_xy, 2.0)
        + lambdas.lambda_wh * mean_i(sq_wh, 2.0)
        + lambdas.lambda_conf * mean_i(sq_conf)
        + lambdas.lambda_noobj * mean_i(noobj_sum, float(grid_slots - 1))
        + lambdas.lambda_cls * mean_i(sq_cls)
    )
    has_box = m_i > 0
    return jnp.where(has_box, loss_i, 0.0), has_box


def yolo_loss_paper(
    det: Detections,
    targets: YoloTargets,
    lambda_coord: float = 5.0,
    lambda_noobj: float = 0.5,
) -> Tuple[jax.Array, LossParts]:
    """Paper-style per-box-sum loss — capability parity with the
    reference's legacy draft (``models/yolov1 temp.py:216-262``, dead
    code): per-box grid sums instead of masked means, confidence target 1
    (not IoU), noobj target 0, class term masked by the obj cell,
    ``lambda_coord`` on xy+wh, final mean over boxes."""
    b, hg, wg, a = det.conf.shape
    batch_idx = jnp.arange(b, dtype=jnp.int32)[:, None]
    cy = targets.cell[..., 0]
    cx = targets.cell[..., 1]

    sig_txty_p = det.sig_txty[batch_idx, cy, cx]   # [B, M, A, 2]
    twth_p = det.twth[batch_idx, cy, cx]
    boxes_p = det.boxes[batch_idx, cy, cx]
    conf_p = det.conf[batch_idx, cy, cx]           # [B, M, A]
    cls_p = det.cls_prob[batch_idx, cy, cx]        # [B, M, C] (v1 head)

    iou_cell = jax.lax.stop_gradient(
        iou(boxes_p, targets.box[:, :, None, :])
    )
    resp = jnp.argmax(iou_cell, axis=-1)

    def take(x):
        idx = resp[..., None, None] if x.ndim == 4 else resp[..., None]
        return jnp.take_along_axis(x, idx.astype(jnp.int32), axis=2).squeeze(2)

    valid = targets.valid.astype(jnp.float32)
    num_boxes = jnp.maximum(jnp.sum(valid), 1.0)

    xy_b = jnp.sum((targets.sig_txty - take(sig_txty_p)) ** 2, -1)
    wh_b = jnp.sum(
        (jnp.sqrt(targets.twth) - jnp.sqrt(take(twth_p))) ** 2, -1
    )
    conf_r = take(conf_p[..., None]).squeeze(-1)
    conf_b = (1.0 - conf_r) ** 2
    conf_sq = jnp.sum(det.conf**2, axis=(1, 2, 3))  # [B]
    noobj_b = conf_sq[:, None] - conf_r**2
    num_cls = det.cls_prob.shape[-1]
    onehot = jax.nn.one_hot(targets.cls, num_cls, dtype=jnp.float32)
    cls_b = jnp.sum((onehot - cls_p) ** 2, -1)

    per_box = (
        lambda_coord * (xy_b + wh_b) + conf_b + lambda_noobj * noobj_b + cls_b
    )
    total = jnp.sum(per_box * valid) / num_boxes
    parts = LossParts(
        jnp.sum(xy_b * valid) / num_boxes,
        jnp.sum(wh_b * valid) / num_boxes,
        jnp.sum(conf_b * valid) / num_boxes,
        jnp.sum(noobj_b * valid) / num_boxes,
        jnp.sum(cls_b * valid) / num_boxes,
    )
    return total, parts
