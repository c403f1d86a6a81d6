"""Fixed-shape greedy NMS, on-device.

The reference (``models/utils.py:68-164``) implements NMS as a Python
``while`` loop of ``masked_select`` calls with data-dependent shapes — it
cannot compile under XLA.  This module re-designs it TPU-first:

* a confidence filter + stable descending sort select the top ``max_keep``
  candidates (static shape);
* greedy suppression runs as a fixed-trip-count ``lax.fori_loop`` over a
  precomputed pairwise-IoU matrix, producing a keep *mask* instead of
  compacting the list.

The kept set is identical to the reference's sequential suppression whenever
the number of boxes above ``conf_thre`` is ≤ ``max_keep`` (suppression order
is score order in both): a suppressed box never suppresses others, and a box
``j`` is dropped iff some still-kept earlier box overlaps it with
``iou >= iou_thre`` — exactly the reference's ``iou_mask = iou < thre`` rule
(``models/utils.py:133``).

``class_offset_boxes`` enables class-wise NMS (a framework capability on top
of the reference's class-agnostic behavior) by the standard coordinate-offset
trick: boxes of different classes are translated to disjoint regions so they
can never suppress each other.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from odc_tpu.core.boxes import pairwise_iou


def _suppress(boxes, score, valid, iou_thre, max_keep):
    """Core fixed-shape suppression. Returns (order, keep) over sorted boxes."""
    n = boxes.shape[0]
    k = min(max_keep, n)

    neg_inf = jnp.array(-jnp.inf, dtype=score.dtype)
    score = jnp.where(valid, score, neg_inf)

    if k < n:
        top_score, order = jax.lax.top_k(score, k)
        survivors = top_score > neg_inf
    else:
        order = jnp.argsort(-score)  # stable descending sort
        survivors = jnp.take(valid, order)

    cand = jnp.take(boxes, order, axis=0)  # [k, 4]
    iou_mat = pairwise_iou(cand, cand)  # [k, k]
    later = (
        jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
        > jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    )
    suppress_mat = (iou_mat >= iou_thre) & later  # [k, k]: i suppresses j

    def body(i, keep):
        row = suppress_mat[i] & keep[i]
        return keep & ~row

    keep = jax.lax.fori_loop(0, k, body, survivors)
    return order, keep


@functools.partial(jax.jit, static_argnames=("max_keep",))
def nms_padded(
    boxes,
    conf,
    cls_scores,
    conf_thre=0.9,
    iou_thre=0.5,
    max_keep: int = 128,
    suppress_boxes=None,
):
    """Greedy NMS with static output shapes.

    Args:
        boxes: [..., 4] corner-format boxes (leading dims are flattened).
        conf: [...] confidence scores; boxes with ``conf < conf_thre`` are
            dropped before suppression (reference ``models/utils.py:92``).
        cls_scores: [..., C] class-specific confidence scores.
        conf_thre, iou_thre: thresholds (reference defaults 0.9 / 0.5).
        max_keep: static candidate budget.
        suppress_boxes: optional [..., 4] boxes used for the IoU overlap test
            instead of ``boxes`` (class-wise NMS passes the class-offset
            coordinates here while outputs keep the originals).

    Returns:
        (boxes [max_keep, 4], conf [max_keep], cls_scores [max_keep, C],
        keep [max_keep] bool), sorted by descending confidence.  Entries with
        ``keep == False`` are padding or suppressed.
    """
    num_cls = cls_scores.shape[-1]
    boxes = boxes.reshape(-1, 4)
    conf = conf.reshape(-1)
    cls_scores = cls_scores.reshape(-1, num_cls)
    sup = (
        boxes if suppress_boxes is None else suppress_boxes.reshape(-1, 4)
    )

    valid = conf >= conf_thre
    order, keep = _suppress(sup, conf, valid, iou_thre, max_keep)

    out_boxes = jnp.take(boxes, order, axis=0)
    out_conf = jnp.take(conf, order)
    out_cls = jnp.take(cls_scores, order, axis=0)

    k = order.shape[0]
    if k < max_keep:  # pad up to the static budget
        pad = max_keep - k
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_conf = jnp.pad(out_conf, (0, pad))
        out_cls = jnp.pad(out_cls, ((0, pad), (0, 0)))
        keep = jnp.pad(keep, (0, pad))

    zeros = jnp.zeros_like
    return (
        jnp.where(keep[:, None], out_boxes, zeros(out_boxes)),
        jnp.where(keep, out_conf, zeros(out_conf)),
        jnp.where(keep[:, None], out_cls, zeros(out_cls)),
        keep,
    )


def class_offset_boxes(boxes, cls_idx, offset: float = 1e5):
    """Translate boxes per class so class-wise NMS reduces to class-agnostic."""
    shift = cls_idx.astype(boxes.dtype)[..., None] * offset
    return boxes + shift


def nms(
    boxes,
    conf,
    cls_scores,
    conf_thre=0.9,
    iou_thre=0.5,
    max_keep: int = 128,
    class_wise: bool = False,
):
    """Host-friendly NMS: runs the fixed-shape kernel, compacts on host.

    Mirrors the reference ``nms()`` return contract
    (``models/utils.py:160-164``): compacted ``(boxes [M, 4], conf [M],
    cls_scores [M, C])`` sorted by descending confidence.
    """
    import numpy as np

    num_cls = cls_scores.shape[-1]
    boxes = boxes.reshape(-1, 4)
    conf = conf.reshape(-1)
    cls_scores = cls_scores.reshape(-1, num_cls)

    if class_wise:
        nms_boxes = class_offset_boxes(boxes, jnp.argmax(cls_scores, -1))
    else:
        nms_boxes = boxes

    valid = conf >= conf_thre
    order, keep = _suppress(nms_boxes, conf, valid, iou_thre, max_keep)

    keep_np = np.asarray(keep)
    order_np = np.asarray(order)[keep_np]
    return (
        np.asarray(boxes)[order_np],
        np.asarray(conf)[order_np],
        np.asarray(cls_scores)[order_np],
    )
