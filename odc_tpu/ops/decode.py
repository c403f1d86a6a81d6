"""Fused box decode for the YOLO heads.

Pure ``jax.numpy`` elementwise math — under ``jit`` XLA fuses the whole
decode (sigmoid/exp/softmax, grid offsets, corner conversion) into the tail
of the head conv/matmul, so decode costs ~zero extra HBM traffic.

Semantics (see SURVEY.md C10):

* **v1** (reference ``models/yolov1.py:250-428``): ``bx = σ(tx) + cx``,
  ``bw = W_g · σ(tw)`` — the reference's *nonstandard sigmoid-wh* decode
  (``yolov1.py:293-299``); class probabilities are per-cell (no anchor dim).
* **v2** (reference ``models/yolov2.py:466-640``): ``bw = p_w · exp(tw)``
  with the 5 hardcoded anchors in grid units (``yolov2.py:49-55``); class
  probabilities are per-anchor.

Both: ``conf = σ(t_o)``, ``cls_prob = softmax``, corner coordinates are in
*pixels* (grid units × cell size), and ``cls_spec = conf · cls_prob``.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

# Reference anchors, (width, height) in 13x13-grid units (yolov2.py:49-55).
YOLOV2_ANCHORS: Tuple[Tuple[float, float], ...] = (
    (1.3221, 1.73145),
    (3.19275, 4.00944),
    (5.05587, 8.09892),
    (9.47112, 4.84053),
    (11.2364, 10.0071),
)

# YOLOv3 anchors, (width, height) in PIXELS of the network input (the
# darknet yolov3.cfg values, smallest->largest).  The reference repo never
# built YOLOv3 (its Darknet-53 backbone is dead code,
# ``models/backbones/darknet53.py:127-283``); this model family is a
# capability extension following the paper (Redmon & Farhadi 2018), not a
# parity target.  Groups of 3 attach to the stride-8/16/32 heads.
YOLOV3_ANCHORS: Tuple[Tuple[float, float], ...] = (
    (10.0, 13.0), (16.0, 30.0), (33.0, 23.0),        # stride 8
    (30.0, 61.0), (62.0, 45.0), (59.0, 119.0),       # stride 16
    (116.0, 90.0), (156.0, 198.0), (373.0, 326.0),   # stride 32
)


class Detections(NamedTuple):
    """Decoded head output (the reference ``predict()`` 6-tuple)."""

    sig_txty: jax.Array  # [B, Hg, Wg, A, 2]  σ(tx), σ(ty)
    twth: jax.Array      # [B, Hg, Wg, A, 2]  v1: σ(tw/th); v2: exp(tw/th)
    boxes: jax.Array     # [B, Hg, Wg, A, 4]  (x1, y1, x2, y2) in pixels
    conf: jax.Array      # [B, Hg, Wg, A]     σ(t_o)
    cls_prob: jax.Array  # v1: [B, Hg, Wg, C]; v2: [B, Hg, Wg, A, C]
    cls_spec: jax.Array  # [B, Hg, Wg, A, C]  conf · cls_prob


def _grid_offsets(hg: int, wg: int, dtype):
    cy = jax.lax.broadcasted_iota(dtype, (1, hg, 1, 1), 1)
    cx = jax.lax.broadcasted_iota(dtype, (1, 1, wg, 1), 2)
    return cy, cx


def _corners(bx, by, bw, bh, image_hw, hg, wg):
    """Grid-unit centers/sizes -> pixel corner coords."""
    h, w = image_hw
    x1 = bx - bw / 2
    y1 = by - bh / 2
    x2 = bx + bw / 2
    y2 = by + bh / 2
    cell_h = h / hg
    cell_w = w / wg
    return jnp.stack(
        [x1 * cell_w, y1 * cell_h, x2 * cell_w, y2 * cell_h], axis=-1
    )


def decode_v1(
    y: jax.Array,
    image_hw: Tuple[int, int],
    num_anchors: int = 2,
) -> Detections:
    """Decode a YOLOv1 head output.

    Args:
        y: [B, Hg, Wg, A*5 + C] raw head output.
        image_hw: static (height, width) of the network input in pixels.
        num_anchors: B in the paper's S×S×(B·5+C) layout (reference default 2).
    """
    b, hg, wg, d = y.shape
    a = num_anchors
    num_cls = d - a * 5

    txtytwthto = y[..., : a * 5].reshape(b, hg, wg, a, 5)
    sig = jax.nn.sigmoid(txtytwthto)

    sig_txty = sig[..., 0:2]
    sig_twth = sig[..., 2:4]
    conf = sig[..., 4]

    cy, cx = _grid_offsets(hg, wg, y.dtype)
    bx = sig_txty[..., 0] + cx
    by = sig_txty[..., 1] + cy
    # Nonstandard reference decode: wh through sigmoid, scaled by grid size
    # (yolov1.py:298-299).
    bw = wg * sig_twth[..., 0]
    bh = hg * sig_twth[..., 1]

    boxes = _corners(bx, by, bw, bh, image_hw, hg, wg)

    cls_prob = jax.nn.softmax(y[..., -num_cls:], axis=-1)  # [B, Hg, Wg, C]
    cls_spec = cls_prob[..., None, :] * conf[..., :, None]

    return Detections(sig_txty, sig_twth, boxes, conf, cls_prob, cls_spec)


def decode_v1_preactivated(
    y: jax.Array,
    image_hw: Tuple[int, int],
    num_anchors: int = 2,
) -> Detections:
    """Decode the LEGACY-draft head (``models/yolov1 temp.py:52-70``): the
    model already applied one sigmoid to everything, so values are consumed
    directly — txty/twth/conf straight from the head, per-cell class
    probabilities are sigmoids (the draft uses no softmax).  Box corners
    follow the same v1 grid math so detect/NMS/eval compose unchanged."""
    b, hg, wg, d = y.shape
    a = num_anchors
    num_cls = d - a * 5

    vals = y[..., : a * 5].reshape(b, hg, wg, a, 5)
    sig_txty = vals[..., 0:2]
    sig_twth = vals[..., 2:4]
    conf = vals[..., 4]

    cy, cx = _grid_offsets(hg, wg, y.dtype)
    bx = sig_txty[..., 0] + cx
    by = sig_txty[..., 1] + cy
    bw = wg * sig_twth[..., 0]
    bh = hg * sig_twth[..., 1]
    boxes = _corners(bx, by, bw, bh, image_hw, hg, wg)

    cls_prob = y[..., -num_cls:]  # already sigmoided by the legacy head
    cls_spec = cls_prob[..., None, :] * conf[..., :, None]
    return Detections(sig_txty, sig_twth, boxes, conf, cls_prob, cls_spec)


def decode_v3(
    ys: Sequence[jax.Array],
    image_hw: Tuple[int, int],
    anchors: Sequence[Tuple[float, float]] = YOLOV3_ANCHORS,
) -> Detections:
    """Decode YOLOv3's three-scale head outputs into ONE flat Detections.

    Args:
        ys: (y32, y16, y8) raw heads, coarsest first; each
            [B, Hg, Wg, 3, 5 + C] with Hg = H/stride.
        image_hw: static (height, width) of the network input in pixels.
        anchors: 9 (w, h) priors in input PIXELS, smallest->largest
            (groups of 3 per scale; the stride-32 head uses the largest).

    Per scale: ``bx = (σ(tx) + cx) · stride``, ``bw = a_w · exp(tw)``
    (anchors are already pixels), ``conf = σ(t_o)``; class probabilities
    are INDEPENDENT sigmoids (the paper's multi-label head — no softmax,
    unlike v1/v2).  Fields are flattened to a leading ``[B, ΣHg·Wg·3]``
    box axis so the downstream e2e path (``odc_tpu.ops.detect`` /
    NMS / serving export) composes unchanged.
    """
    h, w = image_hw
    num_scales = len(ys)
    flat: list = [[] for _ in range(6)]
    for s, y in enumerate(ys):
        b, hg, wg, a, d = y.shape
        # Coarsest head first: (num_scales-1-s) indexes the anchor groups
        # smallest->largest.
        grp = jnp.asarray(
            anchors[3 * (num_scales - 1 - s) : 3 * (num_scales - s)],
            dtype=y.dtype,
        )  # [3, 2] pixels
        stride_h = h / hg
        stride_w = w / wg

        sig_txty = jax.nn.sigmoid(y[..., 0:2])
        exp_twth = jnp.exp(y[..., 2:4])
        conf = jax.nn.sigmoid(y[..., 4])
        cls_prob = jax.nn.sigmoid(y[..., 5:])  # multi-label, no softmax

        cy, cx = _grid_offsets(hg, wg, y.dtype)
        bx = (sig_txty[..., 0] + cx) * stride_w  # pixels
        by = (sig_txty[..., 1] + cy) * stride_h
        bw = grp[:, 0] * exp_twth[..., 0]
        bh = grp[:, 1] * exp_twth[..., 1]
        boxes = jnp.stack(
            [bx - bw / 2, by - bh / 2, bx + bw / 2, by + bh / 2], axis=-1
        )
        cls_spec = cls_prob * conf[..., None]

        g = hg * wg * a
        for i, t in enumerate(
            (sig_txty, exp_twth, boxes, conf, cls_prob, cls_spec)
        ):
            flat[i].append(t.reshape((b, g) + t.shape[4:]))
    return Detections(*(jnp.concatenate(parts, axis=1) for parts in flat))


def decode_v2(
    y: jax.Array,
    image_hw: Tuple[int, int],
    anchors: Sequence[Tuple[float, float]] = YOLOV2_ANCHORS,
) -> Detections:
    """Decode a YOLOv2 head output.

    Args:
        y: [B, Hg, Wg, A, 5 + C] raw head output.
        image_hw: static (height, width) of the network input in pixels.
        anchors: (w, h) anchor priors in grid units.
    """
    _, hg, wg, a, _ = y.shape
    anchors_arr = jnp.asarray(anchors, dtype=y.dtype)  # [A, 2]
    pw = anchors_arr[:, 0]
    ph = anchors_arr[:, 1]

    sig_txty = jax.nn.sigmoid(y[..., 0:2])
    exp_twth = jnp.exp(y[..., 2:4])
    conf = jax.nn.sigmoid(y[..., 4])

    cy, cx = _grid_offsets(hg, wg, y.dtype)
    bx = sig_txty[..., 0] + cx
    by = sig_txty[..., 1] + cy
    bw = pw * exp_twth[..., 0]
    bh = ph * exp_twth[..., 1]

    boxes = _corners(bx, by, bw, bh, image_hw, hg, wg)

    cls_prob = jax.nn.softmax(y[..., 5:], axis=-1)  # [B, Hg, Wg, A, C]
    cls_spec = cls_prob * conf[..., None]

    return Detections(sig_txty, exp_twth, boxes, conf, cls_prob, cls_spec)
